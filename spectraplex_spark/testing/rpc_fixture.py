"""A localhost JSON-RPC fixture node shared by connector and HTTP-edge
tests. Plays the Solana node: canned getSignaturesForAddress /
getTransaction responses plus programmable fault injection (429 with
Retry-After, 500 budgets, transient/broken signatures).

The canned transactions are golden-shaped (solana_parser_test.rs:11-37):
each moves -0.5 SOL from ``WALLET`` — so a fetched history also drives
the normalize pipeline end-to-end, not just the transport.
"""

from __future__ import annotations

import contextlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

WALLET = "FixtureWallet1111111111111111111111111111111"
OTHER = "FixtureOther22222222222222222222222222222222"


def _sig(i: int) -> str:
    return f"sig{i:04d}"


def golden_tx(sig: str, i: int, wallet: str = WALLET) -> dict:
    """One -0.5 SOL transfer out of ``wallet`` (the reference's own
    golden vector shape), stamped with a deterministic blockTime."""
    return {
        "slot": 100 + i,
        "blockTime": 1700000000 + i,
        "transaction": {
            "signatures": [sig],
            "message": {
                "accountKeys": [
                    {"pubkey": wallet, "signer": True, "writable": True},
                    {"pubkey": OTHER, "signer": False, "writable": True},
                ]
            },
        },
        "meta": {
            "fee": 5000,
            "preBalances": [10_000_000_000, 0],
            "postBalances": [9_500_000_000, 500_000_000],
            "preTokenBalances": [],
            "postTokenBalances": [],
        },
    }


class FixtureNode:
    """Canned node state, fault-injectable per (method, signature) or via
    global HTTP fault budgets. ``url`` is set once served."""

    def __init__(self, n_sigs: int = 7):
        self.signatures = [_sig(i) for i in range(n_sigs)]
        self.txs = {s: golden_tx(s, i) for i, s in enumerate(self.signatures)}
        self.http_faults: list[int] = []  # status codes served before success
        self.retry_after: str | None = None
        self.broken_sigs: set[str] = set()  # always fail getTransaction
        self.flaky_sigs: dict[str, int] = {}  # sig -> remaining failures
        self.slow_budget: int = 0  # requests to stall by slow_s before reply
        self.slow_s: float = 0.0
        self.disconnect_budget: int = 0  # requests to cut mid-response-body
        # raw bodies served verbatim with HTTP 200 before real handling —
        # the proxy-returns-an-HTML-error-page-with-200 fault class
        self.garbage_bodies: list[bytes] = []
        self.log: list[str] = []  # method names in arrival order
        self.lock = threading.Lock()
        self.url: str | None = None

    def handle(self, req: dict) -> tuple[int, dict | None, dict[str, str]]:
        method, params = req["method"], req.get("params", [])
        with self.lock:
            self.log.append(method)
            if self.http_faults:
                code = self.http_faults.pop(0)
                hdrs = {"Retry-After": self.retry_after} if self.retry_after else {}
                return code, None, hdrs
        if method == "getSignaturesForAddress":
            cfg = params[1] if len(params) > 1 else {}
            limit = cfg.get("limit", 1000)
            before = cfg.get("before")
            sigs = self.signatures
            if before is not None:
                sigs = sigs[sigs.index(before) + 1 :]
            page = [{"signature": s, "slot": self.txs[s]["slot"]} for s in sigs[:limit]]
            return 200, {"jsonrpc": "2.0", "id": req["id"], "result": page}, {}
        if method == "getTransaction":
            sig = params[0]
            with self.lock:
                if sig in self.broken_sigs:
                    return 200, {"jsonrpc": "2.0", "id": req["id"],
                                 "error": {"code": -32602, "message": "broken"}}, {}
                if self.flaky_sigs.get(sig, 0) > 0:
                    self.flaky_sigs[sig] -= 1
                    return 200, {"jsonrpc": "2.0", "id": req["id"],
                                 "error": {"code": -32005, "message": "node is behind"}}, {}
            return 200, {"jsonrpc": "2.0", "id": req["id"],
                         "result": self.txs[sig]}, {}
        return 200, {"jsonrpc": "2.0", "id": req["id"],
                     "error": {"code": -32601, "message": "no such method"}}, {}


@contextlib.contextmanager
def serve_node(n_sigs: int = 7):
    """Serve a FixtureNode on an ephemeral localhost port."""
    state = FixtureNode(n_sigs=n_sigs)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with state.lock:
                stall = state.slow_budget > 0
                if stall:
                    state.slow_budget -= 1
                cut = (not stall) and state.disconnect_budget > 0
                if cut:
                    state.disconnect_budget -= 1
            if stall:
                import time as _time

                _time.sleep(state.slow_s)  # client-side read timeout path
            if cut:
                # Mid-stream disconnect: advertise a body, send half, drop
                # the connection — the client sees an IncompleteRead.
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", "1000")
                self.end_headers()
                self.wfile.write(b'{"partial')
                self.wfile.flush()
                self.connection.close()
                return
            with state.lock:
                garbage = (
                    state.garbage_bodies.pop(0) if state.garbage_bodies else None
                )
            if garbage is not None:
                with state.lock:
                    state.log.append(json.loads(body)["method"])
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(garbage)))
                self.end_headers()
                self.wfile.write(garbage)
                return
            status, payload, hdrs = state.handle(json.loads(body))
            data = json.dumps(payload).encode() if payload is not None else b""
            try:
                self.send_response(status)
                for k, v in hdrs.items():
                    self.send_header(k, v)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except OSError:
                pass  # client gave up (timeout test) — nothing to report

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    state.url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        yield state
    finally:
        server.shutdown()
        server.server_close()
