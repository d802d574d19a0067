"""K4: the HTTP serving edge — the reference's axum API re-expressed
over the engine's serving functions.

Route parity with api/src/main.rs:30-50:

  GET  /health                    → "OK"            (main.rs:49-51)
  POST /v1/ingest                 → fetch via the RPC connector, land
        {chain, wallet, rpc_url}    bronze idempotently (main.rs:67-87;
                                    the hardcoded limit=50 at main.rs:75)
  POST /v1/normalize {wallet}     → normalize that wallet's bronze rows
                                    into silver (main.rs:89-112)
  GET  /v1/transactions/<wallet>  → bronze rows, JSON array (main.rs:114-121)
  GET  /v1/ledger/<wallet>        → silver rows, JSON array (main.rs:123-130)

Architecture notes (SURVEY §4.2): the reference runs ingest inline in
the request handler and admits it should be a queue job — this edge
keeps that prototype behavior for parity but bounds it the engine's
way: the fetch limit is explicit, reads collect at most ``row_limit``
rows (an unbounded collect at the HTTP edge is the scale anti-pattern),
and every write goes through the idempotent sinks, so a retried POST is
a no-op instead of a duplicate (the reference gets this from ON
CONFLICT, repo.rs:26 — here from deterministic ids + anti-join).

This is a serving *edge*, not a query path: one driver-side thread pool
in front of a shared SparkSession. Throughput-critical deployments
should put the same functions behind Spark Connect instead; the engine
surface is identical either way.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from spectraplex_spark import serving

_TX_ROUTE = re.compile(r"^/v1/transactions/([^/]+)$")
_LEDGER_ROUTE = re.compile(r"^/v1/ledger/([^/]+)$")


class AppState:
    """main.rs:15-17's AppState: the shared handles handlers need —
    a SparkSession instead of a PgPool, medallion paths instead of a
    connection string."""

    def __init__(
        self,
        spark: SparkSession,
        bronze_path: str,
        silver_path: str,
        row_limit: int = 1000,
        ingest_limit: int = 50,
    ):
        self.spark = spark
        self.bronze_path = bronze_path
        self.silver_path = silver_path
        self.row_limit = row_limit
        self.ingest_limit = ingest_limit  # main.rs:75's hardcoded 50
        # one Spark action at a time: local-mode scheduler fairness is
        # not worth interleaved-job nondeterminism at the serving edge
        self.lock = threading.Lock()


class BadRequest(ValueError):
    """Client-side payload fault → HTTP 400 with the message."""


def _require(payload: dict[str, Any], field: str) -> Any:
    try:
        return payload[field]
    except KeyError:
        raise BadRequest(f"missing field '{field}'") from None


def _ingest(state: AppState, payload: dict[str, Any]) -> str:
    """main.rs:67-87 — fetch history over RPC, land bronze.

    Deliberate divergence (SURVEY §4.2 policy): the reference declares
    the payload's chain field but never reads it (``_chain``,
    main.rs:55) — every ingest runs the Solana adapter regardless, so
    a client asking for another chain gets rows silently labeled and
    parsed as Solana.  Here a non-solana chain is a loud 400 instead
    of silently-mislabeled data (wrong deterministic ids, wrong bronze
    partition, wrong normalize dispatch).

    The RPC fetch (driver-side network, possibly seconds of retries)
    runs OUTSIDE the Spark lock — only the bronze landing needs it
    (r14 review finding: the lock's contract is one Spark action at a
    time, not one HTTP request at a time)."""
    from spectraplex_spark.sources.connector import ingest_history
    from spectraplex_spark.sources.io import write_bronze

    wallet = _require(payload, "wallet")
    rpc_url = _require(payload, "rpc_url")
    chain = payload.get("chain", "solana")
    if chain != "solana":
        raise BadRequest(
            f"chain '{chain}' not supported by the RPC ingest edge "
            "(the reference ignores this field and always fetches "
            "solana — rejected loudly here instead)"
        )
    bronze = ingest_history(
        state.spark, rpc_url, wallet, limit=state.ingest_limit
    )
    with state.lock:
        n = write_bronze(bronze, state.bronze_path)
    return f"Ingested {n} transactions"


def _normalize(state: AppState, payload: dict[str, Any]) -> str:
    """main.rs:89-112 — parse the wallet's bronze rows into ledger
    entries. The reference loops rows on the API server; here the same
    chain-dispatched pipeline runs as one Spark job, and the silver
    write is idempotent (re-POSTing normalize is safe)."""
    from spectraplex_spark.operators.normalize import normalize
    from spectraplex_spark.sources.io import write_silver

    wallet = _require(payload, "wallet")
    with state.lock:
        bronze = serving.transactions_by_wallet(
            state.spark, state.bronze_path, wallet
        )
        n = write_silver(normalize(bronze), state.silver_path)
    return f"Normalized {n} ledger entries"


class _Handler(BaseHTTPRequestHandler):
    state: AppState  # injected by make_server

    # -- plumbing --------------------------------------------------------
    def _send(self, status: int, body: bytes, ctype: str = "application/json"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, status: int, obj: Any):
        self._send(status, json.dumps(obj).encode("utf-8"))

    def _json_rows(self, df) -> bytes:
        rows = serving.to_json_rows(df, limit=self.state.row_limit)
        return ("[" + ",".join(rows) + "]").encode("utf-8")

    def log_message(self, *args):  # tests run quiet; deployments wrap WSGI
        pass

    # -- routes ----------------------------------------------------------
    def do_GET(self):
        try:
            if self.path == "/health":
                self._send(200, b"OK", ctype="text/plain")
                return
            # Spark work (the collect inside _json_rows) runs under the
            # lock; the HTTP socket write does NOT — a slow client must
            # not serialize every other request behind its recv window
            # (r14 review finding).
            m = _TX_ROUTE.match(self.path)
            if m:
                with self.state.lock:
                    body = self._json_rows(
                        serving.transactions_by_wallet(
                            self.state.spark, self.state.bronze_path, m.group(1)
                        )
                    )
                self._send(200, body)
                return
            m = _LEDGER_ROUTE.match(self.path)
            if m:
                with self.state.lock:
                    body = self._json_rows(
                        serving.ledger_by_wallet(
                            self.state.spark, self.state.silver_path, m.group(1)
                        )
                    )
                self._send(200, body)
                return
            self._send_json(404, {"error": "no such route"})
        except Exception as e:  # main.rs maps handler errors to 500
            self._send_json(500, {"error": str(e)})

    def do_POST(self):
        # Error mapping (r14 review finding — the old broad handlers sent
        # malformed client JSON to 500 and blamed upstream-node KeyErrors
        # on the client as 400): client faults — unparseable body,
        # non-object payload, missing/unsupported fields (BadRequest) —
        # are 400; everything past payload validation is a server/upstream
        # fault and maps to 500, like the reference's
        # INTERNAL_SERVER_ERROR catch-alls (main.rs:76,83).
        try:
            length = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(length) or b"{}")
            except ValueError:
                self._send_json(400, {"error": "request body is not valid JSON"})
                return
            if not isinstance(payload, dict):
                self._send_json(400, {"error": "request body must be a JSON object"})
                return
            if self.path == "/v1/ingest":
                self._send_json(200, _ingest(self.state, payload))
                return
            if self.path == "/v1/normalize":
                self._send_json(200, _normalize(self.state, payload))
                return
            self._send_json(404, {"error": "no such route"})
        except BadRequest as e:
            self._send_json(400, {"error": str(e)})
        except Exception as e:
            self._send_json(500, {"error": str(e)})


def make_server(
    state: AppState, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (not start) the server — callers own the lifecycle. Port 0
    binds an ephemeral port (tests); the reference pins 3000
    (main.rs:40)."""
    handler = type("BoundHandler", (_Handler,), {"state": state})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever(state: AppState, host: str = "127.0.0.1", port: int = 3000):
    """main.rs:40-44's serve loop."""
    server = make_server(state, host, port)
    print(f"Listening on {host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    finally:
        server.server_close()
