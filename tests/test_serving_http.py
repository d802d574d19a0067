"""HTTP serving edge: the full reference API loop against a live local
server — ingest over RPC (fixture node) → normalize → read back — plus
route/error parity with api/src/main.rs:30-50.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from rpc_fixture import WALLET, serve_node
from spectraplex_spark.serving_http import AppState, make_server


@pytest.fixture()
def app(spark, tmp_path):
    state = AppState(
        spark,
        bronze_path=str(tmp_path / "bronze"),
        silver_path=str(tmp_path / "silver"),
    )
    server = make_server(state)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read().decode()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, r.read().decode()


def test_health(app):
    assert _get(f"{app}/health") == (200, "OK")  # main.rs:49-51


def test_full_api_loop(app):
    with serve_node(n_sigs=3) as node:
        # POST /v1/ingest (main.rs:67-87)
        status, body = _post(
            f"{app}/v1/ingest",
            {"chain": "solana", "wallet": WALLET, "rpc_url": node.url},
        )
        assert (status, json.loads(body)) == (200, "Ingested 3 transactions")

        # re-POST: idempotent landing makes the retry a no-op (vs the
        # reference's ON CONFLICT DO NOTHING, repo.rs:26)
        _, body = _post(
            f"{app}/v1/ingest",
            {"chain": "solana", "wallet": WALLET, "rpc_url": node.url},
        )
        assert json.loads(body) == "Ingested 0 transactions"

    # POST /v1/normalize (main.rs:89-112): 3 golden txs → 3 SOL entries
    status, body = _post(f"{app}/v1/normalize", {"wallet": WALLET})
    assert (status, json.loads(body)) == (200, "Normalized 3 ledger entries")

    # GET /v1/transactions/:wallet (main.rs:114-121)
    status, body = _get(f"{app}/v1/transactions/{WALLET}")
    txs = json.loads(body)
    assert status == 200 and len(txs) == 3
    assert [t["timestamp"] for t in txs] == sorted(t["timestamp"] for t in txs)

    # GET /v1/ledger/:wallet (main.rs:123-130): exact golden amount
    status, body = _get(f"{app}/v1/ledger/{WALLET}")
    entries = json.loads(body)
    assert status == 200 and len(entries) == 3
    assert all(e["asset_symbol"] == "SOL" for e in entries)
    assert all(float(e["amount"]) == -0.5 for e in entries)


def test_unknown_route_404_and_bad_request_400(app):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{app}/v1/nothing")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{app}/v1/normalize", {})  # missing wallet
    assert e.value.code == 400


# --- r14 review-pass regressions ------------------------------------------


def _post_raw(url, data: bytes):
    req = urllib.request.Request(
        url, data=data,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read().decode()


def test_malformed_json_body_is_400_not_500(app):
    """Client faults map to 400: unparseable body and non-object payload
    (the old broad handler sent both to 500 — r14 review finding)."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(f"{app}/v1/normalize", b"{not json")
    assert e.value.code == 400
    assert "not valid JSON" in e.value.read().decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_raw(f"{app}/v1/ingest", b"[1, 2]")
    assert e.value.code == 400
    assert "JSON object" in e.value.read().decode()


def test_non_solana_chain_rejected_400(app):
    """The reference declares but never reads the chain field (`_chain`,
    api/src/main.rs:55) — every ingest runs the Solana adapter, so a
    client asking for another chain would get silently-mislabeled rows.
    Deliberate divergence: loud 400 instead (r14 review finding)."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            f"{app}/v1/ingest",
            {"chain": "ethereum", "wallet": WALLET, "rpc_url": "http://unused"},
        )
    assert e.value.code == 400
    assert "chain 'ethereum' not supported" in e.value.read().decode()


def test_upstream_fault_is_500_not_400(app):
    """A server/upstream fault (unreachable RPC node) must surface as
    500, never be blamed on the client as 400."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            f"{app}/v1/ingest",
            # closed port: connection refused -> retries -> RpcError
            {"wallet": WALLET, "rpc_url": "http://127.0.0.1:9"},
        )
    assert e.value.code == 500


def test_missing_fields_still_400_with_field_name(app):
    for payload, missing in [({}, "wallet"), ({"wallet": WALLET}, "rpc_url")]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{app}/v1/ingest", payload)
        assert e.value.code == 400
        assert missing in e.value.read().decode()
