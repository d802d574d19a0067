"""S1 as a REGISTERED Spark data source: the Solana RPC connector
re-expressed through PySpark 4's Python Data Source API, so ingestion
is a first-class ``spark.read.format("solana_rpc")`` instead of a
helper function — the surface the reference exposes as an adapter
trait (adapters/src/solana.rs:23-58) in the form Spark users expect.

Why this shape matters at 100 TB: partition planning IS the scale
design. ``partitions()`` returns one InputPartition per wallet, so
Spark schedules one EXECUTOR task per wallet, each with its own
rate-limited client — aggregate node pressure = concurrent tasks ×
per-task rps, throttled by the scheduler, with per-wallet retry
isolation and speculative re-execution for free. The driver never
fetches, never collects, never proxies a byte (contrast
connector.ingest_history, the deliberately driver-side inline path the
HTTP API uses for bounded interactive ingests).

Usage::

    spark.dataSource.register(SolanaRpcDataSource)
    raw = (spark.read.format("solana_rpc")
           .option("url", node_url)
           .option("wallets", "w1,w2,w3")
           .option("limit", 50)
           .load())                       # RAW_FETCH_SCHEMA rows
    bronze = conform_to_bronze(raw)

On a real cluster ship this package to executors (archives/py-files);
in local mode registration alone suffices. The canned-node fixture
(testing/rpc_fixture.py) drives it broker-less end to end — graded in
the catalog as ``rpc_ingest_datasource`` against the same golden
ledger oracle as the helper-function path, so BOTH ingest surfaces
carry the hash.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# NOTE: worker-side imports (connector, ingest) happen inside read():
# the DataSource class is pickled to executors, and deferring imports
# keeps the pickle small and the dependency local to the task.

_SCHEMA_DDL = (
    "wallet_address string, signature string, response_json string, chain string"
)


class _WalletPartition(InputPartition):
    """One wallet's history = one Spark task (the planning unit)."""

    def __init__(self, wallet: str):
        self.wallet = wallet


class _SolanaRpcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("solana_rpc: required option 'url' is missing")
        wallets = options.get("wallets", "")
        self.wallets = [w.strip() for w in wallets.split(",") if w.strip()]
        if not self.wallets:
            raise ValueError(
                "solana_rpc: required option 'wallets' is missing or empty "
                "(comma-separated wallet addresses)"
            )
        self.limit = int(options.get("limit", 50))
        # Default THROTTLED at the fetch_wallet_batch per-task rate (20
        # rps): an unthrottled default contradicted the module's own
        # rate-limit contract — 100 wallets without max_rps scheduled
        # 100 concurrent ungated tasks at the node (r14 review finding).
        # Explicit max_rps=0 opts out (an operator's deliberate choice).
        self.max_rps = float(options.get("max_rps", 20.0)) or None
        self.chain = options.get("chain", "solana")
        # Retry/timeout knobs were previously unreachable from .option()
        self.timeout = float(options.get("timeout", 30.0))
        self.max_retries = int(options.get("max_retries", 4))
        self.backoff_s = float(options.get("backoff_s", 0.5))

    def partitions(self) -> list[InputPartition]:
        return [_WalletPartition(w) for w in self.wallets]

    def read(self, partition: _WalletPartition) -> Iterator[tuple]:
        # Executes on the executor: each task owns a client with its own
        # rate gate — the aggregate-rps knob is the task count.
        from spectraplex_spark.sources.connector import (
            SolanaRpcClient,
            fetch_history,
        )

        client = SolanaRpcClient(
            self.url,
            timeout=self.timeout,
            max_retries=self.max_retries,
            backoff_s=self.backoff_s,
            max_rps=self.max_rps,
        )
        for row in fetch_history(client, partition.wallet, self.limit, self.chain):
            yield (
                row["wallet_address"],
                row["signature"],
                row["response_json"],
                row["chain"],
            )


class SolanaRpcDataSource(DataSource):
    """``spark.read.format("solana_rpc")`` — register with
    ``spark.dataSource.register(SolanaRpcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "solana_rpc"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _SolanaRpcReader(self.options)
