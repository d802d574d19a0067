"""S2 as a REGISTERED streaming source: a gRPC-relay frame log replayed
through PySpark 4's Python Data Source streaming API with REAL offset
management — the third surface for the reference's stream adapter
(adapters/src/solana_grpc.rs:19-23 stubs the live connection; the
production deployment relays frames to a durable log, and THIS is the
consumer of that log).

The relay contract: a thin process owns the gRPC connection and
appends one JSONL line per frame — ``{"seq": N, "frame_b64": ...}`` —
to a log file (ever-growing; rotation is compaction's concern, not the
reader's). This source tails the log as a Spark stream:

  - offsets are ``{"seq": last_consumed}``, tracked by Spark's
    checkpoint: a restarted query RESUMES after the committed seq —
    no duplicates, no gaps (exactly-once landing when composed with
    the idempotent sinks; at-least-once replay alone is already
    handled downstream by stream_dedup_within_watermark).
  - ``read(start)`` serves at most ``batch_size`` frames per
    micro-batch (backpressure), ``readBetweenOffsets`` replays a
    committed range DETERMINISTICALLY for failure recovery — both are
    line-offset scans of the log, no state beyond the offset dict.
  - output rows are (seq long, frame binary): exactly the shape
    ``decode_yellowstone`` consumes (value_col='frame'), so the full
    pipe is  readStream.format('grpc_replay') -> decode_yellowstone
    -> stream_normalize_to_silver — the same bronze seam as the file
    and Kafka sources.

SimpleDataSourceStreamReader is the right API tier here: the driver
reads the (small, sequential) log and Spark distributes decoding;
prefetch/caching of uncommitted batches is handled by the wrapper.
On a real cluster, ship the package to executors as with the batch
data source (sources/datasource.py).
"""

from __future__ import annotations

import base64
import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class _GrpcReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("grpc_replay: required option 'path' is missing")
        self.batch_size = int(options.get("batch_size", 1000))
        # best-effort resume point: (seq consumed through, byte offset
        # just past its line). Driver-local only — a restarted query
        # starts cold with one full scan, then stays incremental, so
        # the per-trigger cost is O(new bytes), not O(log size).
        self._pos_cache: tuple[int, int] = (-1, 0)

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def _scan(
        self, after_seq: int, limit: int | None, upto_seq: int | None = None
    ) -> tuple[list[tuple], int]:
        """Frames with after_seq < seq [<= upto_seq], at most ``limit``,
        in file order (which the relay contract makes seq order — and
        that contract is now CHECKED: a non-increasing seq raises
        instead of silently losing the out-of-place frame forever).

        A torn final line — the reader racing the relay's append — is
        DEFERRED, not fatal: only bytes up to the last newline are
        parsed; the partial tail completes by the next trigger."""
        rows: list[tuple] = []
        last = after_seq
        if not os.path.exists(self.path):
            return rows, last  # relay not started yet — empty batch
        cache_seq, cache_pos = self._pos_cache
        start_pos = cache_pos if (cache_seq == after_seq and cache_pos > 0) else 0
        # CHUNKED consumption (review finding r13): the old unbounded
        # fh.read() pulled the whole remaining tail into driver memory
        # on EVERY trigger even though batch_size caps consumption — a
        # 1 GB backlog at batch_size=1000 cost ~quadratic total I/O and
        # a full-tail memory spike per micro-batch.  Reading 4 MiB at a
        # time and returning as soon as ``limit`` frames are parsed
        # makes per-trigger cost proportional to the BATCH, with the
        # buffer bounded by chunk + one line.
        chunk_bytes = 1 << 22
        pos = start_pos
        prev_seq: int | None = None
        buf = b""
        with open(self.path, "rb") as fh:
            size = os.fstat(fh.fileno()).st_size
            if start_pos > size:
                start_pos = 0  # log rotated/truncated underneath us — rescan
                pos = 0
            fh.seek(start_pos)
            while True:
                chunk = fh.read(chunk_bytes)
                if not chunk:
                    break  # EOF: whatever is left in buf is a torn tail
                buf += chunk
                # Split on b"\n" ONLY: splitlines() would also split on
                # \r / \r\n and make _pos_cache drift one byte per CRLF
                # line, landing every cached-resume seek mid-line (r11
                # ADVICE).  A lone \r stays part of the line and is
                # removed by .strip() before json parsing.  A final
                # newline-less fragment stays in buf — the torn-tail
                # race with the relay's append is DEFERRED, not fatal:
                # it completes by the next trigger.
                while True:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        break
                    raw, buf = buf[:nl], buf[nl + 1 :]
                    line_len = nl + 1
                    line = raw.strip()
                    if line:
                        rec = json.loads(line.decode("utf-8"))
                        seq = int(rec["seq"])
                        if prev_seq is not None and seq <= prev_seq:
                            raise ValueError(
                                f"grpc_replay: log {self.path!r} violates "
                                f"the seq-ordered relay contract (seq {seq} "
                                f"after {prev_seq} at byte {pos}); a silent "
                                "skip here would lose the frame forever"
                            )
                        prev_seq = seq
                        if upto_seq is not None and seq > upto_seq:
                            return rows, last  # committed-range replay: done
                        if seq > after_seq:
                            rows.append(
                                (seq, base64.b64decode(rec["frame_b64"]))
                            )
                            last = seq
                            if limit is not None and len(rows) >= limit:
                                pos += line_len
                                self._pos_cache = (last, pos)
                                return rows, last
                    pos += line_len
        if upto_seq is None:
            self._pos_cache = (last, pos)
        return rows, last

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows, last = self._scan(int(start["seq"]), self.batch_size)
        return iter(rows), {"seq": last}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # deterministic committed-range replay: early-stops at `end`
        # instead of materializing the whole remaining tail
        rows, _ = self._scan(int(start["seq"]), None, upto_seq=int(end["seq"]))
        return iter(rows)

    def commit(self, end: dict) -> None:
        # The log is externally owned (the relay appends, compaction
        # rotates); nothing to acknowledge. Spark's checkpoint holds
        # the committed offset.
        pass


class GrpcReplayDataSource(DataSource):
    """``spark.readStream.format("grpc_replay")`` — register with
    ``spark.dataSource.register(GrpcReplayDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "grpc_replay"

    def schema(self) -> str:
        return "seq long, frame binary"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _GrpcReplayStreamReader(self.options)
