"""The append-epoch protocol as a STREAMING SOURCE: tail a committed
epoch table as a Structured Stream, with epoch numbers as the offsets —
Delta's ``readStream`` on a change feed, rebuilt on the engine's own
commit protocol (sources/commit.py).

Why this exists: ``read_epoch_changes`` gives an incremental consumer
the (from, to] delta as a BATCH, but the consumer then owns the "last
epoch I processed" bookkeeping. Registering the protocol as a PySpark 4
streaming Data Source moves that bookkeeping into Spark's checkpoint:
a restarted query resumes after its committed epoch — no duplicates, no
gaps — and composes with watermarks, stream-stream joins, and the
idempotent sinks like any other stream.

Design (the datasource.py / replay_source.py disciplines):

  - offsets are ``{"epoch": N}``; ``latestOffset`` re-reads the
    manifest dir (cheap: one listdir + JSON reads, the metadata
    squash_epochs bounds) and can cap advancement via
    ``max_epochs_per_batch`` (backpressure);
  - ``partitions(start, end)`` expands the manifest file-list diff to
    ONE InputPartition PER COMMITTED DATA FILE, so the actual parquet
    reading happens ON EXECUTORS (pyarrow), embarrassingly parallel —
    the full DataSourceStreamReader tier, not the driver-side Simple
    tier, because epochs carry data volume, not a sequence log;
  - a range behind a squash boundary fails loudly with the same
    re-baseline instruction as the batch reader (a stale checkpoint
    must never silently skip or duplicate);
  - Hive-style partition directory values (``part=a/...``) surface as
    STRING columns appended after the file columns (documented: the
    file schema carries no partition types; consumers cast).

Schema is derived at plan time from the NEWEST committed file (epochs
never change the schema — the append schema guard in io.py enforces
that), never from a raw directory listing (torn files are invisible,
the read_epoch_changes discipline).

Register with ``spark.dataSource.register(EpochTailDataSource)`` and
read with ``spark.readStream.format("epoch_tail").option("path", dir)``.
On a real cluster ship the package to executors as with the batch data
source (sources/datasource.py).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

_ARROW_TO_DDL = {
    "int8": "byte",
    "int16": "short",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
    "timestamp[us]": "timestamp",
    "timestamp[ms]": "timestamp",
    "timestamp[ns]": "timestamp",
}


def _arrow_ddl(arrow_schema) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for field in arrow_schema:
        t = str(field.type)
        if t.startswith("decimal128("):
            ddl = "decimal" + t[len("decimal128"):]
        elif t in _ARROW_TO_DDL:
            ddl = _ARROW_TO_DDL[t]
        else:  # loud seam: exotic nested types need an explicit mapping
            raise ValueError(
                f"epoch_tail: no Spark DDL mapping for arrow type {t} "
                f"(column {field.name})"
            )
        out.append((field.name, ddl))
    return out


def _partition_cols(rels: list[str]) -> list[str]:
    """Hive-style directory keys, in path order, from committed rel paths."""
    cols: list[str] = []
    for rel in rels:
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k = seg.split("=", 1)[0]
                if k not in cols:
                    cols.append(k)
    return cols


def _partition_values(rel: str, cols: list[str]) -> list[str | None]:
    got: dict[str, str | None] = {}
    for seg in rel.split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            from urllib.parse import unquote  # Hive %-escaping

            got[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return [got.get(c) for c in cols]


class _EpochFilePartition(InputPartition):
    def __init__(self, abs_path: str, part_values: list[str | None]):
        self.abs_path = abs_path
        self.part_values = part_values


class _EpochTailStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, declared_names: list[str] | None = None):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("epoch_tail: required option 'path' is missing")
        self.from_epoch = int(options.get("from_epoch", -1))
        self.max_epochs = int(options.get("max_epochs_per_batch", 0))  # 0 = all
        from spectraplex_spark.sources.commit import _epoch_paths

        if not _epoch_paths(self.table_dir):
            raise ValueError(f"epoch_tail: {self.table_dir} has no committed epochs")
        self.part_cols = _partition_cols(sorted(self._committed_files()))
        # The stream's declared column order. The append schema guard
        # (io.py) allows later epochs to write the SAME columns in a
        # DIFFERENT parquet physical order; read() must therefore yield by
        # the declared names, never by a file's physical order, or two
        # same-typed columns would silently transpose between epochs.
        if declared_names is None:
            declared_names = [n for n, _ in self._newest_file_ddl()] + self.part_cols
        # read() yields (file columns in declared order) + (partition
        # values in discovered order) POSITIONALLY, so a user-supplied
        # schema must place the partition columns at the TAIL in that
        # order — anything else (mid-schema, reordered, or omitted
        # partition columns) would silently transpose same-typed
        # columns or mis-size the tuples (review finding): fail loud.
        if self.part_cols:
            tail = declared_names[-len(self.part_cols):]
            if tail != self.part_cols:
                raise ValueError(
                    "epoch_tail: the declared schema must end with the "
                    f"table's partition columns {self.part_cols} in that "
                    f"order (got tail {tail}); rows are yielded as "
                    "file-columns + partition-values positionally"
                )
        part_set = set(self.part_cols)
        self.file_cols = [n for n in declared_names if n not in part_set]
        self._last_served = self.from_epoch
        # Backpressure cap arming: on a FRESH start Spark calls
        # initialOffset() first (committed == from_epoch, capping is safe);
        # on a RESTART it does not, and the checkpointed offset is unknown
        # here — a capped latestOffset based on from_epoch could then
        # return an offset BEHIND the checkpoint, regressing the offset log
        # and replanning epochs already written to the sink. So the cap
        # stays unarmed until initialOffset/partitions/commit reveals a
        # floor: the first post-restart latestOffset is uncapped (one
        # bounded over-wide batch), after which backpressure resumes.
        self._cap_armed = False

    def _newest_file_ddl(self) -> list[tuple[str, str]]:
        import pyarrow.parquet as pq

        rels = sorted(self._committed_files())
        return _arrow_ddl(pq.read_schema(os.path.join(self.table_dir, rels[-1])))

    # -- manifest helpers (driver-side, metadata-sized) -------------------

    def _manifests(self) -> list[dict]:
        from spectraplex_spark.sources.commit import _epoch_paths

        out = []
        for p in _epoch_paths(self.table_dir):
            with open(p) as fh:
                out.append(json.load(fh))
        return out

    def _committed_files(self) -> list[str]:
        rels: list[str] = []
        for m in self._manifests():
            rels.extend(m["files"])
        return rels

    # -- offsets -----------------------------------------------------------

    def initialOffset(self) -> dict:
        self._cap_armed = True  # fresh start: committed == from_epoch
        return {"epoch": self.from_epoch}

    def latestOffset(self) -> dict:
        epochs = sorted(m["epoch"] for m in self._manifests())
        newest = epochs[-1] if epochs else self.from_epoch
        if self.max_epochs > 0 and self._cap_armed:
            # Backpressure: advance at most max_epochs committed epochs per
            # micro-batch (bounds a batch's file count after a backlog).
            # _last_served is clamped up by every observed offset
            # (initialOffset/partitions/commit), so the capped value can
            # never be behind the checkpointed start — the offset log is
            # monotone by construction.
            base = max(self._last_served, self.from_epoch)
            newer = [e for e in epochs if e > base]
            newest = newer[: self.max_epochs][-1] if newer else base
        self._cap_armed = True
        self._last_served = max(self._last_served, newest)
        return {"epoch": newest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["epoch"]), int(end["epoch"])
        # A (re)planned batch reveals the checkpointed floor: never let a
        # later capped latestOffset return anything behind it.
        self._last_served = max(self._last_served, lo, hi)
        self._cap_armed = True
        files: dict[str, int] = {}
        seen: list[int] = []
        for m in self._manifests():
            boundary = m.get("squashed_from", m["epoch"])
            if boundary <= lo < m["epoch"]:
                raise RuntimeError(
                    f"epoch_tail: checkpointed offset {lo} is behind the "
                    f"squash boundary {m['epoch']} of {self.table_dir} — "
                    "per-epoch deltas before the boundary are retired; "
                    "re-baseline the stream (fresh checkpoint, "
                    f"from_epoch={m['epoch']})"
                )
            seen.append(m["epoch"])
            if m["epoch"] <= lo or m["epoch"] > hi:
                continue
            files.update(m["files"])
        newest = max(seen) if seen else None
        if newest is None or hi > newest:
            raise RuntimeError(
                f"epoch_tail: requested epochs ({lo}, {hi}] but newest "
                f"committed epoch is {newest}"
            )
        return [
            _EpochFilePartition(
                os.path.join(self.table_dir, rel), _partition_values(rel, self.part_cols)
            )
            for rel in sorted(files)
        ]

    # -- executor-side read -------------------------------------------------

    def read(self, partition: _EpochFilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        # Yield in the DECLARED stream column order; a file written with
        # reordered columns — legal under the append schema guard — lands
        # correctly. The scan is ACTUALLY pruned: the missing-column
        # check reads only the footer schema, and iter_batches(columns=)
        # decodes just the declared columns batch-by-batch instead of
        # materializing the whole file as Python dicts (review finding:
        # read_table(path).select() decoded every column first).
        names = pq.read_schema(partition.abs_path).names
        missing = [n for n in self.file_cols if n not in names]
        if missing:
            raise RuntimeError(
                f"epoch_tail: committed file {partition.abs_path} lacks "
                f"declared stream columns {missing}"
            )
        part = tuple(partition.part_values)
        pf = pq.ParquetFile(partition.abs_path)
        for batch in pf.iter_batches(columns=self.file_cols):
            if not self.file_cols:  # partition-only schema: count rows
                for _ in range(batch.num_rows):
                    yield part
                continue
            sel = batch.select(self.file_cols)  # declared order
            cols = [c.to_pylist() for c in sel.columns]
            for vals in zip(*cols):
                yield vals + part

    def commit(self, end: dict) -> None:
        # Spark's checkpoint owns the committed offset; remember it so the
        # backpressure cap can never plan backwards after this point.
        self._last_served = max(self._last_served, int(end["epoch"]))
        self._cap_armed = True


class EpochTailDataSource(DataSource):
    """``spark.readStream.format("epoch_tail")`` over an append-epoch
    table (sources/commit.py). Offsets are epoch numbers."""

    @classmethod
    def name(cls) -> str:
        return "epoch_tail"

    def schema(self) -> str:
        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("epoch_tail: required option 'path' is missing")
        import pyarrow.parquet as pq

        from spectraplex_spark.sources.commit import committed_epoch_files

        rels = sorted(committed_epoch_files(table_dir))
        if not rels:
            raise ValueError(f"epoch_tail: {table_dir} commits no files")
        cols = _arrow_ddl(pq.read_schema(os.path.join(table_dir, rels[-1])))
        cols += [(c, "string") for c in _partition_cols(rels)]
        return ", ".join(f"{n} {t}" for n, t in cols)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _EpochTailStreamReader(self.options, [f.name for f in schema.fields])
