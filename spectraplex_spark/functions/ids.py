"""Deterministic row identity.

The reference mints UUIDv4 per bronze row and per ledger entry
(adapters/src/solana.rs:42, adapters/src/solana_parser.rs:31,71), which
breaks golden/hash comparisons and idempotent re-runs. We derive ids as
content hashes instead (SURVEY §1.2): the same input always produces the
same id, which is what makes the idempotent-append protocol (reference
`ON CONFLICT (id) DO NOTHING`, adapters/src/repo.rs:26,56) meaningful on
re-ingestion — a re-run dedupes instead of duplicating. At 100 TB this
also means ids need no coordination/state: any executor computes them
locally from row content.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def deterministic_id(*parts: Column | str) -> Column:
    """sha256 over '|'-joined parts, hex string (stable, collision-safe)."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.sha2(F.concat_ws("|", *cols), 256)
