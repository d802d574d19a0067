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
    """sha256 over '|'-joined parts, hex string.

    Identity contract (r14 review finding — the old one-liner claimed
    'collision-safe' unconditionally): parts must be NON-NULL and
    '|'-free.  The separator is deliberately unescaped — every call
    site feeds base58 signatures/pubkeys, the chain enum, decimal
    renderings, or integer ordinals, none of which can contain '|' —
    so equal joined strings imply equal part tuples there.  The NULL
    leg IS guarded structurally: ``F.concat`` (unlike the previous
    ``concat_ws``, which SKIPS null parts) propagates NULL, so a row
    with any NULL part gets a NULL id instead of silently colliding
    with a different row's id — e.g. (chain, NULL wallet, sig) vs
    (chain, wallet==sig, NULL sig), which used to hash identically and
    made the idempotent-append anti-join DROP a genuinely distinct
    row.  NULL ids stay visible/queryable, and the sinks' null-safe
    anti-join already pins their replay semantics (io.py).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    sep = [F.lit("|")] * (2 * len(cols) - 1)
    sep[0::2] = cols
    return F.sha2(F.concat(*sep), 256)
