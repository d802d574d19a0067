"""Hybrid retrieval fusion — reciprocal-rank fusion (RRF) of ranked
shortlists (r11 verdict task #9: the RAG serving shape).

Reference context: the reference repo has no retrieval layer at all
(740-LoC ETL prototype); this implements the standard published RRF
formulation (Cormack/Clarke/Buettcher, SIGIR 2009) over the engine's
existing graded rankers — BM25 (operators/retrieval.py) for the
lexical leg and int8-SQ dot product (operators/pq.py) for the
semantic leg.

Exactness contract (the repo-wide bit-grading discipline): the
classic score Σ 1/(k0 + rank) is a float sum, so it is graded on the
1/scale integer grid instead:

    rrf_q(d) = Σ_lists  scale div (k0 + rank_d)

Every term is exact BIGINT floor division of two small integers, so
Spark and the DuckDB oracle agree bit-for-bit, and the ORDERING is
the same as the float formulation's for any scale ≥ lists·(k0+max_rank)²
(distinct float values stay distinct on the grid; ties on the grid
were ties or near-ties in float, and the id tiebreaker pins them).

Scale shape: fusion runs AFTER the rankers, on their k-row
shortlists — driver-k-bounded inputs by contract, never the corpus.
The rank window is a single-partition sort of ≤k rows per list (the
serving-edge limit() discipline, same as serving.py K4); the fuse
itself is one union + one groupBy over ≤ lists·k rows.  At 100 TB
nothing here touches the data path: the heavy legs (BM25 postings
probe, SQ scan) keep their own distributed plans and each hands the
fusion a k-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Standard RRF smoothing constant (SIGIR 2009 used 60).
RRF_K0 = 60

#: 1/scale integer grid for the reciprocal terms: 2^20 keeps every
#: scale div (k0 + rank) distinct for rank ≤ ~960 at k0=60.
RRF_SCALE = 1 << 20


def rrf_fuse(
    shortlists: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k0: int = RRF_K0,
    scale: int = RRF_SCALE,
    k: int = 10,
) -> DataFrame:
    """Fuse ranked shortlists into ``(id_col, rrf_q, n_lists)`` top-k.

    ``shortlists`` — (shortlist, score_col) pairs; each shortlist is a
    BOUNDED frame (a ranker's top-k output).  Rank within each list is
    dense 1-based by (score desc, id asc) — the id tiebreaker keeps
    the fused score deterministic under equal ranker scores.
    ``n_lists`` rides along as the how-many-legs-agreed witness (the
    standard RRF diagnostic for shortlist sizing).
    """
    if len(shortlists) < 2:
        raise ValueError(
            f"rrf_fuse: fusion needs >= 2 shortlists, got {len(shortlists)}"
        )
    if k0 < 1 or scale < 1 or k < 1:
        raise ValueError(f"rrf_fuse: k0/scale/k must be >= 1, got {k0}/{scale}/{k}")
    contribs = None
    for df, score_col in shortlists:
        # single-partition window over a ≤k-row shortlist: bounded by
        # the ranker's limit(), the serving-edge exception to the
        # no-global-window rule (documented above).
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        c = df.select(
            F.col(id_col),
            F.row_number().over(w).alias("_rank"),
        ).select(
            id_col,
            F.expr(f"CAST({int(scale)} div ({int(k0)} + _rank) AS BIGINT)").alias(
                "_rrf"
            ),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    return (
        contribs.groupBy(id_col)
        .agg(
            F.sum("_rrf").cast("long").alias("rrf_q"),
            F.count(F.lit(1)).cast("int").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_q"), F.asc(id_col))
        .limit(k)
    )
