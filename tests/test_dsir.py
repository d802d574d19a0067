"""DSIR importance resampling (operators/dsir.py): weight direction,
selection determinism, token-free exclusion. Cross-engine grading is
in test_oracle_parity.py (dsir_importance_sample).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spectraplex_spark.operators.dsir import (
    DSIR_SCALE,
    dsir_bucket_weights,
    dsir_importance_sample,
)


def _corpus(spark):
    # target rows speak "alpha", raw background speaks "omega"
    rows = [(i, "alpha " * 5, "en") for i in range(10)]
    rows += [(100 + i, "omega " * 5, "xx") for i in range(40)]
    rows += [(200, "alpha alpha omega", "xx"), (201, "omega omega omega", "xx")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_target_feature_buckets_get_heavier_weights(spark):
    df = _corpus(spark)
    w = {
        r["bucket"]: r
        for r in dsir_bucket_weights(df, F.col("lang") == "en").collect()
    }
    from spectraplex_spark.operators.textops import hashed_bucket

    alpha_b, omega_b = (
        df.sparkSession.createDataFrame([("alpha",), ("omega",)], ["t"])
        .select(hashed_bucket(F.col("t")).alias("b"))
        .rdd.map(lambda r: r["b"])
        .collect()
    )
    assert alpha_b != omega_b
    # alpha: 52 occurrences, 50 in-target; omega: 123, 0 in-target
    assert w[alpha_b]["wq"] > w[omega_b]["wq"]
    # exact smoothed grid arithmetic
    a = w[alpha_b]
    assert a["wq"] == ((a["target_count"] + 1) * DSIR_SCALE) // (a["raw_count"] + 64)


def test_sample_ranks_target_like_docs_first(spark):
    df = _corpus(spark)
    got = dsir_importance_sample(df, F.col("lang") == "en", k=2).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["lang"], []).append(r["doc_id"])
    # within the raw 'xx' stratum the alpha-heavy doc outranks pure omega
    assert by_stratum["xx"][0] == 200
    assert by_stratum["en"] == [0, 1]  # ties break by id


def test_token_free_docs_are_excluded(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "   ", "en")],
        "doc_id long, text string, lang string",
    )
    got = dsir_importance_sample(df, F.col("lang") == "en", k=5).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_scalable_topk_bit_equal_to_window_form(spark):
    """The scale twin must return IDENTICAL survivors to the plain
    per-stratum window on a skewed corpus (one hot stratum >> the
    others), including score ties resolved by id, strata smaller than
    k, and a NULL stratum."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.dsir import (
        dsir_importance_sample,
        dsir_importance_sample_scalable,
    )

    rows = []
    # hot stratum: 600 docs, many tied scores (few distinct words)
    for i in range(600):
        rows.append((i, "en", f"w{i % 7} w{i % 3} common"))
    # cold strata incl. one smaller than k and a NULL stratum
    for i in range(600, 620):
        rows.append((i, "de", f"w{i % 5} rare{i}"))
    for i in range(620, 623):
        rows.append((i, "fr", "w1 w2"))
    for i in range(623, 626):
        rows.append((i, None, "w1 nullish"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pred = F.col("doc_id") % 4 == 0

    def rowset(out):
        return sorted(
            ((r["lang"] or "", r["doc_id"], r["score_q"], r["rk"]) for r in out.collect())
        )

    plain = rowset(dsir_importance_sample(df, pred, k=5))
    scal = rowset(
        dsir_importance_sample_scalable(df, pred, k=5, hot_factor=16, safety=2)
    )
    assert plain == scal
    # the hot stratum genuinely took the prefilter path
    assert sum(1 for lang, *_ in plain if lang == "en") == 5


def test_scalable_twin_accepts_non_string_stratum(spark):
    """The threshold frame must type itself from the ACTUAL stratum
    column — the old hardcoded '_st string' schema crashed
    createDataFrame for int domain ids whenever a stratum went hot
    (r14 review finding)."""
    from spectraplex_spark.operators.dsir import dsir_importance_sample_scalable

    rows = [(i, "alpha words here", i % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, domain_id int")
    got = dsir_importance_sample_scalable(
        df, F.col("domain_id") == 0, k=3, stratum_col="domain_id",
        hot_factor=10,  # 150 rows per stratum >> 10*3 -> both strata hot
    )
    plain = dsir_importance_sample(
        df, F.col("domain_id") == 0, k=3, stratum_col="domain_id"
    )
    key = lambda d: sorted(map(tuple, d.select("domain_id", "doc_id", "score_q", "rk").collect()))
    assert key(got) == key(plain)


def test_fallback_branch_keeps_null_stratum_rows(spark, monkeypatch):
    """When any hot stratum falls back (sketch under-keeps), rows with a
    NULL stratum must survive: `~isin(failing)` is NULL for NULL _st and
    filter drops NULLs, so the old form silently erased the NULL
    stratum's top-k (r14 review finding).  Forces the fallback by
    patching percentile_approx to return an impossible threshold."""
    import spectraplex_spark.operators.dsir as dsir_mod
    from spectraplex_spark.operators.dsir import dsir_importance_sample

    rows = [(i, "alpha beta gamma", "hot") for i in range(300)]
    rows += [(1000 + i, "alpha beta gamma", None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    real_pa = F.percentile_approx

    def broken_percentile(col, frac, accuracy):
        # a threshold above every score -> kept == 0 -> stratum fails
        return F.expr("max(score_q) + 1").cast("long")

    monkeypatch.setattr(dsir_mod.F, "percentile_approx", broken_percentile)
    try:
        got = dsir_mod.dsir_importance_sample_scalable(
            df, F.lit(False), k=2, stratum_col="lang", hot_factor=10
        )
        res = sorted(
            [(r["lang"], r["doc_id"]) for r in got.collect()], key=repr
        )
    finally:
        monkeypatch.setattr(dsir_mod.F, "percentile_approx", real_pa)
    plain = sorted(
        [
            (r["lang"], r["doc_id"])
            for r in dsir_importance_sample(
                df, F.lit(False), k=2, stratum_col="lang"
            ).collect()
        ],
        key=repr,
    )
    assert res == plain
    assert any(lang is None for lang, _ in res), "NULL stratum vanished"
