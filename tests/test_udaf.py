"""UDAF surface (functions/udaf.py): the GROUPED_AGG pandas demo and
its partial-aggregatable scale twin must compute identical exact
median/IQR; the twin's plan must show partial aggregation and no
pandas aggregate. Cross-engine grading is in test_oracle_parity.py
(udaf_value_stats, udaf_value_stats_scalable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# NOTE: spectraplex_spark.functions.udaf is imported INSIDE each test —
# its @pandas_udf decorators parse DDL return types at import time,
# which needs an active SparkContext.

SCHEMA = "event_type string, value double"


def _df(spark):
    rows = []
    for g, n in (("a", 1), ("b", 2), ("c", 7), ("d", 100)):
        rows += [(g, float(((i * 37) % n) - n / 3 + 0.25)) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def test_scalable_matches_grouped_agg_and_builtin(spark):
    from spectraplex_spark.functions.udaf import (
        robust_value_stats,
        robust_value_stats_scalable,
    )

    df = _df(spark)
    demo = {r["event_type"]: r for r in robust_value_stats(df).collect()}
    scale = {r["event_type"]: r for r in robust_value_stats_scalable(df).collect()}
    builtin = {
        r["event_type"]: r
        for r in df.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("med"),
            (
                F.percentile("value", F.lit(0.75)) - F.percentile("value", F.lit(0.25))
            ).alias("iqr"),
        )
        .collect()
    }
    assert set(demo) == set(scale) == {"a", "b", "c", "d"}
    for g in demo:
        assert scale[g]["n"] == demo[g]["n"]
        assert abs(scale[g]["median_value"] - demo[g]["median_value"]) < 1e-9
        assert abs(scale[g]["iqr_value"] - demo[g]["iqr_value"]) < 1e-9
        assert abs(scale[g]["median_value"] - builtin[g]["med"]) < 1e-9
        assert abs(scale[g]["iqr_value"] - builtin[g]["iqr"]) < 1e-9


def test_scalable_plan_has_partial_agg_and_no_pandas(spark):
    from spectraplex_spark.functions.udaf import robust_value_stats_scalable

    plan = (
        robust_value_stats_scalable(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan or "partial_count" in plan or "Partial" in plan
    assert "AggregateInPandas" not in plan
    assert "collect_list" not in plan


def test_single_and_two_element_groups(spark):
    from spectraplex_spark.functions.udaf import robust_value_stats_scalable

    df = spark.createDataFrame(
        [("x", 5.0), ("y", 1.0), ("y", 2.0)], SCHEMA
    )
    got = {r["event_type"]: r for r in robust_value_stats_scalable(df).collect()}
    assert got["x"]["median_value"] == 5.0 and got["x"]["iqr_value"] == 0.0
    assert got["y"]["median_value"] == 1.5 and got["y"]["iqr_value"] == 0.5


def test_null_values_do_not_shift_quantiles(spark):
    """NULLs must be excluded from median/IQR (pandas skipna / SQL
    semantics) while n stays COUNT(*); an all-null group keeps its
    count row with NULL quantiles — in BOTH twins."""
    from spectraplex_spark.functions.udaf import (
        robust_value_stats,
        robust_value_stats_scalable,
    )

    df = spark.createDataFrame(
        [("m", None), ("m", 1.0), ("m", 2.0), ("m", 3.0), ("m", None),
         ("z", None), ("z", None)],
        SCHEMA,
    )
    for fn in (robust_value_stats, robust_value_stats_scalable):
        got = {r["event_type"]: r for r in fn(df).collect()}
        assert got["m"]["n"] == 5  # COUNT(*) counts nulls
        assert got["m"]["median_value"] == 2.0  # nulls skipped in ranks
        assert got["m"]["iqr_value"] == 1.0
        assert got["z"]["n"] == 2
        assert got["z"]["median_value"] is None
        assert got["z"]["iqr_value"] is None
