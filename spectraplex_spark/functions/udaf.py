"""§2.10 UDAF surface: vectorized grouped-aggregate pandas UDFs.

The reference has no UDAF concept (its one aggregate shape is
hand-written SQL, migrations/20251219000000_init.sql); Spark's
user-defined aggregate surface is the GROUPED_AGG pandas UDF — each
group's column arrives as ONE Arrow-backed pandas Series and the
function returns one scalar. That is the right altitude for custom
aggregates that numpy/pandas already implement well (order statistics,
robust estimators) but Spark lacks as builtins or where the builtin is
approximate (percentile_approx) and the exact answer is wanted.

Scale honesty, stated where it bites: a GROUPED_AGG pandas UDF has NO
partial aggregation — every group's FULL column is shuffled to one
task and materialized in memory (contrast builtin aggregates, which
combine map-side). That is the correct trade for many-medium-groups
(the per-event-type shape here: group count is tiny, per-group data
fits a task), and the wrong one for corpus-scale single groups — for
those, use the builtin `percentile` / sketch aggregates instead. The
graded query exists to pin the SURFACE and its exactness, not to claim
UDAFs beat builtins.

Determinism: median is order-independent (sort inside pandas), and the
even-count midpoint pays one add + one halving — single IEEE ops, the
same arithmetic DuckDB's median and Spark's exact `percentile(0.5)`
perform, so the result is bit-gradable (pytest cross-checks all
three).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


@F.pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median of a group (GROUPED_AGG shape: Series -> scalar).
    NULL values are skipped (pandas skipna, matching SQL median); an
    all-null group yields NULL, not NaN."""
    m = v.median()
    return None if pd.isna(m) else float(m)


@F.pandas_udf("double")
def iqr_udaf(v: pd.Series) -> float:
    """Interquartile range (q75 - q25, linear interpolation — numpy's
    default, matching DuckDB's quantile_cont). NULLs skipped; an
    all-null group yields NULL."""
    r = v.quantile(0.75) - v.quantile(0.25)
    return None if pd.isna(r) else float(r)


@F.pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Group size. Exists because Spark REJECTS mixing GROUPED_AGG
    pandas UDFs with builtin aggregates in one agg()
    (INVALID_PANDAS_UDF_PLACEMENT) — an agg() using any pandas UDAF
    must be all-pandas; this is part of the surface's contract."""
    return int(len(v))


def robust_value_stats(df: DataFrame, group_col: str = "event_type", value_col: str = "value") -> DataFrame:
    """Per-group exact median + IQR + size via the UDAF surface (an
    all-pandas agg — see count_udaf for why the count can't be the
    builtin). API demo: for the scale path use
    :func:`robust_value_stats_scalable`, which computes the same
    statistics with partial aggregation and spillable sorts."""
    return df.groupBy(group_col).agg(
        count_udaf(F.col(value_col)).alias("n"),
        median_udaf(F.col(value_col)).alias("median_value"),
        iqr_udaf(F.col(value_col)).alias("iqr_value"),
    )


def robust_value_stats_scalable(
    df: DataFrame, group_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """The SCALE twin of :func:`robust_value_stats`: identical exact
    median/IQR/size, built from partial-aggregatable pieces only — no
    GROUPED_AGG pandas UDF, so no group's full column ever materializes
    in one task's memory.

    Two passes over the group:
      1. per-group counts — builtin count, map-side combined;
      2. rank each value (row_number window: the per-group sort runs
         in Spark's spillable ExternalSorter, ties between equal
         values are position-arbitrary but quantile SELECTION is by
         position, so the selected VALUE is deterministic), keep only
         the ≤6 rows sitting at the quantile index positions, then a
         conditional-min aggregate (HashAggregate with partial_min —
         the plan-visible partial aggregation) picks them out.

    Quantile index arithmetic is exact integers: pos = (n-1)·num/den
    with den ∈ {2,4}, so lo/hi indices are integer div/mod and the
    interpolation fraction is one of {0, .25, .5, .75} — exact binary
    doubles. The final q = lo + (hi-lo)·frac pays two IEEE ops,
    matching numpy/pandas/DuckDB linear interpolation (graded at 6dp,
    the udaf_value_stats precedent — op order may differ by 1 ulp
    across engines).

    NULL semantics (matches the GROUPED_AGG twin and SQL aggregates):
    ``n`` counts every row of the group (COUNT(*), the UDAF's len(v));
    median/IQR are over the NON-NULL values only — nulls are filtered
    before ranking so they can't shift quantile index positions. An
    all-null group keeps its count row with NULL median/IQR.

    At 100 TB: a skewed group costs a spillable sort, not an OOM — the
    straggler risk the GROUPED_AGG version documents is gone."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_total"),
        F.count(value_col).cast("long").alias("_n"),  # non-null: ranks run over these
    )
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.col(value_col).cast("double").alias("_v"))
        .withColumn(
            "_i",
            F.row_number().over(Window.partitionBy(group_col).orderBy("_v")) - 1,
        )
        .join(F.broadcast(counts.select(group_col, "_n")), group_col)
    )

    quantiles = (("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4))
    agg_exprs = []
    keep = F.lit(False)
    for name, num, den in quantiles:
        t = (F.col("_n") - F.lit(1)) * F.lit(num)  # numerator of (n-1)*p*den
        lo = ((t - t % den) / den).cast("long")
        hi = lo + F.when(t % den != 0, F.lit(1)).otherwise(F.lit(0))
        frac = (t % den).cast("double") / F.lit(float(den))
        ranked = (
            ranked.withColumn(f"_{name}_lo", lo)
            .withColumn(f"_{name}_hi", hi)
            .withColumn(f"_{name}_f", frac)
        )
        keep = keep | (F.col("_i") == F.col(f"_{name}_lo")) | (
            F.col("_i") == F.col(f"_{name}_hi")
        )
        agg_exprs += [
            F.min(F.when(F.col("_i") == F.col(f"_{name}_lo"), F.col("_v"))).alias(
                f"_{name}_lov"
            ),
            F.min(F.when(F.col("_i") == F.col(f"_{name}_hi"), F.col("_v"))).alias(
                f"_{name}_hiv"
            ),
            F.max(f"_{name}_f").alias(f"_{name}_frac"),
        ]

    g = ranked.filter(keep).groupBy(group_col).agg(*agg_exprs)

    def q(name):
        return F.col(f"_{name}_lov") + (
            F.col(f"_{name}_hiv") - F.col(f"_{name}_lov")
        ) * F.col(f"_{name}_frac")

    # left join keeps all-null groups (absent from the ranked frame)
    # with NULL quantiles, mirroring the UDAF twin
    return counts.join(g, group_col, "left").select(
        group_col,
        F.col("_n_total").alias("n"),
        q("q50").alias("median_value"),
        (q("q75") - q("q25")).alias("iqr_value"),
    )
