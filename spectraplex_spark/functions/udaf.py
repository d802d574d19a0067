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
    """Exact median of a group (GROUPED_AGG shape: Series -> scalar)."""
    return float(v.median())


@F.pandas_udf("double")
def iqr_udaf(v: pd.Series) -> float:
    """Interquartile range (q75 - q25, linear interpolation — numpy's
    default, matching DuckDB's quantile_cont)."""
    return float(v.quantile(0.75) - v.quantile(0.25))


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
    builtin)."""
    return df.groupBy(group_col).agg(
        count_udaf(F.col(value_col)).alias("n"),
        median_udaf(F.col(value_col)).alias("median_value"),
        iqr_udaf(F.col(value_col)).alias("iqr_value"),
    )
