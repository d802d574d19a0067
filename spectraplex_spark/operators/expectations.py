"""Declarative data-quality expectations — the reference's DDL
constraints re-expressed for a lake where nothing enforces them.

The reference leans on Postgres to guarantee integrity: PRIMARY KEY
(unique + not null, init.sql:7,24), NOT NULL columns (init.sql:8-14,
26-31, add_wallet:12), enum domains (chain_enum/entry_type_enum,
init.sql:12,29), and REFERENCES transactions(id) (init.sql:25).
Parquet enforces NONE of those — a pipeline that migrates off the
database silently loses its integrity net unless the checks move into
the engine. This module is that net, Deequ-shaped: declare rules,
evaluate them in ONE aggregation pass (plus one anti-join per
referential rule), get an exact violation report.

Scale design: every non-referential rule folds into a single agg of
integer violation indicators — one partial-aggregated pass over the
table regardless of rule count; ``unique`` adds count_distinct on its
column (no extra scan); each ``references`` rule is one left-anti
count against the (column-pruned) parent keys — the same shape as the
idempotent sink's dedup probe. All counts are exact BIGINTs, so the
report is bit-gradable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str | None = None
    values: tuple = field(default_factory=tuple)
    lo: float | None = None
    hi: float | None = None
    expr: Column | None = None
    parent: DataFrame | None = None
    parent_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(name=f"not_null({col})", kind="not_null", col=col)


def unique(col: str) -> Rule:
    """Duplicate NON-NULL values (nulls are not_null's concern — the
    SQL UNIQUE/PK split)."""
    return Rule(name=f"unique({col})", kind="unique", col=col)


def in_set(col: str, values) -> Rule:
    return Rule(name=f"in_set({col})", kind="in_set", col=col, values=tuple(values))


def in_range(col: str, lo: float, hi: float) -> Rule:
    return Rule(name=f"in_range({col})", kind="in_range", col=col, lo=lo, hi=hi)


def satisfies(name: str, expr: Column) -> Rule:
    """Arbitrary boolean expression that every row must satisfy (the
    CHECK constraint)."""
    return Rule(name=name, kind="satisfies", expr=expr)


def references(col: str, parent: DataFrame, parent_col: str) -> Rule:
    """Foreign key: every non-null value must exist in the parent
    column (init.sql:25's REFERENCES)."""
    return Rule(
        name=f"references({col})", kind="references", col=col,
        parent=parent, parent_col=parent_col,
    )


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, kind, n_rows, n_violations, passed) — one row per rule."""
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    agg_rules = []
    for r in rules:
        if r.kind == "not_null":
            v = F.sum(F.when(F.col(r.col).isNull(), 1).otherwise(0))
        elif r.kind == "unique":
            v = F.count(r.col) - F.count_distinct(F.col(r.col))
        elif r.kind == "in_set":
            v = F.sum(
                F.when(
                    F.col(r.col).isNotNull() & ~F.col(r.col).isin(*r.values), 1
                ).otherwise(0)
            )
        elif r.kind == "in_range":
            v = F.sum(
                F.when(
                    F.col(r.col).isNotNull()
                    & ((F.col(r.col) < r.lo) | (F.col(r.col) > r.hi)),
                    1,
                ).otherwise(0)
            )
        elif r.kind == "satisfies":
            v = F.sum(F.when(~r.expr, 1).otherwise(0))
        elif r.kind == "references":
            continue  # handled below (needs a join)
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
        agg_rules.append(r)
        aggs.append(v.cast("long").alias(f"_v{len(agg_rules) - 1}"))
    head = df.agg(*aggs).head()
    n_rows = int(head["_n"])
    spark = df.sparkSession
    out = [
        (r.name, r.kind, n_rows, int(head[f"_v{i}"]))
        for i, r in enumerate(agg_rules)
    ]
    for r in rules:
        if r.kind != "references":
            continue
        viol = (
            df.filter(F.col(r.col).isNotNull())
            .select(r.col)
            .join(
                r.parent.select(F.col(r.parent_col).alias(r.col)),
                r.col,
                "left_anti",
            )
            .count()
        )
        out.append((r.name, r.kind, n_rows, int(viol)))
    return spark.createDataFrame(
        [(n, k, nr, nv, nv == 0) for n, k, nr, nv in out],
        "rule string, kind string, n_rows long, n_violations long, passed boolean",
    )


def violating_rows(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Rows failing ANY row-level rule, annotated with the comma-joined
    names of the rules they break — the selector that feeds the bronze
    quarantine lane (sources/io.land_with_quarantine): aggregate
    expectations tell you the table is dirty, this tells you WHICH rows
    to divert. Row-level kinds only (not_null/in_set/in_range/
    satisfies); set-level rules (unique, references) have no single
    guilty row and raise."""
    preds = []
    for r in rules:
        if r.kind == "not_null":
            p = F.col(r.col).isNull()
        elif r.kind == "in_set":
            p = F.col(r.col).isNotNull() & ~F.col(r.col).isin(*r.values)
        elif r.kind == "in_range":
            p = F.col(r.col).isNotNull() & (
                (F.col(r.col) < r.lo) | (F.col(r.col) > r.hi)
            )
        elif r.kind == "satisfies":
            p = ~r.expr
        else:
            raise ValueError(
                f"rule {r.name!r} ({r.kind}) is set-level — no single row is "
                "the violation; use check_expectations for the aggregate count"
            )
        preds.append(F.when(p, F.lit(r.name)))
    broken = F.array_compact(F.array(*preds))
    return (
        df.withColumn("_broken", broken)
        .filter(F.size("_broken") > 0)
        .withColumn("violated_rules", F.concat_ws(",", "_broken"))
        .drop("_broken")
    )
