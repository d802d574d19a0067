"""Relational operator coverage (SURVEY.md §2.2-2.8) over the driver's
TPC-H-shaped tables.

Each query maps a reference operator category to idiomatic DataFrame
code and carries a DuckDB oracle twin. Scale notes are inline: which
joins broadcast, where the shuffles are, and why the plan survives a
100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from spectraplex_spark.plans.registry import query, table

DEC = T.DecimalType(38, 6)


def dec6(col):
    """Per-row decimal cast — makes downstream SUM exact and
    order-independent (see plans/__init__ determinism rules)."""
    return col.cast(DEC)


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.4 — the index-implied report workloads)
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty,
           SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS sum_base_price,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS sum_disc_price,
           SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(38,6))) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="TPC-H Q1 shape: scan + filter + hash aggregate. Map-side partial "
    "aggregation keeps the shuffle tiny (6 groups) at any scale.",
)
def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec6(F.col("l_quantity"))).alias("sum_qty"),
            F.sum(dec6(F.col("l_extendedprice"))).alias("sum_base_price"),
            F.sum(dec6(disc_price)).alias("sum_disc_price"),
            F.sum(dec6(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Distinct aggregation: Spark plans a two-phase (partial-distinct "
    "then merge) expand; no driver-side work.",
)
def agg_count_distinct(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP: hierarchical subtotals in one pass (Spark Expand node — "
    "rows are replicated per grouping set before one hash agg; no extra scans).",
)
def agg_rollup_lineitem(spark, sf_dir):
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(dec6(F.col("l_quantity"))).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS sum_price,
           COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two report dimensions (SURVEY §2.4's anticipated "
    "tax-report rollups).",
)
def agg_cube_orders(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum(dec6(F.col("o_totalprice"))).alias("sum_price"), F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# --------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: selective dim filter -> broadcast customer into "
    "orders, shuffle join to lineitem on orderkey, agg, TakeOrderedAndProject "
    "top-k (no global sort materialized).",
)
def q3_shipping_priority(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n_name,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: 6-way join. region/nation/supplier/customer are "
    "broadcast dims; only orders⋈lineitem shuffles on orderkey. The "
    "c_nationkey = s_nationkey local-supplier predicate rides the join.",
)
def q5_region_revenue(spark, sf_dir):
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "join_left_order_counts",
    """
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(38,6))) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="Left outer join preserving customers with zero orders "
    "(COUNT(col) skips nulls on both engines).",
)
def join_left_order_counts(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec6(F.coalesce(F.col("o_totalprice"), F.lit(0)))).alias("total_spent"),
        )
    )


@query(
    "join_semi_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'F')
    """,
    doc="Left-semi join (EXISTS). Spark never materializes the right side "
    "into the output — at scale this is the cheap way to express the "
    "duplicate-id guard of the reference's ON CONFLICT (SURVEY §2.7).",
)
def join_semi_customers_with_orders(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS) — the idempotent-append protocol's "
    "core primitive (new ids not present in the target; SURVEY §4.1).",
)
def join_anti_customers_without_orders(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_broadcast_brand_revenue",
    """
    SELECT p_brand,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    bench=True,
    doc="Fact⋈dim with explicit broadcast hint: part is small relative to "
    "lineitem at every SF, so the join is shuffle-free; only the 25-group "
    "agg shuffles.",
)
def join_broadcast_brand_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — running balances / ranking)
# --------------------------------------------------------------------------

@query(
    "window_topn_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
    doc="Per-key top-N via row_number. One shuffle on the partition key; "
    "orderkey tiebreaker makes ranking deterministic.",
)
def window_topn_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_revenue",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_rev
    FROM lineitem
    """,
    doc="Running total per supplier — the reference schema's anticipated "
    "running-balance report (SURVEY §2.4); decimal sum keeps the prefix "
    "sums exact, (shipdate, orderkey, linenumber) is a unique order.",
)
def window_running_revenue(spark, sf_dir):
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        table(spark, sf_dir, "lineitem")
        .withColumn("running_rev", F.sum(dec6(F.col("l_extendedprice"))).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
    )


@query(
    "window_lag_order_gap",
    """
    SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
    """,
    doc="lag(): days between consecutive orders per customer "
    "(as-of/previous-row analytics).",
)
def window_lag_order_gap(spark, sf_dir):
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .withColumn(
            "days_since_prev",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("int"),
        )
        .select("o_custkey", "o_orderkey", "days_since_prev")
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY §2.6)
# --------------------------------------------------------------------------

@query(
    "sort_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject (per-partition "
    "heap + driver merge) — no full sort at any scale. The reference's O3 "
    "take-most-recent shape (solana.rs:30).",
)
def sort_topk_orders(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------

@query(
    "setop_union_segments",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="UNION (distinct).",
)
def setop_union_segments(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "setop_intersect_segments",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="INTERSECT.",
)
def setop_intersect_segments(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@query(
    "setop_except_segments",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="EXCEPT.",
)
def setop_except_segments(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics


# --------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# --------------------------------------------------------------------------

@query(
    "scalar_string_parts",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_uc,
           SUBSTR(p_name, 1, 10) AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part WHERE p_name LIKE '%gold%' OR p_size > 40
    """,
    doc="String functions: upper/substr/length/concat/like — all "
    "whole-stage-codegen JVM expressions, no UDFs.",
)
def scalar_string_parts(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gold%") | (F.col("p_size") > 40)).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "scalar_date_orders",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS sum_price
    FROM orders GROUP BY 1, 2
    """,
    doc="Date-part extraction + period grouping (the reference's "
    "time-bounded report indexes, init.sql:34-35).",
)
def scalar_date_orders(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec6(F.col("o_totalprice"))).alias("sum_price"),
        )
    )


@query(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ABS(l_discount - 0.05) AS DECIMAL(38,6)) AS disc_dev,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS net_price
    FROM lineitem WHERE l_quantity >= 49
    """,
    doc="Math scalar functions (abs/mod/arithmetic) with decimal-cast "
    "projection for engine-exact compare.",
)
def scalar_math_lineitem(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 49).select(
        "l_orderkey",
        "l_linenumber",
        dec6(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        dec6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@query(
    "scalar_json_events",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="JSON extraction from the props column (the raw_metadata analog, "
    "SURVEY §2.8 F1-F3) — get_json_object stays JVM-side.",
)
def scalar_json_events(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "case_when_value_tiers",
    """
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS tier,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(38,6))) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="CASE WHEN dispatch (the reference's enum mapping / sign "
    "classification shape, F7/F8).",
)
def case_when_value_tiers(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    return ev.groupBy(tier.alias("tier")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec6(F.col("value"))).alias("sum_value"),
    )


@query(
    "array_ops_embeddings",
    """
    SELECT label,
           COUNT(*) AS n,
           CAST(MIN(len(embedding)) AS INTEGER) AS min_dim,
           CAST(MAX(len(embedding)) AS INTEGER) AS max_dim,
           SUM(CAST(embedding[1] AS DECIMAL(38,6))) AS sum_first
    FROM embeddings GROUP BY label
    """,
    doc="Array functions over the embedding column (size / element_at) — "
    "the E2/E3 column model is plain Spark arrays.",
)
def array_ops_embeddings(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    return em.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("embedding")).cast("int").alias("min_dim"),
        F.max(F.size("embedding")).cast("int").alias("max_dim"),
        F.sum(dec6(F.get(F.col("embedding"), 0))).alias("sum_first"),
    )
