"""Bucketing (shuffle-free co-located joins) + skew salting."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from spectraplex_spark.plans.registry import table
from spectraplex_spark.sources.layout import salted_group_sum, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf (session default: ./spark-warehouse);
    # tables are dropped in the finally block
    orders = table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", ["o_orderkey"], 8
    )
    j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # result is still correct
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_group_sum_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    rows = [(0 if i % 10 else i % 7, float(i)) for i in range(10_000)]
    df = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
        ])
    )
    v_dec = F.col("v").cast(T.DecimalType(38, 6))
    plain = {
        (r.k, r.total)
        for r in df.groupBy("k").agg(F.sum(v_dec).alias("total")).collect()
    }
    salted = {
        (r.k, r.total)
        for r in salted_group_sum(df, ["k"], v_dec, "total", salt_n=8).collect()
    }
    assert plain == salted


def test_bronze_partition_pruning_in_plan(spark, tmp_path):
    """The chain/date partition layout must actually prune: the scan's
    PartitionFilters carry the predicate and non-matching partitions
    are never read (the reference needed an index for this — init.sql:18)."""
    from spectraplex_spark.schemas import BRONZE_SCHEMA
    from spectraplex_spark.sources.io import write_bronze

    rows = [
        (f"id-{i}", "u", "w", 1672531200 + i * 86_400, f"s{i}",
         "solana" if i % 2 else "ethereum", "{}", None)
        for i in range(6)
    ]
    target = str(tmp_path / "bronze")
    write_bronze(spark.createDataFrame(rows, BRONZE_SCHEMA), target)
    df = spark.read.parquet(target).filter(F.col("chain") == "solana")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "chain" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == 3
