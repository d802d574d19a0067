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


def test_aqe_splits_skewed_join(spark, tmp_path):
    """The 100 TB skew story's runtime half: AQE must detect the hot key
    and split its partition (skew=true on the sort-merge join) instead
    of leaving one straggler task. Thresholds are lowered so the test's
    data qualifies as 'skewed'; salting (above) remains the
    aggregation-side tool."""
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        # 95% of left rows share key 0; right side is uniform
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
        )
        j = left.join(right, "k")
        # collect() executes THIS DataFrame's QueryExecution, so its
        # adaptive plan finalizes (count()/write() spawn fresh plans)
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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
