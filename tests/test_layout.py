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


def test_zorder_value_is_morton_interleave(spark):
    from spectraplex_spark.sources.layout import zorder_value

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y"), 3).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(3):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(8) for y in range(8)}
    assert sorted(got.values()) == list(range(64))  # bijection on the grid


def _rowgroup_stats(path, cols):
    """(min, max) per row group per column across all part files."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            stats = {}
            for c in cols:
                s = rg.column(names.index(c)).statistics
                stats[c] = (s.min, s.max)
            out.append(stats)
    return out


def test_zorder_layout_prunes_two_column_boxes(spark, tmp_path):
    """Z-ordering on (custkey, totalprice) must let row-group min/max
    stats skip substantially more of the file than the natural layout
    for a two-predicate box scan — the multi-dimensional data-skipping
    claim, measured on real parquet footers."""
    from spectraplex_spark.sources.layout import write_zordered

    orders = table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain_path, z_path = str(tmp_path / "plain"), str(tmp_path / "zorder")
    orders.coalesce(1).write.option("parquet.block.size", str(64 * 1024)).parquet(
        plain_path
    )
    write_zordered(
        orders.coalesce(1), z_path, "o_custkey", "o_totalprice",
        bits=8, block_size=64 * 1024,
    )

    cols = ["o_custkey", "o_totalprice"]
    lo_c, hi_c = 100, 200  # ~6.7% of custkeys
    lo_p, hi_p = 1000.0, 2000.0

    def overlapping(groups):
        hit = sum(
            1
            for g in groups
            if g["o_custkey"][0] <= hi_c
            and g["o_custkey"][1] >= lo_c
            and g["o_totalprice"][0] <= hi_p
            and g["o_totalprice"][1] >= lo_p
        )
        return hit, len(groups)

    plain_hit, plain_n = overlapping(_rowgroup_stats(plain_path, cols))
    z_hit, z_n = overlapping(_rowgroup_stats(z_path, cols))
    assert plain_n >= 4 and z_n >= 4  # enough groups to mean anything
    # same rows either way
    assert spark.read.parquet(z_path).count() == spark.read.parquet(plain_path).count()
    # natural layout (ordered by orderkey) can't skip the box; z-order must
    assert z_hit / z_n < plain_hit / plain_n, (
        f"z-order {z_hit}/{z_n} vs plain {plain_hit}/{plain_n}"
    )


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


def test_ivf_index_partition_prunes_and_matches_inline(spark, tmp_path):
    """The materialized IVF layout must (a) partition-prune: the probe
    filter appears as PartitionFilters and the scan reads only probed
    cluster directories; (b) agree exactly with the on-the-fly ivf_topk
    for the same centroids and probes."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.simsearch import (
        fit_ivf_centroids,
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )
    from spectraplex_spark.plans import table

    em = table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") != 0
    )
    qvec = [
        float(x)
        for x in table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    ]
    cent = fit_ivf_centroids(em, n_centroids=8, seed=42)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(em, path, cent)

    indexed = ivf_topk_indexed(spark, path, qvec, cent, k=10, n_probe=3)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "ivf_cluster" in pf and ("IN (" in pf or "INSET" in pf or " IN " in pf)

    inline = ivf_topk(em, qvec, k=10, n_probe=3, centroids=cent)
    assert [(r[0], r[1]) for r in indexed.collect()] == [
        (r[0], r[1]) for r in inline.collect()
    ]


def test_ivfpq_index_is_codes_only_and_partition_prunes(spark, tmp_path):
    """The IVFPQ claims, plan-asserted: (a) the probe filter appears as
    PartitionFilters (unprobed clusters' files are never read); (b) the
    scan's ReadSchema carries the m-byte code column and NO embedding —
    the index physically cannot read vectors; (c) full-probe ADC over
    the index returns exactly what the inline pq_topk computes."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.pq import (
        ivfpq_topk,
        ivfpq_topk_rerank,
        pq_codebooks,
        pq_topk,
        write_ivfpq_index,
    )
    from spectraplex_spark.operators.simsearch import cosine_topk, fit_ivf_centroids
    from spectraplex_spark.plans.registry import table
    from tests.conftest import SF_DIR

    em = table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    corpus = em.filter(F.col("vec_id") != 0)
    cent = fit_ivf_centroids(corpus, n_centroids=8, seed=42)
    cb = pq_codebooks(64, 4, 8, seed=7, scale=0.25)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(corpus, path, cent, cb)

    pruned = ivfpq_topk(spark, path, qvec, cent, cb, k=10, n_probe=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "ivf_cluster" in pf and ("IN (" in pf or "INSET" in pf or " IN " in pf)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "pq_code" in read_schema and "embedding" not in read_schema

    # full probe == inline pq_topk exactly (same codes, same quantized LUT)
    full = ivfpq_topk(spark, path, qvec, cent, cb, k=10, n_probe=8).collect()
    inline = pq_topk(corpus, qvec, cb, k=10).collect()
    assert [(r.vec_id, r.pq_code, r.adc_score) for r in full] == [
        (r.vec_id, r.pq_code, r.adc_score) for r in inline
    ]

    # rerank scores are exact cosines for surviving candidates
    brute = {r.vec_id: r.cosine for r in cosine_topk(corpus, qvec, k=50).collect()}
    rr = ivfpq_topk_rerank(spark, path, corpus, qvec, cent, cb, k=10, n_probe=8).collect()
    assert rr and all(r.cosine == brute[r.vec_id] for r in rr if r.vec_id in brute)


def test_ivfpq_index_rejects_mismatched_codebooks(spark, tmp_path):
    """The _config sidecar contract: querying a materialized IVFPQ index
    with codebooks other than the ones that built it must fail loudly
    (different codebooks would silently mis-score every row)."""
    import pytest
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.pq import (
        ivfpq_topk,
        pq_codebooks,
        write_ivfpq_index,
    )
    from spectraplex_spark.operators.simsearch import fit_ivf_centroids
    from spectraplex_spark.plans.registry import table
    from tests.conftest import SF_DIR

    em = table(spark, SF_DIR, "embeddings").limit(100)
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    cent = fit_ivf_centroids(em, n_centroids=4, seed=42)
    cb = pq_codebooks(64, 4, 8, seed=7)
    path = str(tmp_path / "idx")
    write_ivfpq_index(em, path, cent, cb)
    # Mismatched params must fail on a FRESH index, before any correct-
    # params query runs: this proves the _config sidecar survived the
    # one-shot build's overwrite (a correct query first would silently
    # re-create a missing sidecar from its own params, masking the loss).
    with pytest.raises(ValueError, match="codebook_sha"):
        ivfpq_topk(spark, path, qvec, cent, pq_codebooks(64, 4, 8, seed=99), k=5)
    # same params -> fine
    assert ivfpq_topk(spark, path, qvec, cent, cb, k=5, n_probe=4).count() == 5


def test_ivfpq_incremental_append_replay_idempotent(spark, tmp_path):
    """Two-batch incremental index build == one-shot build (same rows,
    same query results); replaying a batch appends zero rows."""
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.pq import (
        append_ivfpq_batch,
        ivfpq_topk,
        pq_codebooks,
        write_ivfpq_index,
    )
    from spectraplex_spark.operators.simsearch import fit_ivf_centroids
    from spectraplex_spark.plans.registry import table
    from tests.conftest import SF_DIR

    em = table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in em.filter(F.col("vec_id") == 0).head()["embedding"]]
    corpus = em.filter(F.col("vec_id") != 0)
    cent = fit_ivf_centroids(corpus, n_centroids=4, seed=42)
    cb = pq_codebooks(64, 4, 8, seed=7)

    b1 = corpus.filter(F.col("vec_id") % 2 == 1)
    b2 = corpus.filter(F.col("vec_id") % 2 == 0)
    inc_path = str(tmp_path / "inc")
    assert append_ivfpq_batch(b1, inc_path, cent, cb) == b1.count()
    assert append_ivfpq_batch(b2, inc_path, cent, cb) == b2.count()
    assert append_ivfpq_batch(b1, inc_path, cent, cb) == 0  # replay no-op

    oneshot = str(tmp_path / "oneshot")
    write_ivfpq_index(corpus, oneshot, cent, cb)
    a = [(r.vec_id, r.pq_code, r.adc_score) for r in ivfpq_topk(spark, inc_path, qvec, cent, cb, k=10, n_probe=4).collect()]
    b = [(r.vec_id, r.pq_code, r.adc_score) for r in ivfpq_topk(spark, oneshot, qvec, cent, cb, k=10, n_probe=4).collect()]
    assert a == b


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from spectraplex_spark.plans.registry import table
    from spectraplex_spark.sources.layout import compact_to
    from tests.conftest import SF_DIR

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    ev.repartition(16).write.parquet(src)
    n = ev.count()
    before, after = compact_to(spark, src, dst, rows_per_file=n // 3 + 1)
    assert before >= 16 and after == 3
    back = spark.read.parquet(dst)
    assert back.count() == n
    # content hash identical (order-independent aggregate)
    h = lambda df: df.agg(
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h")
    ).head()["h"]
    assert h(back) == h(ev)


def test_zorder_value_n_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from spectraplex_spark.sources.layout import zorder_value, zorder_value_n

    rows = [(3, 5, 9), (0, 0, 0), (255, 1, 128), (17, 254, 63)]
    df = spark.createDataFrame(rows, "x long, y long, w long")

    def morton_n(vals, bits=8):
        z = 0
        n = len(vals)
        for b in range(bits):
            for c, v in enumerate(vals):
                z |= ((v >> b) & 1) << (b * n + c)
        return z

    got = [
        (r["x"], r["y"], r["w"], r["z3"])
        for r in df.select(
            "x", "y", "w",
            zorder_value_n([F.col("x"), F.col("y"), F.col("w")], 8).alias("z3"),
        ).collect()
    ]
    for x, y, w, z in got:
        assert z == morton_n([x, y, w])
    # 2-col form must agree with the existing pairwise interleave
    two = df.select(
        zorder_value_n([F.col("x"), F.col("y")], 8).alias("a"),
        zorder_value(F.col("x"), F.col("y"), 8).alias("b"),
    ).collect()
    for r in two:
        assert r["a"] == r["b"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="63"):
        zorder_value_n([F.col("x")] * 9, 8)


def test_ivf_index_probes_from_storage_alone(spark, tmp_path):
    """A FRESH consumer with no in-memory state probes the materialized
    index: centroids round-trip float64-bit-exact through the
    _centroids table, so probe selection (and therefore results) equal
    the building session's; wrong-family and missing indexes fail
    loudly."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.simsearch import (
        fit_ivf_centroids,
        ivf_topk_indexed,
        read_ivf_index,
        write_ivf_index,
    )
    from spectraplex_spark.plans import table

    em = table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") != 0
    )
    qvec = [
        float(x)
        for x in table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    ]
    cent = fit_ivf_centroids(em, n_centroids=8, seed=42)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(em, path, cent)

    stored, cfg = read_ivf_index(spark, path)
    assert np.array_equal(stored, np.asarray(cent, dtype=np.float64))
    assert (cfg["family"], cfg["k"]) == ("ivf_float", "8")
    with_mem = ivf_topk_indexed(spark, path, qvec, cent, k=10, n_probe=3)
    from_storage = ivf_topk_indexed(spark, path, qvec, k=10, n_probe=3)
    assert [tuple(r) for r in from_storage.collect()] == [
        tuple(r) for r in with_mem.collect()
    ]
    with pytest.raises(ValueError, match="_config"):
        read_ivf_index(spark, str(tmp_path / "nope"))
    # r13 review findings: explicit centroids validate against the
    # sidecar's content pin — a superseded in-memory fit must fail
    # loudly instead of silently probing a foreign partition layout
    stale = np.asarray(cent, dtype=np.float64).copy()
    stale[0, 0] += 1.0
    with pytest.raises(ValueError, match="centroid_sha"):
        ivf_topk_indexed(spark, path, qvec, stale, k=10, n_probe=3)
    with pytest.raises(ValueError, match="k="):
        ivf_topk_indexed(spark, path, qvec, stale[:4], k=10, n_probe=3)
    # and a parameter-mismatched REBUILD refuses before touching rows/
    # (config-first ordering): the stored layout stays consistent
    cent16 = fit_ivf_centroids(em, n_centroids=4, seed=7)
    with pytest.raises(ValueError):
        write_ivf_index(em, path, cent16)
    stored2, _ = read_ivf_index(spark, path)
    assert np.array_equal(stored2, np.asarray(cent, dtype=np.float64))
    assert [tuple(r) for r in ivf_topk_indexed(
        spark, path, qvec, k=10, n_probe=3
    ).collect()] == [tuple(r) for r in with_mem.collect()]


def test_cosine_zero_norm_rows_never_crash_or_rank(spark):
    """Spark 4 ANSI aborts double division by zero: a single zero-norm
    embedding (or a zero query) used to kill cosine_topk/cosine_pairs
    with DIVIDE_BY_ZERO (empirically reproduced, r13 review). The
    guarded cosine yields NULL — sorts last, fails every threshold."""
    from spectraplex_spark.operators.simsearch import cosine_pairs, cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in rows] == [1, 3, 2]
    assert rows[-1]["cosine"] is None  # undefined, never a real score
    pairs = cosine_pairs(df, threshold=-1.0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}
    # zero QUERY vector: every cosine undefined, nothing ranks above NULL
    rows = cosine_topk(df.filter("vec_id != 2"), [0.0, 0.0], k=2).collect()
    assert all(r["cosine"] is None for r in rows)


def test_ivfpq_index_probes_from_storage_alone(spark, tmp_path):
    """Fresh-session IVFPQ probe: the persisted model tables load back
    SHA-verified and the storage-alone query equals the in-memory one;
    a tampered model table fails loudly."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from spectraplex_spark.operators.pq import (
        fit_pq_codebooks,
        ivfpq_topk,
        read_ivfpq_model,
        write_ivfpq_index,
    )
    from spectraplex_spark.operators.simsearch import fit_ivf_centroids
    from spectraplex_spark.plans import table

    em = table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") != 0
    )
    qvec = [
        float(x)
        for x in table(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    ]
    cent = fit_ivf_centroids(em, n_centroids=4, seed=42)
    cb = fit_pq_codebooks(em, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(em, path, cent, cb)

    rc, rcb = read_ivfpq_model(spark, path)
    assert np.array_equal(rc, np.asarray(cent, dtype=np.float64))
    assert np.array_equal(rcb, np.asarray(cb, dtype=np.float64))
    with_mem = ivfpq_topk(spark, path, qvec, cent, cb, k=10, n_probe=2)
    from_storage = ivfpq_topk(spark, path, qvec, k=10, n_probe=2)
    assert [tuple(r) for r in from_storage.collect()] == [
        tuple(r) for r in with_mem.collect()
    ]
    with pytest.raises(ValueError, match="both"):
        ivfpq_topk(spark, path, qvec, centroids=cent)
    # tampered model table -> SHA mismatch, loud failure
    spark.createDataFrame(
        [(int(i), [float(v) + 1.0 for v in c]) for i, c in enumerate(cent)],
        "cluster_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    with pytest.raises(ValueError, match="SHA"):
        read_ivfpq_model(spark, path)
