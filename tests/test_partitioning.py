"""partitioning.widen — the guard that keeps CPU-heavy projections off a
single core for one-row-group inputs while never touching wide inputs."""

from etl_processes_spark.partitioning import widen


def test_widen_spreads_narrow_scan(spark, sf_dir):
    # a one-row-group parquet file arrives as a single partition
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = widen(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row multiset unchanged
    assert out.count() == df.count()


def test_widen_spreads_narrow_range(spark):
    df = spark.range(0, 1000, 1, 1)  # plain Range leaf, 1 partition
    out = widen(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r[0] for r in out.collect()) == list(range(1000))


def test_widen_noop_for_post_shuffle_frames(spark):
    target = spark.sparkContext.defaultParallelism
    # explicit repartition, joins, aggregates: already shuffle-partitioned
    # wide AND unsafe to probe (AQE finalization) — widen must not touch them
    assert widen(spark.range(1000).repartition(target)) is not None
    df = spark.range(1000).repartition(target)
    assert widen(df) is df
    r = spark.range(100)
    agg = r.groupBy((r["id"] % 3).alias("k")).count()
    assert widen(agg) is agg
    a, b = spark.range(50), spark.range(50)
    j = a.join(b, "id")
    assert widen(j) is j
