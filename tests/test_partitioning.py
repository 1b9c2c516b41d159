"""partitioning.widen — the guard that keeps CPU-heavy projections off a
single core for one-row-group inputs while never touching wide inputs."""

from etl_processes_spark.partitioning import widen


def test_widen_spreads_narrow_input(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = widen(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row multiset unchanged
    assert sorted(r[0] for r in out.collect()) == list(range(1000))


def test_widen_noop_for_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target)
    out = widen(df)
    # already at full width: widen must not add another shuffle
    assert out is df


def test_widen_noop_just_under_threshold(spark):
    target = spark.sparkContext.defaultParallelism
    if target < 2:
        return
    # min_factor=2: inputs wider than target/2 stay untouched
    df = spark.range(1000).repartition(max(1, target // 2 + 1))
    assert widen(df) is df
