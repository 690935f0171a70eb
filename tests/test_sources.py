"""Custom Python DataSource: determinism, partition parallelism,
source-side filter pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from parking_bigdata_spark.sources import register


def _load(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_synthetic_source_deterministic_and_partitioned(spark):
    register(spark)
    df = _load(spark, partitions=4, rows_per_partition=500, seed=11)
    assert df.count() == 2000
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _load(spark, partitions=4, rows_per_partition=500,
                                seed=11).collect()))
    assert a == b                      # same seed -> identical data
    c = _load(spark, partitions=4, rows_per_partition=500, seed=12)
    assert sorted(map(tuple, c.collect())) != a


def test_synthetic_source_filter_pushdown_matches_post_filter(spark):
    register(spark)
    full = _load(spark, partitions=4, rows_per_partition=500, seed=11)
    pushed = (_load(spark, partitions=4, rows_per_partition=500, seed=11)
              .where(F.col("event_type") == "purchase"))
    expect = sorted(tuple(r) for r in full.collect()
                    if r["event_type"] == "purchase")
    assert sorted(map(tuple, pushed.collect())) == expect
    # and it composes with downstream aggregation
    agg = pushed.groupBy("user_id").agg(F.sum("value").alias("s"))
    assert agg.count() > 0
