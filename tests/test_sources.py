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


def test_synthetic_stream_reader_exactly_once(spark, tmp_path):
    """Streaming half of the custom Python DataSource: micro-batches
    arrive deterministically, and a restart from checkpoint resumes at
    the committed offset without duplicating rows (the offset is the
    generator seed, so replay is bit-identical). File sink — the memory
    sink cannot recover from a checkpoint."""
    import time

    from parking_bigdata_spark.sources.synthetic import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_until(min_rows):
        q = (spark.readStream.format("synthetic_events")
             .option("rows_per_batch", "20").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(processingTime="0 seconds").start())
        try:
            for _ in range(120):
                try:
                    if spark.read.parquet(out).count() >= min_rows:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    first = run_until(40)
    ids_a = sorted(r["event_id"] for r in first)
    assert len(ids_a) >= 40
    assert ids_a == sorted(set(ids_a))          # no duplicates
    assert ids_a[:20] == list(range(20))        # batch 0 is ids 0..19

    # restart from the same checkpoint: continues, never replays a
    # committed batch (exactly-once through the file sink's log)
    second = run_until(len(ids_a) + 20)
    ids_b = sorted(r["event_id"] for r in second)
    assert ids_b == sorted(set(ids_b))          # still no duplicates
    assert set(ids_a) <= set(ids_b)             # old rows intact
    assert len(ids_b) >= len(ids_a) + 20        # and new batches landed
