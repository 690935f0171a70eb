"""Structured Streaming pipelines over the events stream (SURVEY.md §2
B12): file-source ingestion, watermarked tumbling-window aggregation,
and a stateful custom operator example.

The batch-equivalent queries live in ``queries.py`` (``events_windowed``,
``events_sessions``) and share the same expressions — Structured
Streaming's incrementalization means the SAME logical plan runs in both
modes; only source/sink and watermark differ.

Scale notes: the windowed aggregation is keyed by (window, event_type) —
state size is bounded by (#types × windows-in-watermark). The watermark
bounds state for late data; at 100 TB/day the same pipeline shards by
key across executors with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Explicit schema for the events stream — streaming file sources must
#: not infer schemas (a full listing+sample pass per trigger at scale).
#: ``ts`` is long nanoseconds in the driver parquet (TIMESTAMP(NANOS)
#: read under nanosAsLong); converted to a proper timestamp in load.
EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.LongType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

#: Engine-written events (e.g. scripts/make_stress.py output) already
#: carry a proper microsecond timestamp.
EVENTS_TS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def read_events_stream(spark: SparkSession, directory: str,
                       glob: str = "events*.parquet",
                       max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over the events parquet data under
    ``directory`` (Spark's streaming file source requires a directory).

    Handles both layouts: a single ``events.parquet`` FILE in a mixed
    directory (driver testdata — ``glob`` selects it among the other
    tables) and an ``events.parquet`` DIRECTORY of part-files (any
    Spark-written dataset — ``pathGlobFilter`` matches leaf file names,
    so the part-dir must be streamed directly or it silently yields
    zero rows).

    ``maxFilesPerTrigger`` bounds per-micro-batch work (backpressure);
    the nanos→timestamp conversion and session-conf hardening match
    ``io.load_table`` (the build driver supplies its own session).
    """
    import os
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    part_dir = os.path.join(directory, "events.parquet")
    if os.path.isdir(part_dir):
        # engine-written part-file dataset: real timestamps already
        return (spark.readStream
                     .schema(EVENTS_TS_SCHEMA)
                     .option("maxFilesPerTrigger", str(max_files_per_trigger))
                     .parquet(part_dir))
    # One batch footer probe decides the physical ts type: TIMESTAMP(NANOS)
    # testdata scans as long under nanosAsLong (convert below), while
    # TIMESTAMP(MICROS) testdata is already a proper timestamp — forcing
    # the long schema there would misread micros as nanos.
    probe = (spark.read.option("pathGlobFilter", glob)
                  .parquet(directory).schema["ts"].dataType)
    if not isinstance(probe, T.LongType):
        return (spark.readStream
                     .schema(EVENTS_TS_SCHEMA)
                     .option("pathGlobFilter", glob)
                     .option("maxFilesPerTrigger", str(max_files_per_trigger))
                     .parquet(directory))
    raw = (spark.readStream
                .schema(EVENTS_RAW_SCHEMA)
                .option("pathGlobFilter", glob)
                .option("maxFilesPerTrigger", str(max_files_per_trigger))
                .parquet(directory))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours",
                    slide: str | None = None) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming form of
    the batch ``events_windowed`` query.

    The watermark bounds state ONLY in append/update output modes
    (windows past the watermark are finalized and evicted). A
    production sink should use append mode; ``complete`` mode (used by
    the drain-everything test runner below) retains all windows by
    definition and ignores watermark eviction.
    """
    w = (F.window("ts", window, slide) if slide
         else F.window("ts", window))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("wstart"), "event_type",
                    "n_events", "sum_value"))


def run_windowed_counts_batchlike(spark: SparkSession, path: str,
                                  query_name: str = "events_windowed_stream"):
    """TEST HARNESS: run the streaming pipeline to completion over the
    existing files (availableNow trigger) into an in-memory sink and
    return the finished result. Complete mode + memory sink are chosen
    so the drained result equals the batch query exactly — this is for
    bounded test inputs only; a production deployment uses append mode
    (watermark-evicted state) and a durable sink.
    """
    stream = windowed_counts(read_events_stream(spark, path))
    q = (stream.writeStream
               .format("memory")
               .queryName(query_name)
               .outputMode("complete")
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
    return spark.table(query_name)


def session_window_counts(events: DataFrame, gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Native engine-managed session windows: ``F.session_window``
    merges a user's events within ``gap`` of each other into one
    dynamically-sized window — the built-in counterpart of the
    `applyInPandasWithState` sessionizer in sessions.py (B13), and the
    streaming twin of the batch `events_sessions` query.

    State per (user, open session) is merged across micro-batches by
    the engine; the watermark closes and evicts sessions whose end
    precedes it. A new event splits a session iff its gap from the
    previous event is >= `gap` (end-exclusive window), matching the
    strict `>` custom sessionizer on any real (non-boundary) data.
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("user_id",
                    F.unix_micros("w.start").alias("sess_start_us"),
                    F.unix_micros("w.end").alias("sess_end_us"),
                    "n_events", "sum_value"))


def run_session_window_batchlike(spark: SparkSession, path: str,
                                 query_name: str = "events_session_windows"):
    """TEST HARNESS: drain the session-window stream over existing
    files (availableNow, complete mode, memory sink) — bounded-input
    testing only, mirroring `run_windowed_counts_batchlike`."""
    stream = session_window_counts(read_events_stream(spark, path))
    q = (stream.writeStream
               .format("memory")
               .queryName(query_name)
               .outputMode("complete")
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
    return spark.table(query_name)


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    `dropDuplicatesWithinWatermark` keeps state bounded (ids older than
    the watermark are evicted), the standard at-least-once → exactly-once
    repair for replayed sources."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def enrich_with_static(events: DataFrame, dim: DataFrame,
                       on: str = "event_type") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (small) static dimension, which Spark broadcasts — per-batch map-side
    hash join, no stream-side shuffle and no state. The standard pattern
    for attaching slowly-changing reference data to a stream; for
    stream-stream joins use watermarks on both sides instead."""
    return events.join(F.broadcast(dim), on, "left")


def run_foreach_batch_sink(spark: SparkSession, path: str, out_dir: str,
                           window: str = "1 hour") -> None:
    """Production sink shape: ``foreachBatch`` hands each micro-batch to
    arbitrary batch-writer logic with its batch id — the hook for
    idempotent upserts/merges into stores without a native streaming
    sink. Here each batch overwrites its own subdirectory keyed by
    batch id, so replays of a failed batch are idempotent (same id →
    same directory → overwrite, not duplicate).

    Uses update output mode: only windows changed by the batch are
    re-emitted, so the per-batch write volume tracks the batch, not the
    full history (complete mode would rewrite everything every batch).
    """
    stream = windowed_counts(read_events_stream(spark, path), window)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (stream.writeStream
               .foreachBatch(write_batch)
               .outputMode("update")
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()


def user_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful shape: per-user cumulative value via
    ``applyInPandasWithState``-style semantics expressed with the
    supported building block — update-mode agg keyed by user.

    (Kept as a windowless keyed aggregation: state = one row per user,
    the canonical pattern for running aggregates in Structured
    Streaming. For arbitrary per-key state machines, swap in
    ``applyInPandasWithState`` with the same key layout.)
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value")))


def view_purchase_attribution(views: DataFrame, purchases: DataFrame,
                              attribution_window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-STREAM inner join with an event-time range condition:
    attribute each purchase to same-user views in the preceding
    ``attribution_window``.

    Both sides are watermarked and the join condition bounds purchase.ts
    to [view.ts, view.ts + window], so Spark can derive state-eviction
    watermarks for BOTH join-state stores — without the time bound the
    state grows forever. The equi-key (user_id) routes both streams
    through one hash partitioning; matches stream out incrementally.
    Cite: reference joins are static inner_joins (R:272); this is the
    streaming counterpart over the events table.
    """
    v = (views.withWatermark("ts", watermark)
              .select(F.col("user_id").alias("v_user"),
                      F.col("event_id").alias("view_id"),
                      F.col("ts").alias("view_ts")))
    p = (purchases.withWatermark("ts", watermark)
                  .select(F.col("user_id").alias("p_user"),
                          F.col("event_id").alias("purchase_id"),
                          F.col("ts").alias("purchase_ts"),
                          F.col("value").alias("purchase_value")))
    cond = ((F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts")
               <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")))
    return (v.join(p, cond)
             .select(F.col("p_user").alias("user_id"), "view_id",
                     "purchase_id", "view_ts", "purchase_ts",
                     "purchase_value"))


def run_view_purchase_attribution_batchlike(spark: SparkSession, path: str,
                                            attribution_window: str = "1 hour"
                                            ) -> DataFrame:
    """Drain the stream-stream attribution join over the events data to
    a memory sink (append mode — stream-stream inner joins emit
    incrementally) and return the result as a static DataFrame."""
    ev = read_events_stream(spark, path)
    out = view_purchase_attribution(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        attribution_window)
    q = (out.writeStream.format("memory")
            .queryName("vp_attr").outputMode("append")
            .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table("vp_attr")
