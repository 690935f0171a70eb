"""Structured Streaming: the streaming windowed aggregation must produce
exactly the batch query's result once the availableNow run drains."""

from __future__ import annotations

from parking_bigdata_spark import queries as Q
from parking_bigdata_spark.streaming import events as stream_ev


def test_streaming_windowed_matches_batch(spark, sf_dir):
    batch = {(r["wstart"], r["event_type"]): (r["n_events"], r["sum_value"])
             for r in Q.events_windowed(spark, sf_dir).collect()}
    streamed = stream_ev.run_windowed_counts_batchlike(
        spark, sf_dir, "t_stream_win")
    got = {(r["wstart"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in streamed.collect()}
    assert got == batch


def test_streaming_running_totals(spark, sf_dir):
    ev = stream_ev.read_events_stream(spark, sf_dir)
    q = (stream_ev.user_running_totals(ev)
         .writeStream.format("memory").queryName("t_user_totals")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("t_user_totals").collect()
    assert len(rows) > 0
    assert all(r["n_events"] > 0 for r in rows)
