"""As-of join semantics on hand-built edge cases."""

from __future__ import annotations

import datetime as dt

from parking_bigdata_spark.operators import temporal


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "e1"), (1, _ts(30), "e2"), (1, _ts(5), "e0"),
         (2, _ts(10), "e3")],
        "k int, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (3, _ts(1), 999.0)],
        "k int, ts timestamp, px double")
    out = {r["name"]: r["px"] for r in
           temporal.asof_join(left, right, "k", "ts", ["px"]).collect()}
    assert out["e0"] is None          # no right row at or before 00:05
    assert out["e1"] == 100.0         # equal timestamps match (inclusive)
    assert out["e2"] == 200.0         # most recent, not first
    assert out["e3"] is None          # key with no right rows at all


def test_asof_join_null_payload_of_newest_row_wins(spark):
    """The most recent right ROW is taken as a unit: a NULL field in it
    must surface as NULL (not fall back to an older non-null value),
    and multiple payload columns must come from the same row."""
    left = spark.createDataFrame([(1, _ts(30), "e")], "k int, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0, "old"), (1, _ts(20), None, "new")],
        "k int, ts timestamp, px double, tag string")
    row = temporal.asof_join(left, right, "k", "ts", ["px", "tag"]).collect()[0]
    assert row["px"] is None          # newest row's NULL, not stale 5.0
    assert row["tag"] == "new"        # both fields from the same row


def test_asof_join_keeps_all_left_rows(spark, sf_dir):
    from parking_bigdata_spark.io import load_table
    from pyspark.sql import functions as F
    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                   .select("user_id", "ts", F.col("ts").alias("pts")))
    joined = temporal.asof_join(ev, purchases, "user_id", "ts", ["pts"])
    assert joined.count() == ev.count()
