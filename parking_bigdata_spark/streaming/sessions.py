"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2 B13, streaming form).

The batch form (``queries.events_sessions``) uses window functions; in
streaming, per-user session state must live across micro-batches — this
is exactly the per-key state-machine case where Spark's built-in
aggregations stop and ``applyInPandasWithState`` is the sanctioned
escape hatch (Arrow-batched, state scoped per key, watermark-driven
eviction available via timeouts).

Scale notes: state is O(1) per user (last_ts + two counters); each
micro-batch ships only that user's new rows through Arrow. The
in-batch sort is per-key and bounded by the micro-batch, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
STATE_SCHEMA = "last_us bigint, n_sessions bigint, n_events bigint"


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Running (user_id, n_sessions, n_events) maintained in keyed state.

    A new session starts when the gap since the user's previous event
    exceeds ``gap_seconds``; state carries the last event time across
    micro-batches so sessions spanning batch boundaries count once.
    """
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0))
        batch = pd.concat(list(pdfs), ignore_index=True)
        # NULL ts → NaT → INT64_MIN under astype; drop them (they carry
        # no event time and would poison last_us)
        batch = batch[batch["ts"].notna()]
        # micro-batches are not ordered per key — sort the batch slice
        ts_us = (batch["ts"].astype("int64") // 1000).sort_values()
        for t in ts_us:
            t = int(t)
            if last_us is None or t - last_us > gap_us:
                n_sessions += 1
            # never REGRESS last_us: an event older than state's high
            # water mark (out-of-order across micro-batches) joins the
            # current session instead of rewinding it — rewinding would
            # make the next on-time event spuriously open a session.
            last_us = t if last_us is None else max(last_us, t)
            n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame([{
            "user_id": user_id,
            "n_sessions": n_sessions,
            "n_events": n_events,
        }])

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def run_sessionize_batchlike(spark, directory: str,
                             query_name: str = "sessions_stateful"):
    """Drain the existing event files through the stateful operator
    (availableNow) into a memory sink; returns the final per-user rows."""
    from . import events as ev
    stream = sessionize_stateful(ev.read_events_stream(spark, directory))
    q = (stream.writeStream.format("memory").queryName(query_name)
               .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    # update mode may emit a row per micro-batch; keep the last per user
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (spark.table(query_name)
            .withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1").drop("__rn"))
