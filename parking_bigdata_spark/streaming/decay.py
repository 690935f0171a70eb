"""Stateful streaming with Spark 4's ``transformWithStateInPandas``
(SURVEY.md §2 B32): a per-user exponentially-decayed engagement score —
the streaming twin of the batch ``decayed_engagement`` query (C16).

``transformWithStateInPandas`` is the successor to
``applyInPandasWithState`` (the sessionizer in ``sessions.py`` shows
that older API): typed state variables (value/list/map), timers, and
TTL live on a ``StatefulProcessorHandle`` instead of a single opaque
tuple. State here is one (last_us, score, n_events) value per user —
O(1) per key, RocksDB-backed on a real cluster; each micro-batch ships
only that user's new rows through Arrow.

The recurrence ``s_k = s_{k-1} * exp(-lam * dt) + v_k`` telescopes to
``sum_i v_i * exp(-lam * (t_last - t_i))`` — the closed form a batch
job computes row-locally — so streaming-vs-batch parity is testable to
float tolerance (addition order differs).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = "user_id bigint, score double, n_events bigint"

#: decay rate: half-life of one day
HALF_LIFE_S = 86_400.0
LAMBDA_PER_US = math.log(2.0) / (HALF_LIFE_S * 1e6)


class DecayedEngagementProcessor(StatefulProcessor):
    """Running decayed engagement per user across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "engagement", "last_us bigint, score double, n_events bigint")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            last_us, score, n_events = self._state.get()
        else:
            last_us, score, n_events = None, 0.0, 0
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch[batch["ts"].notna()]
        # normalize to µs explicitly: Arrow may hand pandas either
        # datetime64[ns] or datetime64[us] (pandas 2.x), and a blind
        # int64-divide would be silently 1000x off for [us] input
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = batch["value"].fillna(0.0).to_numpy()
        order = ts_us.argsort(kind="stable")
        for i in order:
            t = int(ts_us[i])
            if last_us is None:
                last_us = t
            # out-of-order events decay *themselves* to the current
            # high-water mark instead of rewinding it (mirrors the
            # sessionizer's never-regress rule): score stays the decayed
            # sum to max(t_seen).
            if t >= last_us:
                score = score * math.exp(-LAMBDA_PER_US * (t - last_us))
                score += float(vals[i])
                last_us = t
            else:
                score += float(vals[i]) * math.exp(
                    -LAMBDA_PER_US * (last_us - t))
            n_events += 1
        self._state.update((last_us, score, n_events))
        yield pd.DataFrame([{
            "user_id": user_id, "score": score, "n_events": n_events,
        }])

    def close(self) -> None:
        pass


def decayed_engagement_stream(events: DataFrame) -> DataFrame:
    """Wire the processor onto a (streaming or batch) events frame."""
    return (events.select("user_id", "ts", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=DecayedEngagementProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


def run_decayed_engagement_batchlike(spark, directory: str,
                                     query_name: str = "decay_stateful"):
    """Drain the event files through the stateful operator (availableNow,
    memory sink); returns the latest per-user rows."""
    from . import events as ev
    stream = decayed_engagement_stream(ev.read_events_stream(spark, directory))
    q = (stream.writeStream.format("memory").queryName(query_name)
               .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    sink = spark.table(query_name)
    # update mode emits one row per key per batch; keep the last
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (sink.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1).drop("__rn"))
