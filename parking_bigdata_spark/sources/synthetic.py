"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events generator with real partition
parallelism and source-side filter pushdown.

Why it exists: the engine's other inputs are files; this is the
"connector" surface — the same API you'd use to wrap a REST endpoint,
a message queue, or an internal record service as a first-class Spark
table. The generator shape mirrors the driver testdata's `events`
table, so every downstream operator composes with it.

Scale design:
- One `InputPartition` per requested split; each partition seeds its
  own RNG (seed + partition id) so the output is deterministic AND
  embarrassingly parallel — no cross-partition coordination, no
  driver-side data.
- Rows are emitted as Arrow RecordBatches (the vectorized path), not
  per-row Python tuples.
- `pushFilters` handles `event_type = '...'` at generation time, so a
  filtered scan never materializes non-matching rows (the Python-source
  analogue of parquet predicate pushdown).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    Filter, InputPartition)

EVENT_TYPES = ["view", "cart", "purchase", "refund"]
_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
           "event_type string, value double")


class _Part(InputPartition):
    def __init__(self, pid: int, rows: int, seed: int,
                 event_type: str | None):
        self.pid = pid
        self.rows = rows
        self.seed = seed
        self.event_type = event_type


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("partitions", "8"))
        self.rows_per_partition = int(options.get("rows_per_partition", "1000"))
        self.seed = int(options.get("seed", "7"))
        self.event_type: str | None = None

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if (isinstance(f, EqualTo) and f.attribute == ("event_type",)
                    and isinstance(f.value, str)):
                self.event_type = f.value
            else:
                yield f  # everything else stays a Spark-side filter

    def partitions(self):
        return [_Part(i, self.rows_per_partition, self.seed, self.event_type)
                for i in range(self.n_partitions)]

    def read(self, partition: _Part) -> Iterator:
        import numpy as np
        import pyarrow as pa

        rng = np.random.RandomState(partition.seed + partition.pid)
        n = partition.rows
        base = np.int64(1704067200) * 1_000_000  # 2024-01-01 UTC, µs
        event_id = partition.pid * np.int64(n) + np.arange(n, dtype=np.int64)
        ts_us = base + rng.randint(0, 30 * 86400 * 10**6, size=n)
        user_id = rng.randint(0, 1000, size=n).astype(np.int64)
        etype = np.array(EVENT_TYPES)[rng.randint(0, len(EVENT_TYPES), size=n)]
        value = np.round(rng.uniform(0, 100, size=n), 4)
        if partition.event_type is not None:
            # pushed-down filter: drop rows at the generator, after the
            # RNG draws, so filtered output is a strict subset of the
            # unfiltered run (determinism is observable in tests)
            mask = etype == partition.event_type
            event_id, ts_us, user_id = event_id[mask], ts_us[mask], user_id[mask]
            etype, value = etype[mask], value[mask]
        yield pa.RecordBatch.from_arrays(
            [pa.array(event_id),
             pa.array(ts_us).cast(pa.timestamp("us")),
             pa.array(user_id),
             pa.array(etype),
             pa.array(value)],
            names=["event_id", "ts", "user_id", "event_type", "value"])


class SyntheticEventsStreamReader:
    """Streaming half of the connector surface (Spark 4
    ``SimpleDataSourceStreamReader``): micro-batches of deterministic
    events keyed by a monotonically increasing batch offset.

    Exactly-once contract: the offset IS the generator seed input, so
    ``readBetweenOffsets`` (replay after restart) regenerates the same
    rows bit-for-bit — the source-side half of end-to-end exactly-once,
    no log or cache needed. Lazy import keeps the batch reader usable
    on Spark builds without the streaming Python-source API.
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", "50"))
        self.seed = int(options.get("seed", "7"))

    def initialOffset(self):
        return {"batch": 0}

    def _rows(self, batch: int):
        import datetime

        import numpy as np
        rng = np.random.RandomState(self.seed + batch)
        n = self.rows_per_batch
        base = 1704067200  # 2024-01-01 UTC, seconds
        for i in range(n):
            ts = datetime.datetime.fromtimestamp(
                base + batch * 3600 + int(rng.randint(0, 3600)),
                tz=datetime.timezone.utc)
            yield (batch * n + i, ts, int(rng.randint(0, 1000)),
                   EVENT_TYPES[int(rng.randint(0, len(EVENT_TYPES)))],
                   round(float(rng.uniform(0, 100)), 4))

    def read(self, start):
        b = start["batch"]
        # a LIST, not a generator: Spark's prefetching cache copy.copy()s
        # the returned iterator, and generators aren't copyable
        return list(self._rows(b)), {"batch": b + 1}

    def readBetweenOffsets(self, start, end):
        # the replay path wants a true ITERATOR (list →
        # DATA_SOURCE_INVALID_RETURN_TYPE), unlike read()'s prefetch
        # path which needs a copyable one
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(self._rows(b))
        return iter(rows)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Register the source; afterwards
    ``spark.read.format("synthetic_events").load()`` works anywhere.
    Python-source filter pushdown is opt-in (set at runtime here so the
    build driver's own session gets it too, like io.load_table's conf
    hardening)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
