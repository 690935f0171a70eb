"""Temporal operators: as-of join, rolling windows, cumulative analytics.

The as-of join (match each left row to the most recent right row at or
before its timestamp, per key) is an operator Spark lacks natively.
The scalable formulation here is union + single keyed window — NOT a
per-row subquery or a range cross-join:

  1. tag right rows 0, left rows 1; union on (key, ts, tag, payload)
  2. one window over (key) ordered by (ts, tag):
     ``last_value(payload, ignoreNulls)`` carries the latest right
     payload forward onto every left row
  3. keep left rows

One shuffle on the key, linear scan within partitions — the same cost
profile as a groupBy, regardless of how many right rows precede each
left row. Equal timestamps match (right sorts before left at ties),
matching ANSI/DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str], suffix: str = "_right") -> DataFrame:
    """Left as-of join: every ``left`` row + the most recent ``right``
    payload with ``right.ts <= left.ts`` for the same key (NULL when no
    prior right row exists)."""
    left_cols = left.columns
    rtypes = dict(right.dtypes)
    # the payload travels as ONE struct: last(struct, ignoreNulls) then
    # picks the most recent right ROW as a unit. Carrying each payload
    # column separately would (a) skip a genuinely-NULL field of the
    # newest row and surface a stale older value, and (b) stitch fields
    # from different right rows into a row that never existed.
    payload_struct_type = ("struct<" + ",".join(
        f"{c}:{rtypes[c]}" for c in payload_cols) + ">")
    l = left.select(
        F.col(key), F.col(ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
        F.lit(None).cast(payload_struct_type).alias("__p"))
    r = right.select(
        F.col(key), F.col(ts).alias("__ts"), F.lit(0).alias("__tag"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"))
    u = l.unionByName(r)
    w = (Window.partitionBy(key).orderBy("__ts", "__tag")
               .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        "__tag", "__lrow",
        F.last(F.col("__p"), ignorenulls=True).over(w).alias("__f"))
    out = filled.where(F.col("__tag") == 1)
    sel = [F.col(f"__lrow.{c}").alias(c) for c in left_cols]
    sel += [F.col(f"__f.{c}").alias(f"{c}{suffix}" if c in left_cols else c)
            for c in payload_cols]
    return out.select(*sel)


def rolling_agg(df: DataFrame, key: str, order_cols: list[str],
                value_col: str, n_rows: int = 5,
                aggs: tuple[str, ...] = ("avg",)) -> DataFrame:
    """Row-based rolling aggregates over the trailing ``n_rows`` window
    per key — the streaming-friendly moving average (R's rolling EDA
    views). One shuffle on the key."""
    w = (Window.partitionBy(key).orderBy(*order_cols)
               .rowsBetween(-(n_rows - 1), 0))
    out = df
    for a in aggs:
        out = out.withColumn(f"rolling_{a}_{value_col}",
                             F.round(getattr(F, a)(value_col).over(w), 4))
    return out


def cumulative_sum(df: DataFrame, key: str, order_cols: list[str],
                   value_col: str, out_col: str = "cum_sum") -> DataFrame:
    """Per-key running total ordered by ``order_cols`` (cumulative spend
    analytics). One shuffle on the key."""
    w = (Window.partitionBy(key).orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col, F.round(F.sum(value_col).over(w), 4))
