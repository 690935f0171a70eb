"""Feature-engineering operators: binning/clamping, ratios, pivot-wider.

Reference parity: 전용면적 rounding to the tens digit with 10/100 clamps
(20210803_이승하.R:290-296), ratio features 세대당주차면수 /
실거주당주차등록 (R:421-424), ordinal bucketing of 버스정류장수
(R:431-434), and the zero-filled pivot-wider of household counts by area
band (R:300-310).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_clamp(df: DataFrame, col: str, out_col: str, scale: int = -1,
              lo: float | None = None, hi: float | None = None) -> DataFrame:
    """round(col, scale) then clamp to [lo, hi] — R:292-296.
    ``least``/``greatest`` keep it in codegen (R's pmin/pmax).
    """
    e = F.round(F.col(col), scale)
    if hi is not None:
        e = F.least(e, F.lit(hi))
    if lo is not None:
        e = F.greatest(e, F.lit(lo))
    return df.withColumn(out_col, e)


def ordinal_bucket(df: DataFrame, col: str, out_col: str,
                   edges: list[float]) -> DataFrame:
    """Ordinal bucketing by explicit right-open edges (R:431-434's nested
    ifelse ladder). Expressed as a chain of ``when`` — one codegen'd
    expression, no UDF, no Bucketizer ML dependency.
    """
    e = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        e = F.when(F.col(col) < F.lit(edges[i]), F.lit(i)).otherwise(e)
    return df.withColumn(out_col, e.cast("int"))


def with_ratio(df: DataFrame, out_col: str, num: str, den,
               round_to: int | None = None) -> DataFrame:
    """Ratio feature num/den (R:421-424). ``den`` may be a column name or
    a Column expression (e.g. 총세대수 - 공가수). NULL on zero denominator
    (Spark division semantics already yield NULL for 0/0 with nullable
    doubles; we guard explicitly for exact-zero).
    """
    den_col = F.col(den) if isinstance(den, str) else den
    e = F.when(den_col != 0, F.col(num) / den_col)
    if round_to is not None:
        e = F.round(e, round_to)
    return df.withColumn(out_col, e)


def pivot_wider(df: DataFrame, id_col: str, names_from: str,
                values_from: str, values: list, agg: str = "sum",
                fill_value=0, prefix: str = "") -> DataFrame:
    """groupBy().pivot(names_from, values) with zero fill — the
    reference's ``pivot_wider(values_fill = 0)`` (R:300-310).

    Pinning ``values`` matters at scale: without it Spark runs an extra
    distinct-values job over the whole fact table. Output columns are
    ``{prefix}{value}`` zero-padded order-stable like R's names_glue.
    """
    agg_fn = getattr(F, agg)
    pv = (df.groupBy(id_col)
            .pivot(names_from, values)
            .agg(agg_fn(F.col(values_from))))
    out = pv
    for v in values:
        new = f"{prefix}{v}"
        out = out.withColumnRenamed(str(v), new) if str(v) != new else out
        out = out.withColumn(new, F.coalesce(F.col(new), F.lit(fill_value)))
    return out
