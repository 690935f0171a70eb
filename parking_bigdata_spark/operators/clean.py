"""Cleaning / imputation operators.

Reference parity: NA→0 fills (20210803_이승하.R:352,358), median
imputation (R:942-943), and the per-complex household-weighted mean
imputation of 임대보증금/임대료 (R:923-940).

Scale notes: imputation never self-joins the fact table. Group
statistics ride a window function (same shuffle as the group key) or a
broadcast of a tiny aggregate; global statistics are computed once and
injected as literals via crossJoin of a 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_constant(df: DataFrame, cols: dict[str, float]) -> DataFrame:
    """NULL → constant (R:352,358 fills 지하철역수/버스정류장수 with 0).
    Pure ``coalesce`` — codegen, zero extra passes.
    """
    out = df
    for c, v in cols.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def impute_median(df: DataFrame, col: str, out_col: str | None = None,
                  exact: bool = True) -> DataFrame:
    """NULL → column median (R:942-943).

    exact=True uses ``median()`` (sort-based, fine into the billions of
    rows for a single column); at extreme scale flip to
    ``approx_percentile(col, 0.5)`` — one streaming sketch pass.
    The single median value is a 1-row aggregate crossJoined back
    (Spark broadcasts 1-row relations), NOT collected to Python.
    """
    out_col = out_col or col
    med_expr = (F.median(F.col(col)) if exact
                else F.percentile_approx(F.col(col), 0.5))
    med = df.agg(med_expr.alias("__med"))
    return (df.crossJoin(F.broadcast(med))
              .withColumn(out_col, F.coalesce(F.col(col), F.col("__med")))
              .drop("__med"))


def impute_group_weighted_mean(df: DataFrame, group_col: str, col: str,
                               weight_col: str,
                               out_col: str | None = None) -> DataFrame:
    """NULL → group-level weighted mean, sum(x*w)/sum(w) over the group
    (the reference's per-단지코드 rent/deposit fill, R:923-940).

    The group stats come from a map-side-combined aggregate (groups-
    sized output) broadcast back onto the fact — NOT an unordered
    window over the group key: a window still routes every row of a
    group through ONE WindowExec task, which serializes low-cardinality
    groups at scale. The fact is never self-joined and never shuffles
    for the fill. Rows where the whole group is NULL stay NULL (caller
    can chain ``impute_median`` as the reference does at R:941-944).
    """
    out_col = out_col or col
    stats = (df.where(F.col(col).isNotNull())
               .groupBy(group_col)
               .agg((F.sum(F.col(col) * F.col(weight_col))
                     / F.sum(weight_col)).alias("__gwm"))
               .withColumnRenamed(group_col, "__gk"))
    # eqNullSafe: a NULL group key forms its own group (matching the
    # window/groupBy semantics the reference implies) instead of never
    # matching and silently staying NULL. No broadcast hint: group-key
    # cardinality is data-dependent, so let AQE pick broadcast vs
    # shuffle from actual stats (ADVICE r01).
    return (df.join(stats, F.col(group_col).eqNullSafe(F.col("__gk")),
                    "left")
              .withColumn(out_col, F.coalesce(F.col(col), F.col("__gwm")))
              .drop("__gwm", "__gk"))


def chained_regression_impute(df: DataFrame, a: str, b: str,
                              n_iter: int = 2):
    """Deterministic MICE-style chained-equation imputation (the
    reference loads ``mice``, 20210803_이승하.R:59): two columns with
    missingness impute each other through alternating regressions —
    mean-fill init, then per half-iteration regress the observed values
    of one column on the CURRENT filled partner and fill its missing
    entries from the fit. The classic mice posterior-noise draw is
    omitted (deterministic = oracle-checkable); this is the
    regression-imputation / EM-flavored variant.

    Scale shape: every half-iteration is ONE fused aggregate (count,
    sums, products — map-side combined) whose two scalar coefficients
    fold into the next fill expression as literals. The fact table
    never shuffles and nothing but k scalars ever reaches the driver.

    Returns (df_with_filled_columns, fill expressions are materialized
    as ``<col>_filled``).
    """
    ma, mb = df.agg(F.avg(a), F.avg(b)).collect()[0]
    if ma is None or mb is None:
        raise ValueError(
            f"chained_regression_impute needs observed values in both "
            f"columns; {a if ma is None else b} is entirely NULL")
    cur_a = F.coalesce(F.col(a), F.lit(float(ma)))
    cur_b = F.coalesce(F.col(b), F.lit(float(mb)))

    def _fit(target: str, partner_expr):
        # nullif: a zero-variance (constant) partner has no defined
        # slope — fall back to the mean fill (slope 0) instead of an
        # ANSI divide-by-zero inside the aggregate
        r = (df.where(F.col(target).isNotNull())
               .select(F.col(target).alias("__t"), partner_expr.alias("__p"))
               .agg((F.covar_pop("__p", "__t")
                     / F.nullif(F.var_pop("__p"), F.lit(0.0))).alias("s"),
                    F.avg("__t").alias("mt"), F.avg("__p").alias("mp"))
               .collect()[0])
        slope = 0.0 if r["s"] is None else float(r["s"])
        return slope, float(r["mt"]), float(r["mp"])

    for _ in range(n_iter):
        s1, mt, mp = _fit(a, cur_b)
        cur_a = F.coalesce(
            F.col(a), F.lit(mt) + F.lit(s1) * (cur_b - F.lit(mp)))
        s2, mt, mp = _fit(b, cur_a)
        cur_b = F.coalesce(
            F.col(b), F.lit(mt) + F.lit(s2) * (cur_a - F.lit(mp)))
    return (df.withColumn(f"{a}_filled", cur_a)
              .withColumn(f"{b}_filled", cur_b))
