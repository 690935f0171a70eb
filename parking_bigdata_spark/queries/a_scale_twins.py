"""Query registry — a_scale_twins module (round-5 VERDICT asks #2/#3):
approx 100 TB scale twins for the rank-statistic family.

The exact forms (A56 spearman, A102 ROC-AUC, A18d Kruskal-Wallis,
A18f Mann-Whitney, A79 Gini, A63 MAD) all ride the exact
distinct-value table (`operators/stats.tie_avg_ranks`) — O(distinct
values) state, which is O(rows) on a continuous column at 100 TB.
Each twin here re-expresses the SAME statistic on a fixed
``_TWIN_GRID``-bucket uniform grid (the A18gb recipe,
queries/a_stats.py:1022): state is grid-bounded by construction, every
window runs over ≤ G (or k·G) rows, and the bin rule is plain IEEE
arithmetic both engines reproduce bit-identically — so five of the six
carry FULL value-level DuckDB oracles. The results are the exact
statistics OF THE BINNED DATA (legitimate tie-adjusted forms,
converging to the exact ones as G grows); where the binning admits a
closed bracket (ROC-AUC, Mann-Whitney U: cross-bucket pairs are
provably strictly ordered, within-bucket pairs are the only unknown)
the output carries the PROOF bracket and tests assert the exact value
lands inside it. The MAD twin is the one sketch-based member
(percentile_approx/GK — engine-specific estimates); since round 8 its
REGISTERED form carries the B31 bound-as-oracle contract (exact audit
columns + containment booleans, DuckDB-hash-checked — see the round-8
section at the end of this module) while the `_detail` form keeps the
GK estimates and is bound-asserted against the exact A63 at two SFs in
tests/test_round5.py.

Reference parity: these formalize the scale path for R's
``cor(method="spearman")`` companion to L388 and the nonparametric
tests around L700-775 (20210803_이승하.R), per the r04 verdict's #2/#3
next-round asks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import stats

#: One grid constant for the whole family — 256 edges hold every
#: binned statistic within ~1% of its exact form at the driver SFs
#: (asserted in tests/test_round5.py) while bounding shuffle/window
#: state at 256 (or k·256) rows regardless of data size.
_TWIN_GRID = 256


def _bucket_expr(v, mn, mx, G: int):
    """The shared engine-reproducible bin rule: floor((v-mn)/(mx-mn)*G)
    clamped to [0, G-1], bucket 0 when the column is constant. Written
    with the same operator order as the SQL oracles so both engines
    bin bit-identically."""
    raw = F.floor((v - mn) / (mx - mn) * G)
    return (F.when(mx > mn,
                   F.least(F.lit(G - 1), F.greatest(F.lit(0), raw)))
             .otherwise(F.lit(0))).cast("int")


_BUCKET_SQL = ("CASE WHEN {mx} > {mn} THEN CAST(least({gm1}, greatest(0, "
               "floor(({v} - {mn}) / ({mx} - {mn}) * {g}))) AS INT) "
               "ELSE 0 END")


def _sql_bucket(v: str, mn: str, mx: str, G: int) -> str:
    return _BUCKET_SQL.format(v=v, mn=mn, mx=mx, g=G, gm1=G - 1)


# --------------------------------------------------------------------------
# A56b. Approx Spearman on a fixed uniform grid (100 TB path for A56):
# both axes bin to G buckets, the G×G contingency cells carry the
# counts, and rho is the weighted Pearson correlation of the buckets'
# tie-averaged ranks — exactly Spearman of the DISCRETIZED pair.
# State: ≤ G² cells + two ≤ G-row marginal rank tables (broadcast);
# the only windows run over ≤ G rows. The exact A56's rank tables are
# O(distinct values) = O(rows) on these near-unique columns.
# --------------------------------------------------------------------------

def spearman_approx_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    G = _TWIN_GRID
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_quantity").cast("double").alias("x"),
                  F.col("l_extendedprice").cast("double").alias("y"))
    mm = d.agg(F.min("x").alias("xmn"), F.max("x").alias("xmx"),
               F.min("y").alias("ymn"), F.max("y").alias("ymx"))
    # 1-row frame feeding the bin join — materialize once
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = d.crossJoin(F.broadcast(mm))
    bx = _bucket_expr(F.col("x"), F.col("xmn"), F.col("xmx"), G)
    by = _bucket_expr(F.col("y"), F.col("ymn"), F.col("ymx"), G)
    cells = (j.groupBy(bx.alias("bx"), by.alias("by"))
               .agg(F.count(F.lit(1)).alias("w"))
               .localCheckpoint(eager=True))

    def marg_ranks(bcol: str, alias: str) -> DataFrame:
        # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction —
        # the plan-hygiene allowlist admits it as a non-data-sized
        # window key
        m = (cells.groupBy(F.col(bcol).alias("__gbkt"))
                  .agg(F.sum("w").alias("t")))
        w = Window.orderBy("__gbkt").rowsBetween(
            Window.unboundedPreceding, 0)
        return m.select(F.col("__gbkt").alias(bcol),
                        (F.sum("t").over(w) - (F.col("t") - 1) / 2.0)
                        .alias(alias))

    jj = (cells.join(F.broadcast(marg_ranks("bx", "r_x")), "bx")
               .join(F.broadcast(marg_ranks("by", "r_y")), "by"))
    # weighted Pearson over the ≤ G² cells; doubles BEFORE the products
    # (w·r² would overflow int64 in the 100 TB regime)
    wd = F.col("w").cast("double")
    agg = jj.agg(F.sum("w").alias("n"),
                 F.sum(wd * F.col("r_x")).alias("sx"),
                 F.sum(wd * F.col("r_y")).alias("sy"),
                 F.sum(wd * F.col("r_x") * F.col("r_x")).alias("sxx"),
                 F.sum(wd * F.col("r_y") * F.col("r_y")).alias("syy"),
                 F.sum(wd * F.col("r_x") * F.col("r_y")).alias("sxy"))
    nd = F.col("n").cast("double")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / nd
    # nullif: a CONSTANT axis has zero rank variance — rho is
    # undefined and must come back NULL, not an ANSI DIVIDE_BY_ZERO
    # job abort (the loess_curve precedent; caught by the round-6
    # degenerate-input test)
    den = F.nullif(
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / nd)
               * (F.col("syy") - F.col("sy") * F.col("sy") / nd)),
        F.lit(0.0))
    return agg.select(F.col("n").cast("long").alias("n_rows"),
                      F.lit(G).alias("grid_size"),
                      F.round(num / den, 4).alias("spearman_rho_approx"))

SPEARMAN_APPROX_SQL = f"""
WITH d AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
), mm AS (
  SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx
  FROM d
), cells AS (
  SELECT {_sql_bucket('x', 'xmn', 'xmx', _TWIN_GRID)} AS bx,
         {_sql_bucket('y', 'ymn', 'ymx', _TWIN_GRID)} AS by,
         count(*) AS w
  FROM d CROSS JOIN mm GROUP BY 1, 2
), rx AS (
  SELECT bx,
         sum(sum(w)) OVER (ORDER BY bx ROWS UNBOUNDED PRECEDING)
           - (sum(w) - 1) / 2.0 AS r_x
  FROM cells GROUP BY bx
), ry AS (
  SELECT by,
         sum(sum(w)) OVER (ORDER BY by ROWS UNBOUNDED PRECEDING)
           - (sum(w) - 1) / 2.0 AS r_y
  FROM cells GROUP BY by
), jj AS (
  SELECT CAST(w AS DOUBLE) AS w, r_x, r_y
  FROM cells JOIN rx USING (bx) JOIN ry USING (by)
)
SELECT CAST(sum(w) AS BIGINT) AS n_rows,
       {_TWIN_GRID} AS grid_size,
       round((sum(w * r_x * r_y) - sum(w * r_x) * sum(w * r_y) / sum(w))
             / nullif(sqrt((sum(w * r_x * r_x)
                            - sum(w * r_x) * sum(w * r_x) / sum(w))
                           * (sum(w * r_y * r_y)
                              - sum(w * r_y) * sum(w * r_y) / sum(w))),
                      0), 4)
         AS spearman_rho_approx
FROM jj
"""


# --------------------------------------------------------------------------
# A102b. Approx ROC-AUC on a fixed uniform grid (100 TB path for
# A102): scores bin to G buckets; cross-bucket (pos, neg) pairs are
# PROVABLY strictly ordered (a higher bucket's values all exceed a
# lower bucket's), only within-bucket pairs are unknown — so the
# output carries the proof bracket [auc_lo, auc_hi] that must contain
# the exact AUC (asserted at two SFs), with the tie-averaged midpoint
# as the estimate. One bounded groupBy + one ≤ G-row window.
# --------------------------------------------------------------------------

def _roc_grid(d: DataFrame, G: int) -> DataFrame:
    """Grid-binned ROC core over a (pos, v) frame — parametrized by G
    so the [auc_lo, auc_hi] bracket theorem is testable on coarse
    grids where the bracket is genuinely wide
    (tests/test_round6.py randomized containment tests)."""
    spark = d.sparkSession
    mm = d.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = d.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy(b.alias("__gbkt"))
              .agg(F.sum("pos").alias("f1"),
                   F.sum(1 - F.col("pos")).alias("f0")))
    # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = Window.orderBy("__gbkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select("f1", "f0", F.sum("f0").over(w).alias("c0"))
    f1d, f0d = F.col("f1").cast("double"), F.col("f0").cast("double")
    agg = cum.agg(F.sum("f1").alias("np"), F.sum("f0").alias("nn"),
                  F.sum(f1d * (F.col("c0").cast("double") - f0d))
                   .alias("lo_pairs"),
                  F.sum(f1d * f0d).alias("tie_pairs"))
    # nullif: a single-class input (no positives or no negatives) has
    # no (pos, neg) pairs — AUC undefined, NULL not a job abort
    den = F.nullif(F.col("np").cast("double") * F.col("nn").cast("double"),
                   F.lit(0.0))
    auc_lo = F.col("lo_pairs") / den
    auc_mid = (F.col("lo_pairs") + 0.5 * F.col("tie_pairs")) / den
    auc_hi = (F.col("lo_pairs") + F.col("tie_pairs")) / den
    return agg.select(F.col("np").cast("long").alias("n_pos"),
                      F.col("nn").cast("long").alias("n_neg"),
                      F.lit(G).alias("grid_size"),
                      F.round(auc_mid, 4).alias("auc_approx"),
                      F.round(auc_lo, 4).alias("auc_lo"),
                      F.round(auc_hi, 4).alias("auc_hi"),
                      F.round(2 * auc_mid - 1, 4).alias("gini_approx"))


def roc_auc_approx_order_status(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.select((F.col("o_orderstatus") == "F").cast("int").alias("pos"),
                 F.col("o_totalprice").cast("double").alias("v"))
    return _roc_grid(d, _TWIN_GRID)


ROC_AUC_APPROX_SQL = f"""
WITH d AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM orders
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM d),
cells AS (
  SELECT {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         sum(pos) AS f1, sum(1 - pos) AS f0
  FROM d CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT f1, f0,
         sum(f0) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS c0
  FROM cells
), agg AS (
  SELECT CAST(sum(f1) AS BIGINT) AS np, CAST(sum(f0) AS BIGINT) AS nn,
         sum(CAST(f1 AS DOUBLE) * (CAST(c0 AS DOUBLE)
                                   - CAST(f0 AS DOUBLE))) AS lo_pairs,
         sum(CAST(f1 AS DOUBLE) * CAST(f0 AS DOUBLE)) AS tie_pairs
  FROM cum
)
SELECT np AS n_pos, nn AS n_neg, {_TWIN_GRID} AS grid_size,
       round((lo_pairs + 0.5 * tie_pairs)
             / nullif(CAST(np AS DOUBLE) * CAST(nn AS DOUBLE), 0), 4)
         AS auc_approx,
       round(lo_pairs / nullif(CAST(np AS DOUBLE) * CAST(nn AS DOUBLE), 0),
             4) AS auc_lo,
       round((lo_pairs + tie_pairs)
             / nullif(CAST(np AS DOUBLE) * CAST(nn AS DOUBLE), 0), 4)
         AS auc_hi,
       round(2 * ((lo_pairs + 0.5 * tie_pairs)
                  / nullif(CAST(np AS DOUBLE) * CAST(nn AS DOUBLE), 0))
             - 1, 4) AS gini_approx
FROM agg
"""


# --------------------------------------------------------------------------
# A18db. Approx Kruskal-Wallis on a fixed uniform grid (100 TB path
# for A18d): the SAME tie-corrected H closed form, with each bucket's
# total count playing the tie-run role — H of the binned data. State:
# k·G cells + one ≤ G-row rank window; the exact A18d's distinct-value
# table is O(rows) on a continuous column. Cubes promoted to double
# BEFORE the product (a bucket can hold ~1e12 rows at 100 TB; 1e36
# overflows int64, doubles carry the ratio fine).
# --------------------------------------------------------------------------

def kruskal_approx_acctbal_by_segment(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    G = _TWIN_GRID
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_mktsegment",
                    F.col("c_acctbal").cast("double").alias("v"))
            .where(F.col("v").isNotNull()))
    mm = cust.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = cust.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy("c_mktsegment", b.alias("__gbkt"))
               .agg(F.count(F.lit(1)).alias("f"))
               .localCheckpoint(eager=True))
    buckets = cells.groupBy("__gbkt").agg(F.sum("f").alias("l"))
    # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = Window.orderBy("__gbkt").rowsBetween(Window.unboundedPreceding, 0)
    ranked = buckets.select(
        "__gbkt", "l",
        (F.sum("l").over(w) - (F.col("l") - 1) / 2.0).alias("r"))
    grp = (cells.join(F.broadcast(ranked.select("__gbkt", "r")), "__gbkt")
                .groupBy("c_mktsegment")
                .agg(F.sum(F.col("r") * F.col("f")).alias("rg"),
                     F.sum("f").alias("ng")))
    tot = grp.agg(F.sum("ng").alias("n"), F.count(F.lit(1)).alias("k"),
                  F.sum(F.col("rg") * F.col("rg") / F.col("ng"))
                   .alias("s"))
    ld = F.col("l").cast("double")
    ties = ranked.agg(F.sum(ld * ld * ld - ld).alias("tie3"))
    n, k, s, tie3 = F.col("n"), F.col("k"), F.col("s"), F.col("tie3")
    nd = n.cast("double")
    # nullif: an ALL-TIED input (constant column => one occupied
    # bucket) drives the tie correction to exactly 1 - 1 = 0 — H is
    # undefined there and must come back NULL, not an ANSI
    # DIVIDE_BY_ZERO job abort
    h = ((F.lit(12.0) * s / (nd * (nd + 1)) - 3 * (nd + 1))
         / F.nullif(1 - tie3 / F.nullif(nd * nd * nd - nd, F.lit(0.0)),
                    F.lit(0.0)))
    return tot.crossJoin(ties).select(
        n.cast("long").alias("n"), k.cast("long").alias("k"),
        F.lit(G).alias("grid_size"),
        F.round(h, 4).alias("h_stat_approx"))

KRUSKAL_APPROX_SQL = f"""
WITH c AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM c),
cells AS (
  SELECT c_mktsegment, {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         count(*) AS f
  FROM c CROSS JOIN mm GROUP BY 1, 2
), buckets AS (
  SELECT b, sum(f) AS l,
         sum(sum(f)) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
           - (sum(f) - 1) / 2.0 AS r
  FROM cells GROUP BY b
), grp AS (
  SELECT c_mktsegment, sum(r * f) AS rg, CAST(sum(f) AS BIGINT) AS ng
  FROM cells JOIN buckets USING (b) GROUP BY 1
), tot AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, count(*) AS k,
         sum(rg * rg / ng) AS s
  FROM grp
), ties AS (
  SELECT sum(CAST(l AS DOUBLE) * CAST(l AS DOUBLE) * CAST(l AS DOUBLE)
             - CAST(l AS DOUBLE)) AS tie3
  FROM buckets
)
SELECT n, CAST(k AS BIGINT) AS k, {_TWIN_GRID} AS grid_size,
       round((12.0 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1))
              - 3 * (CAST(n AS DOUBLE) + 1))
             / nullif(1 - tie3 / nullif(CAST(n AS DOUBLE) * n * n - n, 0),
                      0), 4) AS h_stat_approx
FROM tot, ties
"""


# --------------------------------------------------------------------------
# A18fb. Approx Mann-Whitney U on a fixed uniform grid (100 TB path
# for A18f): U by pair counting over the binned arms — cross-bucket
# pairs are strictly ordered (see A102b; U and AUC share the
# Hanley-McNeil identity), so [u_lo, u_hi] is a proof bracket for the
# exact strict-pair count and u_approx is the tie-averaged binned U
# (identical to the rank formula on binned data). z uses the standard
# tie correction with bucket totals as tie runs.
# --------------------------------------------------------------------------

def _mw_grid(d: DataFrame, G: int, n1_alias: str = "n1",
             n2_alias: str = "n2") -> DataFrame:
    """Grid-binned Mann-Whitney core over an (i1, v) frame —
    parametrized by G so the [u_lo, u_hi] bracket theorem is testable
    on coarse grids (tests/test_round6.py)."""
    spark = d.sparkSession
    mm = d.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = d.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy(b.alias("__gbkt"))
              .agg(F.sum("i1").alias("f1"),
                   F.sum(1 - F.col("i1")).alias("f2")))
    # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = Window.orderBy("__gbkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select("f1", "f2", F.sum("f2").over(w).alias("c2"))
    f1d, f2d = F.col("f1").cast("double"), F.col("f2").cast("double")
    ld = f1d + f2d
    agg = cum.agg(F.sum("f1").alias("n1"), F.sum("f2").alias("n2"),
                  F.sum(f1d * (F.col("c2").cast("double") - f2d))
                   .alias("u_lo"),
                  F.sum(f1d * f2d).alias("tie_pairs"),
                  F.sum(ld * ld * ld - ld).alias("tie3"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    u_mid = F.col("u_lo") + 0.5 * F.col("tie_pairs")
    mu = n1d * n2d / 2.0
    sig2 = (n1d * n2d / 12.0) * ((nd + 1)
                                 - F.col("tie3") / (nd * (nd - 1)))
    # nullif: an all-tied input zeroes the tie-corrected variance —
    # z undefined => NULL, not an ANSI DIVIDE_BY_ZERO job abort
    return agg.select(F.col("n1").cast("long").alias(n1_alias),
                      F.col("n2").cast("long").alias(n2_alias),
                      F.lit(G).alias("grid_size"),
                      F.round(u_mid, 4).alias("u_approx"),
                      F.round(F.col("u_lo"), 4).alias("u_lo"),
                      F.round(F.col("u_lo") + F.col("tie_pairs"), 4)
                       .alias("u_hi"),
                      F.round((u_mid - mu)
                              / F.nullif(F.sqrt(sig2), F.lit(0.0)), 4)
                       .alias("z_approx"))


def mannwhitney_approx_order_value(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    g1, g2 = "1-URGENT", "5-LOW"
    o = load_table(spark, sf_dir, "orders")
    d = (o.where(F.col("o_orderpriority").isin(g1, g2))
          .select((F.col("o_orderpriority") == g1).cast("int").alias("i1"),
                  F.col("o_totalprice").cast("double").alias("v")))
    return _mw_grid(d, _TWIN_GRID, "n_urgent", "n_low")


MANNWHITNEY_APPROX_SQL = f"""
WITH d AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS i1,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM d),
cells AS (
  SELECT {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         sum(i1) AS f1, sum(1 - i1) AS f2
  FROM d CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT f1, f2,
         sum(f2) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS c2
  FROM cells
), agg AS (
  SELECT CAST(sum(f1) AS BIGINT) AS n1, CAST(sum(f2) AS BIGINT) AS n2,
         sum(CAST(f1 AS DOUBLE) * (CAST(c2 AS DOUBLE)
                                   - CAST(f2 AS DOUBLE))) AS u_lo,
         sum(CAST(f1 AS DOUBLE) * CAST(f2 AS DOUBLE)) AS tie_pairs,
         sum((CAST(f1 AS DOUBLE) + CAST(f2 AS DOUBLE))
             * (CAST(f1 AS DOUBLE) + CAST(f2 AS DOUBLE))
             * (CAST(f1 AS DOUBLE) + CAST(f2 AS DOUBLE))
             - (CAST(f1 AS DOUBLE) + CAST(f2 AS DOUBLE))) AS tie3
  FROM cum
)
SELECT n1 AS n_urgent, n2 AS n_low, {_TWIN_GRID} AS grid_size,
       round(u_lo + 0.5 * tie_pairs, 4) AS u_approx,
       round(u_lo, 4) AS u_lo,
       round(u_lo + tie_pairs, 4) AS u_hi,
       round((u_lo + 0.5 * tie_pairs
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / nullif(sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                    * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                       - tie3 / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                 * (CAST(n1 AS DOUBLE)
                                    + CAST(n2 AS DOUBLE) - 1)))), 0), 4)
         AS z_approx
FROM agg
"""


# --------------------------------------------------------------------------
# A79b. Approx per-segment Gini on a fixed uniform grid (100 TB path
# for A79): per-(segment, bucket) cells keep the EXACT value sums; the
# only approximation is rank coarsening — every value in a bucket gets
# the bucket's tie-averaged within-segment rank. Gini's rank formula
# then runs on k·G cells, with per-segment cumulative windows over ≤ G
# rows each (the window INPUT is grid-bounded, so the low-cardinality
# partition trap the exact form dodges via tie_avg_ranks_by_group
# cannot bite). Full value-level oracle.
# --------------------------------------------------------------------------

def gini_approx_acctbal_by_segment(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    G = _TWIN_GRID
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_mktsegment",
                    F.col("c_acctbal").cast("double").alias("v"))
            .where(F.col("v") > 0))
    mm = cust.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = cust.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy("c_mktsegment", b.alias("__gbkt"))
               .agg(F.count(F.lit(1)).alias("f"),
                    F.sum("v").alias("sx")))
    # per-segment cumulative rank over the ≤ G-row grid (bounded input)
    w = (Window.partitionBy("c_mktsegment").orderBy("__gbkt")
               .rowsBetween(Window.unboundedPreceding, 0))
    ranked = cells.withColumn(
        "r", F.sum("f").over(w) - (F.col("f") - 1) / 2.0)
    per = (ranked.groupBy("c_mktsegment")
                 .agg(F.sum("f").alias("n"), F.sum("sx").alias("sv"),
                      F.sum(F.col("r") * F.col("sx")).alias("srx")))
    nd = F.col("n").cast("double")
    return per.select(
        "c_mktsegment", F.col("n").cast("long").alias("n_customers"),
        F.lit(G).alias("grid_size"),
        F.round(2.0 * F.col("srx") / (nd * F.col("sv"))
                - (nd + 1.0) / nd, 4).alias("gini_approx"))

GINI_APPROX_SQL = f"""
WITH c AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal > 0
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM c),
cells AS (
  SELECT c_mktsegment, {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         count(*) AS f, sum(v) AS sx
  FROM c CROSS JOIN mm GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, f, sx,
         sum(f) OVER (PARTITION BY c_mktsegment ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (f - 1) / 2.0 AS r
  FROM cells
)
SELECT c_mktsegment, CAST(sum(f) AS BIGINT) AS n_customers,
       {_TWIN_GRID} AS grid_size,
       round(2.0 * sum(r * sx) / (CAST(sum(f) AS DOUBLE) * sum(sx))
             - (CAST(sum(f) AS DOUBLE) + 1.0) / CAST(sum(f) AS DOUBLE),
             4) AS gini_approx
FROM ranked GROUP BY 1
"""


# --------------------------------------------------------------------------
# A63b. Approx MAD per group via the GK sketch (100 TB path for A63 —
# VERDICT r04 #3): both median passes ride
# stats.grouped_quantiles_approx (ONE mergeable percentile_approx
# aggregate each, rank error ≤ n/accuracy, no bracket refine / no
# candidate scan). NO SQL oracle by design: DuckDB's approx_quantile
# is a t-digest, a different sketch, so estimates differ
# engine-to-engine — the driver records rows-only and
# tests/test_round5.py bound-asserts every output against the exact
# A63 at two SFs (the A159b/catalog_profile_approx pattern).
#
# PROOF BRACKETS (VERDICT r05 #7, the ROC/Mann-Whitney discipline):
# each sketch pass also probes fractions 0.5 ± 4/accuracy — the same
# 4× rank-error cushion grouped_quantiles' exact refine is built on —
# so [med_lo, med_hi] is GUARANTEED to contain the group's exact
# percentile_cont median (GK returns a value whose rank is within
# n/accuracy of the probe; the ±4/accuracy probes therefore sit
# strictly below/above the true median rank), and [mad_lo, mad_hi]
# likewise brackets the exact median of |v − median_price_approx|
# (the deviation median around the EMITTED center). Both brackets are
# asserted against the exact A63 machinery at two SFs in
# tests/test_round6.py — a driver-checkable invariant in the output
# even though the point estimates stay rows-only.
# --------------------------------------------------------------------------

def mad_approx_price_by_flag_detail(spark: SparkSession, sf_dir: str,
                                    li: DataFrame | None = None) -> DataFrame:
    acc = 10000
    if li is None:
        # isNotNull matches the audit tier's pinned projection (ADVICE
        # r09): without it the standalone/audit=False detail could see
        # different _probe_eps group counts than the audit path on a
        # null-containing price column (no effect on TPC-H data)
        li = (load_table(spark, sf_dir, "lineitem")
              .where(F.col("l_extendedprice").isNotNull())
              .select("l_returnflag",
                      F.col("l_extendedprice").cast("double").alias("v")))
    # r07: the fixed ±4/acc offset is SUB-RANK at small group n, where
    # both probes can collapse onto the same order statistic below the
    # interpolated percentile_cont target — _probe_eps floors the
    # offset at 3 ranks of the smallest group (no-op at production n)
    eps = _probe_eps(li, "l_returnflag", value_col="v")
    # materialize the 3-row median table: the deviation pass otherwise
    # replays the first sketch scan's lineage. _probe_fracs clamps to
    # [0, 1] — with the small-n floor, eps can exceed 0.5 on tiny
    # groups and an unclamped 0.5 ± eps would abort percentile_approx
    med = (stats.grouped_quantiles_approx(
               li, "l_returnflag", "v", _probe_fracs([0.5], eps),
               _probe_names(["med"]), accuracy=acc)
           .localCheckpoint(eager=True))
    dev = (li.join(F.broadcast(med), "l_returnflag")
             .select("l_returnflag",
                     F.abs(F.col("v") - F.col("med")).alias("adev")))
    mad = stats.grouped_quantiles_approx(
        dev, "l_returnflag", "adev", _probe_fracs([0.5], eps),
        _probe_names(["mad"]), accuracy=acc)
    # bracket edges round OUTWARD via the module-level _floor4/_ceil4 —
    # a half-even round could nudge an edge past an exact value sitting
    # within 5e-5 of it and silently void the containment guarantee
    return (med.join(F.broadcast(mad), "l_returnflag")
               .select("l_returnflag",
                       F.round("med", 4).alias("median_price_approx"),
                       _floor4("med_lo").alias("med_lo"),
                       _ceil4("med_hi").alias("med_hi"),
                       F.round("mad", 4).alias("mad_approx"),
                       _floor4("mad_lo").alias("mad_lo"),
                       _ceil4("mad_hi").alias("mad_hi"),
                       F.lit(acc).alias("accuracy")))


# --------------------------------------------------------------------------
# A123b. Approx PR-AUC / average precision on a fixed uniform grid
# (100 TB path for A123 — VERDICT r05 #2): the exact form's
# score-block table is O(distinct scores) = O(rows) on a continuous
# column; here scores bin to G buckets and the SAME Davis-Goadrich
# tie-block AP formula runs over the ≤ G-row block table (each bucket
# IS a score block: AP of the binned data, a legitimate tie-handled
# average precision converging to the exact one as G grows). One
# bounded groupBy + one descending cumulative window over ≤ G rows.
# Full value-level oracle (same bit-identical bin rule both engines).
# --------------------------------------------------------------------------

def pr_auc_approx_order_status(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    G = _TWIN_GRID
    o = load_table(spark, sf_dir, "orders")
    d = o.select((F.col("o_orderstatus") == "P").cast("long").alias("pos"),
                 F.col("o_totalprice").cast("double").alias("v"))
    mm = d.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = d.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy(b.alias("__gbkt"))
              .agg(F.sum("pos").alias("tp_b"),
                   F.count(F.lit(1)).alias("n_b")))
    # descending-score blocks: higher buckets rank first; the window
    # input is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = (Window.orderBy(F.desc("__gbkt"))
               .rowsBetween(Window.unboundedPreceding, 0))
    cum = cells.select("tp_b", "n_b",
                       F.sum("tp_b").over(w).alias("ctp"),
                       F.sum("n_b").over(w).alias("cn"))
    tot = cum.agg(F.sum("tp_b").alias("P"),
                  F.sum("n_b").alias("N"),
                  F.sum(F.col("tp_b").cast("double")
                        * (F.col("ctp").cast("double")
                           / F.col("cn").cast("double"))).alias("s"))
    # nullif: zero positives => AP undefined, NULL not a job abort
    return tot.select(
        F.col("P").cast("long").alias("n_pos"),
        (F.col("N") - F.col("P")).cast("long").alias("n_neg"),
        F.lit(G).alias("grid_size"),
        F.round(F.col("s")
                / F.nullif(F.col("P").cast("double"), F.lit(0.0)), 6)
         .alias("average_precision_approx"))

PR_AUC_APPROX_SQL = f"""
WITH d AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS pos,
         CAST(o_totalprice AS DOUBLE) AS v
  FROM orders
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM d),
cells AS (
  SELECT {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         sum(pos) AS tp_b, count(*) AS n_b
  FROM d CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT tp_b, n_b,
         sum(tp_b) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS ctp,
         sum(n_b) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS cn
  FROM cells
)
SELECT CAST(sum(tp_b) AS BIGINT) AS n_pos,
       CAST(sum(n_b) - sum(tp_b) AS BIGINT) AS n_neg,
       {_TWIN_GRID} AS grid_size,
       round(sum(CAST(tp_b AS DOUBLE) * (CAST(ctp AS DOUBLE)
                                         / CAST(cn AS DOUBLE)))
             / nullif(CAST(sum(tp_b) AS DOUBLE), 0), 6)
         AS average_precision_approx
FROM cum
"""


# --------------------------------------------------------------------------
# A139b. Approx Dunn's post-hoc pairwise rank test on a fixed uniform
# grid (100 TB path for A139 — VERDICT r05 #2): the exact form's
# global rank table is O(distinct acctbals); here every value gets
# its bucket's tie-averaged rank (the A18db recipe), per-segment mean
# ranks come off k·G cells, and the |segments|²-bounded pairwise z
# uses the standard tie correction with bucket totals as tie runs —
# Dunn's test OF THE BINNED DATA. Full value-level oracle.
# --------------------------------------------------------------------------

def dunn_approx_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    G = _TWIN_GRID
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("double").alias("v"))
    mm = cust.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = cust.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("v"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy("c_mktsegment", b.alias("__gbkt"))
               .agg(F.count(F.lit(1)).alias("f"))
               .localCheckpoint(eager=True))
    buckets = cells.groupBy("__gbkt").agg(F.sum("f").alias("l"))
    # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = Window.orderBy("__gbkt").rowsBetween(Window.unboundedPreceding, 0)
    ranked = buckets.select(
        "__gbkt", "l",
        (F.sum("l").over(w) - (F.col("l") - 1) / 2.0).alias("r"))
    grp = (cells.join(F.broadcast(ranked.select("__gbkt", "r")), "__gbkt")
                .groupBy("c_mktsegment")
                .agg(F.sum(F.col("r") * F.col("f")).alias("rsum"),
                     F.sum("f").alias("ng")))
    ld = F.col("l").cast("double")
    glob = (buckets.agg(F.sum("l").alias("n_total"),
                        F.sum(ld * ld * ld - ld).alias("tie3")))
    a = grp.select(F.col("c_mktsegment").alias("seg_a"),
                   (F.col("rsum") / F.col("ng")).alias("mr_a"),
                   F.col("ng").alias("na"))
    b2 = grp.select(F.col("c_mktsegment").alias("seg_b"),
                    (F.col("rsum") / F.col("ng")).alias("mr_b"),
                    F.col("ng").alias("nb"))
    nn = F.col("n_total").cast("double")
    sig2 = (nn * (nn + 1) / 12.0 - F.col("tie3") / (12.0 * (nn - 1)))
    # nullif: an all-tied input (one occupied bucket) zeroes sig2 —
    # z undefined => NULL, not an ANSI DIVIDE_BY_ZERO job abort
    z = ((F.col("mr_a") - F.col("mr_b"))
         / F.nullif(
             F.sqrt(sig2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
             F.lit(0.0)))
    return (a.join(b2, a.seg_a < b2.seg_b).crossJoin(F.broadcast(glob))
             .select("seg_a", "seg_b",
                     F.lit(G).alias("grid_size"),
                     F.round("mr_a", 4).alias("mean_rank_a_approx"),
                     F.round("mr_b", 4).alias("mean_rank_b_approx"),
                     F.round(z, 4).alias("z_approx"))
             .orderBy("seg_a", "seg_b"))

DUNN_APPROX_SQL = f"""
WITH c AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS v FROM customer
), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM c),
cells AS (
  SELECT c_mktsegment, {_sql_bucket('v', 'mn', 'mx', _TWIN_GRID)} AS b,
         count(*) AS f
  FROM c CROSS JOIN mm GROUP BY 1, 2
), buckets AS (
  SELECT b, sum(f) AS l,
         sum(sum(f)) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
           - (sum(f) - 1) / 2.0 AS r
  FROM cells GROUP BY b
), grp AS (
  SELECT c_mktsegment, sum(r * f) AS rsum, CAST(sum(f) AS BIGINT) AS ng
  FROM cells JOIN buckets USING (b) GROUP BY 1
), gtot AS (
  SELECT CAST(sum(l) AS DOUBLE) AS n_total,
         sum(CAST(l AS DOUBLE) * CAST(l AS DOUBLE) * CAST(l AS DOUBLE)
             - CAST(l AS DOUBLE)) AS tie3
  FROM buckets
)
SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
       {_TWIN_GRID} AS grid_size,
       round(a.rsum / a.ng, 4) AS mean_rank_a_approx,
       round(b.rsum / b.ng, 4) AS mean_rank_b_approx,
       round((a.rsum / a.ng - b.rsum / b.ng)
             / nullif(sqrt((n_total * (n_total + 1) / 12.0
                            - tie3 / (12.0 * (n_total - 1)))
                           * (1.0 / a.ng + 1.0 / b.ng)), 0), 4) AS z_approx
FROM grp a JOIN grp b ON a.c_mktsegment < b.c_mktsegment
CROSS JOIN gtot
ORDER BY seg_a, seg_b
"""


# --------------------------------------------------------------------------
# A136b. Approx Wilcoxon signed-rank on a fixed uniform grid (100 TB
# path for A136 — VERDICT r05 #2): the exact form ranks O(#parts)
# distinct |d| values; here |d| bins to G buckets and W⁺ is the
# tie-averaged rank sum over ≤ G cells. PROOF BRACKET: equal d values
# share a bucket and buckets partition by value range, so each
# bucket's pairs occupy exactly the global rank positions
# (cum_before, cum_before + l]; tie-averaging within a bucket is a
# rank-preserving smoothing, so the exact W⁺ (exact-resolution tie
# averages) lies between "positives take the lowest positions" and
# "positives take the highest positions":
#   w_lo = Σ_b tpos·cb + tpos(tpos+1)/2
#   w_hi = Σ_b tpos·cb + tpos·l − tpos(tpos−1)/2
# [w_lo, w_hi] MUST contain the exact A136 w_plus (asserted at two
# SFs in tests/test_round6.py). z uses the standard tie correction
# with bucket totals as tie runs. Full value-level oracle.
# --------------------------------------------------------------------------

def _wilcoxon_grid(pairs: DataFrame, G: int) -> DataFrame:
    """The grid-binned signed-rank core over a (d, ad) pair frame —
    parametrized by G so the bracket THEOREM is testable on coarse
    grids (tests/test_round6.py randomized containment tests drive
    G=4..8, where brackets are wide and actually exercised; the
    registered query uses _TWIN_GRID, where this corpus degenerates
    to exact)."""
    spark = pairs.sparkSession
    mm = pairs.agg(F.min("ad").alias("mn"), F.max("ad").alias("mx"))
    mm = spark.createDataFrame(mm.collect(), schema=mm.schema)
    j = pairs.crossJoin(F.broadcast(mm))
    b = _bucket_expr(F.col("ad"), F.col("mn"), F.col("mx"), G)
    cells = (j.groupBy(b.alias("__gbkt"))
              .agg(F.count(F.lit(1)).alias("l"),
                   F.sum((F.col("d") > 0).cast("long")).alias("tpos")))
    # __gbkt is grid-bounded (≤ _TWIN_GRID rows) by construction
    w = Window.orderBy("__gbkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "l", "tpos",
        (F.sum("l").over(w) - F.col("l")).alias("cb"))
    ld = F.col("l").cast("double")
    tp = F.col("tpos").cast("double")
    cb = F.col("cb").cast("double")
    agg = cum.agg(
        F.sum("l").alias("n"),
        F.sum(tp * (cb + (ld + 1) / 2.0)).alias("wplus"),
        F.sum(tp * cb + tp * (tp + 1) / 2.0).alias("w_lo"),
        F.sum(tp * cb + tp * ld - tp * (tp - 1) / 2.0).alias("w_hi"),
        F.sum(ld * ld * ld - ld).alias("tsum"))
    n = F.col("n").cast("double")
    var = (n * (n + 1) * (2 * n + 1) / 24.0 - F.col("tsum") / 48.0)
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.lit(G).alias("grid_size"),
        F.round("wplus", 2).alias("w_plus_approx"),
        F.round("w_lo", 2).alias("w_lo"),
        F.round("w_hi", 2).alias("w_hi"),
        F.round((F.col("wplus") - n * (n + 1) / 4.0) / F.sqrt(var), 6)
         .alias("z_approx"))


def wilcoxon_approx_signed_rank(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("p_partkey", "p_retailprice")
               .agg(F.max(F.col("l_extendedprice") / F.col("l_quantity"))
                     .alias("peak"))
               .select((F.col("peak") - F.col("p_retailprice")).alias("d"))
               .where(F.col("d") != 0)
               .select("d", F.abs("d").alias("ad")))
    return _wilcoxon_grid(pairs, _TWIN_GRID)


WILCOXON_APPROX_SQL = f"""
WITH pairs AS (
  SELECT max(l.l_extendedprice / l.l_quantity) - p.p_retailprice AS d
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_retailprice
), nz AS (
  SELECT d, abs(d) AS ad FROM pairs WHERE d <> 0
), mm AS (SELECT min(ad) AS mn, max(ad) AS mx FROM nz),
cells AS (
  SELECT {_sql_bucket('ad', 'mn', 'mx', _TWIN_GRID)} AS b,
         count(*) AS l,
         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS tpos
  FROM nz CROSS JOIN mm GROUP BY 1
), cum AS (
  SELECT CAST(l AS DOUBLE) AS l, CAST(tpos AS DOUBLE) AS tp,
         CAST(sum(l) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) - l
              AS DOUBLE) AS cb
  FROM cells
), agg AS (
  SELECT CAST(sum(l) AS BIGINT) AS n,
         sum(tp * (cb + (l + 1) / 2.0)) AS wplus,
         sum(tp * cb + tp * (tp + 1) / 2.0) AS w_lo,
         sum(tp * cb + tp * l - tp * (tp - 1) / 2.0) AS w_hi,
         sum(l * l * l - l) AS tsum
  FROM cum
)
SELECT n AS n_pairs, {_TWIN_GRID} AS grid_size,
       round(wplus, 2) AS w_plus_approx,
       round(w_lo, 2) AS w_lo,
       round(w_hi, 2) AS w_hi,
       round((wplus - CAST(n AS DOUBLE) * (n + 1) / 4.0)
             / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2.0 * n + 1) / 24.0
                    - tsum / 48.0), 6) AS z_approx
FROM agg
"""


# ==========================================================================
# Round-7 additions (VERDICT r06 next-round #2): GK proof-bracket twins
# for the exact-quantile family. The exact forms (A64 trimmed mean, A92
# winsorized stats, A44 fences, C2 quantile summary, A80 RFM bounds,
# C38 funnel latency) all ride `stats.grouped_quantiles`' exact
# bracket-refine machinery, whose RLE candidate table is O(distinct
# values) — O(rows) on continuous columns at 100 TB. Each twin below
# replaces that stage with ONE mergeable-GK `grouped_quantiles_approx`
# pass carrying ±4/accuracy PROOF probes (the A63b/A159b recipe,
# mad_approx_price_by_flag above): by the GK rank guarantee (error ≤
# n/accuracy, 4× inside the probe offset) the probe at p−eps returns a
# value whose rank sits strictly below the exact quantile's and p+eps
# strictly above — so every emitted [*_lo, *_hi] bracket PROVABLY
# contains the exact percentile_cont value. Bracket edges round
# OUTWARD (floor/ceil at 4 dp) so rounding can never void containment.
# GK estimates are engine-specific (DuckDB uses t-digest), so the
# `_detail` forms here carry no SQL oracles; since round 8 the
# REGISTERED keys are the bound-as-oracle wrappers at the end of this
# module (exact audits + containment booleans, DuckDB-hash-checked)
# and tests/test_round7.py keeps asserting bracket containment +
# point-estimate closeness of the detail forms at three SFs.
# ==========================================================================

_GK_ACC = 10000

#: audit passes (the r08 bound-as-oracle exact sides) run the exact
#: machinery at this accuracy: a pure performance knob — exactness
#: never depends on it (grouped_quantiles' bracket always contains the
#: true quantile and the below-count pass pins the exact rank; values
#: verified identical at 10000/2000/500 on sf0.1, GK insert cost ~17%
#: lower per pass). Since round 9 this IS stats.EXACT_QUANTILE_ACC —
#: one constant (env-overridable there) governs the exact machinery's
#: accuracy everywhere, so retuning cannot miss a site (code-review
#: r09: two independent 2000s each claiming to be the single site).
#: NEVER emitted in query output: the twins' `accuracy` columns carry
#: the detail forms' SKETCH accuracy (_GK_ACC, or rfm's local 2000),
#: which is result-affecting and stays pinned.
_AUDIT_ACC = stats.EXACT_QUANTILE_ACC


def _floor4(c):
    return F.floor(F.col(c) * 1e4) / 1e4


def _ceil4(c):
    return F.ceil(F.col(c) * 1e4) / 1e4


def _probe_eps(df: DataFrame, group_col: str | None = None,
               acc: int = _GK_ACC, value_col: str | None = None,
               nmin: int | None = None) -> float:
    """±probe offset: 4/accuracy (the GK rank-slack cushion), but never
    less than 3 ranks of the smallest group. At small n the ±4/acc
    offset is SUB-RANK: both probes collapse onto the same order
    statistic, which can sit strictly below the interpolated
    percentile_cont target (observed at sf0.001: probe ranks 196/197
    around an exact position of 196.1 — the hi probe missed the
    ceiling value). eps ≥ 3/n pushes each probe ≥ 1 full rank past the
    interpolation floor/ceiling, restoring the containment PROOF at
    every n; at production n (n ≥ 30000·…) the max() constant-folds to
    4/accuracy, so the scale path is untouched. The count is one
    row-count aggregate (parquet-metadata cheap next to the GK scan)."""
    # count NON-NULL values (F.count(col)), not rows: percentile_approx
    # ranks only non-null values, so a mostly-NULL group's effective n
    # is smaller than its row count and a row-based floor could still
    # leave the probes sub-rank (code-review r07)
    cnt = F.count(value_col) if value_col else F.count(F.lit(1))
    if nmin is None:
        if group_col is None:
            nmin = df.agg(cnt.alias("n")).collect()[0][0]
        else:
            nmin = (df.groupBy(group_col).agg(cnt.alias("n"))
                      .agg(F.min("n")).collect()[0][0])
    return max(4.0 / acc, 3.0 / max(int(nmin or 1), 1))


def _probe_fracs(ps: list[float], eps: float) -> list[float]:
    """[p−eps, p, p+eps] per target fraction, clamped to [0, 1]."""
    out: list[float] = []
    for p in ps:
        out += [max(0.0, p - eps), p, min(1.0, p + eps)]
    return out


def _probe_names(names: list[str]) -> list[str]:
    out: list[str] = []
    for a in names:
        out += [f"{a}_lo", a, f"{a}_hi"]
    return out


# --------------------------------------------------------------------------
# A64b. Approx trimmed mean via GK cutoffs (100 TB path for A64): the
# exact form cuts at per-group ranks ±floor(0.1·n); here the 10%/90%
# cutoffs come from ONE GK pass and the mean is a conditional
# aggregate between them — a quantile-trimmed mean whose cutoffs carry
# proof brackets. The rank slack shifts which ≤ 8n/accuracy boundary
# rows enter the average, so the point estimate drifts O(1/accuracy)
# relative; brackets + drift asserted in tests/test_round7.py.
# --------------------------------------------------------------------------

def trimmed_mean_approx_price_detail(spark: SparkSession, sf_dir: str,
                                     li: DataFrame | None = None) -> DataFrame:
    # isNotNull BEFORE counting (ADVICE r07): `n` must count the values
    # the GK cutoffs actually rank, matching the winsorized sibling and
    # the probe floor's assumptions on null-containing inputs
    if li is None:
        li = (load_table(spark, sf_dir, "lineitem")
              .where(F.col("l_extendedprice").isNotNull())
              .select("l_returnflag",
                      F.col("l_extendedprice").cast("double").alias("v")))
    eps = _probe_eps(li, "l_returnflag", value_col="v")
    # materialize the 3-row cutoff table: the mean pass otherwise
    # replays the sketch scan's lineage (the A63b pattern)
    cuts = (stats.grouped_quantiles_approx(
                li, "l_returnflag", "v",
                _probe_fracs([0.1, 0.9], eps), _probe_names(["c10", "c90"]),
                accuracy=_GK_ACC)
            .localCheckpoint(eager=True))
    j = li.join(F.broadcast(cuts), "l_returnflag")
    inside = (F.col("v") >= F.col("c10")) & (F.col("v") <= F.col("c90"))
    return (j.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(inside.cast("long")).alias("n_kept"),
                  F.round(F.avg(F.when(inside, F.col("v"))), 4)
                   .alias("trimmed_mean_approx"),
                  # group-constant (broadcast cutoffs): min = the value
                  F.min(_floor4("c10_lo")).alias("c10_lo"),
                  F.min(_ceil4("c10_hi")).alias("c10_hi"),
                  F.min(_floor4("c90_lo")).alias("c90_lo"),
                  F.min(_ceil4("c90_hi")).alias("c90_hi"))
             .withColumn("accuracy", F.lit(_GK_ACC)))


# --------------------------------------------------------------------------
# A92b. Approx winsorized statistics via GK cutoffs (100 TB path for
# A92): identical clamp aggregate, p01/p99 from ONE GK pass with proof
# brackets. Clamp decisions flip only for rows between a cutoff's
# bracket edges (≤ 8n/accuracy of them), bounding the moment drift.
# --------------------------------------------------------------------------

def winsorized_approx_price_stats_detail(spark: SparkSession, sf_dir: str,
                                         li: DataFrame | None = None) -> DataFrame:
    if li is None:
        li = (load_table(spark, sf_dir, "lineitem")
              .where(F.col("l_extendedprice").isNotNull())
              .select("l_returnflag",
                      F.col("l_extendedprice").cast("double").alias("v")))
    eps = _probe_eps(li, "l_returnflag", value_col="v")
    q = (stats.grouped_quantiles_approx(
             li, "l_returnflag", "v",
             _probe_fracs([0.01, 0.99], eps), _probe_names(["p01", "p99"]),
             accuracy=_GK_ACC)
         .localCheckpoint(eager=True))
    w = li.join(F.broadcast(q), "l_returnflag")
    v = F.col("v")
    clamped = F.least(F.greatest(v, F.col("p01")), F.col("p99"))
    return (w.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.avg(clamped), 4).alias("winsorized_mean_approx"),
                  F.round(F.stddev_samp(clamped), 4)
                   .alias("winsorized_sd_approx"),
                  F.sum(((v < F.col("p01")) | (v > F.col("p99")))
                        .cast("long")).alias("n_clamped"),
                  F.round(F.first("p01"), 4).alias("p01_approx"),
                  # group-constant (broadcast cutoffs): min = the value
                  F.min(_floor4("p01_lo")).alias("p01_lo"),
                  F.min(_ceil4("p01_hi")).alias("p01_hi"),
                  F.round(F.first("p99"), 4).alias("p99_approx"),
                  F.min(_floor4("p99_lo")).alias("p99_lo"),
                  F.min(_ceil4("p99_hi")).alias("p99_hi"))
             .withColumn("accuracy", F.lit(_GK_ACC)))


# --------------------------------------------------------------------------
# A44b. Approx Tukey fences via GK quartiles (100 TB path for A44 —
# the swap its docstring has promised since round 1, now registered):
# q1/q3 from ONE GK pass with proof brackets; fences and the
# conditional outlier/whisker aggregate are unchanged.
# --------------------------------------------------------------------------

def outlier_fences_approx_detail(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    proj = cust.select("c_mktsegment",
                       F.col("c_acctbal").cast("double").alias("v"))
    eps = _probe_eps(proj, "c_mktsegment", value_col="v")
    q = (stats.grouped_quantiles_approx(
             proj, "c_mktsegment", "v",
             _probe_fracs([0.25, 0.75], eps), _probe_names(["q1", "q3"]),
             accuracy=_GK_ACC)
         .localCheckpoint(eager=True))
    fences = q.select(
        "c_mktsegment",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        _floor4("q1_lo").alias("q1_lo"), _ceil4("q1_hi").alias("q1_hi"),
        _floor4("q3_lo").alias("q3_lo"), _ceil4("q3_hi").alias("q3_hi"))
    x = F.col("v")
    return (proj.join(F.broadcast(fences), "c_mktsegment")
                .groupBy("c_mktsegment")
                .agg(F.round(F.min("lo"), 4).alias("fence_lo_approx"),
                     F.round(F.min("hi"), 4).alias("fence_hi_approx"),
                     F.sum(((x < F.col("lo")) | (x > F.col("hi")))
                           .cast("int")).cast("long").alias("n_outliers"),
                     F.round(F.min(F.when(x >= F.col("lo"), x)), 4)
                      .alias("whisker_lo"),
                     F.round(F.max(F.when(x <= F.col("hi"), x)), 4)
                      .alias("whisker_hi"),
                     F.min("q1_lo").alias("q1_lo"),
                     F.min("q1_hi").alias("q1_hi"),
                     F.min("q3_lo").alias("q3_lo"),
                     F.min("q3_hi").alias("q3_hi"))
                .withColumn("accuracy", F.lit(_GK_ACC)))


# --------------------------------------------------------------------------
# C2b. Approx boxplot summary via GK (100 TB path for C2): four
# percentiles from ONE GK pass with proof brackets; min/max stay a
# plain codegen aggregate.
# --------------------------------------------------------------------------

def quantile_summary_approx_detail(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select("o_orderpriority",
                         F.col("o_totalprice").cast("double").alias("v"))
    # ONE fused pass supplies min/max AND the non-null probe counts —
    # its tiny result is collected for eps and rebuilt locally, so the
    # twin scans orders exactly twice (this pass + the GK pass), same
    # as the exact C2 (code-review r07: the separate count scan is
    # fused away, and no pin is needed for a bare 2-col scan — the
    # exact form's documented tradeoff)
    mm_rows = (proj.groupBy("o_orderpriority")
                   .agg(F.round(F.min("v"), 4).alias("lo"),
                        F.round(F.max("v"), 4).alias("hi"),
                        F.count("v").alias("n")).collect())
    nmin = min((r["n"] for r in mm_rows), default=0)
    eps = _probe_eps(proj, "o_orderpriority", nmin=nmin)
    mm = spark.createDataFrame(
        [(r["o_orderpriority"], r["lo"], r["hi"]) for r in mm_rows],
        "o_orderpriority string, lo double, hi double")
    q = stats.grouped_quantiles_approx(
        proj, "o_orderpriority", "v",
        _probe_fracs([0.25, 0.5, 0.75, 0.95], eps),
        _probe_names(["p25", "p50", "p75", "p95"]), accuracy=_GK_ACC)
    sel = ["o_orderpriority"]
    for a in ("p25", "p50", "p75", "p95"):
        sel += [F.round(a, 4).alias(f"{a}_approx"),
                _floor4(f"{a}_lo").alias(f"{a}_lo"),
                _ceil4(f"{a}_hi").alias(f"{a}_hi")]
    return (q.join(F.broadcast(mm), "o_orderpriority")
             .select(*sel, "lo", "hi")
             .withColumn("accuracy", F.lit(_GK_ACC)))


# --------------------------------------------------------------------------
# A80b. Approx RFM cut points via GK (100 TB path for A80's ONLY
# rows-state stage): the exact A80 melts the customer metric table and
# runs grouped_quantiles over (metric, value); everything downstream
# (scoring, segment rollup) is already bounded. This twin emits that
# quantile stage — the three R/F/M quartile cut points with proof
# brackets — from ONE GK pass over the same melted frame. Scoring
# consumes these bounds unchanged, so bracket containment here is the
# scale proof for the whole segmentation.
# --------------------------------------------------------------------------

def _rfm_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The melted (metric, value) R/F/M frame, pinned once — shared by
    the GK probe pass, the probe-count pass and (in the registered
    audit form) the exact quantile pass."""
    from ..functions import money
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("rd"))
    pc = (orders.groupBy("o_custkey")
          .agg(F.max("o_orderdate").alias("last_o"),
               F.count(F.lit(1)).alias("freq"),
               F.sum(money("o_totalprice")).alias("mon_dec"))
          .crossJoin(F.broadcast(ref))
          .select(F.col("freq").cast("double").alias("freq"),
                  F.col("mon_dec").cast("double").alias("mon"),
                  F.datediff(F.to_date("rd"), F.to_date("last_o"))
                   .cast("double").alias("rec")))
    # materialize the customer-sized metric table (the exact A80 does
    # the same): the probe-count pass and the GK pass otherwise each
    # replay the orders scan+shuffle — measured 5.75 s vs the exact's
    # 4.98 s at 100× without this pin, 2.9 s with it
    pc = pc.localCheckpoint(eager=True)
    return pc.select(
        F.explode(F.map_from_arrays(
            F.array(F.lit("rec"), F.lit("freq"), F.lit("mon")),
            F.array("rec", "freq", "mon"))).alias("metric", "__v"))


def rfm_bounds_approx_detail(spark: SparkSession, sf_dir: str,
                             melted: DataFrame | None = None) -> DataFrame:
    if melted is None:
        melted = _rfm_melted(spark, sf_dir)
    # accuracy 2000, not the family's 10000: GK insert cost grows
    # ~linearly with accuracy (measured 2.28 s vs 0.91 s over the 100×
    # melted frame) and this twin's contract is bracket CONTAINMENT of
    # the cut points, not tightness — brackets stay provable at any
    # accuracy, just ~5× wider in rank (still < 0.5% of n)
    acc = 2000
    eps = _probe_eps(melted, "metric", acc=acc, value_col="__v")
    q = stats.grouped_quantiles_approx(
        melted, "metric", "__v",
        _probe_fracs([0.25, 0.5, 0.75], eps),
        _probe_names(["q1", "q2", "q3"]), accuracy=acc)
    sel = ["metric"]
    for a in ("q1", "q2", "q3"):
        sel += [F.round(a, 4).alias(f"{a}_approx"),
                _floor4(f"{a}_lo").alias(f"{a}_lo"),
                _ceil4(f"{a}_hi").alias(f"{a}_hi")]
    return (q.select(*sel)
             .withColumn("accuracy", F.lit(acc))
             .orderBy("metric"))


# --------------------------------------------------------------------------
# C38b. Approx funnel latency quantiles via GK (100 TB path for C38):
# the per-user funnel windows are already user-bounded; only the
# global p50/p90 rode the exact distinct-value machinery. ONE GK pass
# with proof probes replaces it.
# --------------------------------------------------------------------------

def _funnel_latency_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user view→purchase latency frame (C38's window stage),
    pinned once — shared by the GK probe pass, the probe-count pass
    and (in the registered audit form) the exact quantile pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t, ty = F.col("ts"), F.col("event_type")
    d = ev.withColumn("t_view", F.min(F.when(ty == "view", t)).over(w))
    d = d.withColumn(
        "t_click", F.min(F.when((ty == "click")
                                & (t >= F.col("t_view")), t)).over(w))
    d = d.withColumn(
        "t_purchase", F.min(F.when((ty == "purchase")
                                   & (t >= F.col("t_click")), t)).over(w))
    lat = (d.groupBy("user_id")
             .agg(F.max("t_purchase").alias("tp"),
                  F.max("t_view").alias("tv"))
             .where(F.col("tp").isNotNull())
             .select(F.lit("all").alias("g"),
                     ((F.unix_micros("tp") - F.unix_micros("tv"))
                      / F.lit(1_000_000.0)).alias("latency_s")))
    # single group: the latency frame is small (converted users), but
    # it feeds TWO consumers (probe-count + quantiles + n) — pin one
    # evaluation so the window construction runs once
    return lat.localCheckpoint(eager=True)


def funnel_latency_approx_quantiles_detail(
        spark: SparkSession, sf_dir: str,
        lat: DataFrame | None = None) -> DataFrame:
    if lat is None:
        lat = _funnel_latency_frame(spark, sf_dir)
    eps = _probe_eps(lat, value_col="latency_s")
    q = stats.grouped_quantiles_approx(
        lat, "g", "latency_s",
        _probe_fracs([0.5, 0.9], eps), _probe_names(["p50", "p90"]),
        accuracy=_GK_ACC)
    n = lat.groupBy("g").agg(F.count(F.lit(1)).alias("n_converted"))
    return (q.join(n, "g")
             .select("n_converted",
                     F.round("p50", 4).alias("p50_s_approx"),
                     _floor4("p50_lo").alias("p50_lo"),
                     _ceil4("p50_hi").alias("p50_hi"),
                     F.round("p90", 4).alias("p90_s_approx"),
                     _floor4("p90_lo").alias("p90_lo"),
                     _ceil4("p90_hi").alias("p90_hi"))
             .withColumn("accuracy", F.lit(_GK_ACC)))


# ==========================================================================
# Round-8 upgrade (VERDICT r07 next-round #1): every GK proof-bracket
# twin above becomes DRIVER-VALUE-CHECKABLE via the B31 bound-as-oracle
# pattern (queries/b_llm.py sketch_hll_union, the r07 template). The
# registered query no longer EMITS the engine-specific GK estimates and
# bracket edges (DuckDB's approx_quantile is a t-digest — a different
# sketch, so point estimates can never hash-match); instead it emits
#   * the EXACT statistic as an audit column (computed with the same
#     stats.grouped_quantiles machinery the exact counterparts already
#     hash-match DuckDB with — affordable at driver SFs), and
#   * the in-query containment boolean: the exact value MUST lie inside
#     the GK proof bracket (the ±4/accuracy ∨ 3/n probe cushion — the
#     guarantee tests/test_round5-7.py have asserted at three SFs).
# DuckDB's oracle recomputes the exact side (quantile_cont) and asserts
# the boolean as a TRUE literal — a sketch drifting out of its proof
# bracket now FAILS the driver's value hash instead of hiding behind a
# rows-only row. At 100 TB the exact audit columns are dropped and the
# sketch brackets are the product; the `*_detail` forms above (which
# tests still exercise for bracket width / point-estimate drift) ARE
# that production output shape.
# ==========================================================================


def mad_approx_price_by_flag(spark: SparkSession, sf_dir: str, *,
                             audit: bool = True) -> DataFrame:
    """A63b bound-as-oracle form. `mad_in_bracket` uses the TRIANGLE-
    INEQUALITY widening: [mad_lo, mad_hi] brackets the deviation median
    around the EMITTED GK center a, while the audit MAD is the
    deviation median around the exact median b; |median|v−a| −
    median|v−b|| ≤ |a−b| ≤ w (both a and b lie in [med_lo, med_hi], by
    GK monotonicity in the fraction and the containment proof), so the
    exact MAD provably lies in [mad_lo − w, mad_hi + w]."""
    if not audit:
        return mad_approx_price_by_flag_detail(spark, sf_dir)
    # AUDIT-SHAPE scan sharing (round 9, measured 0.86x at sf0.1): the
    # detail's GK passes and the exact audit passes otherwise each
    # replay the parquet scan+projection — pin it ONCE and feed both.
    # Driver-SF shape only: the audit=False / _detail product never
    # checkpoints the fact (a 100 TB pin is not the scale path; the
    # detail keeps its own lazy scan when called standalone).
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull())
          .select("l_returnflag",
                  F.col("l_extendedprice").cast("double").alias("v"))
          .localCheckpoint(eager=True))
    det = mad_approx_price_by_flag_detail(spark, sf_dir, li=li)
    med_e = (stats.grouped_median(li, "l_returnflag", "v", alias="med_e",
                                  accuracy=_AUDIT_ACC)
             .localCheckpoint(eager=True))
    dev = (li.join(F.broadcast(med_e), "l_returnflag")
             .select("l_returnflag",
                     F.abs(F.col("v") - F.col("med_e")).alias("adev")))
    mad_e = stats.grouped_median(dev, "l_returnflag", "adev",
                                 alias="mad_e", accuracy=_AUDIT_ACC)
    n = li.groupBy("l_returnflag").agg(F.count("v").alias("n"))
    w = F.col("med_hi") - F.col("med_lo")
    return (det.join(F.broadcast(med_e), "l_returnflag")
               .join(F.broadcast(mad_e), "l_returnflag")
               .join(F.broadcast(n), "l_returnflag")
               .select(
                   "l_returnflag", "n",
                   F.round("med_e", 4).alias("median_price_exact"),
                   F.round("mad_e", 4).alias("mad_exact"),
                   ((F.col("med_lo") <= F.col("med_e"))
                    & (F.col("med_e") <= F.col("med_hi")))
                   .alias("med_in_bracket"),
                   ((F.col("mad_lo") - w <= F.col("mad_e"))
                    & (F.col("mad_e") <= F.col("mad_hi") + w))
                   .alias("mad_in_bracket"),
                   "accuracy"))


MAD_APPROX_SQL = """
WITH li AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), med AS (
  SELECT l_returnflag, median(v) AS med, count(*) AS n
  FROM li GROUP BY 1
)
SELECT l.l_returnflag, CAST(max(m.n) AS BIGINT) AS n,
       round(max(m.med), 4) AS median_price_exact,
       round(median(abs(l.v - m.med)), 4) AS mad_exact,
       TRUE AS med_in_bracket, TRUE AS mad_in_bracket,
       10000 AS accuracy
FROM li l JOIN med m USING (l_returnflag)
GROUP BY 1
"""


def trimmed_mean_approx_price(spark: SparkSession, sf_dir: str, *,
                              audit: bool = True) -> DataFrame:
    """A64b bound-as-oracle form: exact percentile_cont(0.1/0.9)
    cutoffs as audit columns + GK-bracket containment booleans, plus
    the exact QUANTILE-trimmed mean between those exact cutoffs (the
    statistic the GK twin estimates — DuckDB-recomputable, unlike the
    GK point estimate)."""
    if not audit:
        return trimmed_mean_approx_price_detail(spark, sf_dir)
    # AUDIT-SHAPE scan sharing (round 9, measured 0.86x at sf0.1): the
    # detail's GK passes and the exact audit passes otherwise each
    # replay the parquet scan+projection — pin it ONCE and feed both.
    # Driver-SF shape only: the audit=False / _detail product never
    # checkpoints the fact (a 100 TB pin is not the scale path; the
    # detail keeps its own lazy scan when called standalone).
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull())
          .select("l_returnflag",
                  F.col("l_extendedprice").cast("double").alias("v"))
          .localCheckpoint(eager=True))
    det = trimmed_mean_approx_price_detail(spark, sf_dir, li=li)
    cuts = (stats.grouped_quantiles(li, "l_returnflag", "v", [0.1, 0.9],
                                    ["c10_e", "c90_e"], accuracy=_AUDIT_ACC)
            .localCheckpoint(eager=True))
    j = li.join(F.broadcast(cuts), "l_returnflag")
    inside = (F.col("v") >= F.col("c10_e")) & (F.col("v") <= F.col("c90_e"))
    ex = (j.groupBy("l_returnflag")
           .agg(F.min("c10_e").alias("c10_e"),
                F.min("c90_e").alias("c90_e"),
                F.avg(F.when(inside, F.col("v"))).alias("tm_e")))
    return (det.join(F.broadcast(ex), "l_returnflag")
               .select(
                   "l_returnflag", "n",
                   F.round("c10_e", 4).alias("c10_exact"),
                   F.round("c90_e", 4).alias("c90_exact"),
                   F.round("tm_e", 4).alias("trimmed_mean_exact"),
                   ((F.col("c10_lo") <= F.col("c10_e"))
                    & (F.col("c10_e") <= F.col("c10_hi")))
                   .alias("c10_in_bracket"),
                   ((F.col("c90_lo") <= F.col("c90_e"))
                    & (F.col("c90_e") <= F.col("c90_hi")))
                   .alias("c90_in_bracket"),
                   "accuracy"))


TRIMMED_MEAN_APPROX_SQL = f"""
WITH li AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), q AS (
  SELECT l_returnflag, quantile_cont(v, 0.1) AS c10,
         quantile_cont(v, 0.9) AS c90
  FROM li GROUP BY 1
)
SELECT li.l_returnflag, count(*) AS n,
       round(any_value(c10), 4) AS c10_exact,
       round(any_value(c90), 4) AS c90_exact,
       round(avg(CASE WHEN v >= c10 AND v <= c90 THEN v END), 4)
         AS trimmed_mean_exact,
       TRUE AS c10_in_bracket, TRUE AS c90_in_bracket,
       {_GK_ACC} AS accuracy
FROM li JOIN q USING (l_returnflag)
GROUP BY 1
"""


def winsorized_approx_price_stats(spark: SparkSession, sf_dir: str, *,
                                  audit: bool = True) -> DataFrame:
    """A92b bound-as-oracle form: exact p01/p99 audits + containment
    booleans, plus the exact winsorized moments (the A92 statistics —
    DuckDB-recomputable via WINSORIZED_SQL's shape)."""
    if not audit:
        return winsorized_approx_price_stats_detail(spark, sf_dir)
    # AUDIT-SHAPE scan sharing (round 9, measured 0.86x at sf0.1): the
    # detail's GK passes and the exact audit passes otherwise each
    # replay the parquet scan+projection — pin it ONCE and feed both.
    # Driver-SF shape only: the audit=False / _detail product never
    # checkpoints the fact (a 100 TB pin is not the scale path; the
    # detail keeps its own lazy scan when called standalone).
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull())
          .select("l_returnflag",
                  F.col("l_extendedprice").cast("double").alias("v"))
          .localCheckpoint(eager=True))
    det = winsorized_approx_price_stats_detail(spark, sf_dir, li=li)
    q = (stats.grouped_quantiles(li, "l_returnflag", "v", [0.01, 0.99],
                                 ["p01_e", "p99_e"], accuracy=_AUDIT_ACC)
         .localCheckpoint(eager=True))
    w = li.join(F.broadcast(q), "l_returnflag")
    v = F.col("v")
    clamped = F.least(F.greatest(v, F.col("p01_e")), F.col("p99_e"))
    ex = (w.groupBy("l_returnflag")
           .agg(F.min("p01_e").alias("p01_e"),
                F.min("p99_e").alias("p99_e"),
                F.avg(clamped).alias("wm_e"),
                F.stddev_samp(clamped).alias("ws_e"),
                F.sum(((v < F.col("p01_e")) | (v > F.col("p99_e")))
                      .cast("long")).alias("n_clamped_exact")))
    return (det.join(F.broadcast(ex), "l_returnflag")
               .select(
                   "l_returnflag", "n",
                   F.round("wm_e", 4).alias("winsorized_mean_exact"),
                   F.round("ws_e", 4).alias("winsorized_sd_exact"),
                   "n_clamped_exact",
                   F.round("p01_e", 4).alias("p01_exact"),
                   F.round("p99_e", 4).alias("p99_exact"),
                   ((F.col("p01_lo") <= F.col("p01_e"))
                    & (F.col("p01_e") <= F.col("p01_hi")))
                   .alias("p01_in_bracket"),
                   ((F.col("p99_lo") <= F.col("p99_e"))
                    & (F.col("p99_e") <= F.col("p99_hi")))
                   .alias("p99_in_bracket"),
                   "accuracy"))


WINSORIZED_APPROX_SQL = f"""
WITH li AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), q AS (
  SELECT l_returnflag, quantile_cont(v, 0.01) AS p01,
         quantile_cont(v, 0.99) AS p99
  FROM li GROUP BY 1
), w AS (
  SELECT li.l_returnflag, v, p01, p99,
         least(greatest(v, p01), p99) AS cv
  FROM li JOIN q USING (l_returnflag)
)
SELECT l_returnflag, count(*) AS n,
       round(avg(cv), 4) AS winsorized_mean_exact,
       round(stddev_samp(cv), 4) AS winsorized_sd_exact,
       CAST(sum(CASE WHEN v < p01 OR v > p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_exact,
       round(any_value(p01), 4) AS p01_exact,
       round(any_value(p99), 4) AS p99_exact,
       TRUE AS p01_in_bracket, TRUE AS p99_in_bracket,
       {_GK_ACC} AS accuracy
FROM w GROUP BY 1
"""


def outlier_fences_approx(spark: SparkSession, sf_dir: str, *,
                          audit: bool = True) -> DataFrame:
    """A44b bound-as-oracle form: exact q1/q3 audits + containment
    booleans, plus the exact fences and outlier count (A44's output —
    DuckDB-recomputable via OUTLIER_FENCES_SQL's shape)."""
    det = outlier_fences_approx_detail(spark, sf_dir)
    if not audit:
        return det
    proj = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("double").alias("v"))
    q = (stats.grouped_quantiles(proj, "c_mktsegment", "v", [0.25, 0.75],
                                 ["q1_e", "q3_e"], accuracy=_AUDIT_ACC)
         .localCheckpoint(eager=True))
    fe = q.select(
        "c_mktsegment", "q1_e", "q3_e",
        (F.col("q1_e") - 1.5 * (F.col("q3_e") - F.col("q1_e"))).alias("lo_e"),
        (F.col("q3_e") + 1.5 * (F.col("q3_e") - F.col("q1_e"))).alias("hi_e"))
    x = F.col("v")
    ex = (proj.join(F.broadcast(fe), "c_mktsegment")
              .groupBy("c_mktsegment")
              .agg(F.min("q1_e").alias("q1_e"),
                   F.min("q3_e").alias("q3_e"),
                   F.round(F.min("lo_e"), 4).alias("fence_lo_exact"),
                   F.round(F.min("hi_e"), 4).alias("fence_hi_exact"),
                   F.sum(((x < F.col("lo_e")) | (x > F.col("hi_e")))
                         .cast("int")).cast("long")
                    .alias("n_outliers_exact")))
    return (det.join(F.broadcast(ex), "c_mktsegment")
               .select(
                   "c_mktsegment",
                   F.round("q1_e", 4).alias("q1_exact"),
                   F.round("q3_e", 4).alias("q3_exact"),
                   "fence_lo_exact", "fence_hi_exact", "n_outliers_exact",
                   ((F.col("q1_lo") <= F.col("q1_e"))
                    & (F.col("q1_e") <= F.col("q1_hi")))
                   .alias("q1_in_bracket"),
                   ((F.col("q3_lo") <= F.col("q3_e"))
                    & (F.col("q3_e") <= F.col("q3_hi")))
                   .alias("q3_in_bracket"),
                   "accuracy"))


OUTLIER_FENCES_APPROX_SQL = f"""
WITH q AS (
  SELECT c_mktsegment,
         quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75) AS q3
  FROM customer GROUP BY 1
), f AS (
  SELECT c_mktsegment, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
  FROM q
)
SELECT c_mktsegment,
       round(any_value(q1), 4) AS q1_exact,
       round(any_value(q3), 4) AS q3_exact,
       round(min(lo), 4) AS fence_lo_exact,
       round(min(hi), 4) AS fence_hi_exact,
       CAST(sum(CASE WHEN c_acctbal < lo OR c_acctbal > hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_exact,
       TRUE AS q1_in_bracket, TRUE AS q3_in_bracket,
       {_GK_ACC} AS accuracy
FROM customer JOIN f USING (c_mktsegment)
GROUP BY 1
"""


def quantile_summary_approx(spark: SparkSession, sf_dir: str, *,
                            audit: bool = True) -> DataFrame:
    """C2b bound-as-oracle form: exact p25/p50/p75/p95 audits +
    containment booleans; min/max stay the exact codegen aggregate."""
    det = quantile_summary_approx_detail(spark, sf_dir)
    if not audit:
        return det
    proj = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("v"))
    ex = stats.grouped_quantiles(proj, "o_orderpriority", "v",
                                 [0.25, 0.5, 0.75, 0.95],
                                 ["p25_e", "p50_e", "p75_e", "p95_e"],
                                 accuracy=_AUDIT_ACC)
    sel = ["o_orderpriority"]
    for a in ("p25", "p50", "p75", "p95"):
        sel += [F.round(f"{a}_e", 4).alias(f"{a}_exact"),
                ((F.col(f"{a}_lo") <= F.col(f"{a}_e"))
                 & (F.col(f"{a}_e") <= F.col(f"{a}_hi")))
                .alias(f"{a}_in_bracket")]
    return (det.join(F.broadcast(ex), "o_orderpriority")
               .select(*sel, "lo", "hi", "accuracy"))


QUANTILE_SUMMARY_APPROX_SQL = f"""
SELECT o_orderpriority,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 4)
         AS p25_exact, TRUE AS p25_in_bracket,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.50), 4)
         AS p50_exact, TRUE AS p50_in_bracket,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 4)
         AS p75_exact, TRUE AS p75_in_bracket,
       round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95), 4)
         AS p95_exact, TRUE AS p95_in_bracket,
       round(min(o_totalprice), 4) AS lo,
       round(max(o_totalprice), 4) AS hi,
       {_GK_ACC} AS accuracy
FROM orders GROUP BY o_orderpriority
"""


def rfm_bounds_approx(spark: SparkSession, sf_dir: str, *,
                      audit: bool = True) -> DataFrame:
    """A80b bound-as-oracle form: exact R/F/M quartile cut points as
    audit columns + GK-bracket containment booleans, over the SAME
    pinned melted frame (one orders scan+shuffle total)."""
    melted = _rfm_melted(spark, sf_dir)
    det = rfm_bounds_approx_detail(spark, sf_dir, melted=melted)
    if not audit:
        return det
    ex = stats.grouped_quantiles(melted, "metric", "__v",
                                 [0.25, 0.5, 0.75],
                                 ["q1_e", "q2_e", "q3_e"], accuracy=_AUDIT_ACC)
    sel = ["metric"]
    for a in ("q1", "q2", "q3"):
        sel += [F.round(f"{a}_e", 4).alias(f"{a}_exact"),
                ((F.col(f"{a}_lo") <= F.col(f"{a}_e"))
                 & (F.col(f"{a}_e") <= F.col(f"{a}_hi")))
                .alias(f"{a}_in_bracket")]
    return (det.join(F.broadcast(ex), "metric")
               .select(*sel, "accuracy")
               .orderBy("metric"))


RFM_BOUNDS_APPROX_SQL = """
WITH ref AS (SELECT max(o_orderdate) AS rd FROM orders),
pc AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                        CAST(any_value(rd) AS DATE)) AS DOUBLE) AS rec,
         CAST(count(*) AS DOUBLE) AS freq,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mon
  FROM orders CROSS JOIN ref GROUP BY 1
), melted AS (
  SELECT 'rec' AS metric, rec AS v FROM pc
  UNION ALL SELECT 'freq', freq FROM pc
  UNION ALL SELECT 'mon', mon FROM pc
)
SELECT metric,
       round(quantile_cont(v, 0.25), 4) AS q1_exact,
       TRUE AS q1_in_bracket,
       round(quantile_cont(v, 0.50), 4) AS q2_exact,
       TRUE AS q2_in_bracket,
       round(quantile_cont(v, 0.75), 4) AS q3_exact,
       TRUE AS q3_in_bracket,
       2000 AS accuracy
FROM melted GROUP BY 1 ORDER BY 1
"""


def funnel_latency_approx_quantiles(spark: SparkSession, sf_dir: str, *,
                                    audit: bool = True) -> DataFrame:
    """C38b bound-as-oracle form: exact p50/p90 latency audits +
    containment booleans, over the SAME pinned latency frame (the
    window stage runs once)."""
    lat = _funnel_latency_frame(spark, sf_dir)
    det = funnel_latency_approx_quantiles_detail(spark, sf_dir, lat=lat)
    if not audit:
        return det
    ex = stats.grouped_quantiles(lat, "g", "latency_s", [0.5, 0.9],
                                 ["p50_e", "p90_e"], accuracy=_AUDIT_ACC)
    return (det.crossJoin(F.broadcast(ex.drop("g")))
               .select(
                   "n_converted",
                   F.round("p50_e", 4).alias("p50_exact"),
                   F.round("p90_e", 4).alias("p90_exact"),
                   ((F.col("p50_lo") <= F.col("p50_e"))
                    & (F.col("p50_e") <= F.col("p50_hi")))
                   .alias("p50_in_bracket"),
                   ((F.col("p90_lo") <= F.col("p90_e"))
                    & (F.col("p90_e") <= F.col("p90_hi")))
                   .alias("p90_in_bracket"),
                   "accuracy"))


FUNNEL_LATENCY_APPROX_SQL = f"""
WITH d1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
), d2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM d1
), d3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t_click
                     THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM d2
), lat AS (
  SELECT (epoch_us(max(t_purchase)) - epoch_us(max(t_view)))
         / 1000000.0 AS latency_s
  FROM d3 GROUP BY user_id
  HAVING max(t_purchase) IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(latency_s, 0.5), 4) AS p50_exact,
       round(quantile_cont(latency_s, 0.9), 4) AS p90_exact,
       TRUE AS p50_in_bracket, TRUE AS p90_in_bracket,
       {_GK_ACC} AS accuracy
FROM lat
HAVING count(*) > 0
"""
# HAVING count(*) > 0 (code-review r08): with ZERO conversions the
# Spark side's single-group aggregation over an empty lat frame emits
# 0 rows, while a bare global aggregate here would emit one — the
# clause makes the oracle 0-row on that degenerate input too (the
# exact FUNNEL_LATENCY_SQL carries the same fix).
