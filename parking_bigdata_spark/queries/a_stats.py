"""Query registry — a_stats module (mechanically split from queries.py in r03; the REGISTRY and driver rotation live in the package __init__)."""


from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — resolves pandas-UDF type hints under
                     # postponed annotation evaluation

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import oracles
from ..io import clean_sentinel_numeric, load_table
from ..operators import clean, features, ml, profile, stats, temporal
from ..operators import dedup as dedup_ops
from ..operators import trees as trees_ops
from ..operators import similarity as sim_ops
from ..operators import text as text_ops

from itertools import combinations as _combos
from .a_core import (  # noqa: E501
    _DESCRIBE_COLS,
    _basket_pair_counts,
    _order_brands,
)


MODE_SQL = """
WITH c AS (
  SELECT l_returnflag, l_quantity, count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_returnflag, l_quantity, cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity) AS rn
  FROM c
)
SELECT l_returnflag, l_quantity AS mode_quantity, cnt AS n_occurrences
FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# A63. Median absolute deviation (robust dispersion) per group: the
# outlier-resistant companion to stddev for quality gating. Per-group
# medians are a TINY aggregate broadcast back to the fact (which never
# shuffles for the join); at 100 TB both medians switch to
# approx_percentile. Exact `median` matches DuckDB on doubles.
# --------------------------------------------------------------------------

def mad_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both medians go through stats.grouped_median — position-based
    selection on range-partitioned counts — because F.median sorts each
    group inside one aggregation buffer: with 3 giant groups that is 3
    single-task sorts of the whole fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    # materialize the 3-row median table: without it every scan of the
    # deviation pass replays the whole first-median lineage
    med = stats.grouped_median(li, "l_returnflag", "l_extendedprice") \
               .localCheckpoint(eager=True)
    dev = (li.join(F.broadcast(med), "l_returnflag")
             .select("l_returnflag",
                     F.abs(F.col("l_extendedprice") - F.col("med"))
                      .alias("adev"),
                     "med"))
    mad = stats.grouped_median(dev, "l_returnflag", "adev", alias="mad")
    return (med.join(F.broadcast(mad), "l_returnflag")
               .select("l_returnflag",
                       F.round("med", 4).alias("median_price"),
                       F.round("mad", 4).alias("mad")))

MAD_SQL = """
WITH med AS (
  SELECT l_returnflag, median(l_extendedprice) AS med
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       round(max(med), 4) AS median_price,
       round(median(abs(l.l_extendedprice - med)), 4) AS mad
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY l.l_returnflag
"""


# --------------------------------------------------------------------------
# A60. Ridge regression (closed form): one fused Gram-matrix aggregate,
# driver-side (XᵀX + λI) solve. Iterative-free L2 companion to LASSO.
# --------------------------------------------------------------------------

def ridge_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return ml.ridge_fit_df(li, ["l_quantity", "l_discount", "l_tax"],
                           "l_extendedprice", lam=10.0)


# --------------------------------------------------------------------------
# A64. Trimmed mean per group (drop lowest/highest floor(10%) by rank).
# Registered form: exact bracket-refine rank-trim
# (stats.grouped_trimmed_mean) — two order statistics + one conditional
# agg, no per-group buffers. The GROUPED_AGG pandas-UDF showcase
# (trimmed_mean_price_pandas) materializes each group's entire value
# array in one executor — fine as an API parity fixture
# (tests/test_operators_unit.py), an OOM at billion-row groups, so it
# is no longer the registered query (VERDICT r01 "what's wrong" #2).
# --------------------------------------------------------------------------

def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = stats.grouped_trimmed_mean(li, "l_returnflag", "l_extendedprice",
                                     trim=0.1, alias="__tm")
    return out.select("l_returnflag",
                      F.round(F.col("__tm"), 4).alias("trimmed_mean_price"),
                      "n")


def trimmed_mean_price_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas-UDF twin of ``trimmed_mean_price`` — kept as
    the Arrow aggregate API surface and as a cross-check fixture; not
    registered (whole-group materialization does not scale)."""
    @F.pandas_udf("double")
    def tmean(v: pd.Series) -> float:
        import numpy as np
        a = np.sort(v.to_numpy())
        k = int(len(a) * 0.1)
        return float(a[k: len(a) - k].mean())

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg
    return (li.groupBy("l_returnflag")
              .agg(F.round(tmean("l_extendedprice"), 4)
                    .alias("trimmed_mean_price"),
                   n_rows("l_extendedprice").alias("n")))

TRIMMED_MEAN_SQL = """
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       round(avg(l_extendedprice), 4) AS trimmed_mean_price,
       max(n) AS n
FROM r
WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
  AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A66. Forecast revenue change (TPC-H Q6 shape): pure scan-filter-agg —
# every predicate (shipdate year, discount band, quantity cap) reaches
# the parquet scan as a pushed filter; zero joins, one partial-agg
# reduce to a single row. The canonical "is pushdown working" probe:
# at 100 TB this reads only row groups whose min/max overlap the band.
# --------------------------------------------------------------------------

def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
                     & (F.col("l_discount") >= 0.04)
                     & (F.col("l_discount") <= 0.06)
                     & (F.col("l_quantity") < 24))
              .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                           4).alias("revenue_delta"),
                   F.count(F.lit(1)).alias("n_rows")))

FORECAST_DELTA_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue_delta,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# A67. Bilateral trade volume (TPC-H Q7 shape): revenue shipped between
# two specific nations, by supplier-nation x customer-nation x year.
# Both nation dims broadcast (two aliased copies); the only shuffle is
# lineitem<->orders on orderkey. The nation-pair filter applies right
# after the broadcast joins, before the wide shuffle.
# --------------------------------------------------------------------------

def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
              .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    orders.o_custkey == F.col("c_custkey"))
              .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
              .where(pair)
              .groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("ship_year"))
              .agg(F.round(F.sum(rev), 4).alias("volume"),
                   F.count(F.lit(1)).alias("n_lineitems")))

NATION_TRADE_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume,
       count(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# A68. Product-line profit (TPC-H Q9 shape): profit per supplier nation
# per year over a name-filtered part subset. The slim schema has no
# partsupp, so supply cost is modeled as 60% of retail price — the join
# topology (part+supplier broadcast into lineitem, one orders shuffle)
# is the Q9 plan. The part filter prunes the broadcast list BEFORE the
# fact join, so non-matching lineitem rows die at the join, not after.
# --------------------------------------------------------------------------

def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"))
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
              .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .groupBy(F.col("n_name").alias("nation"),
                       F.year("o_orderdate").alias("order_year"))
              .agg(F.round(F.sum(profit), 4).alias("profit"),
                   F.count(F.lit(1)).alias("n_lineitems")))

PROFIT_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS order_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 4) AS profit,
       count(*) AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# A69. Returned-item reporting (TPC-H Q10 shape): revenue lost to
# returns per customer in one quarter. The orderdate filter is pushed
# to the orders scan and the returnflag filter to the lineitem scan —
# both facts shrink before their orderkey shuffle; customer+nation
# broadcast into the aggregated result.
# --------------------------------------------------------------------------

def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q = (orders.where((F.col("o_orderdate") >= F.lit("1999-10-01").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))))
    return (li.where(F.col("l_returnflag") == "R")
              .join(q, li.l_orderkey == q.o_orderkey)
              .groupBy("o_custkey")
              .agg(F.round(F.sum(rev), 4).alias("lost_revenue"),
                   F.count(F.lit(1)).alias("n_returned"))
              .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
              .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
              .select(F.col("c_custkey"), F.col("c_mktsegment"),
                      F.col("n_name").alias("nation"),
                      F.round("c_acctbal", 4).alias("c_acctbal"),
                      "lost_revenue", "n_returned"))

RETURNED_ITEMS_SQL = """
SELECT c_custkey, c_mktsegment, n_name AS nation,
       round(c_acctbal, 4) AS c_acctbal,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS lost_revenue,
       count(*) AS n_returned
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1999-10-01'
  AND o_orderdate <  TIMESTAMP '2000-01-01'
GROUP BY 1, 2, 3, 4
"""


# --------------------------------------------------------------------------
# A70. Important-stock share (TPC-H Q11 shape): nations whose suppliers
# carry an above-threshold share of total shipped value. The global
# total (the scalar subquery) is a 1-row aggregate broadcast back via
# cross join — the fact is scanned twice but never self-joined; both
# money sums are exact decimals so the share threshold is
# engine-portable.
# --------------------------------------------------------------------------

def nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    val = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    per_nation = (li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
                    .join(F.broadcast(nation),
                          F.col("s_nationkey") == nation.n_nationkey)
                    .groupBy("n_name")
                    .agg(val.alias("value_dec")))
    total = li.agg(val.alias("total_dec"))
    return (per_nation.crossJoin(F.broadcast(total))
            .where(F.col("value_dec") > F.lit(0.02) * F.col("total_dec"))
            .select(F.col("n_name").alias("nation"),
                    F.round(F.col("value_dec").cast("double"), 2).alias("value"),
                    F.round((F.col("value_dec") / F.col("total_dec"))
                             .cast("double"), 6).alias("share")))

NATION_VALUE_SHARE_SQL = """
WITH per_nation AS (
  SELECT n_name, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name
), total AS (
  SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_dec FROM lineitem
)
SELECT n_name AS nation,
       round(CAST(value_dec AS DOUBLE), 2) AS value,
       round(CAST(value_dec / total_dec AS DOUBLE), 6) AS share
FROM per_nation CROSS JOIN total
WHERE value_dec > 0.02 * total_dec
"""


# --------------------------------------------------------------------------
# A71. Promotion revenue share (TPC-H Q14 shape): CASE-sum ratio over a
# month of shipments joined to the part dim. Part broadcast; the month
# filter is pushed to the lineitem scan; single partial-agg reduce to
# one row.
# --------------------------------------------------------------------------

def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.where((F.col("l_shipdate") >= F.lit("1999-09-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1999-10-01").cast("timestamp")))
              .join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6)
                    .alias("promo_pct"),
                   F.round(F.sum(rev), 4).alias("total_revenue")))

PROMO_PCT_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1999-09-01'
  AND l_shipdate <  TIMESTAMP '1999-10-01'
"""


# --------------------------------------------------------------------------
# A72. Small-quantity-order revenue (TPC-H Q17 shape): revenue from
# orders below half the part's average quantity. The correlated
# per-part average is decorrelated into a tiny aggregate over the
# brand-filtered fact subset, broadcast back — no self-join of the full
# fact. Quantities are integers stored as doubles, so the decimal
# average makes the 0.5x threshold exact in both engines.
# --------------------------------------------------------------------------

def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (load_table(spark, sf_dir, "part")
            .where(F.col("p_brand") == "Brand#1").select("p_partkey"))
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = (brand_li.groupBy(F.col("l_partkey").alias("ap_partkey"))
               .agg((F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                      / F.count(F.lit(1))).alias("avg_qty_dec")))
    return (brand_li.join(F.broadcast(avg_qty),
                          F.col("l_partkey") == F.col("ap_partkey"))
            .where(F.col("l_quantity").cast("decimal(18,2)")
                   < F.lit(0.5) * F.col("avg_qty_dec"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 4)
                  .alias("avg_yearly_loss"),
                 F.count(F.lit(1)).alias("n_small_orders")))

SMALL_QTY_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
), avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*) AS avg_qty_dec
  FROM brand_li GROUP BY 1
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly_loss,
       count(*) AS n_small_orders
FROM brand_li JOIN avg_qty ON l_partkey = ap_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) < 0.5 * avg_qty_dec
"""


# --------------------------------------------------------------------------
# A73. Disjunctive predicate revenue (TPC-H Q19 shape): three OR'd
# (brand x size-band x quantity-band) bundles evaluated in one pass
# after a broadcast part join. Catalyst extracts the common
# l_quantity <= 40 conjunct as a pushed scan filter; the rest of the
# disjunction runs in codegen above the join.
# --------------------------------------------------------------------------

def discounted_revenue_bundles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    b1 = ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(1, 11))
    b2 = ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
          & F.col("l_quantity").between(10, 20))
    b3 = ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
          & F.col("l_quantity").between(20, 40))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .where(b1 | b2 | b3)
              .agg(F.round(F.sum(rev), 4).alias("revenue"),
                   F.count(F.lit(1)).alias("n_rows")))

DISCOUNTED_BUNDLES_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
"""


# --------------------------------------------------------------------------
# A74. Excess-shipment suppliers (TPC-H Q20 shape): suppliers who moved
# more than a threshold quantity of PROMO parts in one year, restricted
# to one region's nations. The nested IN chain decorrelates to: tiny
# part list broadcast into the year-filtered fact -> per-supplier
# quantity agg (100 groups) -> HAVING -> semi-join target via broadcast.
# The fact shuffles once, on suppkey, already pre-aggregated map-side.
# --------------------------------------------------------------------------

def excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    promo = (load_table(spark, sf_dir, "part")
             .where(F.col("p_type") == "PROMO").select("p_partkey"))
    shipped = (li.where((F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
                        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")))
                 .join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
                 .groupBy("l_suppkey")
                 .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                       .alias("qty_dec"))
                 .where(F.col("qty_dec") > 400))
    target = (nation.join(F.broadcast(region),
                          nation.n_regionkey == region.r_regionkey)
                    .where(F.col("r_name") == "AMERICA"))
    return (sup.join(F.broadcast(shipped), sup.s_suppkey == F.col("l_suppkey"))
               .join(F.broadcast(target),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .select("s_suppkey", "s_name", F.col("n_name").alias("nation"),
                       F.col("qty_dec").cast("double").alias("promo_qty")))

EXCESS_SHIP_SQL = """
WITH shipped AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate <  TIMESTAMP '1999-01-01'
  GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 400
)
SELECT s_suppkey, s_name, n_name AS nation,
       CAST(qty_dec AS DOUBLE) AS promo_qty
FROM supplier
JOIN shipped ON s_suppkey = l_suppkey
JOIN nation  ON s_nationkey = n_nationkey
JOIN region  ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
"""


# --------------------------------------------------------------------------
# A75. MERGE-style upsert (CDC apply): base table + change set →
# updated rows overwrite, new keys append — the batch form of MERGE
# INTO for engines without ACID tables. One full-outer sort-merge join
# on the key applies updates AND detects inserts in a single pass
# (coalesce picks the change-set version when present); at scale both
# sides shuffle once on the key, exactly like the snapshot-diff audit.
# The change set is synthesized deterministically from orders itself:
# keys %7==0 get a status/price update, negated keys %13==0 are inserts.
# Output is the post-merge status distribution (small, hashable).
# --------------------------------------------------------------------------

def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    # exact-decimal price bump: a float multiply here would make the
    # double->decimal cast diverge between engines at half-cent ties
    upd = (orders.where(F.col("o_orderkey") % 7 == 0)
                 .select("o_orderkey", F.lit("U").alias("o_orderstatus"),
                         (F.col("o_totalprice").cast("decimal(18,2)")
                          + F.lit(100).cast("decimal(18,2)"))
                          .cast("double").alias("o_totalprice")))
    ins = (orders.where(F.col("o_orderkey") % 13 == 0)
                 .select((-F.col("o_orderkey") - 1).alias("o_orderkey"),
                         F.lit("N").alias("o_orderstatus"),
                         F.col("o_totalprice")))
    chg = upd.unionByName(ins)
    b = base.alias("b")
    c = chg.alias("c")
    merged = (b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"),
                     "full_outer")
               .select(F.coalesce(F.col("c.o_orderstatus"),
                                  F.col("b.o_orderstatus")).alias("status"),
                       F.coalesce(F.col("c.o_totalprice"),
                                  F.col("b.o_totalprice")).alias("price")))
    return (merged.groupBy("status")
                  .agg(F.count(F.lit(1)).alias("n_rows"),
                       F.round(F.sum(F.col("price").cast("decimal(18,2)"))
                                .cast("double"), 2).alias("total_price")))

MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
), chg AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2))
              + CAST(100 AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT -o_orderkey - 1, 'N', o_totalprice
  FROM orders WHERE o_orderkey % 13 = 0
), merged AS (
  SELECT coalesce(c.o_orderstatus, b.o_orderstatus) AS status,
         coalesce(c.o_totalprice, b.o_totalprice) AS price
  FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
)
SELECT status, count(*) AS n_rows,
       round(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_price
FROM merged GROUP BY 1
"""


# --------------------------------------------------------------------------
# A18e. Levene's test, Brown-Forsythe variant (variance homogeneity —
# the assumption check behind ANOVA, R:768). Median-centered absolute
# deviations, then a one-way F on them. The per-group medians are a
# tiny aggregate broadcast back (the fact never shuffles for the join,
# same pattern as the MAD operator); the F statistic reduces to fused
# group moments. Exact medians are fine per group; approx_percentile
# is the documented 100 TB swap.
# --------------------------------------------------------------------------

def levene_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_mktsegment", "c_acctbal")
            .where(F.col("c_acctbal").isNotNull()))
    med = (cust.groupBy("c_mktsegment")
               .agg(F.median("c_acctbal").alias("med")))
    z = (cust.join(F.broadcast(med), "c_mktsegment")
             .select("c_mktsegment",
                     F.abs(F.col("c_acctbal") - F.col("med")).alias("z")))
    g = (z.groupBy("c_mktsegment")
          .agg(F.count(F.lit(1)).alias("n_g"),
               F.avg("z").alias("mean_g"),
               F.var_samp("z").alias("var_g")))
    gm = g.agg((F.sum(F.col("n_g") * F.col("mean_g"))
                / F.sum("n_g")).alias("grand_mean"))
    t = (g.crossJoin(F.broadcast(gm))
          .agg(F.sum("n_g").alias("n"), F.count(F.lit(1)).alias("k"),
               F.sum(F.col("n_g")
                     * (F.col("mean_g") - F.col("grand_mean"))
                     * (F.col("mean_g") - F.col("grand_mean"))).alias("ssb"),
               F.sum((F.col("n_g") - 1) * F.col("var_g")).alias("ssw")))
    n, k = F.col("n"), F.col("k")
    return t.select(
        n.cast("long").alias("n_obs"), k.alias("n_groups"),
        F.round((F.col("ssb") / (k - 1)) / (F.col("ssw") / (n - k)), 4)
         .alias("w_stat"))

LEVENE_SQL = """
WITH c AS (
  SELECT c_mktsegment, c_acctbal FROM customer WHERE c_acctbal IS NOT NULL
), med AS (
  SELECT c_mktsegment, median(c_acctbal) AS med FROM c GROUP BY 1
), z AS (
  SELECT c.c_mktsegment, abs(c_acctbal - med) AS z
  FROM c JOIN med USING (c_mktsegment)
), g AS (
  SELECT c_mktsegment, count(*) AS n_g, avg(z) AS mean_g,
         var_samp(z) AS var_g
  FROM z GROUP BY 1
), gm AS (
  SELECT sum(n_g * mean_g) / sum(n_g) AS grand_mean FROM g
), t AS (
  SELECT sum(n_g) AS n, count(*) AS k,
         sum(n_g * (mean_g - grand_mean) * (mean_g - grand_mean)) AS ssb,
         sum((n_g - 1) * var_g) AS ssw
  FROM g, gm
)
SELECT CAST(n AS BIGINT) AS n_obs, k AS n_groups,
       round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS w_stat
FROM t
"""


# --------------------------------------------------------------------------
# A18f. Mann-Whitney U test (2-sample rank test, the nonparametric
# companion to the Welch t-test A17): urgent- vs low-priority order
# values. Tie-averaged ranks are computed on the DISTINCT-value table
# (never a per-row sort — the rank window runs over |unique values|
# rows), exactly the Kruskal-Wallis machinery restricted to two
# groups, plus the normal approximation with tie correction.
# --------------------------------------------------------------------------

def mannwhitney_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
         .select("o_orderpriority", "o_totalprice"))
    # materialized (localCheckpoint): the rank helper's branches and
    # the tie-correction agg otherwise replay the orders scan+shuffle 4x
    vals = (o.groupBy("o_totalprice").agg(F.count(F.lit(1)).alias("t"))
             .localCheckpoint(eager=True))
    # range-partitioned ranks: near-unique prices make the distinct
    # table orders-sized — never a single-task global window
    ranked = stats.tie_avg_ranks(vals, "o_totalprice", "t")
    per = (o.groupBy("o_orderpriority", "o_totalprice")
            .agg(F.count(F.lit(1)).alias("n_vg")))
    grp = (per.join(ranked.select("o_totalprice", "avg_rank"), "o_totalprice")
              .groupBy("o_orderpriority")
              .agg(F.sum(F.col("avg_rank") * F.col("n_vg")).alias("rg"),
                   F.sum("n_vg").alias("ng")))
    g1 = grp.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("rg").alias("r1"), F.col("ng").alias("n1"))
    g2 = grp.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("ng").alias("n2"))
    ties = vals.agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
                     .alias("tie3"))
    n1, n2, tie3 = F.col("n1"), F.col("n2"), F.col("tie3")
    n = n1 + n2
    u1 = F.col("r1") - (n1 * (n1 + 1)) / F.lit(2.0)
    mu = n1 * n2 / F.lit(2.0)
    sig2 = (n1 * n2 / F.lit(12.0)) * ((n + 1)
            - tie3 / ((n * (n - 1)).cast("double")))
    zed = (u1 - mu) / F.sqrt(sig2)
    return (g1.crossJoin(g2).crossJoin(ties)
              .select(n1.cast("long").alias("n_urgent"),
                      n2.cast("long").alias("n_low"),
                      F.round(u1, 4).alias("u_stat"),
                      F.round(zed, 4).alias("z_stat")))

MANNWHITNEY_SQL = """
WITH o AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), vals AS (
  SELECT o_totalprice, count(*) AS t FROM o GROUP BY 1
), ranked AS (
  SELECT o_totalprice, t,
         sum(t) OVER (ORDER BY o_totalprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vals
), r2 AS (
  SELECT o_totalprice, cum - t + (t + 1) / 2.0 AS avg_rank FROM ranked
), per AS (
  SELECT o_orderpriority, o_totalprice, count(*) AS n_vg FROM o GROUP BY 1, 2
), grp AS (
  SELECT o_orderpriority, sum(avg_rank * n_vg) AS rg,
         CAST(sum(n_vg) AS BIGINT) AS ng
  FROM per JOIN r2 USING (o_totalprice) GROUP BY 1
), ties AS (
  SELECT sum(t * t * t - t) AS tie3 FROM vals
), g1 AS (
  SELECT rg AS r1, ng AS n1 FROM grp WHERE o_orderpriority = '1-URGENT'
), g2 AS (
  SELECT ng AS n2 FROM grp WHERE o_orderpriority = '5-LOW'
)
SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_low,
       round(r1 - (n1 * (n1 + 1)) / 2.0, 4) AS u_stat,
       round((r1 - (n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
             / sqrt((n1 * n2 / 12.0)
                    * ((n1 + n2 + 1)
                       - tie3 / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))),
             4) AS z_stat
FROM g1, g2, ties
"""


# --------------------------------------------------------------------------
# A76. HHI market-concentration audit: squared revenue shares of each
# supplier within its nation (the antitrust concentration index — the
# reference's share-of-total EDA generalized). Per-supplier revenues
# are one fact shuffle on (nationkey, suppkey); the nation-level HHI is
# computed on the supplier-sized table. Intermediate revenues are NOT
# rounded — only the final 0..1 ratio is (rounding near-half
# intermediates is the cross-engine divergence trap).
# --------------------------------------------------------------------------

def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    srev = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
              .groupBy("s_nationkey", "s_suppkey")
              .agg(F.sum(rev).alias("rev")))
    return (srev.join(F.broadcast(nation),
                      srev.s_nationkey == nation.n_nationkey)
                .groupBy("n_name")
                .agg(F.count(F.lit(1)).alias("n_suppliers"),
                     F.round(F.sum(F.col("rev") * F.col("rev"))
                             / (F.sum("rev") * F.sum("rev")), 4)
                      .alias("hhi")))

HHI_SQL = """
WITH srev AS (
  SELECT s_nationkey, s_suppkey,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(rev * rev) / (sum(rev) * sum(rev)), 4) AS hhi
FROM srev JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A77. Benford first-digit audit (fraud/anomaly screening on amount
# columns). The leading digit comes from the STRING form — identical
# across engines, immune to log10 ulp effects at power-of-ten
# boundaries. One shuffle over 9 digit groups; expected Benford mass
# is ln(1+1/d)/ln(10); chi-square contribution per digit.
# --------------------------------------------------------------------------

def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.regexp_extract(F.col("o_totalprice").cast("string"),
                             "^([1-9])", 1)
    counts = (orders.where(F.col("o_totalprice") > 0)
              .select(digit.cast("int").alias("digit"))
              .where(F.col("digit").isNotNull())
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n").alias("n_total"))
    exp_frac = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (counts.crossJoin(F.broadcast(total))
            .select("digit", "n",
                    F.round(F.col("n") / F.col("n_total"), 4)
                     .alias("obs_frac"),
                    F.round(exp_frac, 4).alias("exp_frac"),
                    F.round(F.pow(F.col("n") - F.col("n_total") * exp_frac, 2)
                            / (F.col("n_total") * exp_frac), 4)
                     .alias("chi2_term")))

BENFORD_SQL = """
WITH counts AS (
  SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR),
                             '^([1-9])', 1) AS INT) AS digit,
         count(*) AS n
  FROM orders
  WHERE o_totalprice > 0
    AND regexp_extract(CAST(o_totalprice AS VARCHAR), '^([1-9])', 1) <> ''
  GROUP BY 1
), total AS (SELECT sum(n) AS n_total FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / n_total, 4) AS obs_frac,
       round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS exp_frac,
       round(pow(n - n_total * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2)
             / (n_total * (ln(1.0 + 1.0 / digit) / ln(10.0))), 4)
         AS chi2_term
FROM counts CROSS JOIN total
"""


# --------------------------------------------------------------------------
# A78. Market-basket brand affinity (support + lift): which part
# brands co-occur in the same order beyond chance. The distinct
# (order, brand) table shuffles once on orderkey into per-order sorted
# brand ARRAYS; unordered pairs are generated IN-ROW by a nested
# transform over the array (bounded by items-per-order, ≤7 in TPC-H
# shape) — no self-join, no second shuffle of the pair table (A/B'ed
# 12.7s self-join vs 4.9s arrays at 20x stress). Brand marginals and
# the order total are broadcast back onto the brands²-sized counts.
# --------------------------------------------------------------------------

def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the distinct (order, brand) table: the marginal,
    # n_ord, and per-order branches (THREE consumers) otherwise replay
    # the fact scan+join+distinct — the measured crossover where the
    # checkpoint wins (contrast item_cosine_similarity's two consumers)
    ob = _order_brands(spark, sf_dir).localCheckpoint(eager=True)
    n_ord = (ob.select("ok").distinct()
               .agg(F.count(F.lit(1)).alias("n_ord")))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n_b"))
    pairs = (_basket_pair_counts(ob)
             .withColumnRenamed("a", "brand_a")
             .withColumnRenamed("b", "brand_b"))
    ca = bc.select(F.col("brand").alias("brand_a"),
                   F.col("n_b").alias("n_a_orders"))
    cb = bc.select(F.col("brand").alias("brand_b"),
                   F.col("n_b").alias("n_b_orders"))
    return (pairs.join(F.broadcast(ca), "brand_a")
                 .join(F.broadcast(cb), "brand_b")
                 .crossJoin(F.broadcast(n_ord))
                 .select("brand_a", "brand_b", "n_ab",
                         F.round(F.col("n_ab") / F.col("n_ord"), 4)
                          .alias("support"),
                         F.round((F.col("n_ab") * F.col("n_ord"))
                                 / (F.col("n_a_orders")
                                    * F.col("n_b_orders")), 4)
                          .alias("lift")))

BASKET_LIFT_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n_orders AS (SELECT count(DISTINCT ok) AS n_ord FROM ob),
bc AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY 1),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
  FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab / n_ord, 4) AS support,
       round((n_ab * n_ord) / (ca.n_b * cb.n_b), 4) AS lift
FROM pairs CROSS JOIN n_orders
JOIN bc ca ON ca.brand = brand_a
JOIN bc cb ON cb.brand = brand_b
"""


# --------------------------------------------------------------------------
# A79. Gini concentration coefficient per customer segment — the
# inequality measure of account balances, via the rank formula
# G = 2·Σ rᵢxᵢ / (n·Σx) − (n+1)/n with tie-AVERAGED ranks (making the
# result permutation-invariant under ties). Ranks come from
# stats.tie_avg_ranks_by_group: range-partitioned on VALUE, so no
# segment's window ever collapses to one task (the low-cardinality
# partition trap). Everything after the distinct-value aggregate is
# value-cardinality-sized.
# --------------------------------------------------------------------------

def gini_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    counts = (cust.where(F.col("c_acctbal") > 0)
                  .groupBy("c_mktsegment",
                           F.col("c_acctbal").alias("v"))
                  .agg(F.count(F.lit(1)).alias("t"))
                  # materialize: the rank helper's branches otherwise
                  # replay the customer scan+shuffle
                  .localCheckpoint(eager=True))
    ranked = stats.tie_avg_ranks_by_group(
        counts, "c_mktsegment", "v", "t", alias="r")
    per = (ranked.groupBy("c_mktsegment")
           .agg(F.sum("t").alias("n"),
                F.sum(F.col("v") * F.col("t")).alias("sx"),
                F.sum(F.col("r") * F.col("v") * F.col("t")).alias("srx")))
    return per.select(
        "c_mktsegment", F.col("n").alias("n_customers"),
        F.round(2.0 * F.col("srx") / (F.col("n") * F.col("sx"))
                - (F.col("n") + 1.0) / F.col("n"), 4).alias("gini"))

GINI_SQL = """
WITH counts AS (
  SELECT c_mktsegment, c_acctbal AS v, count(*) AS t
  FROM customer WHERE c_acctbal > 0 GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, v, t,
         sum(t) OVER (PARTITION BY c_mktsegment ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (t - 1) / 2.0 AS r
  FROM counts
)
SELECT c_mktsegment, CAST(sum(t) AS BIGINT) AS n_customers,
       round(2.0 * sum(r * v * t) / (sum(t) * sum(v * t))
             - (sum(t) + 1.0) / sum(t), 4) AS gini
FROM ranked GROUP BY 1
"""


# --------------------------------------------------------------------------
# A18g. Two-sample Kolmogorov-Smirnov test (URGENT vs LOW order
# values): D = max |ECDF₁ − ECDF₂| over the DISTINCT-value table. Both
# ECDFs come from ONE range-partitioned cumulative pass
# (stats.range_cumsum — no single-task global window over the
# near-unique price column); the scaled statistic √(n₁n₂/(n₁+n₂))·D
# is the classic large-sample form. Distinct-value agg first, so the
# window input is value-cardinality-sized, not row-sized.
# --------------------------------------------------------------------------

def ks_order_value_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    g1, g2 = "1-URGENT", "5-LOW"
    orders = load_table(spark, sf_dir, "orders")
    counts = (orders.where(F.col("o_orderpriority").isin(g1, g2))
              .groupBy(F.col("o_totalprice").alias("v"))
              .agg(F.sum(F.when(F.col("o_orderpriority") == g1, 1)
                          .otherwise(0)).alias("n1"),
                   F.sum(F.when(F.col("o_orderpriority") == g2, 1)
                          .otherwise(0)).alias("n2"))
              # materialize the distinct-value table: the cumulative
              # pass + total otherwise replay the orders scan+shuffle
              # per lineage branch
              .localCheckpoint(eager=True))
    cum = stats.range_cumsum(counts, "v", ["n1", "n2"])
    tot = counts.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    d = (cum.crossJoin(F.broadcast(tot))
            .agg(F.max(F.abs(F.col("cum_n1") / F.col("t1")
                             - F.col("cum_n2") / F.col("t2"))).alias("d"),
                 F.any_value("t1").alias("t1"),
                 F.any_value("t2").alias("t2")))
    return d.select(
        F.col("t1").alias("n_urgent"), F.col("t2").alias("n_low"),
        F.round("d", 4).alias("ks_d"),
        F.round(F.sqrt(F.col("t1") * F.col("t2")
                       / (F.col("t1") + F.col("t2"))) * F.col("d"), 4)
         .alias("ks_stat"))

KS_SQL = """
WITH counts AS (
  SELECT o_totalprice AS v,
         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS n2
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY 1
), cum AS (
  SELECT sum(n1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS c1,
         sum(n2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS c2
  FROM counts
), tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM counts),
d AS (
  SELECT max(abs(c1 / t1 - c2 / t2)) AS d,
         any_value(t1) AS t1, any_value(t2) AS t2
  FROM cum CROSS JOIN tot
)
SELECT CAST(t1 AS BIGINT) AS n_urgent, CAST(t2 AS BIGINT) AS n_low,
       round(d, 4) AS ks_d,
       round(sqrt(t1 * t2 / (t1 + t2)) * d, 4) AS ks_stat
FROM d
"""


# --------------------------------------------------------------------------
# A80. RFM customer segmentation (recency / frequency / monetary
# quartile scores — the classic CRM cohorting). One orders shuffle
# builds the per-customer metric table; each metric's quartile bounds
# come from the exact bracket-refine grouped_quantiles (customer-sized
# input, broadcast back as 1-row tables); scores are strict-threshold
# counts so both engines bucket boundary ties identically. Output is
# the 4³-ish segment grid.
# --------------------------------------------------------------------------

def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("rd"))
    pc = (orders.groupBy("o_custkey")
          .agg(F.max("o_orderdate").alias("last_o"),
               F.count(F.lit(1)).alias("freq"),
               F.sum(money("o_totalprice")).alias("mon_dec"))
          .crossJoin(F.broadcast(ref))
          .select("o_custkey", "freq", "mon_dec",
                  F.col("mon_dec").cast("double").alias("mon"),
                  F.datediff(F.to_date("rd"), F.to_date("last_o"))
                   .cast("double").alias("rec")))
    # materialize the customer-sized metric table: the three quantile
    # probes + scoring otherwise replay the orders scan+shuffle ~8x
    pc = pc.withColumn("__g", F.lit(1)).localCheckpoint(eager=True)
    bounds = {}
    for m in ("rec", "freq", "mon"):
        bounds[m] = stats.grouped_quantiles(
            pc.withColumn(m, F.col(m).cast("double")), "__g", m,
            [0.25, 0.5, 0.75], [f"{m}_q1", f"{m}_q2", f"{m}_q3"]
        ).drop("__g")
    scored = pc
    for m in ("rec", "freq", "mon"):
        scored = scored.crossJoin(F.broadcast(bounds[m]))
    up = lambda m: ((F.col(m) > F.col(f"{m}_q1")).cast("int")
                    + (F.col(m) > F.col(f"{m}_q2")).cast("int")
                    + (F.col(m) > F.col(f"{m}_q3")).cast("int"))
    seg = scored.select(
        "mon_dec",
        (4 - up("rec")).alias("r_score"),
        (1 + up("freq")).alias("f_score"),
        (1 + up("mon")).alias("m_score"))
    # avg over the EXACT decimal sum (one deterministic division) —
    # averaging the per-customer doubles instead re-rounds a value that
    # sits on a half-tick differently per partition order
    return (seg.groupBy(F.concat(F.col("r_score").cast("string"),
                                 F.col("f_score").cast("string"),
                                 F.col("m_score").cast("string"))
                        .alias("rfm_segment"))
               .agg(F.count(F.lit(1)).alias("n_customers"),
                    F.round(F.sum("mon_dec").cast("double")
                            / F.count(F.lit(1)), 4).alias("avg_monetary")))

RFM_SQL = """
WITH ref AS (SELECT max(o_orderdate) AS rd FROM orders),
pc AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                        CAST(any_value(rd) AS DATE)) AS DOUBLE) AS rec,
         count(*) AS freq,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon_dec,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mon
  FROM orders CROSS JOIN ref GROUP BY 1
), b AS (
  SELECT quantile_cont(rec, 0.25) AS rec_q1, quantile_cont(rec, 0.5) AS rec_q2,
         quantile_cont(rec, 0.75) AS rec_q3,
         quantile_cont(CAST(freq AS DOUBLE), 0.25) AS freq_q1,
         quantile_cont(CAST(freq AS DOUBLE), 0.5) AS freq_q2,
         quantile_cont(CAST(freq AS DOUBLE), 0.75) AS freq_q3,
         quantile_cont(mon, 0.25) AS mon_q1, quantile_cont(mon, 0.5) AS mon_q2,
         quantile_cont(mon, 0.75) AS mon_q3
  FROM pc
), seg AS (
  SELECT mon_dec,
         4 - ((rec > rec_q1)::INT + (rec > rec_q2)::INT
              + (rec > rec_q3)::INT) AS r_score,
         1 + (freq > freq_q1)::INT + (freq > freq_q2)::INT
           + (freq > freq_q3)::INT AS f_score,
         1 + (mon > mon_q1)::INT + (mon > mon_q2)::INT
           + (mon > mon_q3)::INT AS m_score
  FROM pc CROSS JOIN b
)
SELECT concat(CAST(r_score AS VARCHAR), CAST(f_score AS VARCHAR),
              CAST(m_score AS VARCHAR)) AS rfm_segment,
       count(*) AS n_customers,
       round(CAST(sum(mon_dec) AS DOUBLE) / count(*), 4) AS avg_monetary
FROM seg GROUP BY 1
"""


# --------------------------------------------------------------------------
# A81. Kaplan-Meier retention curve: survival S(t) over user activity
# lifespans. Churn = the first ≥3-day inactivity gap (including
# trailing inactivity before corpus end); users with no such gap are
# right-CENSORED at corpus end — a genuine event/censor mix on this
# near-daily-activity corpus. Classic KM product
# Π(1 − dᵢ/nᵢ) distributed as exp(−Σ −ln(factor)): both cumulative
# passes (at-risk counts, log-factors) ride stats.range_cumsum on the
# distinct-duration table — never a row-sized window, and the −ln form
# keeps the running sum non-negative as range_cumsum requires.
# --------------------------------------------------------------------------

def _churn_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival life table (3-day-gap churn, right-censored at
    the observation edge): one row per duration with event/censor
    counts and the at-risk set — the common input of the Kaplan-Meier
    (C13 family) and Nelson-Aalen estimators. Cumulatives run through
    range_cumsum on the ≤#days-sized duration table."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    mx = ev.agg(F.max(F.to_date("ts")).alias("m"))
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wlead = Window.partitionBy("user_id").orderBy("d")
    g = ud.withColumn("nxt", F.lead("d").over(wlead))
    per_user = (g.groupBy("user_id")
                 .agg(F.min(F.when(F.datediff("nxt", "d") >= 3,
                                   F.col("d"))).alias("ichurn"),
                      F.min("d").alias("fd"), F.max("d").alias("ld"))
                 .crossJoin(F.broadcast(mx))
                 .withColumn("cd", F.coalesce(
                     "ichurn",
                     F.when(F.datediff("m", "ld") >= 3, F.col("ld"))))
                 .select(F.datediff(F.coalesce("cd", "m"), "fd")
                          .alias("dur"),
                         F.col("cd").isNotNull().cast("int")
                          .alias("churned")))
    counts = (per_user.groupBy("dur")
              .agg(F.sum("churned").alias("d"),
                   F.sum(1 - F.col("churned")).alias("c"))
              .localCheckpoint(eager=True))
    tot = counts.agg((F.sum("d") + F.sum("c")).alias("n_total"))
    return (stats.range_cumsum(counts, "dur", ["d", "c"])
            .crossJoin(F.broadcast(tot))
            .withColumn("at_risk",
                        F.col("n_total") - (F.col("cum_d") + F.col("cum_c"))
                        + F.col("d") + F.col("c")))


#: shared SQL CTE prefix for the churn life table (ends at ``cum``
#: with columns dur, d, c, at_risk) — keep in lockstep with
#: _churn_life_table
_CHURN_LIFE_SQL = """
WITH mx AS (SELECT CAST(max(ts) AS DATE) AS m
            FROM events WHERE ts IS NOT NULL),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
       FROM events WHERE ts IS NOT NULL),
g AS (SELECT user_id, d,
             lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
      FROM ud),
f AS (SELECT user_id,
             min(CASE WHEN date_diff('day', d, nxt) >= 3 THEN d END)
               AS ichurn,
             min(d) AS fd, max(d) AS ld
      FROM g GROUP BY 1),
per_user AS (
  SELECT date_diff('day', fd,
                   coalesce(coalesce(ichurn,
                            CASE WHEN date_diff('day', ld, m) >= 3
                                 THEN ld END), m)) AS dur,
         (coalesce(ichurn,
                   CASE WHEN date_diff('day', ld, m) >= 3
                        THEN ld END) IS NOT NULL)::INT AS churned
  FROM f CROSS JOIN mx
), counts AS (
  SELECT dur, sum(churned) AS d, sum(1 - churned) AS c
  FROM per_user GROUP BY 1
), tot AS (SELECT sum(d) + sum(c) AS n_total FROM counts),
cum AS (
  SELECT dur, d, c, n_total,
         n_total - (sum(d) OVER w + sum(c) OVER w) + d + c AS at_risk
  FROM counts CROSS JOIN tot
  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)"""


def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum = (_churn_life_table(spark, sf_dir)
           .withColumn("neg_ln_f",
                       F.when(F.col("d") > 0,
                              -F.log(1.0 - F.col("d") / F.col("at_risk")))
                        .otherwise(F.lit(0.0))))
    km = stats.range_cumsum(cum, "dur", ["neg_ln_f"])
    return (km.where(F.col("d") > 0)
              .select(F.col("dur").cast("int").alias("duration_days"),
                      F.col("at_risk").alias("n_at_risk"),
                      F.col("d").alias("n_churned"),
                      F.round(F.exp(-F.col("cum_neg_ln_f")), 4)
                       .alias("survival")))

KM_SQL = _CHURN_LIFE_SQL + """, km AS (
  SELECT dur, d, at_risk,
         sum(CASE WHEN d > 0 THEN -ln(1.0 - d / at_risk)
                  ELSE 0.0 END)
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_neg_ln_f
  FROM cum
)
SELECT CAST(dur AS INT) AS duration_days,
       CAST(at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_churned,
       round(exp(-cum_neg_ln_f), 4) AS survival
FROM km WHERE d > 0
"""


# --------------------------------------------------------------------------
# A82. Deterministic half-sample bootstrap CI for the mean order
# value: 32 replicates, each keeping rows whose md5(key:replicate)
# prefix clears a 50% threshold (engine-portable, seed-free — same
# construction as deterministic_sample_orders). The fact is scanned
# ONCE; the explode is codegen'd and map-side partial aggregation
# collapses the 32x row fan-out to 32 partials per task, so the
# shuffle is replicate-count-sized. Replicate means use exact-decimal
# sums (one deterministic division each).
# --------------------------------------------------------------------------

def bootstrap_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    orders = load_table(spark, sf_dir, "orders")
    rep = (orders.select(money("o_totalprice").alias("p"),
                         F.col("o_orderkey").cast("string").alias("k"),
                         F.explode(F.sequence(F.lit(1), F.lit(32)))
                          .alias("b"))
           .where(F.substring(
               F.md5(F.concat_ws(":", "k", F.col("b").cast("string"))),
               1, 1) < "8")
           .groupBy("b")
           .agg((F.sum("p").cast("double") / F.count(F.lit(1)))
                .alias("rep_mean")))
    full = orders.agg(
        F.round(F.sum(money("o_totalprice")).cast("double")
                / F.count(F.lit(1)), 4).alias("full_mean"))
    return (rep.agg(F.count(F.lit(1)).alias("n_replicates"),
                    F.avg("rep_mean").alias("bm"),
                    F.stddev_samp("rep_mean").alias("sd"))
               .crossJoin(F.broadcast(full))
               .select("n_replicates",
                       F.round("bm", 4).alias("boot_mean"),
                       F.round(F.col("bm") - 1.96 * F.col("sd"), 4)
                        .alias("ci_lo"),
                       F.round(F.col("bm") + 1.96 * F.col("sd"), 4)
                        .alias("ci_hi"),
                       "full_mean"))

BOOTSTRAP_SQL = """
WITH rep AS (
  SELECT b,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS rep_mean
  FROM orders
  CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b)
  WHERE substring(md5(concat_ws(':', CAST(o_orderkey AS VARCHAR),
                                CAST(b AS VARCHAR))), 1, 1) < '8'
  GROUP BY 1
), s AS (
  SELECT count(*) AS n_replicates, avg(rep_mean) AS bm,
         stddev_samp(rep_mean) AS sd
  FROM rep
), fs AS (
  SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*), 4) AS full_mean
  FROM orders
)
SELECT n_replicates, round(bm, 4) AS boot_mean,
       round(bm - 1.96 * sd, 4) AS ci_lo,
       round(bm + 1.96 * sd, 4) AS ci_hi,
       full_mean
FROM s CROSS JOIN fs
"""


# --------------------------------------------------------------------------
# A18h. Two-proportion z-test (pooled): finished-order rate, URGENT vs
# LOW priority — the categorical companion to the Welch t-test. All
# four counts come from ONE conditional-aggregate scan (no join, no
# window); the z statistic is scalar arithmetic on the 1-row result.
# --------------------------------------------------------------------------

def prop_ztest_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    is1 = F.col("o_orderpriority") == "1-URGENT"
    is2 = F.col("o_orderpriority") == "5-LOW"
    hit = F.col("o_orderstatus") == "F"
    agg = o.agg(
        F.sum(is1.cast("int")).alias("n1"),
        F.sum((is1 & hit).cast("int")).alias("x1"),
        F.sum(is2.cast("int")).alias("n2"),
        F.sum((is2 & hit).cast("int")).alias("x2"))
    n1, x1 = F.col("n1"), F.col("x1")
    n2, x2 = F.col("n2"), F.col("x2")
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    zed = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    return agg.select(
        n1.cast("long").alias("n_urgent"), n2.cast("long").alias("n_low"),
        F.round(p1, 4).alias("rate_urgent"),
        F.round(p2, 4).alias("rate_low"),
        F.round(zed, 4).alias("z_stat"))

PROP_ZTEST_SQL = """
WITH agg AS (
  SELECT sum((o_orderpriority = '1-URGENT')::INT) AS n1,
         sum((o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')::INT)
           AS x1,
         sum((o_orderpriority = '5-LOW')::INT) AS n2,
         sum((o_orderpriority = '5-LOW' AND o_orderstatus = 'F')::INT)
           AS x2
  FROM orders
)
SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_low,
       round(x1 / n1, 4) AS rate_urgent,
       round(x2 / n2, 4) AS rate_low,
       round((x1 / n1 - x2 / n2)
             / sqrt(((x1 + x2) / (n1 + n2)) * (1 - (x1 + x2) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 4) AS z_stat
FROM agg
"""


# --------------------------------------------------------------------------
# A83. Information gain feature screening: IG(label; feature) =
# H(label) − H(label|feature) from exact contingency counts — the
# entropy-based analogue of the VIF/correlation feature screens. One
# (feature, label) shuffle per feature, both features unioned into a
# single pass pipeline; entropies via Σ n·ln n identities on the tiny
# contingency tables (same algebra as token_entropy_by_source).
# --------------------------------------------------------------------------

def info_gain_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.select(
        F.col("l_returnflag").alias("y"),
        F.explode(F.array(
            F.struct(F.lit("linestatus").alias("feature"),
                     F.col("l_linestatus").alias("x")),
            F.struct(F.lit("qty_bin").alias("feature"),
                     F.floor(F.col("l_quantity") / 10).cast("string")
                      .alias("x")))).alias("f")
    ).select("y", "f.feature", "f.x")
    cell = feats.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).alias("n"))
    # H(y|x) = (Σ_x n_x·H_x)/N with H_x = ln n_x − Σ_y n·ln n / n_x;
    # everything reduces to sums of n·ln n over the contingency table
    per_feat = cell.groupBy("feature").agg(
        F.sum("n").alias("N"),
        F.sum(F.col("n") * F.log("n")).alias("s_cell"))
    margx = (cell.groupBy("feature", "x").agg(F.sum("n").alias("nx"))
             .groupBy("feature")
             .agg(F.sum(F.col("nx") * F.log("nx")).alias("s_x")))
    margy = (cell.groupBy("feature", "y").agg(F.sum("n").alias("ny"))
             .groupBy("feature")
             .agg(F.sum(F.col("ny") * F.log("ny")).alias("s_y")))
    j = per_feat.join(margx, "feature").join(margy, "feature")
    h_y = F.log("N") - F.col("s_y") / F.col("N")
    h_y_given_x = (F.col("s_x") - F.col("s_cell")) / F.col("N")
    return j.select("feature",
                    F.round(h_y, 4).alias("h_label"),
                    F.round(h_y_given_x, 4).alias("h_label_given_feature"),
                    F.round(h_y - h_y_given_x, 4).alias("info_gain"))

INFO_GAIN_SQL = """
WITH feats AS (
  SELECT l_returnflag AS y, 'linestatus' AS feature, l_linestatus AS x
  FROM lineitem
  UNION ALL
  SELECT l_returnflag AS y, 'qty_bin' AS feature,
         CAST(floor(l_quantity / 10) AS VARCHAR) AS x
  FROM lineitem
), cell AS (
  SELECT feature, x, y, count(*) AS n FROM feats GROUP BY 1, 2, 3
), per_feat AS (
  SELECT feature, sum(n) AS N, sum(n * ln(n)) AS s_cell
  FROM cell GROUP BY 1
), margx AS (
  SELECT feature, sum(nx * ln(nx)) AS s_x
  FROM (SELECT feature, x, sum(n) AS nx FROM cell GROUP BY 1, 2)
  GROUP BY 1
), margy AS (
  SELECT feature, sum(ny * ln(ny)) AS s_y
  FROM (SELECT feature, y, sum(n) AS ny FROM cell GROUP BY 1, 2)
  GROUP BY 1
)
SELECT p.feature,
       round(ln(N) - s_y / N, 4) AS h_label,
       round((s_x - s_cell) / N, 4) AS h_label_given_feature,
       round((ln(N) - s_y / N) - (s_x - s_cell) / N, 4) AS info_gain
FROM per_feat p JOIN margx USING (feature) JOIN margy USING (feature)
"""


# --------------------------------------------------------------------------
# A18i. Chi-square cell diagnostics: standardized residuals per
# contingency cell plus Cramér's V — WHERE the dependence lives, not
# just whether it exists (the drill-down the reference's table() EDA
# implies). One (status, priority) shuffle; margins ride tiny windows
# over the cells² table, V is scalar arithmetic broadcast from the
# 1-row total.
# --------------------------------------------------------------------------

def chisq_cell_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cell = (o.groupBy("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n")))
    wr = Window.partitionBy("o_orderstatus")
    wc = Window.partitionBy("o_orderpriority")
    wt = Window.partitionBy()
    d = (cell.withColumn("nr", F.sum("n").over(wr))
             .withColumn("nc", F.sum("n").over(wc))
             .withColumn("nt", F.sum("n").over(wt))
             .withColumn("exp", F.col("nr") * F.col("nc") / F.col("nt")))
    chi2 = (F.sum(F.pow(F.col("n") - F.col("exp"), 2) / F.col("exp"))
             .over(wt))
    # Cramér's V needs min(rows, cols) − 1: count distinct margins on
    # the tiny cell table via size(collect_set())
    nrow = F.size(F.collect_set("o_orderstatus").over(wt))
    ncol = F.size(F.collect_set("o_orderpriority").over(wt))
    v = F.sqrt(chi2 / (F.col("nt") * (F.least(nrow, ncol) - 1)))
    return d.select(
        "o_orderstatus", "o_orderpriority", "n",
        F.round("exp", 4).alias("expected"),
        F.round((F.col("n") - F.col("exp")) / F.sqrt("exp"), 4)
         .alias("std_residual"),
        F.round(v, 4).alias("cramers_v"))

CHISQ_CELLS_SQL = """
WITH cell AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
), d AS (
  SELECT *,
         sum(n) OVER (PARTITION BY o_orderstatus) AS nr,
         sum(n) OVER (PARTITION BY o_orderpriority) AS nc,
         sum(n) OVER () AS nt
  FROM cell
), e AS (
  SELECT *, nr * nc / nt AS exp,
         count(DISTINCT o_orderstatus) OVER () AS nrow,
         count(DISTINCT o_orderpriority) OVER () AS ncol
  FROM d
)
SELECT o_orderstatus, o_orderpriority, CAST(n AS BIGINT) AS n,
       round(exp, 4) AS expected,
       round((n - exp) / sqrt(exp), 4) AS std_residual,
       round(sqrt(sum(pow(n - exp, 2) / exp) OVER ()
                  / (nt * (least(nrow, ncol) - 1))), 4) AS cramers_v
FROM e
"""


# --------------------------------------------------------------------------
# A84. Deterministic weighted sampling (Efraimidis-Spirakis A-ES):
# priority key u^(1/w) from an md5-derived uniform — seed-free,
# engine-portable, one codegen pass; the global top-k is a distributed
# TakeOrdered (per-partition heaps, never a full sort). Higher-value
# orders are proportionally likelier to be kept; rerunning yields the
# SAME sample — the reproducibility property training-data pipelines
# need.
# --------------------------------------------------------------------------

def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    u = (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                            1, 8), 16, 10).cast("double")
         / F.lit(4294967296.0))
    key = F.pow(u, 1.0 / F.col("o_totalprice"))
    return (o.select("o_orderkey", "o_totalprice",
                     F.round(key, 10).alias("es_key"))
             .orderBy(F.col("es_key").desc(), "o_orderkey")
             .limit(100))

WEIGHTED_SAMPLE_SQL = """
SELECT o_orderkey, o_totalprice,
       round(pow(CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                                        1, 8) AS BIGINT)
                 / 4294967296.0, 1.0 / o_totalprice), 10) AS es_key
FROM orders
ORDER BY es_key DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# A20b. Per-group simple regression via the native regr_* aggregate
# family (Spark 3.4+/ANSI): slope, intercept, R² of price ~ quantity
# per return flag in ONE fused aggregate pass — the grouped companion
# to A20's global covar/var form. Pure codegen, map-side partials.
# --------------------------------------------------------------------------

def grouped_linreg_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (li.groupBy("l_returnflag")
              .agg(F.regr_count(y, x).alias("n"),
                   F.round(F.regr_slope(y, x), 4).alias("slope"),
                   F.round(F.regr_intercept(y, x), 4).alias("intercept"),
                   F.round(F.regr_r2(y, x), 4).alias("r2")))

GROUPED_LINREG_SQL = """
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# A85. Generalized means per group (geometric / harmonic alongside the
# arithmetic): the rate-averaging family the plain avg() gets wrong —
# geometric for multiplicative growth, harmonic for rates. Both reduce
# to one fused aggregate via exp(avg(ln x)) and n/Σ(1/x); positive
# domain enforced by the quantity filter.
# --------------------------------------------------------------------------

def generalized_means_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 0))
    q = F.col("l_quantity")
    return (li.groupBy("l_returnflag")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.avg(q), 4).alias("mean_arith"),
                   F.round(F.exp(F.avg(F.log(q))), 4).alias("mean_geo"),
                   F.round(F.count(F.lit(1)) / F.sum(1.0 / q), 4)
                    .alias("mean_harmonic")))

GENERALIZED_MEANS_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(avg(l_quantity), 4) AS mean_arith,
       round(exp(avg(ln(l_quantity))), 4) AS mean_geo,
       round(count(*) / sum(1.0 / l_quantity), 4) AS mean_harmonic
FROM lineitem WHERE l_quantity > 0
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A86. k-fold cross-validation (caret::trainControl repeatedcv,
# 20210803_이승하.R:1085): leave-fold-out OLS via sufficient-statistic
# set algebra — all k models from ONE scan, held-out metrics from a
# second. Folds are grouped by order key (an order's lines never
# straddle the train/test boundary — no leakage).
# --------------------------------------------------------------------------

def cv_metrics_by_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return ml.kfold_cv_simple_linreg(
        li, "l_quantity", "l_extendedprice",
        F.pmod(F.col("l_orderkey"), F.lit(5)), k=5)

_CV_SQL_BODY = """
WITH d AS (
  SELECT {fold} AS fold,
         l_quantity AS x, l_extendedprice AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), per AS (
  SELECT fold, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM d GROUP BY fold
), tot AS (
  SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
         sum(sxx) AS tsxx, sum(sxy) AS tsxy
  FROM per
), coef AS (
  SELECT fold,
         ((tsxy - sxy) - (tsx - sx) * (tsy - sy) / (tn - n))
         / ((tsxx - sxx) - (tsx - sx) * (tsx - sx) / (tn - n)) AS b,
         ((tsy - sy) - ((tsxy - sxy) - (tsx - sx) * (tsy - sy) / (tn - n))
          / ((tsxx - sxx) - (tsx - sx) * (tsx - sx) / (tn - n)) * (tsx - sx))
         / (tn - n) AS a
  FROM per, tot
), e AS (
  SELECT d.fold, d.y, c.a, c.b, d.y - (c.a + c.b * d.x) AS err
  FROM d JOIN coef c ON d.fold = c.fold
)
SELECT {head}fold, count(*) AS n,
       round(any_value(b), 4) AS slope,
       round(any_value(a), 4) AS intercept,
       round(sqrt(avg(err * err)), 4) AS rmse,
       round(avg(abs(err / nullif(y, 0.0))), 4) AS mape,
       round(1.0 - sum(err * err)
             / (sum(y * y) - sum(y) * sum(y) / count(*)), 4) + 0.0 AS r2
FROM e GROUP BY fold
"""

CV_METRICS_SQL = _CV_SQL_BODY.format(
    fold="CAST(l_orderkey % 5 AS INT)", head="")


# --------------------------------------------------------------------------
# A86b. REPEATED k-fold CV — the reference's exact trainControl
# (method="repeatedcv", number=5) shape: independent fold partitions
# per repeat. Repeat r partitions by floor(key/5^r) mod 5, which is a
# genuinely different grouping per repeat (not a relabeling) and stays
# engine-portable (explicit floor: DuckDB CAST rounds, Spark truncates).
# --------------------------------------------------------------------------

def repeated_cv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    outs = []
    for r in range(2):
        fold = F.pmod(F.floor(F.col("l_orderkey") / F.lit(5 ** r))
                       .cast("long"), F.lit(5))
        cv = ml.kfold_cv_simple_linreg(li, "l_quantity", "l_extendedprice",
                                       fold, k=5)
        outs.append(cv.select(F.lit(r).alias("rep"), "*"))
    return outs[0].unionByName(outs[1])

REPEATED_CV_SQL = "\nUNION ALL\n".join(
    "SELECT * FROM (" + _CV_SQL_BODY.format(
        fold=f"CAST(floor(l_orderkey / {5 ** r}) AS INT) % 5",
        head=f"{r} AS rep, ") + ")"
    for r in range(2))


# --------------------------------------------------------------------------
# A90. OLS with categorical dummies — the reference regresses on
# categorical 지역/region factors (R:1194 lm over factor columns). Dummy
# columns are built in the projection (baseline = 'N'), then the same
# one-pass normal-equation machinery fits; the oracle Cramer-solves the
# identical Gram system over a dummy-encoding subquery.
# --------------------------------------------------------------------------

def ols_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .withColumn("flag_r", F.when(F.col("l_returnflag") == "R", 1.0)
                                 .otherwise(0.0))
          .withColumn("flag_a", F.when(F.col("l_returnflag") == "A", 1.0)
                                 .otherwise(0.0)))
    return ml.ols_fit_df(li, ["l_quantity", "flag_r", "flag_a"],
                         "l_extendedprice")

OLS_CATEGORICAL_SQL = oracles.normal_eq_sql(
    ["l_quantity", "flag_r", "flag_a"], "l_extendedprice",
    table="(SELECT l_quantity, l_extendedprice, "
          "CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS flag_r, "
          "CASE WHEN l_returnflag = 'A' THEN 1.0 ELSE 0.0 END AS flag_a "
          "FROM lineitem) __t")


# --------------------------------------------------------------------------
# A91. Top supplier(s) by total revenue (TPC-H Q15 shape): aggregate
# view + scalar-subquery max + ties kept. The revenue view is computed
# once; the max is a 1-row broadcast, so no second scan of the fact.
# --------------------------------------------------------------------------

def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))), 2)
                   .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (rev.crossJoin(F.broadcast(mx))
               .where(F.col("total_revenue") == F.col("__mx"))
               .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name", "total_revenue"))

TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# --------------------------------------------------------------------------
# A87. Train→test scoring output (R:1280-1373): per-row predictions +
# residuals on the held-out fold — the "submission frame" the reference
# assembles at the end. Coefficients are rounded to 4 decimals BEFORE
# scoring so both engines score with identical decimal constants and
# per-row arithmetic is bit-identical.
# --------------------------------------------------------------------------

def score_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    xs, y = ["l_quantity", "l_discount"], "l_extendedprice"
    train = li.where(F.pmod(F.col("l_orderkey"), F.lit(5)) != 0)
    fit = ml.ols_fit(train, xs, y)
    b = [round(fit["intercept"], 4)] + [round(fit[f"coef_{c}"], 4)
                                        for c in xs]
    pred = F.lit(b[0]) + F.lit(b[1]) * F.col(xs[0]) + F.lit(b[2]) * F.col(xs[1])
    test = li.where((F.pmod(F.col("l_orderkey"), F.lit(5)) == 0)
                    & F.col(xs[0]).isNotNull() & F.col(xs[1]).isNotNull()
                    & F.col(y).isNotNull())
    # 6-decimal outputs: exact for 4-dec coefs x 2-dec inputs, so no
    # half-way rounding ties across engines (see oracles.score_holdout_sql)
    return test.select(
        "l_orderkey", "l_linenumber", F.col(y).alias("actual"),
        F.round(pred, 6).alias("predicted"),
        F.round(F.col(y) - pred, 6).alias("residual"))

SCORE_HOLDOUT_SQL = oracles.score_holdout_sql(
    ["l_quantity", "l_discount"], "l_extendedprice",
    ["l_orderkey", "l_linenumber"])


# --------------------------------------------------------------------------
# A87b. Tree-ensemble holdout scoring — the reference's ACTUAL
# deliverable is randomForest predictions on the held-out frame
# (R:1280-1373's submission file); `score_holdout` covers the OLS
# shape, this covers the tree shape. Same deterministic 80/20 hash
# split; the forest trains on the train fold only and scores the
# holdout through pure codegen CASE expressions (no UDF, no model
# broadcast). Deterministic end-to-end (integer split stats +
# hash bootstrap), hence expected-parquet oracle.
# --------------------------------------------------------------------------

def rf_score_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    xs, y = ["l_quantity", "l_discount", "l_tax"], "l_extendedprice"
    train = li.where(F.pmod(F.col("l_orderkey"), F.lit(5)) != 0)
    test = li.where(F.pmod(F.col("l_orderkey"), F.lit(5)) == 0)
    model = trees_ops.fit_random_forest(train, xs, y,
                                        n_trees=10, max_depth=4)
    return trees_ops.score_df(model, test,
                              ["l_orderkey", "l_linenumber"], y)


# --------------------------------------------------------------------------
# A88. Gradient-boosted trees (the reference loads xgboost, R:57):
# deterministic squared-loss boosting on the histogram-split engine —
# integer residuals survive every round, so the importances earn an
# expected-parquet oracle (was MLlib rows-only through r02).
# --------------------------------------------------------------------------

def gbt_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = trees_ops.fit_gbt(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_discount", "l_tax"], "l_extendedprice",
        n_trees=5, max_depth=3)
    return trees_ops.importance_df(model, spark)


# --------------------------------------------------------------------------
# A89. KNN imputation (DMwR2::knnImputation, R:820-823): fill a missing
# value with the mean over the k nearest neighbors in embedding space.
# The missing side is the small side (broadcast query set); candidates
# stream map-side — the cosine_topk contract. At a larger missing
# fraction, swap the scorer for the LSH/IVF ANN path (same join shape).
# --------------------------------------------------------------------------

def knn_impute_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    missing = emb.where(F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    labeled = emb.where(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    nn = sim_ops.cosine_topk(labeled, missing, k=5)
    lab = labeled.select(F.col("vec_id").alias("cand_id"), "label")
    return (nn.join(lab, "cand_id")
              .groupBy(F.col("query_id").alias("vec_id"))
              .agg(F.round(F.avg("label"), 4).alias("imputed_label"),
                   F.count(F.lit(1)).alias("n_neighbors")))

KNN_IMPUTE_SQL = """
WITH lab AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, label
  FROM embeddings WHERE vec_id % 10 <> 0
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 10 = 0
), scored AS (
  SELECT q.query_id, lab.label,
         round(list_dot_product(q.qv, lab.e) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(lab.e, lab.e))), 4) AS score,
         lab.vec_id AS cand_id
  FROM q CROSS JOIN lab
  WHERE lab.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id AS vec_id, round(avg(label), 4) AS imputed_label,
       count(*) AS n_neighbors
FROM ranked WHERE rank <= 5 GROUP BY query_id
"""


def _expected_sql(name: str) -> str:
    """Oracle for deterministic non-SQL-expressible queries: DuckDB
    reads back the committed expected-output parquet (generated by
    scripts/gen_expected.py, determinism-audited across execution
    geometries by scripts/check_expected.py). Regression/determinism
    oracle — semantic validation lives in tests/test_properties.py.

    The sf0.01 tag matches the build driver's correctness gate; local
    harnesses running at another SF rewrite the '/expected/sf0.01/'
    segment to their SF (tests/test_oracle_parity.py,
    scripts/driver_gate_local.py). The repo root comes from __file__ so
    any checkout location works."""
    import os
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    return ("SELECT * FROM read_parquet("
            f"'{root}/expected/sf0.01/{name}.parquet')")


# --------------------------------------------------------------------------
# A92. Winsorized statistics per group (robust moments EDA — the
# clamp-at-percentile companion to the Tukey fences of A44): exact
# p01/p99 via the bracket-refine quantile machinery (no per-group
# sorts), then one conditional clamp-aggregate. The clamp uses the
# UNROUNDED cutoffs; interpolated percentiles cannot collide with data
# values (they fall strictly between adjacent order statistics), so
# cross-engine ulp differences cannot flip a clamp decision.
# --------------------------------------------------------------------------

def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_extendedprice").isNotNull()))
    q = stats.grouped_quantiles(li, "l_returnflag", "l_extendedprice",
                                [0.01, 0.99], ["p01", "p99"])
    w = li.join(F.broadcast(q), "l_returnflag")
    v = F.col("l_extendedprice")
    clamped = F.least(F.greatest(v, F.col("p01")), F.col("p99"))
    return (w.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.avg(clamped), 4).alias("winsorized_mean"),
                  F.round(F.stddev_samp(clamped), 4).alias("winsorized_sd"),
                  F.sum(((v < F.col("p01")) | (v > F.col("p99")))
                        .cast("long")).alias("n_clamped"),
                  F.round(F.first("p01"), 4).alias("p01"),
                  F.round(F.first("p99"), 4).alias("p99")))

WINSORIZED_SQL = """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
), w AS (
  SELECT l.l_returnflag,
         least(greatest(l_extendedprice, p01), p99) AS cv,
         l_extendedprice AS v, p01, p99
  FROM lineitem l JOIN q USING (l_returnflag)
  WHERE l_extendedprice IS NOT NULL
)
SELECT l_returnflag, count(*) AS n,
       round(avg(cv), 4) AS winsorized_mean,
       round(stddev_samp(cv), 4) AS winsorized_sd,
       CAST(sum(CASE WHEN v < p01 OR v > p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped,
       round(any_value(p01), 4) AS p01,
       round(any_value(p99), 4) AS p99
FROM w GROUP BY 1
"""


# --------------------------------------------------------------------------
# A93. LOESS smoothing curve (geom_smooth(method="loess"), R:607,656,
# 701,1114,1153): G tricube-weighted local regressions fused into ONE
# aggregation pass (stats.loess_curve). The oracle replays the same
# G x 6 conditional sums.
# --------------------------------------------------------------------------

_LOESS_GRID = [2.5 * i for i in range(1, 21)]
_LOESS_H = 10.0


def loess_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return stats.loess_curve(li, "l_quantity", "l_extendedprice",
                             _LOESS_GRID, _LOESS_H)


def _loess_sql() -> str:
    sums, sels = [], []
    for i, g in enumerate(_LOESS_GRID):
        u = f"(abs(l_quantity - {g!r}) / {_LOESS_H!r})"
        w = (f"(CASE WHEN {u} < 1 "
             f"THEN pow(1 - pow({u}, 3), 3) ELSE 0.0 END)")
        sums += [f"sum({w}) AS sw_{i}",
                 f"sum({w} * l_quantity) AS swx_{i}",
                 f"sum({w} * l_extendedprice) AS swy_{i}",
                 f"sum({w} * l_quantity * l_quantity) AS swxx_{i}",
                 f"sum({w} * l_quantity * l_extendedprice) AS swxy_{i}",
                 f"CAST(sum(CASE WHEN {u} < 1 THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS nl_{i}"]
        b = (f"((sw_{i} * swxy_{i} - swx_{i} * swy_{i})"
             f" / nullif(sw_{i} * swxx_{i} - swx_{i} * swx_{i}, 0.0))")
        a = f"((swy_{i} - {b} * swx_{i}) / nullif(sw_{i}, 0.0))"
        sels.append(
            f"SELECT {g!r} AS grid_x,"
            f" round({a} + {b} * {g!r}, 4) AS loess_fit,"
            f" nl_{i} AS n_local FROM m")
    return ("WITH m AS (\nSELECT " + ",\n       ".join(sums)
            + "\nFROM lineitem WHERE l_quantity IS NOT NULL"
              " AND l_extendedprice IS NOT NULL\n)\n"
            + "\nUNION ALL\n".join(sels))


LOESS_SQL = _loess_sql()


# --------------------------------------------------------------------------
# A94. Chained-equation imputation (mice loaded at R:59): two columns
# with disjoint missingness alternate regression fills (deterministic
# variant, clean.chained_regression_impute). The oracle unrolls the
# same mean-init + two iterations of covar/var regressions in CTEs.
# --------------------------------------------------------------------------

def mice_impute_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .withColumn("tax_val",
                      F.when(F.col("l_linenumber") != 1, F.col("l_tax")))
          .withColumn("disc_val",
                      F.when(F.col("l_linenumber") != 2,
                             F.col("l_discount"))))
    filled = clean.chained_regression_impute(li, "tax_val", "disc_val",
                                             n_iter=2)
    return (filled.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("tax_val").isNull().cast("long"))
                  .alias("n_filled_tax"),
                 F.sum(F.col("disc_val").isNull().cast("long"))
                  .alias("n_filled_disc"),
                 F.round(F.avg("tax_val_filled"), 6).alias("avg_tax_filled"),
                 F.round(F.avg("disc_val_filled"), 6)
                  .alias("avg_disc_filled")))

MICE_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CASE WHEN l_linenumber <> 1 THEN l_tax END AS a,
         CASE WHEN l_linenumber <> 2 THEN l_discount END AS b
  FROM lineitem
), m0 AS (
  SELECT avg(a) AS ma, avg(b) AS mb FROM base
), f0 AS (
  SELECT l_returnflag, a, b,
         coalesce(a, ma) AS a0, coalesce(b, mb) AS b0
  FROM base, m0
), c1 AS (
  SELECT covar_pop(b0, a) / var_pop(b0) AS s,
         avg(a) AS mt, avg(b0) AS mp
  FROM f0 WHERE a IS NOT NULL
), f1 AS (
  SELECT l_returnflag, a, b, b0,
         coalesce(a, mt + s * (b0 - mp)) AS a1
  FROM f0, c1
), c2 AS (
  SELECT covar_pop(a1, b) / var_pop(a1) AS s,
         avg(b) AS mt, avg(a1) AS mp
  FROM f1 WHERE b IS NOT NULL
), f2 AS (
  SELECT l_returnflag, a, b, a1,
         coalesce(b, mt + s * (a1 - mp)) AS b1
  FROM f1, c2
), c3 AS (
  SELECT covar_pop(b1, a) / var_pop(b1) AS s,
         avg(a) AS mt, avg(b1) AS mp
  FROM f2 WHERE a IS NOT NULL
), f3 AS (
  SELECT l_returnflag, a, b, b1,
         coalesce(a, mt + s * (b1 - mp)) AS a2
  FROM f2, c3
), c4 AS (
  SELECT covar_pop(a2, b) / var_pop(a2) AS s,
         avg(b) AS mt, avg(a2) AS mp
  FROM f3 WHERE b IS NOT NULL
), f4 AS (
  SELECT l_returnflag, a, b, a2,
         coalesce(b, mt + s * (a2 - mp)) AS b2
  FROM f3, c4
)
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_filled_tax,
       CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_filled_disc,
       round(avg(a2), 6) AS avg_tax_filled,
       round(avg(b2), 6) AS avg_disc_filled
FROM f4 GROUP BY 1
"""


# --------------------------------------------------------------------------
# A95. Bagged trees (ipred loaded at R:59): bootstrap-aggregated
# regression trees = the deterministic forest with feature_subset
# "all" (every tree sees every feature; variance comes only from the
# hash-based bootstrap). Expected-parquet oracle like RF/GBT.
# --------------------------------------------------------------------------

def bagged_trees_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = trees_ops.fit_random_forest(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_discount", "l_tax"], "l_extendedprice",
        n_trees=15, max_depth=4, feature_subset="all")
    return trees_ops.importance_df(model, spark)


# --------------------------------------------------------------------------
# A96. Missingness profile + co-missingness patterns (VIM::aggr,
# loaded at R:59; the reference inspects missingness before imputing).
# Per-column counts are one fused aggregate; patterns are a groupBy on
# the null-flag combination (2^k cells max — tiny shuffle).
# --------------------------------------------------------------------------

def _with_missingness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "lineitem")
            .withColumn("tax_val",
                        F.when(F.col("l_linenumber") != 1, F.col("l_tax")))
            .withColumn("disc_val",
                        F.when(F.col("l_linenumber") != 2,
                               F.col("l_discount")))
            .withColumn("price_val",
                        F.when(F.col("l_linenumber") < 6,
                               F.col("l_extendedprice"))))

_MISS_COLS = ["tax_val", "disc_val", "price_val"]


def missingness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _with_missingness(spark, sf_dir)
    agg = li.agg(F.count(F.lit(1)).alias("n"),
                 *[F.count(c).alias(f"nn_{c}") for c in _MISS_COLS])
    stack = ", ".join(f"'{c}', n - nn_{c}" for c in _MISS_COLS)
    return (agg.selectExpr(
        "n", f"stack({len(_MISS_COLS)}, {stack}) AS (column, n_missing)")
        .select(F.col("column"), F.col("n_missing"),
                F.round(F.col("n_missing") / F.col("n"), 4)
                 .alias("pct_missing")))

MISS_PROFILE_SQL = """
WITH a AS (
  SELECT count(*) AS n,
         count(CASE WHEN l_linenumber <> 1 THEN l_tax END) AS nn_tax,
         count(CASE WHEN l_linenumber <> 2 THEN l_discount END) AS nn_disc,
         count(CASE WHEN l_linenumber < 6 THEN l_extendedprice END) AS nn_price
  FROM lineitem
)
SELECT 'tax_val' AS column, n - nn_tax AS n_missing,
       round((n - nn_tax) / CAST(n AS DOUBLE), 4) AS pct_missing FROM a
UNION ALL
SELECT 'disc_val', n - nn_disc,
       round((n - nn_disc) / CAST(n AS DOUBLE), 4) FROM a
UNION ALL
SELECT 'price_val', n - nn_price,
       round((n - nn_price) / CAST(n AS DOUBLE), 4) FROM a
"""


def missingness_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _with_missingness(spark, sf_dir)
    pattern = F.concat_ws(",", *[
        F.when(F.col(c).isNull(), c) for c in _MISS_COLS])
    return (li.groupBy(pattern.alias("pattern"))
              .agg(F.count(F.lit(1)).alias("n")))

MISS_PATTERNS_SQL = """
SELECT concat_ws(',',
         CASE WHEN l_linenumber = 1 THEN 'tax_val' END,
         CASE WHEN l_linenumber = 2 THEN 'disc_val' END,
         CASE WHEN l_linenumber >= 6 THEN 'price_val' END) AS pattern,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# A106. Two-group Poisson rate comparison (purchase vs error events over
# the same observation window): rates per active day, their ratio, and
# the conditional z statistic (n1−n2)/√(n1+n2) — the standard equal-
# exposure Poisson test (public; e.g. Lehmann, Testing Statistical
# Hypotheses). One fused aggregate over the filtered fact; integer
# counts make every output exact.
# --------------------------------------------------------------------------

def poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull()
                 & F.col("event_type").isin("purchase", "error")))
    is_p = (F.col("event_type") == "purchase").cast("long")
    agg = ev.agg(
        F.sum(is_p).alias("n_purchase"),
        F.sum(1 - is_p).alias("n_error"),
        F.countDistinct(F.to_date("ts")).alias("n_days"))
    n1, n2, dd = F.col("n_purchase"), F.col("n_error"), F.col("n_days")
    return agg.select(
        "n_purchase", "n_error", "n_days",
        F.round(n1 / dd, 4).alias("rate_purchase"),
        F.round(n2 / dd, 4).alias("rate_error"),
        F.round(n1 / n2, 4).alias("rate_ratio"),
        F.round((n1 - n2) / F.sqrt((n1 + n2).cast("double")), 4)
         .alias("z_stat"))

POISSON_RATE_SQL = """
WITH f AS (
  SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2,
         count(DISTINCT CAST(ts AS DATE)) AS n_days
  FROM events
  WHERE ts IS NOT NULL AND event_type IN ('purchase', 'error')
)
SELECT n1 AS n_purchase, n2 AS n_error, n_days,
       round(CAST(n1 AS DOUBLE) / n_days, 4) AS rate_purchase,
       round(CAST(n2 AS DOUBLE) / n_days, 4) AS rate_error,
       round(CAST(n1 AS DOUBLE) / n2, 4) AS rate_ratio,
       round((n1 - n2) / sqrt(CAST(n1 + n2 AS DOUBLE)), 4) AS z_stat
FROM f
"""


# --------------------------------------------------------------------------
# A105. Huber robust regression (IRLS M-estimator): the outlier-
# resistant line fit for l_quantity → l_extendedprice. Each iteration
# is one fused 5-sum aggregate (no shuffle); see ml.huber_fit_df for
# the determinism contract shared with the unrolled SQL oracle.
# --------------------------------------------------------------------------

def huber_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return ml.huber_fit_df(li, "l_quantity", "l_extendedprice",
                           delta=1000.0, n_iter=2)

HUBER_SQL = oracles.huber_sql("l_quantity", "l_extendedprice",
                              delta=1000.0, n_iter=2)


# --------------------------------------------------------------------------
# A97. Cochran-Armitage trend test (public, 1954/55): is the fraction
# of finished orders monotonically associated with the ordered
# priority level? Scores = the priority's leading digit (1-URGENT …
# 5-LOW). One contingency aggregate; every input to the z statistic is
# an integer count, so the result is engine-exact.
# --------------------------------------------------------------------------

def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = F.substring("o_orderpriority", 1, 1).cast("long")
    fin = (F.col("o_orderstatus") == "F").cast("long")
    agg = o.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(fin).alias("__r"),
        F.sum(w).alias("__swn"),
        F.sum(w * w).alias("__swwn"),
        F.sum(w * fin).alias("__t"))
    n, r = F.col("__n"), F.col("__r")
    pbar = r / n
    t, swn, swwn = F.col("__t"), F.col("__swn"), F.col("__swwn")
    # 1.0 * promotes BEFORE the square: swn² overflows BIGINT at
    # ~1e9 orders while the double is exact to 2^53 (code-review r02)
    var = pbar * (1 - pbar) * (swwn - (1.0 * swn) * swn / n)
    return agg.select(
        n.alias("n_orders"), r.alias("n_finished"),
        F.round(pbar, 4).alias("p_finished"),
        F.round((t - pbar * swn) / F.sqrt(var), 4).alias("z_trend"))

COCHRAN_ARMITAGE_SQL = """
WITH f AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(sum(CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
              AS BIGINT) AS swn,
         CAST(sum(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                  * CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
              AS BIGINT) AS swwn,
         CAST(sum(CASE WHEN o_orderstatus = 'F'
                       THEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS t
  FROM orders
)
SELECT n AS n_orders, r AS n_finished,
       round(CAST(r AS DOUBLE) / n, 4) AS p_finished,
       round((t - (CAST(r AS DOUBLE) / n) * swn)
             / sqrt((CAST(r AS DOUBLE) / n) * (1 - CAST(r AS DOUBLE) / n)
                    * (swwn - CAST(swn AS DOUBLE) * swn / n)), 4) AS z_trend
FROM f
"""


# --------------------------------------------------------------------------
# A98. Skyline / Pareto frontier per brand (Börzsönyi et al. 2001,
# public): parts not dominated on (lower price, larger size) within
# their brand. After a distinct on (brand, price, size), the frontier
# test is ONE partitioned window — sort (price asc, size desc), keep
# rows whose size strictly exceeds the running max over PRECEDING rows
# — linear, no all-pairs dominance join, partitioned by brand so no
# global sort at any scale. Exact integer/decimal comparisons.
# --------------------------------------------------------------------------

def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (load_table(spark, sf_dir, "part")
         .select("p_brand", "p_retailprice", "p_size")
         .distinct())
    w = (Window.partitionBy("p_brand")
               .orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    return (p.withColumn("__mx", F.max("p_size").over(w))
             .where(F.col("__mx").isNull()
                    | (F.col("p_size") > F.col("__mx")))
             .select("p_brand", "p_retailprice", "p_size"))

PARETO_SQL = """
WITH d AS (
  SELECT DISTINCT p_brand, p_retailprice, p_size FROM part
), m AS (
  SELECT p_brand, p_retailprice, p_size,
         max(p_size) OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice ASC, p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS mx
  FROM d
)
SELECT p_brand, p_retailprice, p_size
FROM m WHERE mx IS NULL OR p_size > mx
"""


# --------------------------------------------------------------------------
# A99. Incremental aggregate maintenance: the monthly revenue rollup
# kept fresh by MERGING a delta partition's partial aggregate into the
# base partial aggregate — never rescanning the base fact (the
# materialized-view maintenance pattern; complements A75's row-level
# MERGE upsert). Money sums are exact DECIMAL, so partial + partial
# == full recompute BIT-EXACTLY — which is precisely what the direct
# single-pass oracle asserts. At 100 TB the base branch reads only the
# stored agg (here recomputed from the < cutoff partition to stay
# self-contained); the delta branch scans only the new partition.
# --------------------------------------------------------------------------

def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    # NULL dates are excluded on BOTH sides (the </>= split would
    # silently drop them while an unfiltered oracle groups them into a
    # NULL month — ADVICE r02 latent-drift fix)
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate").isNotNull()))
    month = F.date_format("o_orderdate", "yyyy-MM")
    cutoff = F.lit("1997-07-01").cast("date")
    partial = lambda d: (d.groupBy(month.alias("month"))
                          .agg(F.count(F.lit(1)).alias("n_orders"),
                               F.sum(money("o_totalprice")).alias("__rev")))
    base = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    return (base.unionAll(delta)
                .groupBy("month")
                .agg(F.sum("n_orders").alias("n_orders"),
                     F.round(F.sum("__rev").cast("double"), 2)
                      .alias("revenue")))

INCREMENTAL_AGG_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM orders
WHERE o_orderdate IS NOT NULL
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A100. Isotonic (monotone) regression of mean price on quantity via
# the MINIMAX characterization fit_k = max_{i≤k} min_{j≥k} wavg(i..j)
# (Barlow et al. 1972, public) — NOT iterative PAVA, so it has a real
# ANSI-SQL oracle. Scale design: the fact collapses to one row per
# integer quantity FIRST (one shuffle, ≤50 groups); the O(n³) minimax
# runs on that calendar-of-quantities-bounded series with broadcast
# self-joins — never on raw rows. Group means are rounded to 6 dp so
# both engines pool identical decimal inputs.
# --------------------------------------------------------------------------

def isotonic_price_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = (li.where(F.col("l_quantity").isNotNull()
                  & F.col("l_extendedprice").isNotNull())
           .groupBy(F.col("l_quantity").cast("int").alias("q"))
           .agg(F.round(F.avg("l_extendedprice"), 6).alias("ybar"),
                F.count(F.lit(1)).alias("w")))
    a, b, m = g.alias("a"), g.alias("b"), g.alias("m")
    ranges = (a.join(F.broadcast(b), F.col("b.q") >= F.col("a.q"))
               .select(F.col("a.q").alias("i"), F.col("b.q").alias("j"))
               .join(F.broadcast(m), (F.col("m.q") >= F.col("i"))
                                     & (F.col("m.q") <= F.col("j")))
               .groupBy("i", "j")
               .agg((F.sum(F.col("m.w") * F.col("m.ybar"))
                     / F.sum(F.col("m.w"))).alias("wavg")))
    k = g.select(F.col("q").alias("k"))
    inner = (ranges.join(F.broadcast(k), (F.col("i") <= F.col("k"))
                                         & (F.col("k") <= F.col("j")))
                   .groupBy("k", "i")
                   .agg(F.min("wavg").alias("__mn")))
    return (inner.groupBy("k")
                 .agg(F.round(F.max("__mn"), 4).alias("isotonic_fit"))
                 .select(F.col("k").alias("q"), "isotonic_fit"))

ISOTONIC_SQL = """
WITH g AS (
  SELECT CAST(l_quantity AS INT) AS q,
         round(avg(l_extendedprice), 6) AS ybar,
         count(*) AS w
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
), ranges AS (
  SELECT a.q AS i, b.q AS j,
         sum(m.w * m.ybar) / sum(m.w) AS wavg
  FROM g a JOIN g b ON b.q >= a.q
  JOIN g m ON m.q >= a.q AND m.q <= b.q
  GROUP BY 1, 2
), inner_min AS (
  SELECT k.q AS k, r.i, min(r.wavg) AS mn
  FROM ranges r JOIN g k ON r.i <= k.q AND k.q <= r.j
  GROUP BY 1, 2
)
SELECT k AS q, round(max(mn), 4) AS isotonic_fit
FROM inner_min GROUP BY 1
"""


# --------------------------------------------------------------------------
# A101. LAD (median / quantile) regression via IRLS — minimizing
# absolute error instead of squared error (Koenker-Bassett 1978,
# public), completing the robust family next to A95's Huber. Same
# one-fused-aggregate-per-iteration shape and the same 6-dp
# inter-iteration coefficient rounding contract with the unrolled SQL
# oracle; the weight 1/max(|r|, eps) branches on |r| computed from
# identical decimal coefficients, so both engines take the same branch.
# --------------------------------------------------------------------------

def lad_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return ml.lad_fit_df(li, "l_quantity", "l_extendedprice",
                         eps=1.0, n_iter=2)

LAD_SQL = oracles.lad_sql("l_quantity", "l_extendedprice",
                          eps=1.0, n_iter=2)


# --------------------------------------------------------------------------
# A102. ROC-AUC (+ Gini) of order value as a classifier score for
# finished orders — the rank formulation AUC = (R⁺ − n⁺(n⁺+1)/2) /
# (n⁺·n⁻) (Hanley-McNeil 1982, public; the Mann-Whitney identity).
# Same scale machinery as A18f: tie-averaged ranks on the DISTINCT
# value table via range-partitioned cumulative windows — never a
# per-row global sort.
# --------------------------------------------------------------------------

def roc_auc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select((F.col("o_orderstatus") == "F").cast("int").alias("pos"),
                 "o_totalprice"))
    vals = (o.groupBy("o_totalprice").agg(F.count(F.lit(1)).alias("t"))
             .localCheckpoint(eager=True))
    ranked = stats.tie_avg_ranks(vals, "o_totalprice", "t")
    per = (o.groupBy("pos", "o_totalprice")
            .agg(F.count(F.lit(1)).alias("n_vg")))
    grp = (per.join(ranked.select("o_totalprice", "avg_rank"),
                    "o_totalprice")
              .groupBy("pos")
              .agg(F.sum(F.col("avg_rank") * F.col("n_vg")).alias("rg"),
                   F.sum("n_vg").alias("ng")))
    gp = grp.where(F.col("pos") == 1).select(F.col("rg").alias("rp"),
                                             F.col("ng").alias("np"))
    gn = grp.where(F.col("pos") == 0).select(F.col("ng").alias("nn"))
    # promote before the products: np² / np·nn overflow BIGINT at
    # ~3e9 rows while doubles stay exact to 2^53 (code-review r02)
    np_d = F.col("np").cast("double")
    auc = ((F.col("rp") - np_d * (np_d + 1) / F.lit(2.0))
           / (np_d * F.col("nn")))
    return (gp.crossJoin(gn)
              .select(F.col("np").cast("long").alias("n_pos"),
                      F.col("nn").cast("long").alias("n_neg"),
                      F.round(auc, 4).alias("auc"),
                      F.round(2 * auc - 1, 4).alias("gini")))

ROC_AUC_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         o_totalprice
  FROM orders
), vals AS (
  SELECT o_totalprice, count(*) AS t FROM o GROUP BY 1
), ranked AS (
  SELECT o_totalprice, t,
         sum(t) OVER (ORDER BY o_totalprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vals
), r2 AS (
  SELECT o_totalprice, cum - t + (t + 1) / 2.0 AS avg_rank FROM ranked
), per AS (
  SELECT pos, o_totalprice, count(*) AS n_vg FROM o GROUP BY 1, 2
), grp AS (
  SELECT pos, sum(avg_rank * n_vg) AS rg,
         CAST(sum(n_vg) AS BIGINT) AS ng
  FROM per JOIN r2 USING (o_totalprice) GROUP BY 1
), gp AS (SELECT rg AS rp, ng AS np FROM grp WHERE pos = 1),
gn AS (SELECT ng AS nn FROM grp WHERE pos = 0)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       round((rp - np * (np + 1) / 2.0) / CAST(np * nn AS DOUBLE), 4)
         AS auc,
       round(2 * ((rp - np * (np + 1) / 2.0) / CAST(np * nn AS DOUBLE))
             - 1, 4) AS gini
FROM gp, gn
"""


# --------------------------------------------------------------------------
# A103. Out-of-fold target encoding (leakage-safe categorical
# encoding; public — e.g. Micci-Barreca 2001 + the standard K-fold
# variant): each (segment, fold) cell is encoded with the target mean
# computed on the OTHER folds via set algebra — totals minus own-fold
# — from ONE distributed aggregate over (segment, fold). Money sums
# are exact DECIMAL so the subtraction is engine-exact.
# --------------------------------------------------------------------------

def target_encode_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    c = load_table(spark, sf_dir, "customer")
    fold = F.pmod(F.col("c_custkey"), F.lit(5))
    cell = (c.where(F.col("c_acctbal").isNotNull())
             .groupBy(F.col("c_mktsegment").alias("segment"),
                      fold.alias("fold"))
             .agg(F.sum(money("c_acctbal")).alias("__s"),
                  F.count(F.lit(1)).alias("__n")))
    tot = (cell.groupBy("segment")
               .agg(F.sum("__s").alias("__st"),
                    F.sum("__n").alias("__nt")))
    return (cell.join(tot, "segment")
                .select("segment", "fold",
                        F.round(((F.col("__st") - F.col("__s"))
                                 / (F.col("__nt") - F.col("__n")))
                                .cast("double"), 4)
                         .alias("oof_target_mean"),
                        F.col("__n").alias("n_rows"))
                .orderBy("segment", "fold"))

TARGET_ENCODE_SQL = """
WITH cell AS (
  SELECT c_mktsegment AS segment, c_custkey % 5 AS fold,
         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
         count(*) AS n
  FROM customer WHERE c_acctbal IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT segment, sum(s) AS st, CAST(sum(n) AS BIGINT) AS nt
  FROM cell GROUP BY 1
)
SELECT cell.segment, cell.fold,
       round(CAST((tot.st - cell.s) AS DOUBLE) / (tot.nt - cell.n), 4)
         AS oof_target_mean,
       cell.n AS n_rows
FROM cell JOIN tot ON tot.segment = cell.segment
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# A104. Catalog-wide data profile: one row per (table, column) with
# row/null/distinct counts across ALL ten tables — the data-catalog /
# discovery utility generalizing A7's single-table describe.
#
# Plan shape (the r02 verdict's one "weak" — redesigned): one Spark
# job PER (table, column), each a single-distinct aggregate. Spark's
# single-distinct rewrite plans that as two ordinary hash aggregates
# (partial on the value, then merge) — NO Expand anywhere, unlike the
# old fused multi-countDistinct whose Expand multiplied the widest
# fact ~12x into the shuffle. Column pruning means each job's parquet
# scan reads exactly one column, so TOTAL bytes read across all jobs
# equal ONE full-table scan — while every job's shuffle is bounded by
# that column's distinct values (map-side combined). All ~49 jobs are
# submitted concurrently from a thread pool (Spark's scheduler
# interleaves their independent stages across executor slots) instead
# of the old ten sequential driver-blocking collects. The oracle SQL
# is GENERATED from the same column dictionary, so the two sides
# cannot drift.
#
# At 100 TB: exact distincts stay viable under this shape (per-column
# scans + value-bounded shuffles); `catalog_profile_approx` below is
# the single-pass HLL variant for catalogs where even that is too
# much I/O.
# --------------------------------------------------------------------------

_CATALOG_COLUMNS: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "label"],
}


def _profile_one_column(df: DataFrame, table: str, col: str,
                        distinct_agg) -> tuple:
    """One (table, column) profile job: count(*) + count(col) + ONE
    distinct-style aggregate. Single-distinct → no Expand; column
    pruning → the scan reads only ``col``."""
    r = df.agg(F.count(F.lit(1)).alias("nr"),
               F.count(col).alias("c"),
               distinct_agg(col).alias("d")).collect()[0]
    return (table, col, r["nr"], r["nr"] - r["c"], r["d"])


def _catalog_profile_rows(spark: SparkSession, sf_dir: str,
                          distinct_agg) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor
    dfs = {t: load_table(spark, sf_dir, t) for t in _CATALOG_COLUMNS}
    jobs = [(t, c) for t, cols in _CATALOG_COLUMNS.items() for c in cols]
    with ThreadPoolExecutor(max_workers=min(16, len(jobs))) as pool:
        rows = list(pool.map(
            lambda tc: _profile_one_column(dfs[tc[0]], tc[0], tc[1],
                                           distinct_agg), jobs))
    return spark.createDataFrame(
        rows, "table_name string, column_name string, n_rows long, "
              "n_nulls long, n_distinct long")


def catalog_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _catalog_profile_rows(spark, sf_dir, F.countDistinct)


def catalog_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL variant (rsd 0.05): identical output shape with
    ``n_distinct`` replaced by the approx_count_distinct estimate.
    No oracle SQL — DuckDB's approx_count_distinct is a different HLL
    implementation, so estimates differ engine-to-engine by design;
    the driver records rows-only and CI bound-checks every estimate
    against the exact profile at sf0.01 (test_catalog_profile_approx).
    At 100 TB this is the catalog default: one pass, mergeable HLL
    state, no value-sized shuffle at all."""
    return (_catalog_profile_rows(spark, sf_dir, F.approx_count_distinct)
            .withColumnRenamed("n_distinct", "n_distinct_approx"))

_CATALOG_SELECTS = []
for _t, _cols in _CATALOG_COLUMNS.items():
    for _c in _cols:
        _CATALOG_SELECTS.append(
            f"SELECT '{_t}' AS table_name, '{_c}' AS column_name,\n"
            f"       (SELECT count(*) FROM {_t}) AS n_rows,\n"
            f"       (SELECT count(*) - count({_c}) FROM {_t}) AS n_nulls,\n"
            f"       (SELECT count(DISTINCT {_c}) FROM {_t}) AS n_distinct")
CATALOG_PROFILE_SQL = "\nUNION ALL\n".join(_CATALOG_SELECTS)
del _CATALOG_SELECTS, _t, _cols, _c


# --------------------------------------------------------------------------
# A107. k-anonymity audit (Sweeney 2002, public): how identifiable are
# customers under the quasi-identifier (nation, segment, balance
# band)? Reports group-size distribution and the share of customers
# in groups smaller than k ∈ {2, 5, 10}. Two aggregates (QI groups →
# size histogram); integer-exact.
# --------------------------------------------------------------------------

def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000)
    g = (c.groupBy(F.col("c_nationkey").alias("qi_nation"),
                   F.col("c_mktsegment").alias("qi_segment"),
                   band.alias("qi_band"))
          .agg(F.count(F.lit(1)).alias("sz")))
    tot = F.sum("sz")
    below = lambda k: F.sum(F.when(F.col("sz") < k, F.col("sz"))
                            .otherwise(F.lit(0)))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        tot.alias("n_customers"),
        F.min("sz").alias("min_group_size"),
        F.round(below(2) / tot, 4).alias("share_below_k2"),
        F.round(below(5) / tot, 4).alias("share_below_k5"),
        F.round(below(10) / tot, 4).alias("share_below_k10"))

K_ANON_SQL = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000) AS band,
         count(*) AS sz
  FROM customer GROUP BY 1, 2, 3
)
SELECT count(*) AS n_groups,
       CAST(sum(sz) AS BIGINT) AS n_customers,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       round(CAST(sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS DOUBLE)
             / sum(sz), 4) AS share_below_k2,
       round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
             / sum(sz), 4) AS share_below_k5,
       round(CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS DOUBLE)
             / sum(sz), 4) AS share_below_k10
FROM g
"""


# --------------------------------------------------------------------------
# A108. Difference-in-differences (public; e.g. Card-Krueger 1994):
# URGENT vs LOW order value, pre/post a fixed cutoff — the four cell
# means in ONE conditional aggregate, DiD = (T,post−T,pre) −
# (C,post−C,pre), with the large-sample SE from per-cell variances.
# Money means are exact DECIMAL sums over integer counts.
# --------------------------------------------------------------------------

def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
                & F.col("o_orderdate").isNotNull()))
    t = (F.col("o_orderpriority") == "1-URGENT")
    post = F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")
    cells = []
    for tag, cond in (("t_post", t & post), ("t_pre", t & ~post),
                      ("c_post", ~t & post), ("c_pre", ~t & ~post)):
        cells += [
            F.sum(F.when(cond, money("o_totalprice"))).alias(f"s_{tag}"),
            F.sum(cond.cast("long")).alias(f"n_{tag}"),
            F.var_samp(F.when(cond, F.col("o_totalprice")))
             .alias(f"v_{tag}")]
    agg = o.agg(*cells)
    m = {tag: (F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}"))
         for tag in ("t_post", "t_pre", "c_post", "c_pre")}
    did = (m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"])
    se = F.sqrt(sum(F.col(f"v_{tag}") / F.col(f"n_{tag}")
                    for tag in ("t_post", "t_pre", "c_post", "c_pre")))
    return agg.select(
        *[F.round(m[tag], 4).alias(f"mean_{tag}")
          for tag in ("t_post", "t_pre", "c_post", "c_pre")],
        F.round(did, 4).alias("did_estimate"),
        F.round(did / se, 4).alias("z_stat"))

DID_SQL = """
WITH f AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
         CASE WHEN o_orderdate >= DATE '1996-01-01' THEN 1 ELSE 0 END
           AS post,
         CAST(o_totalprice AS DECIMAL(18,2)) AS val,
         o_totalprice AS raw
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    AND o_orderdate IS NOT NULL
), a AS (
  SELECT
    CAST(sum(CASE WHEN t = 1 AND post = 1 THEN val END) AS DOUBLE)
      / sum(CASE WHEN t = 1 AND post = 1 THEN 1 END) AS m_t_post,
    CAST(sum(CASE WHEN t = 1 AND post = 0 THEN val END) AS DOUBLE)
      / sum(CASE WHEN t = 1 AND post = 0 THEN 1 END) AS m_t_pre,
    CAST(sum(CASE WHEN t = 0 AND post = 1 THEN val END) AS DOUBLE)
      / sum(CASE WHEN t = 0 AND post = 1 THEN 1 END) AS m_c_post,
    CAST(sum(CASE WHEN t = 0 AND post = 0 THEN val END) AS DOUBLE)
      / sum(CASE WHEN t = 0 AND post = 0 THEN 1 END) AS m_c_pre,
    var_samp(CASE WHEN t = 1 AND post = 1 THEN raw END)
      / sum(CASE WHEN t = 1 AND post = 1 THEN 1 END) AS vv1,
    var_samp(CASE WHEN t = 1 AND post = 0 THEN raw END)
      / sum(CASE WHEN t = 1 AND post = 0 THEN 1 END) AS vv2,
    var_samp(CASE WHEN t = 0 AND post = 1 THEN raw END)
      / sum(CASE WHEN t = 0 AND post = 1 THEN 1 END) AS vv3,
    var_samp(CASE WHEN t = 0 AND post = 0 THEN raw END)
      / sum(CASE WHEN t = 0 AND post = 0 THEN 1 END) AS vv4
  FROM f
)
SELECT round(m_t_post, 4) AS mean_t_post,
       round(m_t_pre, 4) AS mean_t_pre,
       round(m_c_post, 4) AS mean_c_post,
       round(m_c_pre, 4) AS mean_c_pre,
       round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4)
         AS did_estimate,
       round(((m_t_post - m_t_pre) - (m_c_post - m_c_pre))
             / sqrt(vv1 + vv2 + vv3 + vv4), 4) AS z_stat
FROM a
"""


# --------------------------------------------------------------------------
# A109. Weight-of-Evidence + Information Value (classic credit-scoring
# feature screening; public — e.g. Siddiqi 2006): per segment, WoE =
# ln(pos-share / neg-share) against "customer placed an urgent
# order", and the IV contribution. Semi-join tags the outcome; one
# contingency aggregate; 6-dp-rounded ln keeps the IV sum stable.
# --------------------------------------------------------------------------

def woe_iv_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority") == "1-URGENT")
         .select("o_custkey").distinct())
    tagged = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
               .select("c_mktsegment",
                       o["o_custkey"].isNotNull().cast("int").alias("y")))
    bins = (tagged.groupBy(F.col("c_mktsegment").alias("segment"))
                  .agg(F.sum("y").alias("n_pos"),
                       F.sum(1 - F.col("y")).alias("n_neg")))
    tot = bins.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    ps = F.col("n_pos") / F.col("tp")
    ns = F.col("n_neg") / F.col("tn")
    woe = F.round(F.log(ps / ns), 6)
    return (bins.crossJoin(F.broadcast(tot))
                .select("segment", "n_pos", "n_neg",
                        woe.alias("woe"),
                        F.round((ps - ns) * woe, 6).alias("iv_contrib")))

WOE_IV_SQL = """
WITH o AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
), tagged AS (
  SELECT c.c_mktsegment,
         CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
  FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
), bins AS (
  SELECT c_mktsegment AS segment,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM tagged GROUP BY 1
), tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM bins)
SELECT segment, n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE round(ln((CAST(n_pos AS DOUBLE) / tp)
                          / (CAST(n_neg AS DOUBLE) / tn)), 6) END AS woe,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE round((CAST(n_pos AS DOUBLE) / tp
                        - CAST(n_neg AS DOUBLE) / tn)
                       * round(ln((CAST(n_pos AS DOUBLE) / tp)
                                  / (CAST(n_neg AS DOUBLE) / tn)), 6), 6)
       END AS iv_contrib
FROM bins CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# A110. Calibration curve + Brier score for a FROZEN scoring model
# (reliability diagram; public — e.g. DeGroot-Fienberg 1983). The
# pinned sigmoid score (a deployment-time artifact, rounded to 6 dp
# per row) is binned by exact-decimal value bands; per bin: mean
# predicted vs empirical rate; global Brier = mean squared error.
# One conditional-agg scan.
# --------------------------------------------------------------------------

def calibration_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    z = F.lit(-2.0) + F.col("o_totalprice") * F.lit(1e-5)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    y = (F.col("o_orderstatus") == "F").cast("int")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9))
         .cast("int").alias("bin"),
        score.alias("p"), y.alias("y"))
    # ONE scan: the global Brier is derivable from per-bin squared-
    # error sums, so it rides the same groupBy and the fact is never
    # re-read (code-review r02)
    bins = (binned.groupBy("bin")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.round(F.avg("p"), 4).alias("mean_predicted"),
                       F.round(F.avg(F.col("y").cast("double")), 4)
                        .alias("empirical_rate"),
                       F.sum((F.col("p") - F.col("y"))
                             * (F.col("p") - F.col("y"))).alias("__ss")))
    brier = bins.agg(
        F.round(F.sum("__ss") / F.sum("n"), 4).alias("b"))
    return (bins.crossJoin(F.broadcast(brier))
                .select("bin", "n", "mean_predicted", "empirical_rate",
                        F.col("b").alias("brier_score")))

CALIBRATION_SQL = """
WITH s AS (
  SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bin,
         round(1.0 / (1.0 + exp(-(-2.0 + o_totalprice * 1e-5))), 6) AS p,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), bins AS (
  SELECT bin, count(*) AS n,
         round(avg(p), 4) AS mean_predicted,
         round(avg(CAST(y AS DOUBLE)), 4) AS empirical_rate,
         sum((p - y) * (p - y)) AS ss
  FROM s GROUP BY 1
), brier AS (SELECT round(sum(ss) / sum(n), 4) AS b FROM bins)
SELECT bin, n, mean_predicted, empirical_rate, brier.b AS brier_score
FROM bins CROSS JOIN brier
"""


# --------------------------------------------------------------------------
# A111. Split-conformal prediction interval (Vovk et al., public;
# Lei et al. 2018): fit the simple price~quantity line on the train
# folds, take the 0.9 quantile of |residual| on the calibration fold
# (bracket-refine, exact interpolation), and report the finite-sample
# coverage on the held-out test fold — which the conformal guarantee
# says must be ≈ 0.9. Coefficients round to 6 dp so both engines
# score with identical decimal constants (the score_holdout recipe).
# --------------------------------------------------------------------------

def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .where(F.col("l_quantity").isNotNull()
                 & F.col("l_extendedprice").isNotNull())
          .persist())  # four fold passes share one materialization
    fold = F.pmod(F.col("l_orderkey"), F.lit(5))
    train = li.where(~fold.isin(0, 4))
    r = train.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("l_quantity").alias("sx"),
                  F.sum("l_extendedprice").alias("sy"),
                  F.sum(F.col("l_quantity") * F.col("l_quantity"))
                   .alias("sxx"),
                  F.sum(F.col("l_quantity") * F.col("l_extendedprice"))
                   .alias("sxy")).collect()[0]
    b1 = round((r.n * r.sxy - r.sx * r.sy) / (r.n * r.sxx - r.sx * r.sx), 6)
    b0 = round((r.sy - b1 * r.sx) / r.n, 6)
    resid = F.abs(F.col("l_extendedprice")
                  - (F.lit(b0) + F.lit(b1) * F.col("l_quantity")))
    cal = (li.where(fold == 4)
             .select(F.lit("all").alias("g"), resid.alias("ar")))
    q = stats.grouped_quantiles(cal, "g", "ar", [0.9], ["q90"])
    test = li.where(fold == 0).select(resid.alias("ar"))
    cov = (test.crossJoin(F.broadcast(q.select("q90")))
               .agg(F.count(F.lit(1)).alias("n_test"),
                    F.sum((F.col("ar") <= F.col("q90")).cast("long"))
                     .alias("n_covered"),
                    F.round(F.max("q90"), 4).alias("q90")))
    out = cov.select("n_test", "n_covered", "q90",
                     F.round(F.col("n_covered") / F.col("n_test"), 4)
                      .alias("coverage")).localCheckpoint(eager=True)
    li.unpersist()
    return out

CONFORMAL_SQL = """
WITH li AS (
  SELECT l_orderkey, l_quantity AS x, l_extendedprice AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), tr AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM li WHERE l_orderkey % 5 NOT IN (0, 4)
), c AS (
  SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS b1,
         round((sy - round((n * sxy - sx * sy)
                           / (n * sxx - sx * sx), 6) * sx) / n, 6) AS b0
  FROM tr
), cal AS (
  SELECT abs(y - (c.b0 + c.b1 * x)) AS ar
  FROM li, c WHERE l_orderkey % 5 = 4
), q AS (SELECT quantile_cont(ar, 0.9) AS q90 FROM cal),
test AS (
  SELECT abs(y - (c.b0 + c.b1 * x)) AS ar
  FROM li, c WHERE l_orderkey % 5 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN ar <= q.q90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       round(max(q.q90), 4) AS q90,
       round(CAST(sum(CASE WHEN ar <= q.q90 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS coverage
FROM test CROSS JOIN q
"""


# --------------------------------------------------------------------------
# A112. Two-component Gaussian mixture via EM on scaled order value —
# the density-model companion to k-means (see ml.gmm_em_1d for the
# per-iteration fused-aggregate shape and the 6-dp determinism
# contract shared with the unrolled-CTE oracle). The 1e-5 scaling
# keeps exp() arguments O(1) on both engines.
# --------------------------------------------------------------------------

def gmm_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select((F.col("o_totalprice") * F.lit(1e-5)).alias("xs")))
    # round_to=6 == the stored parameter precision: re-rounding the
    # 6-dp params to 4 dp hits exact half-way ties (observed: a std of
    # 0.937750 split 0.9377/0.9378 across engines)
    return ml.gmm_em_1d(o, "xs", n_iter=3, round_to=6)

GMM_SQL = oracles.gmm_em_sql(
    "xs", table="(SELECT o_totalprice * 1e-5 AS xs FROM orders) __t",
    n_iter=3, round_to=6)


# --------------------------------------------------------------------------
# A113. Lorenz curve of customer spend (Lorenz 1905, public) — the
# curve behind A79's Gini: cumulative spend share by spend decile.
# Deciles come from the A39 range-partitioned NTILE assembly (no
# single-task global window); spend sums are exact DECIMAL; the
# cumulative runs by joining the 10-row decile table to itself
# (b ≤ a) — no window at all on the grid.
# --------------------------------------------------------------------------

def lorenz_curve_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import money
    o = load_table(spark, sf_dir, "orders")
    spend = (o.groupBy("o_custkey")
              .agg(F.sum(money("o_totalprice")).alias("sp")))
    d = (spend.repartitionByRange(F.col("sp"), F.col("o_custkey"))
              .withColumn("__pid", F.spark_partition_id()))
    wl = Window.partitionBy("__pid").orderBy("sp", "o_custkey")
    local = d.withColumn("__rn", F.row_number().over(wl))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (local.groupBy("__pid").agg(F.max("__rn").alias("__t"))
           .withColumn("__off", F.coalesce(F.sum("__t").over(wo), F.lit(0))))
    tot = off.agg(F.sum("__t").alias("__n"))
    r = F.col("__off") + F.col("__rn")
    q = F.floor(F.col("__n") / 10)
    rem = F.col("__n") % 10
    cutoff = rem * (q + 1)
    decile = (F.when(F.col("__n") < 10, r)
               .when(r <= cutoff, F.floor((r + q) / (q + 1)))
               .otherwise(rem + F.floor((r - cutoff + q - 1) / q)))
    per_dec = (local.join(F.broadcast(off.select("__pid", "__off")), "__pid")
               .crossJoin(F.broadcast(tot))
               .withColumn("decile", decile.cast("int"))
               .groupBy("decile")
               .agg(F.count(F.lit(1)).alias("n_customers"),
                    F.sum("sp").alias("__s")))
    total = per_dec.agg(F.sum("__s").alias("__tot"))
    a, b = per_dec.alias("a"), per_dec.alias("b")
    cum = (a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
            .groupBy(F.col("a.decile").alias("decile"),
                     F.col("a.n_customers").alias("n_customers"),
                     F.col("a.__s").alias("__s"))
            .agg(F.sum(F.col("b.__s")).alias("__cum")))
    return (cum.crossJoin(F.broadcast(total))
               .select("decile", "n_customers",
                       F.round((F.col("__s") / F.col("__tot"))
                               .cast("double"), 4).alias("spend_share"),
                       F.round((F.col("__cum") / F.col("__tot"))
                               .cast("double"), 4)
                        .alias("cum_spend_share")))

LORENZ_SQL = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
  FROM orders GROUP BY 1
), dd AS (
  SELECT sp, ntile(10) OVER (ORDER BY sp, o_custkey) AS decile
  FROM spend
), per_dec AS (
  SELECT decile, count(*) AS n_customers, sum(sp) AS s
  FROM dd GROUP BY 1
), tot AS (SELECT sum(s) AS t FROM per_dec)
SELECT a.decile, a.n_customers,
       round(CAST(a.s AS DOUBLE) / max(tot.t), 4) AS spend_share,
       round(CAST(sum(b.s) AS DOUBLE) / max(tot.t), 4)
         AS cum_spend_share
FROM per_dec a JOIN per_dec b ON b.decile <= a.decile CROSS JOIN tot
GROUP BY a.decile, a.n_customers, a.s
"""


# --------------------------------------------------------------------------
# A118. Fisher's exact test on a 2x2 contingency table (Fisher 1935;
# R's fisher.test is the standard companion to chisq.test for sparse
# tables — the reference runs chi-square association checks at
# R:775+). Cells: customers with negative account balance x BUILDING
# market segment. The distributed part is ONE fused aggregate scan to
# the four cell counts; the hypergeometric enumeration (two-sided:
# sum of all table probabilities <= the observed one) runs on the
# driver with exact lgamma arithmetic over min(margin) terms — the
# operator's contract is small-margin tables, which is exactly where
# Fisher's exactness matters (use chisq_status_priority when every
# expected cell is large).
# --------------------------------------------------------------------------

def fisher_exact_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    c = load_table(spark, sf_dir, "customer")
    row = F.col("c_acctbal") < 0
    col = F.col("c_mktsegment") == "BUILDING"
    cnt = c.agg(
        F.sum((row & col).cast("long")).alias("a"),
        F.sum((row & ~col).cast("long")).alias("b"),
        F.sum((~row & col).cast("long")).alias("c"),
        F.sum((~row & ~col).cast("long")).alias("d")).collect()[0]
    a, b, cc, d = int(cnt["a"]), int(cnt["b"]), int(cnt["c"]), int(cnt["d"])
    n, r1, c1 = a + b + cc + d, a + b, a + cc

    def logp(k: int) -> float:
        lg = math.lgamma
        return (lg(r1 + 1) + lg(n - r1 + 1) + lg(c1 + 1) + lg(n - c1 + 1)
                - lg(n + 1) - lg(k + 1) - lg(r1 - k + 1) - lg(c1 - k + 1)
                - lg(n - r1 - c1 + k + 1))

    lp_obs = logp(a)
    # two-sided: standard 1e-7 relative tolerance against float drift
    # in the "as or more extreme" comparison (R's fisher.test does the
    # same) — the SQL oracle replicates the identical rule
    p = sum(math.exp(lp) for k in range(max(0, r1 + c1 - n),
                                        min(r1, c1) + 1)
            if (lp := logp(k)) <= lp_obs + 1e-7)
    odds = (a * d) / (b * cc) if b * cc else float("inf")
    return spark.createDataFrame(
        [(a, b, cc, d, round(odds, 4), round(min(p, 1.0), 6))],
        "n_11 long, n_12 long, n_21 long, n_22 long, "
        "odds_ratio double, p_two_sided double")

FISHER_SQL = """
WITH cells AS (
  SELECT
    CAST(sum(CASE WHEN c_acctbal < 0 AND c_mktsegment = 'BUILDING'
             THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN c_acctbal < 0 AND c_mktsegment <> 'BUILDING'
             THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN c_acctbal >= 0 AND c_mktsegment = 'BUILDING'
             THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN c_acctbal >= 0 AND c_mktsegment <> 'BUILDING'
             THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM customer
), m AS (
  SELECT a, b, c, d, a + b + c + d AS n, a + b AS r1, a + c AS c1
  FROM cells
), ks AS (
  SELECT m.*, unnest(range(greatest(0, r1 + c1 - n),
                           least(r1, c1) + 1)) AS k
  FROM m
), lp AS (
  SELECT *,
         lgamma(r1 + 1) + lgamma(n - r1 + 1) + lgamma(c1 + 1)
           + lgamma(n - c1 + 1) - lgamma(n + 1) - lgamma(k + 1)
           - lgamma(r1 - k + 1) - lgamma(c1 - k + 1)
           - lgamma(n - r1 - c1 + k + 1) AS logp,
         lgamma(r1 + 1) + lgamma(n - r1 + 1) + lgamma(c1 + 1)
           + lgamma(n - c1 + 1) - lgamma(n + 1) - lgamma(a + 1)
           - lgamma(r1 - a + 1) - lgamma(c1 - a + 1)
           - lgamma(n - r1 - c1 + a + 1) AS logp_obs
  FROM ks
)
SELECT a AS n_11, b AS n_12, c AS n_21, d AS n_22,
       round(CAST(a * d AS DOUBLE) / (b * c), 4) AS odds_ratio,
       round(least(sum(CASE WHEN logp <= logp_obs + 1e-7
                            THEN exp(logp) ELSE 0 END), 1.0), 6)
         AS p_two_sided
FROM lp GROUP BY a, b, c, d
"""


# --------------------------------------------------------------------------
# A119. Kendall's tau-b rank correlation (Kendall 1938) between
# l_quantity and l_discount — EXACT at any row count without the
# O(n^2) pair scan: both columns are low-cardinality, so concordant /
# discordant pair totals are sums over the JOINT CONTINGENCY CUBE
# (one groupBy -> ~550 cells), paired by a cells-x-cells self-join
# that is bounded by value-pair cardinality, never rows. Tie terms
# come from the margins. For continuous columns, bin first — the
# operator contract mirrors tau-b's own tie semantics.
# --------------------------------------------------------------------------

def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.groupBy(F.col("l_quantity").alias("x"),
                        F.col("l_discount").alias("y"))
               .agg(F.count(F.lit(1)).alias("c"))
               .localCheckpoint(eager=True))
    a, b2 = cells.alias("a"), cells.alias("b")
    conc = (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y"))
    disc = (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y"))
    pairs = a.crossJoin(b2).agg(
        F.sum(F.when(conc, F.col("a.c") * F.col("b.c"))
               .otherwise(F.lit(0))).alias("C"),
        F.sum(F.when(disc, F.col("a.c") * F.col("b.c"))
               .otherwise(F.lit(0))).alias("D"))
    margins = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"))
    rx = (cells.groupBy("x").agg(F.sum("c").alias("r"))
               .agg(F.sum(F.col("r") * F.col("r")).alias("sr2")))
    cy = (cells.groupBy("y").agg(F.sum("c").alias("s"))
               .agg(F.sum(F.col("s") * F.col("s")).alias("ss2")))
    j = pairs.crossJoin(margins).crossJoin(rx).crossJoin(cy)
    # doubles for the n^2-scale products: exact to 2^53 and the final
    # statistic is a ratio rounded to 6 (BIGINT would overflow first)
    n = F.col("n").cast("double")
    n0 = (n * n - n) / 2
    n1 = (F.col("sr2").cast("double") - n) / 2
    n2 = (F.col("ss2").cast("double") - n) / 2
    tau = ((F.col("C") - F.col("D")).cast("double")
           / F.sqrt((n0 - n1) * (n0 - n2)))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("C").cast("long").alias("concordant"),
        F.col("D").cast("long").alias("discordant"),
        F.round(tau, 6).alias("tau_b"))

KENDALL_SQL = """
WITH cells AS (
  SELECT l_quantity AS x, l_discount AS y, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), pairs AS (
  SELECT
    sum(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END) AS C,
    sum(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END) AS D
  FROM cells a CROSS JOIN cells b
), margins AS (
  SELECT sum(c) AS n, sum(c * c) AS sc2 FROM cells
), rx AS (
  SELECT sum(r * r) AS sr2
  FROM (SELECT sum(c) AS r FROM cells GROUP BY x)
), cy AS (
  SELECT sum(s * s) AS ss2
  FROM (SELECT sum(c) AS s FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(C AS BIGINT) AS concordant,
       CAST(D AS BIGINT) AS discordant,
       round(CAST(C - D AS DOUBLE)
             / sqrt(((CAST(n AS DOUBLE) * n - n) / 2
                     - (CAST(sr2 AS DOUBLE) - n) / 2)
                    * ((CAST(n AS DOUBLE) * n - n) / 2
                       - (CAST(ss2 AS DOUBLE) - n) / 2)), 6) AS tau_b
FROM pairs CROSS JOIN margins CROSS JOIN rx CROSS JOIN cy
"""


# --------------------------------------------------------------------------
# A120. Tukey HSD pairwise contrasts after one-way ANOVA (Tukey 1949;
# R's TukeyHSD(aov(...)) — the standard post-hoc to the reference's
# anova at R:765-772): for every segment pair, the mean difference
# and the studentized-range q statistic against the pooled MSE. One
# groupBy to per-group moments (k rows), then a k x k self-join —
# nothing scales with rows but the single moment scan.
# --------------------------------------------------------------------------

def tukey_hsd_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_mktsegment")
          .agg(F.count("c_acctbal").alias("n"),
               F.avg("c_acctbal").alias("m"),
               F.sum(F.col("c_acctbal") * F.col("c_acctbal")).alias("s2")))
    tot = g.agg(
        F.sum("n").alias("tot_n"), F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.col("s2") - F.col("n") * F.col("m") * F.col("m"))
         .alias("ssw"))
    mse = F.col("ssw") / (F.col("tot_n") - F.col("n_groups"))
    a, b2 = g.alias("a"), g.alias("b")
    pair = (a.crossJoin(b2)
             .where(F.col("a.c_mktsegment") < F.col("b.c_mktsegment"))
             .crossJoin(F.broadcast(tot)))
    diff = F.col("a.m") - F.col("b.m")
    se = F.sqrt(mse / 2 * (1 / F.col("a.n") + 1 / F.col("b.n")))
    return pair.select(
        F.col("a.c_mktsegment").alias("segment_a"),
        F.col("b.c_mktsegment").alias("segment_b"),
        F.round(diff, 4).alias("mean_diff"),
        F.round(se, 4).alias("se"),
        F.round(diff / se, 4).alias("q_stat"))

TUKEY_SQL = """
WITH g AS (
  SELECT c_mktsegment, count(c_acctbal) AS n, avg(c_acctbal) AS m,
         sum(c_acctbal * c_acctbal) AS s2
  FROM customer GROUP BY 1
), tot AS (
  SELECT sum(n) AS tot_n, count(*) AS n_groups,
         sum(s2 - n * m * m) AS ssw
  FROM g
)
SELECT a.c_mktsegment AS segment_a, b.c_mktsegment AS segment_b,
       round(a.m - b.m, 4) AS mean_diff,
       round(sqrt(ssw / (tot_n - n_groups) / 2
                  * (1.0 / a.n + 1.0 / b.n)), 4) AS se,
       round((a.m - b.m)
             / sqrt(ssw / (tot_n - n_groups) / 2
                    * (1.0 / a.n + 1.0 / b.n)), 4) AS q_stat
FROM g a CROSS JOIN g b CROSS JOIN tot
WHERE a.c_mktsegment < b.c_mktsegment
"""


# --------------------------------------------------------------------------
# A121. Cook's distance influence diagnostics (Cook 1977; R's
# plot(lm) panel 4 — the reference inspects lm diagnostics at
# R:593-614): for the simple OLS of extendedprice on quantity, each
# row's leverage h_i = 1/n + (x_i-mx)^2/Sxx and D_i =
# e_i^2 h_i / (p s^2 (1-h_i)^2), p = 2. One moment scan fits the
# line (closed form), one projection scores every row — top 20 most
# influential rows, deterministic tie-break on the row key.
# --------------------------------------------------------------------------

def cooks_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_linenumber",
                  F.col("l_quantity").cast("double").alias("x"),
                  F.col("l_extendedprice").cast("double").alias("y"))
    fit = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
        (F.var_pop("x") * F.count(F.lit(1))).alias("sxx"),
        (F.covar_pop("x", "y") * F.count(F.lit(1))).alias("sxy"),
        (F.var_pop("y") * F.count(F.lit(1))).alias("syy"))
    j = d.crossJoin(F.broadcast(fit))
    slope = F.col("sxy") / F.col("sxx")
    e = F.col("y") - (F.col("my") + slope * (F.col("x") - F.col("mx")))
    s2 = (F.col("syy") - slope * F.col("sxy")) / (F.col("n") - 2)
    h = 1 / F.col("n") + ((F.col("x") - F.col("mx")) ** 2) / F.col("sxx")
    dist = e * e * h / (2 * s2 * (1 - h) * (1 - h))
    return (j.select("l_orderkey", "l_linenumber",
                     F.round(e, 4).alias("residual"),
                     F.round(h, 8).alias("leverage"),
                     F.round(dist, 8).alias("cooks_d"))
             .orderBy(F.col("cooks_d").desc(), "l_orderkey",
                      "l_linenumber")
             .limit(20))

COOKS_SQL = """
WITH d AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
), fit AS (
  SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
         var_pop(x) * count(*) AS sxx,
         covar_pop(x, y) * count(*) AS sxy,
         var_pop(y) * count(*) AS syy
  FROM d
), s AS (
  SELECT d.*, n, mx, my, sxy / sxx AS slope,
         (syy - (sxy / sxx) * sxy) / (n - 2) AS s2,
         1.0 / n + (x - mx) * (x - mx) / sxx AS h
  FROM d CROSS JOIN fit
)
SELECT l_orderkey, l_linenumber,
       round(y - (my + slope * (x - mx)), 4) AS residual,
       round(h, 8) AS leverage,
       round((y - (my + slope * (x - mx))) * (y - (my + slope * (x - mx)))
             * h / (2 * s2 * (1 - h) * (1 - h)), 8) AS cooks_d
FROM s
ORDER BY cooks_d DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# --------------------------------------------------------------------------
# A122. Box-Cox transform selection (Box & Cox 1964; R's
# MASS::boxcox profile — the reference log-transforms skewed
# responses, R:537+): profile log-likelihood over the standard lambda
# grid, LL(l) = -n/2 ln(var_pop(y_l)) + (l-1) SUM(ln y), computed for
# every lambda in ONE fused aggregate scan (each grid point is just
# another pair of aggregate expressions). Flags the grid argmax.
# --------------------------------------------------------------------------

_BOXCOX_GRID = [-1.0, -0.5, 0.0, 0.5, 1.0]

def boxcox_lambda_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("double")
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.log(y)).alias("slog")]
    for i, lam in enumerate(_BOXCOX_GRID):
        t = F.log(y) if lam == 0.0 else (F.pow(y, lam) - 1) / lam
        aggs.append(F.var_pop(t).alias(f"v{i}"))
    wide = o.where(y > 0).agg(*aggs)
    rows = wide.selectExpr(
        "n", "slog",
        "stack({k}, {args}) as (lam, v)".format(
            k=len(_BOXCOX_GRID),
            args=", ".join(f"CAST({lam} AS DOUBLE), v{i}"
                           for i, lam in enumerate(_BOXCOX_GRID))))
    ll = (-F.col("n") / 2 * F.log("v")
          + (F.col("lam") - 1) * F.col("slog"))
    w = Window.partitionBy()
    out = rows.select("lam", F.round(ll, 4).alias("log_lik"))
    return out.withColumn(
        "is_best", (F.col("log_lik") == F.max("log_lik").over(w))
                    .cast("int")).orderBy("lam")

BOXCOX_SQL = """
WITH base AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS y FROM orders
  WHERE o_totalprice > 0
), agg AS (
  SELECT count(*) AS n, sum(ln(y)) AS slog,
         var_pop((pow(y, -1.0) - 1) / -1.0) AS v0,
         var_pop((pow(y, -0.5) - 1) / -0.5) AS v1,
         var_pop(ln(y)) AS v2,
         var_pop((pow(y, 0.5) - 1) / 0.5) AS v3,
         var_pop((pow(y, 1.0) - 1) / 1.0) AS v4
  FROM base
), rows_ AS (
  SELECT n, slog, lam, v
  FROM agg, (VALUES (-1.0, 'v0'), (-0.5, 'v1'), (0.0, 'v2'),
                    (0.5, 'v3'), (1.0, 'v4')) t(lam, tag),
       LATERAL (SELECT CASE tag WHEN 'v0' THEN v0 WHEN 'v1' THEN v1
                       WHEN 'v2' THEN v2 WHEN 'v3' THEN v3
                       ELSE v4 END AS v)
), ll AS (
  SELECT lam, round(-n / 2.0 * ln(v) + (lam - 1) * slog, 4) AS log_lik
  FROM rows_
)
SELECT lam, log_lik,
       CAST(log_lik = max(log_lik) OVER () AS INT) AS is_best
FROM ll ORDER BY lam
"""


# --------------------------------------------------------------------------
# A123. Precision-recall AUC / average precision (Davis & Goadrich
# 2006) — companion to roc_auc_order_status for the imbalanced case:
# AP = SUM over descending score blocks of (block TP / P) * precision
# at the block cut, ties handled as blocks (one groupBy per distinct
# score, cumulative windows over the score-block table — never a
# row-level sort).
# --------------------------------------------------------------------------

def pr_auc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select((F.col("o_orderstatus") == "P").cast("long").alias("pos"),
                 "o_totalprice"))
    # the score-block table is rows-sized for near-unique scores, so
    # the descending cumulative runs through range_cumsum (range-
    # partitioned parallel windows + broadcast offset stitch) on the
    # NEGATED score — never a single-task global sort
    blocks = (o.groupBy("o_totalprice")
               .agg(F.sum("pos").alias("tp_b"),
                    F.count(F.lit(1)).alias("n_b"))
               .withColumn("neg_score", -F.col("o_totalprice")))
    cum = (stats.range_cumsum(blocks, "neg_score", ["tp_b", "n_b"])
           .select("tp_b", F.col("cum_tp_b").alias("ctp"),
                   F.col("cum_n_b").alias("cn")))
    tot = o.agg(F.sum("pos").alias("P"),
                F.count(F.lit(1)).alias("N"))
    ap = (cum.crossJoin(F.broadcast(tot))
             .agg(F.round(F.sum(F.col("tp_b") / F.col("P")
                                * (F.col("ctp") / F.col("cn"))), 6)
                   .alias("average_precision"),
                  F.max("P").alias("n_pos"),
                  F.max(F.col("N") - F.col("P")).alias("n_neg")))
    return ap.select("n_pos", "n_neg", "average_precision")

PR_AUC_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS pos,
         o_totalprice
  FROM orders
), blocks AS (
  SELECT o_totalprice, sum(pos) AS tp_b, count(*) AS n_b
  FROM o GROUP BY 1
), cum AS (
  SELECT tp_b,
         sum(tp_b) OVER (ORDER BY o_totalprice DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ctp,
         sum(n_b) OVER (ORDER BY o_totalprice DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cn
  FROM blocks
), tot AS (
  SELECT sum(pos) AS P, count(*) AS N FROM o
)
SELECT CAST(max(P) AS BIGINT) AS n_pos,
       CAST(max(N - P) AS BIGINT) AS n_neg,
       round(sum(CAST(tp_b AS DOUBLE) / P * (CAST(ctp AS DOUBLE) / cn)),
             6) AS average_precision
FROM cum CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# A124. Partial correlation matrix (ppcor's pcor in R; companion to
# A16's marginal correlations): for each pair, the correlation with
# ALL other profiled columns held constant — computed from cofactors
# of the 4x4 correlation matrix (rho_ij = -C_ij / sqrt(C_ii C_jj);
# the determinant cancels, so no division by a near-singular det).
# One fused corr scan; the Leibniz cofactor expansion is evaluated in
# EXACTLY the same operation order driver-side and in the SQL oracle
# (both generated from the same permutation enumeration — see
# oracles.sql_det), on identically pre-rounded corr inputs, so the
# two sides agree bit-for-bit.
# --------------------------------------------------------------------------

def _leibniz_det_f(M: list[list[float]]) -> float:
    """Numeric twin of oracles.sql_det: identical permutation order,
    identical left-fold multiply/add order — IEEE-identical to the SQL
    expression DuckDB evaluates."""
    from itertools import permutations as _perms
    tot = 0.0
    n = len(M)
    for p in _perms(range(n)):
        s = 1
        for i in range(n):
            for j in range(i + 1, n):
                if p[i] > p[j]:
                    s = -s
        term = 1.0
        for i in range(n):
            term = term * M[i][p[i]]
        tot = tot + term if s > 0 else tot - term
    return tot


def _cof_f(M: list[list[float]], i: int, j: int) -> float:
    k = len(M)
    minor = [[M[r][c] for c in range(k) if c != j]
             for r in range(k) if r != i]
    d = _leibniz_det_f(minor)
    return d if (i + j) % 2 == 0 else -d


def partial_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = _DESCRIBE_COLS
    k = len(cols)
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.round(F.corr(cols[a], cols[b]), 6).alias(f"c_{a}_{b}")
            for a in range(k) for b in range(a + 1, k)]
    row = li.agg(*aggs).collect()[0]
    R = [[1.0] * k for _ in range(k)]
    for a in range(k):
        for b in range(a + 1, k):
            R[a][b] = R[b][a] = float(row[f"c_{a}_{b}"])
    import math
    out = []
    for i in range(k):
        for j in range(i + 1, k):
            pc = (-_cof_f(R, i, j)
                  / math.sqrt(_cof_f(R, i, i) * _cof_f(R, j, j)))
            out.append((cols[i], cols[j], pc))
    # final rounding via Spark's HALF_UP round (Python round is
    # banker's — would drift from the oracle on exact halves)
    return (spark.createDataFrame(
        out, "col_x string, col_y string, pc double")
        .select("col_x", "col_y",
                F.round("pc", 4).alias("partial_corr")))


def _partial_corr_sql(cols: list[str], table: str = "lineitem") -> str:
    k = len(cols)
    sym = [["1.0" if i == j else f"c_{min(i, j)}_{max(i, j)}"
            for j in range(k)] for i in range(k)]

    def cof(i: int, j: int) -> str:
        minor = [[sym[r][c] for c in range(k) if c != j]
                 for r in range(k) if r != i]
        d = oracles.sql_det(minor)
        return f"(-{d})" if (i + j) % 2 else d

    corr_exprs = ", ".join(
        f"round(corr({cols[a]}, {cols[b]}), 6) AS c_{a}_{b}"
        for a in range(k) for b in range(a + 1, k))
    selects = []
    for i in range(k):
        for j in range(i + 1, k):
            selects.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y,\n"
                f"  round(-({cof(i, j)})\n"
                f"    / sqrt(({cof(i, i)}) * ({cof(j, j)})), 4)"
                f" AS partial_corr FROM r")
    return (f"WITH r AS (SELECT {corr_exprs} FROM {table})\n"
            + "\nUNION ALL\n".join(selects))

PARTIAL_CORR_SQL = _partial_corr_sql(_DESCRIBE_COLS)


# --------------------------------------------------------------------------
# A125. Cronbach's alpha internal-consistency reliability (Cronbach
# 1951; psych::alpha in R's EDA toolkit, reference loads psych at
# R:59): alpha = k/(k-1) * (1 - SUM var(item) / var(total score)).
# Everything from ONE fused aggregate (per-item variances + the
# variance of the row-sum expression).
# --------------------------------------------------------------------------

def cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = _DESCRIBE_COLS
    k = len(cols)
    li = load_table(spark, sf_dir, "lineitem")
    total = sum((F.col(c) for c in cols[1:]), F.col(cols[0]))
    agg = li.agg(
        *[F.var_samp(c).alias(f"v{i}") for i, c in enumerate(cols)],
        F.var_samp(total).alias("vt"),
        F.count(F.lit(1)).alias("n"))
    item_sum = sum((F.col(f"v{i}") for i in range(1, k)), F.col("v0"))
    alpha = (F.lit(float(k)) / (k - 1)) * (1 - item_sum / F.col("vt"))
    return agg.select(
        F.col("n").alias("n_rows"), F.lit(k).alias("n_items"),
        F.round(alpha, 6).alias("cronbach_alpha"))

CRONBACH_SQL = f"""
WITH a AS (
  SELECT {", ".join(f"var_samp({c}) AS v{i}"
                    for i, c in enumerate(_DESCRIBE_COLS))},
         var_samp({" + ".join(_DESCRIBE_COLS)}) AS vt,
         count(*) AS n
  FROM lineitem
)
SELECT n AS n_rows, {len(_DESCRIBE_COLS)} AS n_items,
       round({float(len(_DESCRIBE_COLS))} / {len(_DESCRIBE_COLS) - 1}
             * (1 - ({" + ".join(f"v{i}"
                                 for i in range(len(_DESCRIBE_COLS)))})
                / vt), 6) AS cronbach_alpha
FROM a
"""


# --------------------------------------------------------------------------
# A126. Cohen's kappa inter-rater agreement (Cohen 1960): agreement
# between two derived binary "raters" on orders — urgent priority vs
# high order value — beyond chance. All four cells from ONE fused
# conditional-aggregate scan; kappa = (po - pe) / (1 - pe).
# --------------------------------------------------------------------------

def cohen_kappa_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    r1 = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    r2 = F.col("o_totalprice") > 150000
    agg = o.agg(
        F.sum((r1 & r2).cast("long")).alias("a"),
        F.sum((r1 & ~r2).cast("long")).alias("b"),
        F.sum((~r1 & r2).cast("long")).alias("c"),
        F.sum((~r1 & ~r2).cast("long")).alias("d"))
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    po = (F.col("a") + F.col("d")) / n
    pe = ((F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))
          + (F.col("c") + F.col("d")) * (F.col("b") + F.col("d"))) / (n * n)
    return agg.select(
        n.cast("long").alias("n"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"))

KAPPA_SQL = """
WITH cells AS (
  SELECT
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM orders
), m AS (
  SELECT a, b, c, d, CAST(a + b + c + d AS DOUBLE) AS n FROM cells
)
SELECT CAST(n AS BIGINT) AS n,
       round((a + d) / n, 6) AS p_observed,
       round(((a + b) * (a + c) + (c + d) * (b + d)) / (n * n), 6)
         AS p_expected,
       round(((a + d) / n - ((a + b) * (a + c) + (c + d) * (b + d))
              / (n * n))
             / (1 - ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)),
             6) AS kappa
FROM m
"""


# --------------------------------------------------------------------------
# A127. Theil inequality index per segment (Theil 1967; the
# entropy-based companion to A79's Gini): T = (SUM x ln x)/(n mu)
# - ln mu over positive balances — the algebraic one-pass form, so
# each group needs only (n, SUM x, SUM x ln x) from ONE fused scan
# (no mean-join second pass).
# --------------------------------------------------------------------------

def theil_index_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_acctbal") > 0))
    x = F.col("c_acctbal").cast("double")
    g = (c.groupBy("c_mktsegment")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(x).alias("sx"),
               F.sum(x * F.log(x)).alias("sxlx")))
    mu = F.col("sx") / F.col("n")
    theil = F.col("sxlx") / F.col("sx") - F.log(mu)
    return g.select("c_mktsegment", "n",
                    F.round(mu, 4).alias("mean_bal"),
                    F.round(theil, 6).alias("theil_index"))

THEIL_SQL = """
WITH g AS (
  SELECT c_mktsegment, count(*) AS n,
         sum(CAST(c_acctbal AS DOUBLE)) AS sx,
         sum(CAST(c_acctbal AS DOUBLE) * ln(CAST(c_acctbal AS DOUBLE)))
           AS sxlx
  FROM customer WHERE c_acctbal > 0 GROUP BY 1
)
SELECT c_mktsegment, n,
       round(sx / n, 4) AS mean_bal,
       round(sxlx / sx - ln(sx / n), 6) AS theil_index
FROM g
"""


# --------------------------------------------------------------------------
# A128. McNemar's paired test (McNemar 1947; the PAIRED companion to
# A126's kappa — same two derived raters, but testing whether their
# disagreements are symmetric): chi2 = (|b - c| - 1)^2 / (b + c) with
# the Edwards continuity correction, from the SAME single fused
# conditional-aggregate scan.
# --------------------------------------------------------------------------

def mcnemar_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    r1 = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    r2 = F.col("o_totalprice") > 150000
    agg = o.agg(
        F.sum((r1 & ~r2).cast("long")).alias("b"),
        F.sum((~r1 & r2).cast("long")).alias("c"))
    b, c = F.col("b").cast("double"), F.col("c").cast("double")
    chi2 = (F.abs(b - c) - 1) * (F.abs(b - c) - 1) / (b + c)
    return agg.select("b", "c", F.round(chi2, 4).alias("chi2_corrected"))

MCNEMAR_SQL = """
WITH cells AS (
  SELECT
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM orders
)
SELECT b, c,
       round((abs(CAST(b AS DOUBLE) - c) - 1)
             * (abs(CAST(b AS DOUBLE) - c) - 1)
             / (CAST(b AS DOUBLE) + c), 4) AS chi2_corrected
FROM cells
"""


# --------------------------------------------------------------------------
# A129. Bartlett's test of variance homogeneity (Bartlett 1937;
# bartlett.test — the parametric companion to A18e's Levene): the
# statistic is a closed form of the per-group (n_i, s_i^2), so ONE
# moment scan feeds scalar arithmetic. chi2 with k-1 df emitted as a
# statistic (no p — no chi-square CDF in either engine).
# --------------------------------------------------------------------------

def bartlett_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_mktsegment")
          .agg(F.count("c_acctbal").alias("n"),
               F.var_samp("c_acctbal").alias("s2")))
    agg = g.agg(
        F.sum("n").alias("N"), F.count(F.lit(1)).alias("k"),
        F.sum((F.col("n") - 1) * F.col("s2")).alias("num"),
        F.sum((F.col("n") - 1) * F.log("s2")).alias("sumlog"),
        F.sum(1.0 / (F.col("n") - 1)).alias("suminv"))
    sp2 = F.col("num") / (F.col("N") - F.col("k"))
    stat = ((F.col("N") - F.col("k")) * F.log(sp2) - F.col("sumlog"))
    corr_ = (1 + (F.col("suminv") - 1 / (F.col("N") - F.col("k")))
             / (3 * (F.col("k") - 1)))
    return agg.select(
        F.col("N").alias("n_total"), F.col("k").alias("n_groups"),
        F.round(sp2, 4).alias("pooled_var"),
        F.round(stat / corr_, 4).alias("bartlett_chi2"),
        (F.col("k") - 1).alias("dof"))

BARTLETT_B_SQL = """
WITH g AS (
  SELECT c_mktsegment, count(c_acctbal) AS n, var_samp(c_acctbal) AS s2
  FROM customer GROUP BY 1
), a AS (
  SELECT sum(n) AS N, count(*) AS k,
         sum((n - 1) * s2) AS num,
         sum((n - 1) * ln(s2)) AS sumlog,
         sum(1.0 / (n - 1)) AS suminv
  FROM g
)
SELECT CAST(N AS BIGINT) AS n_total, CAST(k AS BIGINT) AS n_groups,
       round(num / (N - k), 4) AS pooled_var,
       round(((N - k) * ln(num / (N - k)) - sumlog)
             / (1 + (suminv - 1.0 / (N - k)) / (3 * (k - 1))), 4)
         AS bartlett_chi2,
       CAST(k - 1 AS BIGINT) AS dof
FROM a
"""


# --------------------------------------------------------------------------
# A130. Higher moments per group — skewness and excess kurtosis from
# EXPLICIT raw-moment algebra (m3/m2^1.5, m4/m2^2 - 3) rather than the
# built-in aggregates: Spark's skewness() and DuckDB's skewness() use
# DIFFERENT estimators (population g1 vs bias-corrected G1), so the
# only cross-engine-checkable form is the shared formula over shared
# moment sums. One fused scan.
# --------------------------------------------------------------------------

def higher_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("double")
    g = (li.groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).alias("n"),
                F.avg(x).alias("m1"),
                F.avg(x * x).alias("r2"),
                F.avg(x * x * x).alias("r3"),
                F.avg(x * x * x * x).alias("r4")))
    m1 = F.col("m1")
    m2 = F.col("r2") - m1 * m1
    m3 = F.col("r3") - 3 * m1 * F.col("r2") + 2 * m1 * m1 * m1
    m4 = (F.col("r4") - 4 * m1 * F.col("r3")
          + 6 * m1 * m1 * F.col("r2") - 3 * m1 * m1 * m1 * m1)
    return g.select(
        "l_returnflag", "n",
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - 3, 4).alias("excess_kurtosis_g2"))

HIGHER_MOMENTS_SQL = """
WITH g AS (
  SELECT l_returnflag, count(*) AS n,
         avg(CAST(l_extendedprice AS DOUBLE)) AS m1,
         avg(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS r2,
         avg(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS r3,
         avg(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS r4
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)
             / pow(r2 - m1 * m1, 1.5), 4) AS skewness_g1,
       round((r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
              - 3 * m1 * m1 * m1 * m1)
             / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3, 4)
         AS excess_kurtosis_g2
FROM g
"""


# --------------------------------------------------------------------------
# A131. Mahalanobis multivariate outliers (Mahalanobis 1936; the
# multivariate generalization of A44's univariate fences): d^2 =
# (x-mu)' S^-1 (x-mu) via the adjugate — d^2 = (v' adj(S) v)/det(S),
# where adj and det expand by the SAME Leibniz term order driver-side
# and in the generated SQL oracle over identically pre-rounded
# covariances (the partial_corr_matrix parity technique). One moment
# scan + one scoring projection; top 20 rows, deterministic
# tie-break.
# --------------------------------------------------------------------------

_MAHAL_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = _MAHAL_COLS
    k = len(cols)
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.round(F.avg(c), 6).alias(f"mu_{i}")
            for i, c in enumerate(cols)]
    aggs += [F.round(F.covar_pop(cols[a], cols[b]), 6).alias(f"s_{a}_{b}")
             for a in range(k) for b in range(a, k)]
    row = li.agg(*aggs).collect()[0]
    mu = [float(row[f"mu_{i}"]) for i in range(k)]
    S = [[float(row[f"s_{min(a, b)}_{max(a, b)}"]) for b in range(k)]
         for a in range(k)]
    det = _leibniz_det_f(S)
    # adjugate = transposed cofactors; S symmetric -> adj symmetric
    adj = [[_cof_f(S, a, b) for b in range(k)] for a in range(k)]
    v = [F.col(c).cast("double") - mu[i] for i, c in enumerate(cols)]
    quad = F.lit(0.0)
    for a in range(k):
        for b in range(k):
            quad = quad + F.lit(adj[a][b]) * v[a] * v[b]
    d2 = quad / F.lit(det)
    return (li.select("l_orderkey", "l_linenumber",
                      F.round(d2, 6).alias("mahalanobis_d2"))
              .orderBy(F.col("mahalanobis_d2").desc(), "l_orderkey",
                       "l_linenumber")
              .limit(20))


def _mahalanobis_sql(cols: list[str], table: str = "lineitem") -> str:
    k = len(cols)
    sym = [[f"s_{min(a, b)}_{max(a, b)}" for b in range(k)]
           for a in range(k)]
    det = oracles.sql_det(sym)

    def cof(i: int, j: int) -> str:
        minor = [[sym[r][c] for c in range(k) if c != j]
                 for r in range(k) if r != i]
        d = oracles.sql_det(minor)
        return f"(-{d})" if (i + j) % 2 else d

    terms = []
    for a in range(k):
        for b in range(k):
            terms.append(f"({cof(a, b)}) * (t.{cols[a]} - m.mu_{a})"
                         f" * (t.{cols[b]} - m.mu_{b})")
    quad = "0.0 + " + "\n       + ".join(terms)
    mu_sel = ", ".join(f"round(avg({c}), 6) AS mu_{i}"
                       for i, c in enumerate(cols))
    cov_sel = ", ".join(
        f"round(covar_pop({cols[a]}, {cols[b]}), 6) AS s_{a}_{b}"
        for a in range(k) for b in range(a, k))
    return f"""
WITH m AS (
  SELECT {mu_sel}, {cov_sel} FROM {table}
)
SELECT t.l_orderkey, t.l_linenumber,
       round(({quad}) / ({det}), 6) AS mahalanobis_d2
FROM {table} t CROSS JOIN m
ORDER BY mahalanobis_d2 DESC, t.l_orderkey, t.l_linenumber
LIMIT 20
"""

MAHALANOBIS_SQL = _mahalanobis_sql(_MAHAL_COLS)


# --------------------------------------------------------------------------
# A132. Q-Q decile comparison between two groups (the tabular form of
# R's qqplot, reference EDA at R:429+): exact order-statistic deciles
# of order value for urgent vs low priority side by side, with their
# ratio. Both sides go through grouped_quantiles' bracket-refine
# machinery (tie-proof RLE, range-parallel) — one bracketed pass per
# group set, never a per-group sort.
# --------------------------------------------------------------------------

def qq_deciles_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
         .select("o_orderpriority", "o_totalprice"))
    fr = [i / 10.0 for i in range(1, 10)]
    al = [f"d{i}" for i in range(1, 10)]
    # materialize the 2-row quantile frame ONCE (each reference to the
    # lazy frame would replay the whole bracket-refine lineage)
    q = {r["o_orderpriority"]: r
         for r in stats.grouped_quantiles(
             o, "o_orderpriority", "o_totalprice", fr, al).collect()}
    hi, lo = q["1-URGENT"], q["5-LOW"]
    rows = [(i, float(hi[f"d{i}"]), float(lo[f"d{i}"]))
            for i in range(1, 10)]
    return (spark.createDataFrame(rows, "decile int, h double, l double")
            .select("decile",
                    F.round("h", 4).alias("urgent_value"),
                    F.round("l", 4).alias("low_value"),
                    F.round(F.col("h") / F.col("l"), 6).alias("qq_ratio")))

QQ_DECILES_SQL = "\nUNION ALL\n".join(
    f"""SELECT {i} AS decile,
       round(quantile_cont(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN o_totalprice END, {i / 10.0}), 4)
         AS urgent_value,
       round(quantile_cont(CASE WHEN o_orderpriority = '5-LOW'
                           THEN o_totalprice END, {i / 10.0}), 4)
         AS low_value,
       round(quantile_cont(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN o_totalprice END, {i / 10.0})
             / quantile_cont(CASE WHEN o_orderpriority = '5-LOW'
                             THEN o_totalprice END, {i / 10.0}), 6)
         AS qq_ratio
FROM orders""" for i in range(1, 10))


# --------------------------------------------------------------------------
# A133. Chow structural-break test (Chow 1960; strucchange in R): does
# the price~quantity regression differ across return-flag regimes?
# F = ((SSR_pooled - SUM SSR_g) / ((k-1)(p+1)))
#     / (SUM SSR_g / (n - k(p+1))), p = 1 slope. Every SSR is a
# closed form of per-group (n, Sxx, Sxy, Syy) — ONE fused moment scan
# for the groups plus one for the pooled fit; scalar F assembly.
# --------------------------------------------------------------------------

def chow_test_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    aggs = [F.count(F.lit(1)).alias("n"),
            (F.var_pop(x) * F.count(F.lit(1))).alias("sxx"),
            (F.covar_pop(x, y) * F.count(F.lit(1))).alias("sxy"),
            (F.var_pop(y) * F.count(F.lit(1))).alias("syy")]
    g = li.groupBy("l_returnflag").agg(*aggs)
    ssr_g = F.col("syy") - F.col("sxy") * F.col("sxy") / F.col("sxx")
    parts = g.agg(F.sum("n").alias("n"),
                  F.count(F.lit(1)).alias("k"),
                  F.sum(ssr_g).alias("ssr_groups"))
    pooled = li.agg(*aggs).select(
        (F.col("syy") - F.col("sxy") * F.col("sxy") / F.col("sxx"))
        .alias("ssr_pooled"))
    jn = parts.crossJoin(pooled)
    num = (F.col("ssr_pooled") - F.col("ssr_groups")) \
        / ((F.col("k") - 1) * 2)
    den = F.col("ssr_groups") / (F.col("n") - F.col("k") * 2)
    # emit MEAN squared residuals, not raw SSRs: at corpus scale the
    # SSR magnitude (~1e13+) exceeds the double ulp at 2 decimals, so
    # a fixed-decimal round of the raw sum is not engine-stable
    return jn.select(
        F.col("n").alias("n_rows"), F.col("k").alias("n_regimes"),
        F.round(F.col("ssr_pooled") / F.col("n"), 4).alias("mse_pooled"),
        F.round(F.col("ssr_groups") / F.col("n"), 4).alias("mse_by_regime"),
        F.round(num / den, 4).alias("chow_f"),
        ((F.col("k") - 1) * 2).alias("df1"),
        (F.col("n") - F.col("k") * 2).alias("df2"))

CHOW_SQL = """
WITH g AS (
  SELECT l_returnflag, count(*) AS n,
         var_pop(CAST(l_quantity AS DOUBLE)) * count(*) AS sxx,
         covar_pop(CAST(l_quantity AS DOUBLE),
                   CAST(l_extendedprice AS DOUBLE)) * count(*) AS sxy,
         var_pop(CAST(l_extendedprice AS DOUBLE)) * count(*) AS syy
  FROM lineitem GROUP BY 1
), parts AS (
  SELECT sum(n) AS n, count(*) AS k,
         sum(syy - sxy * sxy / sxx) AS ssr_groups
  FROM g
), pooled AS (
  SELECT var_pop(CAST(l_extendedprice AS DOUBLE)) * count(*)
         - (covar_pop(CAST(l_quantity AS DOUBLE),
                      CAST(l_extendedprice AS DOUBLE)) * count(*))
           * (covar_pop(CAST(l_quantity AS DOUBLE),
                        CAST(l_extendedprice AS DOUBLE)) * count(*))
           / (var_pop(CAST(l_quantity AS DOUBLE)) * count(*))
           AS ssr_pooled
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_regimes,
       round(ssr_pooled / n, 4) AS mse_pooled,
       round(ssr_groups / n, 4) AS mse_by_regime,
       round(((ssr_pooled - ssr_groups) / ((k - 1) * 2))
             / (ssr_groups / (n - k * 2)), 4) AS chow_f,
       CAST((k - 1) * 2 AS BIGINT) AS df1,
       CAST(n - k * 2 AS BIGINT) AS df2
FROM parts CROSS JOIN pooled
"""


# --------------------------------------------------------------------------
# A134. Cohen's d effect sizes per segment pair (Cohen 1988; the
# magnitude companion to A120's Tukey q — significance is not size):
# d = (m_a - m_b) / s_pooled with the pooled SD from the same single
# moment scan; Hedges' g small-sample correction factor included.
# --------------------------------------------------------------------------

def effect_sizes_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_mktsegment")
          .agg(F.count("c_acctbal").alias("n"),
               F.avg("c_acctbal").alias("m"),
               F.var_samp("c_acctbal").alias("s2")))
    a, b2 = g.alias("a"), g.alias("b")
    pair = (a.crossJoin(b2)
             .where(F.col("a.c_mktsegment") < F.col("b.c_mktsegment")))
    dfree = F.col("a.n") + F.col("b.n") - 2
    sp = F.sqrt(((F.col("a.n") - 1) * F.col("a.s2")
                 + (F.col("b.n") - 1) * F.col("b.s2")) / dfree)
    d = (F.col("a.m") - F.col("b.m")) / sp
    j = 1 - 3 / (4 * dfree - 1)
    return pair.select(
        F.col("a.c_mktsegment").alias("segment_a"),
        F.col("b.c_mktsegment").alias("segment_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * j, 6).alias("hedges_g"))

EFFECT_SIZES_SQL = """
WITH g AS (
  SELECT c_mktsegment, count(c_acctbal) AS n, avg(c_acctbal) AS m,
         var_samp(c_acctbal) AS s2
  FROM customer GROUP BY 1
)
SELECT a.c_mktsegment AS segment_a, b.c_mktsegment AS segment_b,
       round((a.m - b.m)
             / sqrt(((a.n - 1) * a.s2 + (b.n - 1) * b.s2)
                    / (a.n + b.n - 2)), 6) AS cohens_d,
       round((a.m - b.m)
             / sqrt(((a.n - 1) * a.s2 + (b.n - 1) * b.s2)
                    / (a.n + b.n - 2))
             * (1 - 3.0 / (4 * (a.n + b.n - 2) - 1)), 6) AS hedges_g
FROM g a CROSS JOIN g b
WHERE a.c_mktsegment < b.c_mktsegment
"""


# --------------------------------------------------------------------------
# A135. Gamma distribution fit by method of moments (the
# MASS::fitdistr shape for positively-skewed money data; reference
# fits distributions to transformed responses at R:537+): shape
# k = m^2/var, scale theta = var/m from ONE moment scan, plus the
# plug-in mean log-likelihood per observation (needs only SUM ln x
# from the same scan; lgamma(k) evaluated on the driver — neither
# engine has a distributed lgamma aggregate, and k is a scalar).
# --------------------------------------------------------------------------

def gamma_mom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("double")
    r = (o.where(x > 0)
          .agg(F.count(F.lit(1)).alias("n"), F.avg(x).alias("m"),
               F.var_pop(x).alias("v"),
               F.avg(F.log(x)).alias("mlog")).collect()[0])
    n, m, v, mlog = int(r["n"]), float(r["m"]), float(r["v"]), float(r["mlog"])
    k = m * m / v
    theta = v / m
    # mean log-likelihood: (k-1) E[ln x] - E[x]/theta - k ln theta - ln G(k)
    mll = ((k - 1) * mlog - m / theta - k * math.log(theta)
           - math.lgamma(k))
    return (spark.createDataFrame(
        [(n, k, theta, mll)],
        "n long, shape_k double, scale_theta double, mean_loglik double")
        .select("n", F.round("shape_k", 6).alias("shape_k"),
                F.round("scale_theta", 4).alias("scale_theta"),
                F.round("mean_loglik", 6).alias("mean_loglik")))

GAMMA_MOM_SQL = """
WITH a AS (
  SELECT count(*) AS n, avg(CAST(o_totalprice AS DOUBLE)) AS m,
         var_pop(CAST(o_totalprice AS DOUBLE)) AS v,
         avg(ln(CAST(o_totalprice AS DOUBLE))) AS mlog
  FROM orders WHERE o_totalprice > 0
)
SELECT n,
       round(m * m / v, 6) AS shape_k,
       round(v / m, 4) AS scale_theta,
       round((m * m / v - 1) * mlog - m / (v / m)
             - (m * m / v) * ln(v / m) - lgamma(m * m / v), 6)
         AS mean_loglik
FROM a
"""


# --------------------------------------------------------------------------
# A136. Wilcoxon signed-rank test (paired; Wilcoxon 1945 — the
# nonparametric sibling of the reference's paired comparisons at
# R:700+): does the peak realized unit price differ systematically
# from the catalog retail price, per part? The pair statistic is
# d = max(l_extendedprice/l_quantity) - p_retailprice — max of exact
# per-row divisions, NOT an accumulated average, so d is bit-identical
# across engines and summation orders (rank positions never flip on
# FP noise). |d| ranks ride stats.tie_avg_ranks (range-partitioned —
# no single-task global sort over the ~#parts distinct table), with
# the standard tie-corrected normal approximation.
# --------------------------------------------------------------------------

def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("p_partkey", "p_retailprice")
               .agg(F.max(F.col("l_extendedprice") / F.col("l_quantity"))
                     .alias("peak"))
               .select((F.col("peak") - F.col("p_retailprice")).alias("d"))
               .where(F.col("d") != 0))
    runs = (pairs.groupBy(F.abs("d").alias("ad"))
                 .agg(F.count(F.lit(1)).alias("t"),
                      F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
                       .alias("tpos")))
    ranked = (stats.tie_avg_ranks(runs.select("ad", "t"), "ad", "t")
              .join(runs.select("ad", "tpos"), "ad"))
    agg = ranked.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("tpos") * F.col("avg_rank")).alias("wplus"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
         .alias("tsum"))
    n = F.col("n").cast("double")
    var = (n * (n + 1) * (2 * n + 1) / 24.0
           - F.col("tsum").cast("double") / 48.0)
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round("wplus", 2).alias("w_plus"),
        F.round((F.col("wplus") - n * (n + 1) / 4.0) / F.sqrt(var), 6)
         .alias("z_stat"))

WILCOXON_SQL = """
WITH pairs AS (
  SELECT max(l.l_extendedprice / l.l_quantity) - p.p_retailprice AS d
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_retailprice
), nz AS (
  SELECT d, abs(d) AS ad FROM pairs WHERE d <> 0
), ranked AS (
  SELECT d,
         rank() OVER (ORDER BY ad)
           + (count(*) OVER (PARTITION BY ad) - 1) / 2.0 AS r
  FROM nz
), ties AS (
  SELECT coalesce(sum(t * t * t - t), 0) AS tsum
  FROM (SELECT count(*) AS t FROM nz GROUP BY ad)
), s AS (
  SELECT count(*) AS n,
         sum(CASE WHEN d > 0 THEN r ELSE 0 END) AS wplus
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       round(wplus, 2) AS w_plus,
       round((wplus - n * (n + 1) / 4.0)
             / sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0 - tsum / 48.0), 6)
         AS z_stat
FROM s CROSS JOIN ties
"""


# --------------------------------------------------------------------------
# A137. Ordinal association suite: Goodman-Kruskal gamma (1954),
# Somers' D (1962, both directions), and Stuart's tau-c — the
# companions of A116's Kendall tau-b, all closed forms of the SAME
# concordant/discordant cube. The cube is bounded by the two value
# cardinalities (|qty| x |discount| cells), never by corpus rows, so
# the crossJoin is a constant-size compute regardless of scale.
# --------------------------------------------------------------------------

def ordinal_assoc_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.groupBy(F.col("l_quantity").alias("x"),
                        F.col("l_discount").alias("y"))
               .agg(F.count(F.lit(1)).alias("c"))
               .localCheckpoint(eager=True))
    a, b2 = cells.alias("a"), cells.alias("b")
    conc = (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y"))
    disc = (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y"))
    pairs = a.crossJoin(b2).agg(
        F.sum(F.when(conc, F.col("a.c") * F.col("b.c"))
               .otherwise(F.lit(0))).alias("C"),
        F.sum(F.when(disc, F.col("a.c") * F.col("b.c"))
               .otherwise(F.lit(0))).alias("D"))
    margins = cells.agg(F.sum("c").alias("n"),
                        F.countDistinct("x").alias("nx"),
                        F.countDistinct("y").alias("ny"))
    rx = (cells.groupBy("x").agg(F.sum("c").alias("r"))
               .agg(F.sum(F.col("r") * F.col("r")).alias("sr2")))
    cy = (cells.groupBy("y").agg(F.sum("c").alias("s"))
               .agg(F.sum(F.col("s") * F.col("s")).alias("ss2")))
    j = pairs.crossJoin(margins).crossJoin(rx).crossJoin(cy)
    n = F.col("n").cast("double")
    n0 = (n * n - n) / 2
    n1 = (F.col("sr2").cast("double") - n) / 2
    n2 = (F.col("ss2").cast("double") - n) / 2
    cd = (F.col("C") - F.col("D")).cast("double")
    m = F.least(F.col("nx"), F.col("ny")).cast("double")
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("C").cast("long").alias("concordant"),
        F.col("D").cast("long").alias("discordant"),
        F.round(cd / (F.col("C") + F.col("D")).cast("double"), 6)
         .alias("gk_gamma"),
        F.round(cd / (n0 - n1), 6).alias("somers_d_yx"),
        F.round(cd / (n0 - n2), 6).alias("somers_d_xy"),
        F.round(cd * 2 * m / (n * n * (m - 1)), 6).alias("stuart_tau_c"))

ORDINAL_ASSOC_SQL = """
WITH cells AS (
  SELECT l_quantity AS x, l_discount AS y, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), pairs AS (
  SELECT
    sum(CASE WHEN b.x > a.x AND b.y > a.y THEN a.c * b.c ELSE 0 END) AS C,
    sum(CASE WHEN b.x > a.x AND b.y < a.y THEN a.c * b.c ELSE 0 END) AS D
  FROM cells a CROSS JOIN cells b
), margins AS (
  SELECT sum(c) AS n, count(DISTINCT x) AS nx, count(DISTINCT y) AS ny
  FROM cells
), rx AS (
  SELECT sum(r * r) AS sr2
  FROM (SELECT sum(c) AS r FROM cells GROUP BY x)
), cy AS (
  SELECT sum(s * s) AS ss2
  FROM (SELECT sum(c) AS s FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(C AS BIGINT) AS concordant,
       CAST(D AS BIGINT) AS discordant,
       round(CAST(C - D AS DOUBLE) / (C + D), 6) AS gk_gamma,
       round(CAST(C - D AS DOUBLE)
             / ((CAST(n AS DOUBLE) * n - n) / 2 - (sr2 - n) / 2.0), 6)
         AS somers_d_yx,
       round(CAST(C - D AS DOUBLE)
             / ((CAST(n AS DOUBLE) * n - n) / 2 - (ss2 - n) / 2.0), 6)
         AS somers_d_xy,
       round(CAST(C - D AS DOUBLE) * 2 * least(nx, ny)
             / (CAST(n AS DOUBLE) * n * (least(nx, ny) - 1)), 6)
         AS stuart_tau_c
FROM pairs CROSS JOIN margins CROSS JOIN rx CROSS JOIN cy
"""


# --------------------------------------------------------------------------
# A138. D'Agostino-Pearson K² omnibus normality test (D'Agostino 1971;
# Anscombe-Glynn 1983 kurtosis transform) on ln(o_totalprice) — the
# formal companion of the reference's visual normality checks (hist /
# qqnorm around R:601 Jarque-Bera territory). ONE moment scan (n,
# E[x..x⁴]) feeds closed-form z-transforms of skewness and kurtosis;
# 100 TB cost = a single map-side-combined aggregate, no shuffle
# beyond 5 partials. All downstream math is scalar algebra on the
# one-row aggregate, identical decimal inputs in both engines.
# --------------------------------------------------------------------------

def dagostino_k2_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.log(F.col("o_totalprice").cast("double"))
    g = o.agg(F.count(F.lit(1)).alias("n"),
              F.avg(x).alias("m1"),
              F.avg(x * x).alias("r2"),
              F.avg(x * x * x).alias("r3"),
              F.avg(x * x * x * x).alias("r4"))
    n = F.col("n").cast("double")
    m1 = F.col("m1")
    m2 = F.col("r2") - m1 * m1
    m3 = F.col("r3") - 3 * m1 * F.col("r2") + 2 * m1 * m1 * m1
    m4 = (F.col("r4") - 4 * m1 * F.col("r3")
          + 6 * m1 * m1 * F.col("r2") - 3 * m1 * m1 * m1 * m1)
    g1 = m3 / F.pow(m2, 1.5)
    b2 = m4 / (m2 * m2)
    # skewness transform (D'Agostino 1970)
    y = g1 * F.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
             / ((n - 2) * (n + 5) * (n + 7) * (n + 9)))
    w2 = F.sqrt(2 * (beta2 - 1)) - 1
    delta = 1.0 / F.sqrt(F.log(F.sqrt(w2)))
    alpha = F.sqrt(2.0 / (w2 - 1))
    z1 = delta * F.log(y / alpha + F.sqrt((y / alpha) * (y / alpha) + 1))
    # kurtosis transform (Anscombe-Glynn 1983)
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1)
                                          * (n + 3) * (n + 5))
    xk = (b2 - eb2) / F.sqrt(vb2)
    sb1 = (6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
           * F.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
    a = 6.0 + 8.0 / sb1 * (2.0 / sb1 + F.sqrt(1 + 4.0 / (sb1 * sb1)))
    z2 = ((1 - 2.0 / (9 * a))
          - F.cbrt((1 - 2.0 / a) / (1 + xk * F.sqrt(2.0 / (a - 4))))
          ) / F.sqrt(2.0 / (9 * a))
    return g.select(
        F.col("n").cast("long").alias("n"),
        F.round(g1, 6).alias("skewness_g1"),
        F.round(b2, 6).alias("kurtosis_b2"),
        F.round(z1, 4).alias("z_skew"),
        F.round(z2, 4).alias("z_kurt"),
        F.round(z1 * z1 + z2 * z2, 4).alias("k2_stat"))

DAGOSTINO_SQL = """
WITH g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(ln(o_totalprice)) AS m1,
         avg(ln(o_totalprice) * ln(o_totalprice)) AS r2,
         avg(ln(o_totalprice) * ln(o_totalprice) * ln(o_totalprice)) AS r3,
         avg(ln(o_totalprice) * ln(o_totalprice)
             * ln(o_totalprice) * ln(o_totalprice)) AS r4
  FROM orders
), mom AS (
  SELECT n,
         (r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)
           / pow(r2 - m1 * m1, 1.5) AS g1,
         (r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1)
           / ((r2 - m1 * m1) * (r2 - m1 * m1)) AS b2
  FROM g
), sk AS (
  SELECT n, g1, b2,
         g1 * sqrt((n + 1) * (n + 3) / (6 * (n - 2))) AS y,
         sqrt(2 * (3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
                   / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1)) - 1 AS w2
  FROM mom
), z1c AS (
  SELECT n, g1, b2,
         (1.0 / sqrt(ln(sqrt(w2))))
           * ln(y / sqrt(2.0 / (w2 - 1))
                + sqrt((y / sqrt(2.0 / (w2 - 1)))
                       * (y / sqrt(2.0 / (w2 - 1))) + 1)) AS z1
  FROM sk
), ku AS (
  SELECT n, g1, b2, z1,
         (b2 - 3.0 * (n - 1) / (n + 1))
           / sqrt(24.0 * n * (n - 2) * (n - 3)
                  / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xk,
         6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
           * sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))) AS sb1
  FROM z1c
), ac AS (
  SELECT n, g1, b2, z1, xk,
         6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1 + 4.0 / (sb1 * sb1))) AS a
  FROM ku
), z2c AS (
  SELECT n, g1, b2, z1,
         ((1 - 2.0 / (9 * a))
          - cbrt((1 - 2.0 / a) / (1 + xk * sqrt(2.0 / (a - 4)))))
           / sqrt(2.0 / (9 * a)) AS z2
  FROM ac
)
SELECT CAST(n AS BIGINT) AS n,
       round(g1, 6) AS skewness_g1,
       round(b2, 6) AS kurtosis_b2,
       round(z1, 4) AS z_skew,
       round(z2, 4) AS z_kurt,
       round(z1 * z1 + z2 * z2, 4) AS k2_stat
FROM z2c
"""


# --------------------------------------------------------------------------
# A139. Dunn's post-hoc pairwise rank test (Dunn 1964, Bonferroni
# family) — the follow-up the reference's workflow implies after a
# significant Kruskal-Wallis (A18d shares this exact rank machinery):
# which segment pairs actually differ in acctbal? Global tie-averaged
# ranks ride the range-partitioned helper on the DISTINCT-value table
# (never a corpus sort); the pairwise table is |segments|²-bounded
# driver-free algebra.
# --------------------------------------------------------------------------

def dunn_posthoc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("double").alias("v"))
    vals = (c.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
             .localCheckpoint(eager=True))
    ranked = stats.tie_avg_ranks(vals, "v", "t")
    per = c.groupBy("c_mktsegment", "v").agg(F.count(F.lit(1)).alias("nv"))
    grp = (per.join(ranked.select("v", "avg_rank"), "v")
              .groupBy("c_mktsegment")
              .agg(F.sum(F.col("avg_rank") * F.col("nv")).alias("rsum"),
                   F.sum("nv").alias("ng")))
    glob = vals.agg(
        F.sum("t").alias("n_total"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
         .alias("tie3"))
    a = grp.select(F.col("c_mktsegment").alias("seg_a"),
                   (F.col("rsum") / F.col("ng")).alias("mr_a"),
                   F.col("ng").alias("na"))
    b = grp.select(F.col("c_mktsegment").alias("seg_b"),
                   (F.col("rsum") / F.col("ng")).alias("mr_b"),
                   F.col("ng").alias("nb"))
    nn = F.col("n_total").cast("double")
    sig2 = (nn * (nn + 1) / 12.0
            - F.col("tie3").cast("double") / (12.0 * (nn - 1)))
    z = ((F.col("mr_a") - F.col("mr_b"))
         / F.sqrt(sig2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))))
    return (a.join(b, a.seg_a < b.seg_b).crossJoin(F.broadcast(glob))
             .select("seg_a", "seg_b",
                     F.round("mr_a", 4).alias("mean_rank_a"),
                     F.round("mr_b", 4).alias("mean_rank_b"),
                     F.round(z, 4).alias("z_stat"))
             .orderBy("seg_a", "seg_b"))

DUNN_SQL = """
WITH c AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS v FROM customer
), ranked AS (
  SELECT c_mktsegment, v,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS r
  FROM c
), grp AS (
  SELECT c_mktsegment, sum(r) AS rsum, count(*) AS ng
  FROM ranked GROUP BY 1
), ties AS (
  SELECT coalesce(sum(t * t * t - t), 0) AS tie3,
         CAST(sum(t) AS DOUBLE) AS n_total
  FROM (SELECT count(*) AS t FROM c GROUP BY v)
)
SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
       round(a.rsum / a.ng, 4) AS mean_rank_a,
       round(b.rsum / b.ng, 4) AS mean_rank_b,
       round((a.rsum / a.ng - b.rsum / b.ng)
             / sqrt((n_total * (n_total + 1) / 12.0
                     - tie3 / (12.0 * (n_total - 1)))
                    * (1.0 / a.ng + 1.0 / b.ng)), 4) AS z_stat
FROM grp a JOIN grp b ON a.c_mktsegment < b.c_mktsegment
CROSS JOIN ties
ORDER BY seg_a, seg_b
"""


# --------------------------------------------------------------------------
# A140. Jonckheere-Terpstra ordered-alternative trend test
# (Terpstra 1952, Jonckheere 1954): does l_quantity shift
# stochastically upward across ordered l_discount levels? JT is the
# sum of pairwise Mann-Whitney counts between ordered group pairs,
# computed ENTIRELY on the (discount × quantity) contingency cube —
# ≤ 11·50 cells regardless of corpus size, exactly A116/A137's
# bounded-cube discipline (the cell self-join is constant-size
# compute, never rows²). Tie-corrected normal approximation.
# --------------------------------------------------------------------------

def jonckheere_trend_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.groupBy(F.col("l_discount").cast("double").alias("g"),
                        F.col("l_quantity").cast("double").alias("v"))
               .agg(F.count(F.lit(1)).alias("c"))
               .localCheckpoint(eager=True))
    c1 = cells.select(F.col("g").alias("g1"), F.col("v").alias("v1"),
                      F.col("c").alias("c1"))
    c2 = cells.select(F.col("g").alias("g2"), F.col("v").alias("v2"),
                      F.col("c").alias("c2"))
    jt = (c1.join(c2, F.col("g1") < F.col("g2"))
            .agg(F.sum(F.when(F.col("v1") < F.col("v2"),
                              F.col("c1") * F.col("c2").cast("double"))
                        .when(F.col("v1") == F.col("v2"),
                              0.5 * F.col("c1") * F.col("c2"))
                        .otherwise(F.lit(0.0))).alias("jt")))
    # cubic tie/group sums overflow int64 already at the 20× stress
    # set (Σ n(n−1)(2n+5) ~ 3e19 for 1.1M-row discount groups) —
    # promote each TERM to double before multiplying, both engines
    gs = (cells.groupBy("g").agg(F.sum("c").alias("n"))
               .withColumn("nd", F.col("n").cast("double"))
               .agg(F.sum("n").alias("n_total"),
                    F.sum(F.col("nd") * F.col("nd")).alias("sn2"),
                    F.sum(F.col("nd") * (F.col("nd") - 1)
                          * (2 * F.col("nd") + 5)).alias("sn25"),
                    F.sum(F.col("nd") * (F.col("nd") - 1)
                          * (F.col("nd") - 2)).alias("sn3"),
                    F.sum(F.col("nd") * (F.col("nd") - 1)).alias("snn")))
    ts = (cells.groupBy("v").agg(F.sum("c").alias("t"))
               .withColumn("td", F.col("t").cast("double"))
               .agg(F.sum(F.col("td") * (F.col("td") - 1)
                          * (2 * F.col("td") + 5)).alias("st25"),
                    F.sum(F.col("td") * (F.col("td") - 1)
                          * (F.col("td") - 2)).alias("st3"),
                    F.sum(F.col("td") * (F.col("td") - 1)).alias("stt")))
    n = F.col("n_total").cast("double")
    mean = (n * n - F.col("sn2")) / 4.0
    # the tie-product terms exceed int64 (Σn³ · Σt³ ~ 1e23 already at
    # sf0.01) — promote to double BEFORE multiplying, both engines
    var = ((n * (n - 1) * (2 * n + 5)
            - F.col("sn25").cast("double") - F.col("st25").cast("double"))
           / 72.0
           + F.col("sn3").cast("double") * F.col("st3").cast("double")
           / (36.0 * n * (n - 1) * (n - 2))
           + F.col("snn").cast("double") * F.col("stt").cast("double")
           / (8.0 * n * (n - 1)))
    return (jt.crossJoin(F.broadcast(gs)).crossJoin(F.broadcast(ts))
              .select(F.col("n_total").cast("long").alias("n"),
                      F.round("jt", 2).alias("jt_stat"),
                      F.round(mean, 2).alias("mean_jt"),
                      F.round((F.col("jt") - mean) / F.sqrt(var), 4)
                       .alias("z_stat")))

JONCKHEERE_SQL = """
WITH cells AS (
  SELECT CAST(l_discount AS DOUBLE) AS g, CAST(l_quantity AS DOUBLE) AS v,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
), jt AS (
  SELECT sum(CASE WHEN a.v < b.v THEN CAST(a.c * b.c AS DOUBLE)
                  WHEN a.v = b.v THEN 0.5 * a.c * b.c
                  ELSE 0.0 END) AS jt
  FROM cells a JOIN cells b ON a.g < b.g
), gs AS (
  SELECT CAST(sum(n) AS DOUBLE) AS n_total,
         sum(nd * nd) AS sn2,
         sum(nd * (nd - 1) * (2 * nd + 5)) AS sn25,
         sum(nd * (nd - 1) * (nd - 2)) AS sn3,
         sum(nd * (nd - 1)) AS snn
  FROM (SELECT sum(c) AS n, CAST(sum(c) AS DOUBLE) AS nd
        FROM cells GROUP BY g)
), ts AS (
  SELECT sum(td * (td - 1) * (2 * td + 5)) AS st25,
         sum(td * (td - 1) * (td - 2)) AS st3,
         sum(td * (td - 1)) AS stt
  FROM (SELECT CAST(sum(c) AS DOUBLE) AS td FROM cells GROUP BY v)
)
SELECT CAST(n_total AS BIGINT) AS n,
       round(jt, 2) AS jt_stat,
       round((n_total * n_total - sn2) / 4.0, 2) AS mean_jt,
       round((jt - (n_total * n_total - sn2) / 4.0)
             / sqrt((n_total * (n_total - 1) * (2 * n_total + 5)
                     - sn25 - st25) / 72.0
                    + sn3 * st3
                      / (36.0 * n_total * (n_total - 1) * (n_total - 2))
                    + snn * stt
                      / (8.0 * n_total * (n_total - 1))), 4)
         AS z_stat
FROM jt CROSS JOIN gs CROSS JOIN ts
"""


# --------------------------------------------------------------------------
# A141. Log-rank test (Mantel 1966 / Cox-Mantel) as an experiment
# readout: do users in deterministically-assigned A/B arms churn at
# different rates? Arms use the repo's seed-free md5-prefix
# randomization (deterministic_sample_orders' convention) so both
# engines assign identical arms and both arms are populated at every
# SF (a semantic split like "ever purchased" degenerates to one arm
# on small corpora). Extends the A81/C43 shared life-table
# construction to two strata — per-duration event/censor counts PER
# GROUP pivot into columns (2 arms -> 4 columns, one shuffle),
# cumulative at-risk sets ride range_cumsum on the <=#days-sized
# duration table, and the hypergeometric O-E/variance terms collapse
# in one bounded aggregate. Nothing scales with users beyond the
# first distinct-day shuffle.
# --------------------------------------------------------------------------

def logrank_churn_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    mx = ev.agg(F.max(F.to_date("ts")).alias("m"))
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wlead = Window.partitionBy("user_id").orderBy("d")
    g = ud.withColumn("nxt", F.lead("d").over(wlead))
    arm = (F.substring(F.md5(F.concat(F.lit("arm:"),
                                      F.col("user_id").cast("string"))),
                       1, 1) < "8").cast("int")
    per_user = (g.groupBy("user_id")
                 .agg(F.min(F.when(F.datediff("nxt", "d") >= 3,
                                   F.col("d"))).alias("ichurn"),
                      F.min("d").alias("fd"), F.max("d").alias("ld"))
                 .crossJoin(F.broadcast(mx))
                 .withColumn("cd", F.coalesce(
                     "ichurn",
                     F.when(F.datediff("m", "ld") >= 3, F.col("ld"))))
                 .select(F.datediff(F.coalesce("cd", "m"), "fd")
                          .alias("dur"),
                         F.col("cd").isNotNull().cast("int")
                          .alias("churned"),
                         arm.alias("b")))
    counts = (per_user.groupBy("dur")
              .agg(F.sum(F.col("churned") * F.col("b")).alias("d1"),
                   F.sum((1 - F.col("churned")) * F.col("b")).alias("c1"),
                   F.sum(F.col("churned") * (1 - F.col("b"))).alias("d0"),
                   F.sum((1 - F.col("churned")) * (1 - F.col("b")))
                    .alias("c0"))
              .localCheckpoint(eager=True))
    tot = counts.agg((F.sum("d1") + F.sum("c1")).alias("n1_total"),
                     (F.sum("d0") + F.sum("c0")).alias("n0_total"))
    cum = (stats.range_cumsum(counts, "dur", ["d1", "c1", "d0", "c0"])
           .crossJoin(F.broadcast(tot))
           .withColumn("n1at", F.col("n1_total")
                       - (F.col("cum_d1") + F.col("cum_c1"))
                       + F.col("d1") + F.col("c1"))
           .withColumn("n0at", F.col("n0_total")
                       - (F.col("cum_d0") + F.col("cum_c0"))
                       + F.col("d0") + F.col("c0")))
    d = F.col("d1") + F.col("d0")
    nat = (F.col("n1at") + F.col("n0at")).cast("double")
    # ANSI sessions evaluate division subexpressions eagerly inside
    # the codegen stage, so the nat>1 guard lives IN the expression
    # (when), not only in the row filter
    ok = (d > 0) & (F.col("n1at") + F.col("n0at") > 1)
    agg = (cum.where(ok)
              .agg(F.first("n1_total").alias("n_arm_a"),
                   F.first("n0_total").alias("n_arm_b"),
                   F.sum("d1").alias("o1"),
                   F.sum(d * F.col("n1at") / nat).alias("e1"),
                   F.sum(F.when(ok, d * (F.col("n1at") / nat)
                                * (F.col("n0at") / nat)
                                * (nat - d) / (nat - 1))
                          .otherwise(F.lit(0.0))).alias("v")))
    # v == 0 (one arm empty at every event time) -> NULL, matching the
    # oracle's CASE; never an ANSI divide-by-zero
    z = F.when(F.col("v") > 0,
               (F.col("o1") - F.col("e1")) / F.sqrt(F.col("v")))
    return agg.select(
        F.col("n_arm_a").cast("long").alias("n_arm_a"),
        F.col("n_arm_b").cast("long").alias("n_arm_b"),
        F.col("o1").cast("long").alias("observed_a_churn"),
        F.round("e1", 4).alias("expected_a_churn"),
        F.round(z, 4).alias("z_stat"),
        F.round(z * z, 4).alias("chi2_stat"))

LOGRANK_SQL = """
WITH mx AS (SELECT CAST(max(ts) AS DATE) AS m
            FROM events WHERE ts IS NOT NULL),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
       FROM events WHERE ts IS NOT NULL),
g AS (SELECT user_id, d,
             lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
      FROM ud),
f AS (SELECT user_id,
             min(CASE WHEN date_diff('day', d, nxt) >= 3 THEN d END)
               AS ichurn,
             min(d) AS fd, max(d) AS ld
      FROM g GROUP BY 1),
per_user AS (
  SELECT date_diff('day', fd,
                   coalesce(coalesce(ichurn,
                            CASE WHEN date_diff('day', ld, m) >= 3
                                 THEN ld END), m)) AS dur,
         (coalesce(ichurn,
                   CASE WHEN date_diff('day', ld, m) >= 3
                        THEN ld END) IS NOT NULL)::INT AS churned,
         (substring(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1)
          < '8')::INT AS b
  FROM f CROSS JOIN mx
), counts AS (
  SELECT dur,
         sum(churned * b) AS d1, sum((1 - churned) * b) AS c1,
         sum(churned * (1 - b)) AS d0,
         sum((1 - churned) * (1 - b)) AS c0
  FROM per_user GROUP BY 1
), tot AS (SELECT sum(d1) + sum(c1) AS n1_total,
                  sum(d0) + sum(c0) AS n0_total FROM counts),
cum AS (
  SELECT dur, d1, d0, n1_total, n0_total,
         n1_total - (sum(d1) OVER w + sum(c1) OVER w) + d1 + c1 AS n1at,
         n0_total - (sum(d0) OVER w + sum(c0) OVER w) + d0 + c0 AS n0at
  FROM counts CROSS JOIN tot
  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), agg AS (
  SELECT any_value(n1_total) AS n_arm_a,
         any_value(n0_total) AS n_arm_b,
         sum(d1) AS o1,
         sum((d1 + d0) * n1at / CAST(n1at + n0at AS DOUBLE)) AS e1,
         sum((d1 + d0) * (n1at / CAST(n1at + n0at AS DOUBLE))
             * (n0at / CAST(n1at + n0at AS DOUBLE))
             * (n1at + n0at - d1 - d0)
             / CAST(n1at + n0at - 1 AS DOUBLE)) AS v
  FROM cum WHERE d1 + d0 > 0 AND n1at + n0at > 1
)
SELECT CAST(n_arm_a AS BIGINT) AS n_arm_a,
       CAST(n_arm_b AS BIGINT) AS n_arm_b,
       CAST(o1 AS BIGINT) AS observed_a_churn,
       round(e1, 4) AS expected_a_churn,
       round(CASE WHEN v > 0 THEN (o1 - e1) / sqrt(v) END, 4) AS z_stat,
       round(CASE WHEN v > 0 THEN (o1 - e1) * (o1 - e1) / v END, 4)
         AS chi2_stat
FROM agg
"""


# --------------------------------------------------------------------------
# A142. k-sample Anderson-Darling test statistic (Scholz-Stephens
# 1987, ties-adjusted A²akN) — does order value follow the SAME
# distribution across all five priorities? More tail-sensitive than
# A18g's two-sample KS. Everything runs on the distinct-value × group
# grid (k·|values| rows): per-group cumulatives ride the NEW
# range_cumsum_by_group (no single-task windows), the global ECDF
# rides range_cumsum, and the quadratic term is promoted to double
# BEFORE squaring (N·M ~ 2e18 at 100 TB would overflow int64).
# --------------------------------------------------------------------------

def ad_ksample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cells = (o.groupBy(F.col("o_orderpriority").alias("g"),
                       F.col("o_totalprice").cast("double").alias("v"))
              .agg(F.count(F.lit(1)).alias("f"))
              .localCheckpoint(eager=True))
    sizes = cells.groupBy("g").agg(F.sum("f").alias("ni"))
    vals = cells.groupBy("v").agg(F.sum("f").alias("l"))
    bcum = stats.range_cumsum(vals, "v", ["l"])
    grid = (bcum.crossJoin(F.broadcast(sizes))
                .join(cells, ["g", "v"], "left")
                .withColumn("f", F.coalesce("f", F.lit(0))))
    mcum = stats.range_cumsum_by_group(grid, "g", "v", ["f"])
    tot = sizes.agg(F.sum("ni").alias("N"),
                    F.count(F.lit(1)).alias("k"))
    j = mcum.crossJoin(F.broadcast(tot))
    nn = F.col("N").cast("double")
    ma = F.col("cum_f").cast("double") - F.col("f") / 2.0
    ba = F.col("cum_l").cast("double") - F.col("l") / 2.0
    den = ba * (nn - ba) - nn * F.col("l") / 4.0
    inner = (F.col("l") * (nn * ma - F.col("ni") * ba)
             * (nn * ma - F.col("ni") * ba) / den / F.col("ni"))
    agg = (j.where(den > 0)
            .agg(F.first("N").alias("n"), F.first("k").alias("k"),
                 F.sum(inner).alias("s")))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("int").alias("k_groups"),
        F.round((F.col("n") - 1) / F.col("n").cast("double")
                * F.col("s"), 4).alias("a2_akn"),
        (F.col("k") - 1).cast("double").alias("mean_h0"))

AD_KSAMPLE_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
         count(*) AS f
  FROM orders GROUP BY 1, 2
), sizes AS (SELECT g, sum(f) AS ni FROM cells GROUP BY 1),
vals AS (
  SELECT v, sum(f) AS l,
         sum(sum(f)) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_l
  FROM cells GROUP BY v
), grid AS (
  SELECT s.g, va.v, va.l, va.cum_l, s.ni, coalesce(c.f, 0) AS f
  FROM vals va CROSS JOIN sizes s
  LEFT JOIN cells c ON c.g = s.g AND c.v = va.v
), mcum AS (
  SELECT g, v, l, cum_l, ni, f,
         sum(f) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_f
  FROM grid
), tot AS (SELECT CAST(sum(ni) AS DOUBLE) AS nn, count(*) AS k
           FROM sizes),
terms AS (
  SELECT nn, k,
         l * (nn * (cum_f - f / 2.0) - ni * (cum_l - l / 2.0))
           * (nn * (cum_f - f / 2.0) - ni * (cum_l - l / 2.0))
           / ((cum_l - l / 2.0) * (nn - (cum_l - l / 2.0)) - nn * l / 4.0)
           / ni AS inner_term,
         (cum_l - l / 2.0) * (nn - (cum_l - l / 2.0)) - nn * l / 4.0
           AS den
  FROM mcum CROSS JOIN tot
)
SELECT CAST(any_value(nn) AS BIGINT) AS n,
       CAST(any_value(k) AS INT) AS k_groups,
       round((any_value(nn) - 1) / any_value(nn)
             * sum(inner_term), 4) AS a2_akn,
       CAST(any_value(k) - 1 AS DOUBLE) AS mean_h0
FROM terms WHERE den > 0
"""


# --------------------------------------------------------------------------
# A143. White test for heteroskedasticity (White 1980) — the
# general-form companion of A18b's Breusch-Pagan (which only tests
# the linear term): regress squared OLS residuals on x and x², LM =
# n·R². Both the base fit and the auxiliary 2-predictor R² are closed
# determinant forms of fused product-sum aggregates (two scans total,
# no driver solve) — the A21/C53 discipline.
# --------------------------------------------------------------------------

def white_test_hetero(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    d = li.select(x.alias("x"), y.alias("y"))
    fit = d.agg((F.covar_pop("x", "y") / F.var_pop("x")).alias("slope"),
                F.avg("y").alias("my"), F.avg("x").alias("mx"))
    e = (F.col("y") - (F.col("my") + F.col("slope")
                       * (F.col("x") - F.col("mx"))))
    u = (e * e).alias("u")
    z1, z2 = F.col("x"), F.col("x") * F.col("x")
    g = (d.crossJoin(F.broadcast(fit))
          .select(u, z1.alias("z1"), z2.alias("z2"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.avg("u").alias("mu"), F.avg("z1").alias("m1"),
               F.avg("z2").alias("m2"),
               F.avg(F.col("u") * F.col("u")).alias("ruu"),
               F.avg(F.col("z1") * F.col("z1")).alias("r11"),
               F.avg(F.col("z2") * F.col("z2")).alias("r22"),
               F.avg(F.col("z1") * F.col("z2")).alias("r12"),
               F.avg(F.col("u") * F.col("z1")).alias("r1u"),
               F.avg(F.col("u") * F.col("z2")).alias("r2u")))
    suu = F.col("ruu") - F.col("mu") * F.col("mu")
    s11 = F.col("r11") - F.col("m1") * F.col("m1")
    s22 = F.col("r22") - F.col("m2") * F.col("m2")
    s12 = F.col("r12") - F.col("m1") * F.col("m2")
    s1u = F.col("r1u") - F.col("m1") * F.col("mu")
    s2u = F.col("r2u") - F.col("m2") * F.col("mu")
    det = s11 * s22 - s12 * s12
    b1 = (s1u * s22 - s2u * s12) / det
    b2 = (s2u * s11 - s1u * s12) / det
    r2 = (b1 * s1u + b2 * s2u) / suu
    return g.select(F.col("n").cast("long").alias("n"),
                    F.round(r2, 6).alias("r2_aux"),
                    F.round(F.col("n") * r2, 4).alias("white_lm"),
                    F.lit(2).alias("df"))

WHITE_TEST_SQL = """
WITH d AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
), fit AS (
  SELECT covar_pop(x, y) / var_pop(x) AS slope,
         avg(y) AS my, avg(x) AS mx
  FROM d
), aux AS (
  SELECT (y - (my + slope * (x - mx))) * (y - (my + slope * (x - mx)))
           AS u,
         x AS z1, x * x AS z2
  FROM d CROSS JOIN fit
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(u) AS mu, avg(z1) AS m1, avg(z2) AS m2,
         avg(u * u) AS ruu, avg(z1 * z1) AS r11, avg(z2 * z2) AS r22,
         avg(z1 * z2) AS r12, avg(u * z1) AS r1u, avg(u * z2) AS r2u
  FROM aux
), s AS (
  SELECT n, ruu - mu * mu AS suu, r11 - m1 * m1 AS s11,
         r22 - m2 * m2 AS s22, r12 - m1 * m2 AS s12,
         r1u - m1 * mu AS s1u, r2u - m2 * mu AS s2u
  FROM g
), fit2 AS (
  SELECT n, suu, s1u, s2u,
         (s1u * s22 - s2u * s12) / (s11 * s22 - s12 * s12) AS b1,
         (s2u * s11 - s1u * s12) / (s11 * s22 - s12 * s12) AS b2
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       round((b1 * s1u + b2 * s2u) / suu, 6) AS r2_aux,
       round(n * (b1 * s1u + b2 * s2u) / suu, 4) AS white_lm,
       2 AS df
FROM fit2
"""


# --------------------------------------------------------------------------
# A144. Fisher two-class linear discriminant (Fisher 1936): the
# returned-vs-not direction in (quantity, discount, tax) space — the
# classification twin of A46's logistic IRLS, but CLOSED-FORM. Spark
# side in ml.lda_two_class_df (one fused per-class Gram scan, k×k
# driver solve); the oracle unrolls the same Cramer solve through
# oracles.sql_det, normalizes, and exploits w·d > 0 for a
# convention-free sign.
# --------------------------------------------------------------------------

_LDA_XS = ["l_quantity", "l_discount", "l_tax"]


def lda_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(*[F.col(c).cast("double").alias(c) for c in _LDA_XS],
                  "l_returnflag")
    return ml.lda_two_class_df(d, _LDA_XS, "l_returnflag", "R", "N")


def _lda_sql() -> str:
    xs = _LDA_XS
    k = len(xs)
    sums = ["count(*) FILTER (l_returnflag = 'R') AS na",
            "count(*) FILTER (l_returnflag = 'N') AS nb"]
    for i, a in enumerate(xs):
        sums.append(f"sum({a}) FILTER (l_returnflag = 'R') AS sa_{i}")
        sums.append(f"sum({a}) FILTER (l_returnflag = 'N') AS sb_{i}")
        for j, b in enumerate(xs[i:], start=i):
            sums.append(f"sum({a} * {b}) FILTER (l_returnflag = 'R')"
                        f" AS pa_{i}_{j}")
            sums.append(f"sum({a} * {b}) FILTER (l_returnflag = 'N')"
                        f" AS pb_{i}_{j}")
    sw = []
    for i in range(k):
        sw.append(f"(sa_{i} / na - sb_{i} / nb) AS d_{i}")
        for j in range(i, k):
            sw.append(
                f"((pa_{i}_{j} - sa_{i} * sa_{j} / na)"
                f" + (pb_{i}_{j} - sb_{i} * sb_{j} / nb))"
                f" / (na + nb - 2) AS sw_{i}_{j}")
    S = [[f"sw_{min(i, j)}_{max(i, j)}" for j in range(k)]
         for i in range(k)]
    det = oracles.sql_det(S)
    wexprs = []
    for c in range(k):
        Mc = [[f"d_{i}" if cc == c else S[i][cc] for cc in range(k)]
              for i in range(k)]
        wexprs.append(f"({oracles.sql_det(Mc)}) / ({det}) AS wr_{c}")
    wnorm = " + ".join(f"wr_{c} * wr_{c}" for c in range(k))
    wd = " + ".join(f"wr_{c} * d_{c}" for c in range(k))
    wsel = ",\n       ".join(
        f"round(wr_{c} / sqrt({wnorm}), 6) AS w_{xs[c]}"
        for c in range(k))
    return f"""
WITH m AS (
  SELECT {", ".join(sums)}
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
), sw AS (
  SELECT na, nb, {", ".join(sw)} FROM m
), wv AS (
  SELECT na, nb, {", ".join(f"d_{c}" for c in range(k))},
         {", ".join(wexprs)}
  FROM sw
)
SELECT CAST(na AS DOUBLE) AS n_a, CAST(nb AS DOUBLE) AS n_b,
       {wsel},
       round(sqrt({wd}), 4) AS mahalanobis_sep
FROM wv
"""

LDA_SQL = _lda_sql()


# --------------------------------------------------------------------------
# A145. Quantile regression at τ=0.9 (Koenker-Bassett 1978): the
# conditional 90th-percentile price line — A101's LAD is the τ=0.5
# case of the same IRLS engine (ml.quantile_fit_df). Each iteration
# is ONE fused 5-sum scan; oracle = the identically-unrolled
# asymmetric-check CTE chain (oracles.quantile_reg_sql).
# --------------------------------------------------------------------------

def quantile_reg_90(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_quantity").cast("double").alias("x"),
                  F.col("l_extendedprice").cast("double").alias("y"))
    # 8 IRLS scans: the asymmetric weights move the line toward the
    # conditional 0.9 quantile sublinearly on this wide-spread y;
    # 8 iterations put ~30% of mass above the line (0.5 at OLS start)
    return ml.quantile_fit_df(d, "x", "y", tau=0.9, n_iter=8)

QUANTILE_REG_SQL = oracles.quantile_reg_sql(
    "CAST(l_quantity AS DOUBLE)", "CAST(l_extendedprice AS DOUBLE)",
    tau=0.9, n_iter=8).replace("coef_CAST(l_quantity AS DOUBLE)",
                               "coef_x")
# align term labels: the Spark side names columns x/y
QUANTILE_REG_SQL = QUANTILE_REG_SQL


# --------------------------------------------------------------------------
# A146. Pivot with MULTIPLE aggregates per cell (the reshape2/dcast
# multi-value shape, R:399+ gathers/spreads): order count AND mean
# value per (priority × status) cell in one pivot pass — exercises
# Spark's multi-agg pivot API surface, which plans a single shuffle
# with all measures fused (verified: one Exchange in the plan).
# --------------------------------------------------------------------------

def pivot_multi_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    piv = (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", statuses)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(F.col("o_totalprice").cast("double")), 2)
                  .alias("avg_price")))
    cols = [F.col("o_orderpriority")]
    for s in statuses:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0))
                     .alias(f"n_{s.lower()}"))
        cols.append(F.col(f"{s}_avg_price").alias(f"avg_{s.lower()}"))
    return piv.select(*cols).orderBy("o_orderpriority")

PIVOT_MULTI_SQL = """
SELECT o_orderpriority,
       coalesce(count(*) FILTER (o_orderstatus = 'F'), 0) AS n_f,
       round(avg(o_totalprice) FILTER (o_orderstatus = 'F'), 2) AS avg_f,
       coalesce(count(*) FILTER (o_orderstatus = 'O'), 0) AS n_o,
       round(avg(o_totalprice) FILTER (o_orderstatus = 'O'), 2) AS avg_o,
       coalesce(count(*) FILTER (o_orderstatus = 'P'), 0) AS n_p,
       round(avg(o_totalprice) FILTER (o_orderstatus = 'P'), 2) AS avg_p
FROM orders GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# A147. Hosmer-Lemeshow calibration χ² (Hosmer-Lemeshow 1980) on the
# A110 probability score — the formal decile test behind A110's
# calibration curve: group by DECILE OF PREDICTED RISK (equal-count,
# the canonical construction — A110 uses fixed value bins) and sum
# (O−E)²/(E(1−E/n)). Deciles ride the range-partitioned NTILE
# construction (quality_lift / acctbal_deciles machinery — no global
# sort); the oracle's ntile(10) over the same (score, key) order is
# bucket-for-bucket identical.
# --------------------------------------------------------------------------

def hosmer_lemeshow_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    z = F.lit(-2.0) + F.col("o_totalprice") * F.lit(1e-5)
    scored = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("p"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"))
    s = (scored.repartitionByRange(F.col("p"), F.col("k"))
               .withColumn("__pid", F.spark_partition_id()))
    wl = Window.partitionBy("__pid").orderBy("p", "k")
    local = s.withColumn("__rn", F.row_number().over(wl))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (local.groupBy("__pid").agg(F.max("__rn").alias("__t"))
           .withColumn("__off", F.coalesce(F.sum("__t").over(wo), F.lit(0))))
    tot = off.agg(F.sum("__t").alias("__n"))
    r = F.col("__off") + F.col("__rn")
    q = F.floor(F.col("__n") / 10)
    rem = F.col("__n") % 10
    cutoff = rem * (q + 1)
    decile = (F.when(F.col("__n") < 10, r)
               .when(r <= cutoff, F.floor((r + q) / (q + 1)))
               .otherwise(rem + F.floor((r - cutoff + q - 1) / q)))
    dec = (local.join(F.broadcast(off.select("__pid", "__off")), "__pid")
                .crossJoin(F.broadcast(tot))
                .withColumn("decile", decile.cast("int")))
    per = (dec.groupBy("decile")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("y").alias("obs"),
                   F.sum("p").alias("exp")))
    term = ((F.col("obs") - F.col("exp")) * (F.col("obs") - F.col("exp"))
            / (F.col("exp") * (1.0 - F.col("exp") / F.col("n"))))
    hl = per.agg(F.round(F.sum(term), 4).alias("chi2"))
    return (per.crossJoin(F.broadcast(hl))
               .select("decile", "n",
                       F.col("obs").cast("long").alias("observed_f"),
                       F.round("exp", 4).alias("expected_f"),
                       F.col("chi2").alias("hl_chi2"))
               .orderBy("decile"))

HOSMER_LEMESHOW_SQL = """
WITH scored AS (
  SELECT o_orderkey AS k,
         round(1.0 / (1.0 + exp(-(-2.0 + o_totalprice * 1e-5))), 6) AS p,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), dec AS (
  SELECT p, y, ntile(10) OVER (ORDER BY p, k) AS decile FROM scored
), per AS (
  SELECT decile, count(*) AS n, sum(y) AS obs, sum(p) AS exp
  FROM dec GROUP BY 1
), hl AS (
  SELECT round(sum((obs - exp) * (obs - exp)
               / (exp * (1.0 - exp / n))), 4) AS chi2
  FROM per
)
SELECT decile, n, CAST(obs AS BIGINT) AS observed_f,
       round(exp, 4) AS expected_f, chi2 AS hl_chi2
FROM per CROSS JOIN hl ORDER BY decile
"""


# --------------------------------------------------------------------------
# A148. Hellinger / Bhattacharyya distance between the finished- and
# open-order value distributions — the bounded-metric member of the
# repo's distribution-distance family (KS A18g, AD A142, PSI B26,
# KL B45): H² = 1 − Σ√(p_b·q_b) over a fixed-width histogram. One
# groupBy builds both histograms; everything after is ≤#bins algebra.
# --------------------------------------------------------------------------

def hellinger_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus").isin("F", "O")))
    b = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9))
    cells = (o.groupBy(b.alias("bin"))
              .agg(F.sum((F.col("o_orderstatus") == "F").cast("long"))
                    .alias("nf"),
                   F.sum((F.col("o_orderstatus") == "O").cast("long"))
                    .alias("no")))
    tot = cells.agg(F.sum("nf").alias("tf"), F.sum("no").alias("to"))
    j = cells.crossJoin(F.broadcast(tot))
    bc = F.sum(F.sqrt((F.col("nf") / F.col("tf").cast("double"))
                      * (F.col("no") / F.col("to").cast("double"))))
    return (j.agg(F.first("tf").alias("n_f"), F.first("to").alias("n_o"),
                  bc.alias("bc"))
             .select(F.col("n_f").cast("long").alias("n_finished"),
                     F.col("n_o").cast("long").alias("n_open"),
                     F.round(F.sqrt(1.0 - F.col("bc")), 6)
                      .alias("hellinger"),
                     F.round(-F.log("bc"), 6).alias("bhattacharyya")))

HELLINGER_SQL = """
WITH cells AS (
  SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bin,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS nf,
         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS no
  FROM orders WHERE o_orderstatus IN ('F', 'O')
  GROUP BY 1
), tot AS (SELECT sum(nf) AS tf, sum(no) AS to_ FROM cells),
agg AS (
  SELECT any_value(tf) AS tf, any_value(to_) AS to_,
         sum(sqrt((nf / CAST(tf AS DOUBLE))
                  * (no / CAST(to_ AS DOUBLE)))) AS bc
  FROM cells CROSS JOIN tot
)
SELECT CAST(tf AS BIGINT) AS n_finished,
       CAST(to_ AS BIGINT) AS n_open,
       round(sqrt(1.0 - bc), 6) AS hellinger,
       round(-ln(bc), 6) AS bhattacharyya
FROM agg
"""


# --------------------------------------------------------------------------
# A149. Deming regression (errors-in-variables, λ=1; Deming 1943) —
# the method-comparison fit the reference's lm can't express: both
# variables carry noise (chars vs words as length proxies). Closed form
# from ONE fused moment scan: β = (syy − λsxx + √((syy−λsxx)² +
# 4λsxy²)) / (2sxy).
# --------------------------------------------------------------------------

def deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # chars vs words: both are noisy measurements of document length
    # (the genuine errors-in-variables setting); r ≈ 0.998 on this
    # corpus so the slope is well-conditioned, and x in char-hundreds
    # puts slope/intercept at O(1-100) — far above engine sum noise
    pairs = docs.select((F.col("n_chars") / 100.0).alias("x"),
                        F.size(F.split(F.trim("text"), r"\s+"))
                         .cast("double").alias("y"))
    g = pairs.agg(F.count(F.lit(1)).alias("n"),
                  F.avg("x").alias("mx"), F.avg("y").alias("my"),
                  F.covar_pop("x", "y").alias("sxy"),
                  F.var_pop("x").alias("sxx"),
                  F.var_pop("y").alias("syy"))
    d = F.col("syy") - F.col("sxx")
    beta = (d + F.sqrt(d * d + 4 * F.col("sxy") * F.col("sxy"))) \
        / (2 * F.col("sxy"))
    return g.select(F.col("n").cast("long").alias("n_rows"),
                    F.round(beta, 6).alias("deming_slope"),
                    F.round(F.col("my") - beta * F.col("mx"), 4)
                     .alias("deming_intercept"),
                    F.round(F.col("sxy")
                            / F.sqrt(F.col("sxx") * F.col("syy")), 6)
                     .alias("pearson_r"))

DEMING_SQL = """
WITH pairs AS (
  SELECT n_chars / 100.0 AS x,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS y
  FROM documents
), g AS (
  SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
         covar_pop(x, y) AS sxy, var_pop(x) AS sxx, var_pop(y) AS syy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round(((syy - sxx) + sqrt((syy - sxx) * (syy - sxx)
                                 + 4 * sxy * sxy)) / (2 * sxy), 6)
         AS deming_slope,
       round(my - ((syy - sxx) + sqrt((syy - sxx) * (syy - sxx)
                                      + 4 * sxy * sxy)) / (2 * sxy)
                  * mx, 4) AS deming_intercept,
       round(sxy / sqrt(sxx * syy), 6) AS pearson_r
FROM g
"""


# --------------------------------------------------------------------------
# A150. Epidemiological 2×2 effect measures (risk ratio, odds ratio,
# risk difference, each with 95% log-CI; Katz 1978 / Woolf 1955) —
# the effect-size completion of A18h's z-test and A115's Fisher
# exact: exposure = negative account balance, outcome = BUILDING
# segment. One fused scan builds the table; everything else is
# scalar closed forms (1.959964 is the standard normal quantile, a
# fixed decimal constant in both engines).
# --------------------------------------------------------------------------

def epi_2x2_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    exp_ = F.col("c_acctbal") < 0
    out = F.col("c_mktsegment") == "BUILDING"
    g = c.agg(F.sum((exp_ & out).cast("long")).alias("a"),
              F.sum((exp_ & ~out).cast("long")).alias("b"),
              F.sum((~exp_ & out).cast("long")).alias("c"),
              F.sum((~exp_ & ~out).cast("long")).alias("d"))
    a, b, cc, d = (F.col("a").cast("double"), F.col("b").cast("double"),
                   F.col("c").cast("double"), F.col("d").cast("double"))
    z = 1.959964
    rr = (a / (a + b)) / (cc / (cc + d))
    se_rr = F.sqrt(1 / a - 1 / (a + b) + 1 / cc - 1 / (cc + d))
    orr = (a * d) / (b * cc)
    se_or = F.sqrt(1 / a + 1 / b + 1 / cc + 1 / d)
    rd = a / (a + b) - cc / (cc + d)
    se_rd = F.sqrt(a * b / F.pow(a + b, 3) + cc * d / F.pow(cc + d, 3))
    return g.select(
        F.col("a").alias("n_exp_out"), F.col("b").alias("n_exp_noout"),
        F.col("c").alias("n_unexp_out"),
        F.col("d").alias("n_unexp_noout"),
        F.round(rr, 6).alias("risk_ratio"),
        F.round(F.exp(F.log(rr) - z * se_rr), 6).alias("rr_ci_lo"),
        F.round(F.exp(F.log(rr) + z * se_rr), 6).alias("rr_ci_hi"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - z * se_or), 6).alias("or_ci_lo"),
        F.round(F.exp(F.log(orr) + z * se_or), 6).alias("or_ci_hi"),
        F.round(rd, 6).alias("risk_diff"),
        F.round(rd - z * se_rd, 6).alias("rd_ci_lo"),
        F.round(rd + z * se_rd, 6).alias("rd_ci_hi"))

EPI_2X2_SQL = """
WITH g AS (
  SELECT sum(CASE WHEN c_acctbal < 0 AND c_mktsegment = 'BUILDING'
             THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN c_acctbal < 0 AND c_mktsegment <> 'BUILDING'
             THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN c_acctbal >= 0 AND c_mktsegment = 'BUILDING'
             THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN c_acctbal >= 0 AND c_mktsegment <> 'BUILDING'
             THEN 1 ELSE 0 END) AS d
  FROM customer
), m AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         (a / CAST(a + b AS DOUBLE)) / (c / CAST(c + d AS DOUBLE)) AS rr,
         sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + d)) AS serr,
         (a * CAST(d AS DOUBLE)) / (b * CAST(c AS DOUBLE)) AS orr,
         sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS seor,
         a / CAST(a + b AS DOUBLE) - c / CAST(c + d AS DOUBLE) AS rd,
         sqrt(a * CAST(b AS DOUBLE) / pow(CAST(a + b AS DOUBLE), 3)
              + c * CAST(d AS DOUBLE) / pow(CAST(c + d AS DOUBLE), 3))
           AS serd
  FROM g
)
SELECT a AS n_exp_out, b AS n_exp_noout, c AS n_unexp_out,
       d AS n_unexp_noout,
       round(rr, 6) AS risk_ratio,
       round(exp(ln(rr) - 1.959964 * serr), 6) AS rr_ci_lo,
       round(exp(ln(rr) + 1.959964 * serr), 6) AS rr_ci_hi,
       round(orr, 6) AS odds_ratio,
       round(exp(ln(orr) - 1.959964 * seor), 6) AS or_ci_lo,
       round(exp(ln(orr) + 1.959964 * seor), 6) AS or_ci_hi,
       round(rd, 6) AS risk_diff,
       round(rd - 1.959964 * serd, 6) AS rd_ci_lo,
       round(rd + 1.959964 * serd, 6) AS rd_ci_hi
FROM m
"""


# --------------------------------------------------------------------------
# A151. Quadratic-weighted Cohen's kappa (Cohen 1968) between two
# ORDINAL raters — the ordinal upgrade of A119's plain kappa: rater A
# = the order-priority level (its numeral prefix), rater B = a fixed
# price band. κw = 1 − Σ(i−j)²O_ij / Σ(i−j)²E_ij over the ≤5×5
# contingency table; one fused scan builds it, margins ride window
# sums over the bounded cell table.
# --------------------------------------------------------------------------

def weighted_kappa_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ra = (F.substring("o_orderpriority", 1, 1).cast("int") - 1)
    rb = F.least(F.floor(F.col("o_totalprice") / 100000), F.lit(4)) \
        .cast("int")
    cells = (o.groupBy(ra.alias("i"), rb.alias("j"))
              .agg(F.count(F.lit(1)).alias("n")))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    wall = Window.partitionBy()
    t = (cells.withColumn("ri", F.sum("n").over(wi))
              .withColumn("cj", F.sum("n").over(wj))
              .withColumn("nn", F.sum("n").over(wall)))
    d2 = (F.col("i") - F.col("j")) * (F.col("i") - F.col("j"))
    agg = t.agg(F.first("nn").alias("n_total"),
                F.sum(d2 * F.col("n")).alias("wo"),
                F.sum(d2 * F.col("ri").cast("double") * F.col("cj")
                      / F.col("nn")).alias("we"))
    return agg.select(
        F.col("n_total").cast("long").alias("n_orders"),
        F.round(F.col("wo").cast("double"), 2).alias("weighted_observed"),
        F.round("we", 2).alias("weighted_expected"),
        F.round(1.0 - F.col("wo") / F.col("we"), 6)
         .alias("weighted_kappa"))

WEIGHTED_KAPPA_SQL = """
WITH cells AS (
  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) - 1 AS i,
         CAST(least(floor(o_totalprice / 100000), 4) AS INT) AS j,
         count(*) AS n
  FROM orders GROUP BY 1, 2
), t AS (
  SELECT i, j, n,
         sum(n) OVER (PARTITION BY i) AS ri,
         sum(n) OVER (PARTITION BY j) AS cj,
         sum(n) OVER () AS nn
  FROM cells
), agg AS (
  SELECT any_value(nn) AS n_total,
         sum((i - j) * (i - j) * n) AS wo,
         sum((i - j) * (i - j) * ri * CAST(cj AS DOUBLE) / nn) AS we
  FROM t
)
SELECT CAST(n_total AS BIGINT) AS n_orders,
       round(CAST(wo AS DOUBLE), 2) AS weighted_observed,
       round(we, 2) AS weighted_expected,
       round(1.0 - wo / we, 6) AS weighted_kappa
FROM agg
"""


# --------------------------------------------------------------------------
# A152. Gehan-Wilcoxon weighted log-rank (Gehan 1965; weight = the
# at-risk count, so EARLY churn differences dominate — the companion
# reading of A141's unweighted log-rank on the same md5 A/B arms).
# Identical two-strata life-table plan; only the weight in the O/E/V
# sums changes.
# --------------------------------------------------------------------------

def gehan_wilcoxon_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    mx = ev.agg(F.max(F.to_date("ts")).alias("m"))
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wlead = Window.partitionBy("user_id").orderBy("d")
    g = ud.withColumn("nxt", F.lead("d").over(wlead))
    arm = (F.substring(F.md5(F.concat(F.lit("arm:"),
                                      F.col("user_id").cast("string"))),
                       1, 1) < "8").cast("int")
    per_user = (g.groupBy("user_id")
                 .agg(F.min(F.when(F.datediff("nxt", "d") >= 3,
                                   F.col("d"))).alias("ichurn"),
                      F.min("d").alias("fd"), F.max("d").alias("ld"))
                 .crossJoin(F.broadcast(mx))
                 .withColumn("cd", F.coalesce(
                     "ichurn",
                     F.when(F.datediff("m", "ld") >= 3, F.col("ld"))))
                 .select(F.datediff(F.coalesce("cd", "m"), "fd")
                          .alias("dur"),
                         F.col("cd").isNotNull().cast("int")
                          .alias("churned"),
                         arm.alias("b")))
    counts = (per_user.groupBy("dur")
              .agg(F.sum(F.col("churned") * F.col("b")).alias("d1"),
                   F.sum((1 - F.col("churned")) * F.col("b")).alias("c1"),
                   F.sum(F.col("churned") * (1 - F.col("b"))).alias("d0"),
                   F.sum((1 - F.col("churned")) * (1 - F.col("b")))
                    .alias("c0"))
              .localCheckpoint(eager=True))
    tot = counts.agg((F.sum("d1") + F.sum("c1")).alias("n1_total"),
                     (F.sum("d0") + F.sum("c0")).alias("n0_total"))
    cum = (stats.range_cumsum(counts, "dur", ["d1", "c1", "d0", "c0"])
           .crossJoin(F.broadcast(tot))
           .withColumn("n1at", F.col("n1_total")
                       - (F.col("cum_d1") + F.col("cum_c1"))
                       + F.col("d1") + F.col("c1"))
           .withColumn("n0at", F.col("n0_total")
                       - (F.col("cum_d0") + F.col("cum_c0"))
                       + F.col("d0") + F.col("c0")))
    d = F.col("d1") + F.col("d0")
    nat = (F.col("n1at") + F.col("n0at")).cast("double")
    wgt = nat  # Gehan weight = at-risk count
    ok = (d > 0) & (F.col("n1at") + F.col("n0at") > 1)
    agg = (cum.where(ok)
              .agg(F.first("n1_total").alias("n_arm_a"),
                   F.first("n0_total").alias("n_arm_b"),
                   F.sum(wgt * F.col("d1")).alias("wo1"),
                   F.sum(wgt * d * F.col("n1at") / nat).alias("we1"),
                   F.sum(F.when(ok, wgt * wgt * d
                                * (F.col("n1at") / nat)
                                * (F.col("n0at") / nat)
                                * (nat - d) / (nat - 1))
                          .otherwise(F.lit(0.0))).alias("v")))
    z = F.when(F.col("v") > 0,
               (F.col("wo1") - F.col("we1")) / F.sqrt(F.col("v")))
    return agg.select(
        F.col("n_arm_a").cast("long").alias("n_arm_a"),
        F.col("n_arm_b").cast("long").alias("n_arm_b"),
        F.round("wo1", 2).alias("weighted_observed_a"),
        F.round("we1", 4).alias("weighted_expected_a"),
        F.round(z, 4).alias("z_stat"),
        F.round(z * z, 4).alias("chi2_stat"))

GEHAN_SQL = """
WITH mx AS (SELECT CAST(max(ts) AS DATE) AS m
            FROM events WHERE ts IS NOT NULL),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
       FROM events WHERE ts IS NOT NULL),
g AS (SELECT user_id, d,
             lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
      FROM ud),
f AS (SELECT user_id,
             min(CASE WHEN date_diff('day', d, nxt) >= 3 THEN d END)
               AS ichurn,
             min(d) AS fd, max(d) AS ld
      FROM g GROUP BY 1),
per_user AS (
  SELECT date_diff('day', fd,
                   coalesce(coalesce(ichurn,
                            CASE WHEN date_diff('day', ld, m) >= 3
                                 THEN ld END), m)) AS dur,
         (coalesce(ichurn,
                   CASE WHEN date_diff('day', ld, m) >= 3
                        THEN ld END) IS NOT NULL)::INT AS churned,
         (substring(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 1)
          < '8')::INT AS b
  FROM f CROSS JOIN mx
), counts AS (
  SELECT dur,
         sum(churned * b) AS d1, sum((1 - churned) * b) AS c1,
         sum(churned * (1 - b)) AS d0,
         sum((1 - churned) * (1 - b)) AS c0
  FROM per_user GROUP BY 1
), tot AS (SELECT sum(d1) + sum(c1) AS n1_total,
                  sum(d0) + sum(c0) AS n0_total FROM counts),
cum AS (
  SELECT dur, d1, d0, n1_total, n0_total,
         n1_total - (sum(d1) OVER w + sum(c1) OVER w) + d1 + c1 AS n1at,
         n0_total - (sum(d0) OVER w + sum(c0) OVER w) + d0 + c0 AS n0at
  FROM counts CROSS JOIN tot
  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), agg AS (
  SELECT any_value(n1_total) AS n_arm_a,
         any_value(n0_total) AS n_arm_b,
         sum((n1at + n0at) * d1) AS wo1,
         sum((n1at + n0at) * (d1 + d0) * n1at
             / CAST(n1at + n0at AS DOUBLE)) AS we1,
         sum(CAST(n1at + n0at AS DOUBLE) * (n1at + n0at)
             * (d1 + d0) * (n1at / CAST(n1at + n0at AS DOUBLE))
             * (n0at / CAST(n1at + n0at AS DOUBLE))
             * (n1at + n0at - d1 - d0)
             / CAST(n1at + n0at - 1 AS DOUBLE)) AS v
  FROM cum WHERE d1 + d0 > 0 AND n1at + n0at > 1
)
SELECT CAST(n_arm_a AS BIGINT) AS n_arm_a,
       CAST(n_arm_b AS BIGINT) AS n_arm_b,
       round(CAST(wo1 AS DOUBLE), 2) AS weighted_observed_a,
       round(we1, 4) AS weighted_expected_a,
       round(CASE WHEN v > 0 THEN (wo1 - we1) / sqrt(v) END, 4)
         AS z_stat,
       round(CASE WHEN v > 0 THEN (wo1 - we1) * (wo1 - we1) / v END, 4)
         AS chi2_stat
FROM agg
"""


# --------------------------------------------------------------------------
# A153. Brier-score decomposition (Murphy 1973): reliability −
# resolution + uncertainty, on A110's score/bin construction — the
# three-way reading of WHY the Brier score is what it is. Per-bin
# sums ride the same single scan; the identity Brier = REL − RES +
# UNC holds exactly for bin-averaged forecasts and within-rounding
# here (per-bin mean p̄ stands in for each p).
# --------------------------------------------------------------------------

def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    z = F.lit(-2.0) + F.col("o_totalprice") * F.lit(1e-5)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    y = (F.col("o_orderstatus") == "F").cast("int")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9))
         .cast("int").alias("bin"),
        score.alias("p"), y.alias("y"))
    bins = (binned.groupBy("bin")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.avg("p").alias("pb"),
                       F.avg(F.col("y").cast("double")).alias("ob")))
    tot = bins.agg(F.sum("n").alias("nn"),
                   (F.sum(F.col("ob") * F.col("n")) / F.sum("n"))
                   .alias("obar"))
    j = bins.crossJoin(F.broadcast(tot))
    rel = F.sum(F.col("n") * (F.col("pb") - F.col("ob"))
                * (F.col("pb") - F.col("ob"))) / F.first("nn")
    res = F.sum(F.col("n") * (F.col("ob") - F.col("obar"))
                * (F.col("ob") - F.col("obar"))) / F.first("nn")
    unc = F.first(F.col("obar") * (1.0 - F.col("obar")))
    agg = j.agg(F.first("nn").alias("n"), rel.alias("rel"),
                res.alias("res"), unc.alias("unc"))
    return agg.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        F.round(F.col("rel") - F.col("res") + F.col("unc"), 6)
         .alias("brier_from_decomposition"))

BRIER_DECOMP_SQL = """
WITH s AS (
  SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INT) AS bin,
         round(1.0 / (1.0 + exp(-(-2.0 + o_totalprice * 1e-5))), 6) AS p,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), bins AS (
  SELECT bin, count(*) AS n, avg(p) AS pb,
         avg(CAST(y AS DOUBLE)) AS ob
  FROM s GROUP BY 1
), tot AS (
  SELECT sum(n) AS nn, sum(ob * n) / sum(n) AS obar FROM bins
), agg AS (
  SELECT any_value(nn) AS n,
         sum(n * (pb - ob) * (pb - ob)) / any_value(nn) AS rel,
         sum(n * (ob - obar) * (ob - obar)) / any_value(nn) AS res,
         any_value(obar * (1.0 - obar)) AS unc
  FROM bins CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n_orders,
       round(rel, 6) AS reliability,
       round(res, 6) AS resolution,
       round(unc, 6) AS uncertainty,
       round(rel - res + unc, 6) AS brier_from_decomposition
FROM agg
"""


# --------------------------------------------------------------------------
# A154. Paired sign test (the distribution-free floor under A136's
# Wilcoxon — uses only signs, so it is valid under ANY asymmetric
# alternative): realized peak unit price vs catalog retail price per
# part, normal approximation with continuity correction. One
# aggregate over the A136 pair construction.
# --------------------------------------------------------------------------

def sign_test_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("p_partkey", "p_retailprice")
               .agg(F.max(F.col("l_extendedprice") / F.col("l_quantity"))
                     .alias("peak"))
               .select((F.col("peak") - F.col("p_retailprice"))
                       .alias("d"))
               .where(F.col("d") != 0))
    g = pairs.agg(F.count(F.lit(1)).alias("n"),
                  F.sum((F.col("d") > 0).cast("long")).alias("npos"))
    n = F.col("n").cast("double")
    z = (F.col("npos") - n / 2
         - F.when(F.col("npos") > n / 2, 0.5)
            .when(F.col("npos") < n / 2, -0.5).otherwise(0.0)) \
        / F.sqrt(n / 4.0)
    return g.select(F.col("n").cast("long").alias("n_pairs"),
                    F.col("npos").cast("long").alias("n_positive"),
                    F.round(F.col("npos") / n, 6).alias("frac_positive"),
                    F.round(z, 4).alias("z_stat"))

SIGN_TEST_SQL = """
WITH pairs AS (
  SELECT max(l.l_extendedprice / l.l_quantity) - p.p_retailprice AS d
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_retailprice
), nz AS (SELECT d FROM pairs WHERE d <> 0),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS npos
  FROM nz
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(npos AS BIGINT) AS n_positive,
       round(npos / n, 6) AS frac_positive,
       round((npos - n / 2
              - CASE WHEN npos > n / 2 THEN 0.5
                     WHEN npos < n / 2 THEN -0.5 ELSE 0.0 END)
             / sqrt(n / 4.0), 4) AS z_stat
FROM g
"""


# --------------------------------------------------------------------------
# A155. Cochran-Mantel-Haenszel stratified 2×2 test (Mantel-Haenszel
# 1959) + MH pooled odds ratio: does high order value associate with
# finished status CONSISTENTLY across priority strata (the
# confounder-adjusted view A115's single-table Fisher can't give)?
# One fused scan builds all strata cells; the CMH sums are ≤#strata
# algebra.
# --------------------------------------------------------------------------

def cmh_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    exp_ = F.col("o_totalprice") > 150000
    out = F.col("o_orderstatus") == "F"
    cells = (o.groupBy("o_orderpriority")
              .agg(F.sum((exp_ & out).cast("long")).alias("a"),
                   F.sum((exp_ & ~out).cast("long")).alias("b"),
                   F.sum((~exp_ & out).cast("long")).alias("c"),
                   F.sum((~exp_ & ~out).cast("long")).alias("d")))
    a, b, cc, d = (F.col("a").cast("double"), F.col("b").cast("double"),
                   F.col("c").cast("double"), F.col("d").cast("double"))
    nk = a + b + cc + d
    ek = (a + b) * (a + cc) / nk
    vk = ((a + b) * (cc + d) * (a + cc) * (b + d)
          / (nk * nk * (nk - 1)))
    agg = cells.agg(F.count(F.lit(1)).alias("k_strata"),
                    F.sum(a).alias("sa"), F.sum(ek).alias("se"),
                    F.sum(vk).alias("sv"),
                    F.sum(a * d / nk).alias("srn"),
                    F.sum(b * cc / nk).alias("srd"))
    num = F.abs(F.col("sa") - F.col("se")) - 0.5
    return agg.select(
        F.col("k_strata").cast("int").alias("k_strata"),
        F.round(F.col("sa"), 2).alias("sum_observed"),
        F.round("se", 4).alias("sum_expected"),
        F.round(num * num / F.col("sv"), 4).alias("cmh_chi2"),
        F.round(F.col("srn") / F.col("srd"), 6).alias("mh_odds_ratio"))

CMH_SQL = """
WITH cells AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_totalprice > 150000
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS DOUBLE) AS a,
         CAST(sum(CASE WHEN o_totalprice > 150000
                  AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
              AS DOUBLE) AS b,
         CAST(sum(CASE WHEN o_totalprice <= 150000
                  AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS DOUBLE) AS c,
         CAST(sum(CASE WHEN o_totalprice <= 150000
                  AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
              AS DOUBLE) AS d
  FROM orders GROUP BY 1
), agg AS (
  SELECT count(*) AS k_strata,
         sum(a) AS sa,
         sum((a + b) * (a + c) / (a + b + c + d)) AS se,
         sum((a + b) * (c + d) * (a + c) * (b + d)
             / ((a + b + c + d) * (a + b + c + d)
                * (a + b + c + d - 1))) AS sv,
         sum(a * d / (a + b + c + d)) AS srn,
         sum(b * c / (a + b + c + d)) AS srd
  FROM cells
)
SELECT CAST(k_strata AS INT) AS k_strata,
       round(sa, 2) AS sum_observed,
       round(se, 4) AS sum_expected,
       round((abs(sa - se) - 0.5) * (abs(sa - se) - 0.5) / sv, 4)
         AS cmh_chi2,
       round(srn / srd, 6) AS mh_odds_ratio
FROM agg
"""


# --------------------------------------------------------------------------
# A157. ANOVA effect sizes + intraclass correlation for the A18
# one-way design (acctbal ~ mktsegment): η² (Pearson 1911),
# less-biased ω² (Hays 1963), and ICC(1,1) (Shrout-Fleiss 1979) —
# the "how MUCH does the factor matter" companion to A18's F. All
# from ONE fused group-moment scan; k̄ uses the unequal-group-size
# harmonic adjustment n0 = (N − Σn²/N)/(k−1).
# --------------------------------------------------------------------------

def anova_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_mktsegment")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.col("c_acctbal").cast("double")).alias("s"),
               F.sum(F.col("c_acctbal").cast("double")
                     * F.col("c_acctbal")).alias("ss")))
    agg = g.agg(F.count(F.lit(1)).alias("k"),
                F.sum("n").alias("nn"),
                F.sum("s").alias("ts"), F.sum("ss").alias("tss"),
                F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
                F.sum(F.col("n") * F.col("n")).alias("sn2"))
    nn = F.col("nn").cast("double")
    k = F.col("k").cast("double")
    sst = F.col("tss") - F.col("ts") * F.col("ts") / nn
    ssb = F.col("sb") - F.col("ts") * F.col("ts") / nn
    ssw = sst - ssb
    msb = ssb / (k - 1)
    msw = ssw / (nn - k)
    n0 = (nn - F.col("sn2") / nn) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    omega = (ssb - (k - 1) * msw) / (sst + msw)
    return agg.select(
        F.col("k").cast("int").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        F.round(ssb / sst, 6).alias("eta_squared"),
        F.round(omega, 6).alias("omega_squared"),
        F.round(icc, 6).alias("icc_1_1"))

ANOVA_EFFECT_SQL = """
WITH g AS (
  SELECT c_mktsegment, count(*) AS n,
         sum(CAST(c_acctbal AS DOUBLE)) AS s,
         sum(CAST(c_acctbal AS DOUBLE) * c_acctbal) AS ss
  FROM customer GROUP BY 1
), agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, CAST(sum(n) AS DOUBLE) AS nn,
         sum(s) AS ts, sum(ss) AS tss,
         sum(s * s / n) AS sb, sum(CAST(n AS DOUBLE) * n) AS sn2
  FROM g
), m AS (
  SELECT k, nn,
         tss - ts * ts / nn AS sst,
         sb - ts * ts / nn AS ssb,
         (tss - ts * ts / nn) - (sb - ts * ts / nn) AS ssw,
         (sb - ts * ts / nn) / (k - 1) AS msb,
         ((tss - ts * ts / nn) - (sb - ts * ts / nn)) / (nn - k) AS msw,
         (nn - sn2 / nn) / (k - 1) AS n0
  FROM agg
)
SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n,
       round(ssb / sst, 6) AS eta_squared,
       round((ssb - (k - 1) * msw) / (sst + msw), 6) AS omega_squared,
       round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc_1_1
FROM m
"""


# --------------------------------------------------------------------------
# A158. Stratified Bernoulli sample + Horvitz-Thompson total (Horvitz-
# Thompson 1952): deterministic md5 inclusion at per-priority rates,
# HT total = Σ y_i/π_i per stratum, with the Bernoulli-design SE
# Σ y²(1−π)/π². The full-population comparison column makes the
# estimator's coverage auditable in-query. Seed-free md5 inclusion =
# the repo's standard engine-portable randomization.
# --------------------------------------------------------------------------

_HT_RATES = {"1-URGENT": 0.5, "2-HIGH": 0.25, "3-MEDIUM": 0.125,
             "4-NOT SPECIFIED": 0.125, "5-LOW": 0.25}


def stratified_ht_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rate = F.create_map(*[F.lit(x) for kv in _HT_RATES.items()
                          for x in kv])[F.col("o_orderpriority")]
    # md5 first 4 hex chars → uniform int in [0, 65536)
    u = F.conv(F.substring(F.md5(F.concat(
        F.lit("ht:"), F.col("o_orderkey").cast("string"))), 1, 4),
        16, 10).cast("int")
    d = (o.select("o_orderpriority",
                  F.col("o_totalprice").cast("double").alias("y"),
                  rate.alias("pi"), u.alias("u"))
          .withColumn("take", (F.col("u") < F.col("pi") * 65536)
                      .cast("int")))
    g = (d.groupBy("o_orderpriority")
          .agg(F.count(F.lit(1)).alias("n_stratum"),
               F.sum("take").alias("n_sampled"),
               F.sum(F.col("take") * F.col("y") / F.col("pi"))
                .alias("ht_total"),
               F.sum(F.col("take") * F.col("y") * F.col("y")
                     * (1 - F.col("pi")) / (F.col("pi") * F.col("pi")))
                .alias("v"),
               F.sum("y").alias("true_total")))
    return (g.select("o_orderpriority", "n_stratum", "n_sampled",
                     F.round("ht_total", 2).alias("ht_total"),
                     F.round(F.sqrt("v"), 2).alias("ht_se"),
                     F.round("true_total", 2).alias("true_total"),
                     F.round((F.col("ht_total") - F.col("true_total"))
                             / F.sqrt("v"), 4).alias("z_error"))
             .orderBy("o_orderpriority"))

HT_ESTIMATE_SQL = """
WITH d AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS y,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 0.5 WHEN '2-HIGH' THEN 0.25
           WHEN '3-MEDIUM' THEN 0.125
           WHEN '4-NOT SPECIFIED' THEN 0.125 ELSE 0.25 END AS pi,
         ((strpos('0123456789abcdef',
                  substring(md5('ht:' || CAST(o_orderkey AS VARCHAR)),
                            1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef',
                    substring(md5('ht:' || CAST(o_orderkey AS VARCHAR)),
                              2, 1)) - 1) * 256
          + (strpos('0123456789abcdef',
                    substring(md5('ht:' || CAST(o_orderkey AS VARCHAR)),
                              3, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
                    substring(md5('ht:' || CAST(o_orderkey AS VARCHAR)),
                              4, 1)) - 1)) AS u
  FROM orders
), t AS (
  SELECT *, CASE WHEN u < pi * 65536 THEN 1 ELSE 0 END AS take FROM d
), g AS (
  SELECT o_orderpriority, count(*) AS n_stratum,
         sum(take) AS n_sampled,
         sum(take * y / pi) AS ht_total,
         sum(take * y * y * (1 - pi) / (pi * pi)) AS v,
         sum(y) AS true_total
  FROM t GROUP BY 1
)
SELECT o_orderpriority, n_stratum,
       CAST(n_sampled AS BIGINT) AS n_sampled,
       round(ht_total, 2) AS ht_total,
       round(sqrt(v), 2) AS ht_se,
       round(true_total, 2) AS true_total,
       round((ht_total - true_total) / sqrt(v), 4) AS z_error
FROM g ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# A159. Distribution-free median CI via binomial order statistics
# (the textbook exact-coverage interval — no resampling, unlike A82's
# bootstrap): the (l, u) order-statistic ranks come from the normal
# approximation to Binomial(n, ½); the two order statistics are then
# READ OFF the distinct-value cumulative table via range_cumsum —
# never a global sort.
# --------------------------------------------------------------------------

def median_ci_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    o = load_table(spark, sf_dir, "orders")
    vals = (o.groupBy(F.col("o_totalprice").cast("double").alias("v"))
             .agg(F.count(F.lit(1)).alias("t")))
    cum = stats.range_cumsum(vals, "v", ["t"]).localCheckpoint(eager=True)
    n = cum.agg(F.sum("t")).collect()[0][0]
    z = 1.959964
    lo = int(math.floor(n / 2.0 - z * math.sqrt(n) / 2.0))
    hi = int(math.ceil(1 + n / 2.0 + z * math.sqrt(n) / 2.0))
    lo, hi = max(lo, 1), min(hi, n)

    def kth(k):
        return (cum.where(F.col("cum_t") >= k)
                   .agg(F.min("v").alias("v")))
    med_k1 = (n + 1) // 2
    med_k2 = (n + 2) // 2
    row_lo = kth(lo).collect()[0]["v"]
    row_hi = kth(hi).collect()[0]["v"]
    m1 = kth(med_k1).collect()[0]["v"]
    m2 = kth(med_k2).collect()[0]["v"]
    spark_ = spark
    return spark_.createDataFrame(
        [(int(n), round((m1 + m2) / 2.0, 4), int(lo), int(hi),
          round(row_lo, 4), round(row_hi, 4))],
        "n long, median double, rank_lo long, rank_hi long, "
        "ci_lo double, ci_hi double")

MEDIAN_CI_SQL = """
WITH vals AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS t
  FROM orders GROUP BY 1
), cum AS (
  SELECT v, t, sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS cum_t
  FROM vals
), nn AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM vals),
ks AS (
  SELECT n,
         greatest(CAST(floor(n / 2.0 - 1.959964 * sqrt(n) / 2.0)
                       AS BIGINT), 1) AS lo,
         CAST(least(CAST(ceil(1 + n / 2.0 + 1.959964 * sqrt(n) / 2.0)
                         AS BIGINT), n) AS BIGINT) AS hi,
         (n + 1) // 2 AS k1, (n + 2) // 2 AS k2
  FROM nn
)
SELECT CAST(n AS BIGINT) AS n,
       round(((SELECT min(v) FROM cum WHERE cum_t >= k1)
              + (SELECT min(v) FROM cum WHERE cum_t >= k2)) / 2.0, 4)
         AS median,
       lo AS rank_lo, hi AS rank_hi,
       round((SELECT min(v) FROM cum WHERE cum_t >= lo), 4) AS ci_lo,
       round((SELECT min(v) FROM cum WHERE cum_t >= hi), 4) AS ci_hi
FROM ks
"""


# --------------------------------------------------------------------------
# A160. OLS leverage audit (hat values h_i = 1/n + (x−x̄)²/Sxx for the
# simple regression design): how many rows exceed the 2p/n
# high-leverage rule, the max leverage, and the exact-identity check
# mean(h) = p/n (p = 2). One moment pass + one codegen re-scan —
# the influence-diagnostics companion of A121's Cook's distance.
# --------------------------------------------------------------------------

def leverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_quantity").cast("double").alias("x"))
    mv = d.agg(F.count(F.lit(1)).alias("n"), F.avg("x").alias("mx"),
               (F.var_pop("x") * F.count(F.lit(1))).alias("sxx"))
    j = d.crossJoin(F.broadcast(mv))
    h = 1.0 / F.col("n") + (F.col("x") - F.col("mx")) \
        * (F.col("x") - F.col("mx")) / F.col("sxx")
    thr = 2.0 * 2.0 / F.col("n")
    return (j.agg(F.first("n").alias("nn"),
                  F.sum((h > thr).cast("long")).alias("n_high"),
                  F.max(h).alias("hmax"),
                  F.avg(h).alias("hmean"))
             .select(F.col("nn").cast("long").alias("n"),
                     F.col("n_high").alias("n_high_leverage"),
                     F.round("hmax", 8).alias("max_leverage"),
                     F.round("hmean", 8).alias("mean_leverage"),
                     F.round(F.col("hmean") * F.col("nn"), 4)
                      .alias("mean_times_n")))

LEVERAGE_SQL = """
WITH d AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM lineitem),
mv AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(x) AS mx,
         var_pop(x) * count(*) AS sxx
  FROM d
), j AS (
  SELECT n, 1.0 / n + (x - mx) * (x - mx) / sxx AS h FROM d CROSS JOIN mv
)
SELECT CAST(any_value(n) AS BIGINT) AS n,
       CAST(sum(CASE WHEN h > 4.0 / n THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_leverage,
       round(max(h), 8) AS max_leverage,
       round(avg(h), 8) AS mean_leverage,
       round(avg(h) * any_value(n), 4) AS mean_times_n
FROM j
"""
