#!/usr/bin/env python
"""Generate a N× stress copy of the sf0.1 testdata (default 20×) with
shifted keys so join cardinalities scale, written multi-file so scans
parallelize. Usage:

    python scripts/make_stress.py [out_dir] [factor] [mode]

Modes (VERDICT r05 #3 / r06 #4):
  (default)  replicated facts + dims — all-duplicate text corpus
  unique     salt every document token with the replica index, so
             replicas share NO n-grams/chunks (production-shaped
             unique-heavy corpus for the counting-filter prefilters)
  zipf       additionally skew o_custkey: 50% of orders land on
             custkeys 1..16 with P(k) ∝ 1/k (a Zipf head) — the
             pathological join-key distribution the salted join (A32)
             and AQE skew handling exist for; measured by
             scripts/stress_skew.py

Since round 7 the DIMENSIONS scale with the factor too (r06 verdict
#4: the rank-family stress previously measured base-sized customer/
part/supplier): customer/part/supplier replicate with shifted keys and
the facts' FK columns shift consistently, so per-key join fan-out
stays TPC-H-shaped while dim cardinality grows N×. nation/region stay
fixed (as at any TPC-H SF).

Then: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_bigdata_spark.io import load_table  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402

#: key-shift strides per replica — wide enough that no base key range
#: collides with a shifted copy (base sf0.1: orderkey ≤ 6e6, custkey ≤
#: 15e3, partkey ≤ 2e4, suppkey ≤ 1e3)
_ORDER_STRIDE = 10_000_000
_CUST_STRIDE = 1_000_000
_PART_STRIDE = 1_000_000
_SUPP_STRIDE = 1_000_000

#: Zipf head: this share of fact rows (per mille of 10000) lands on
#: the hot keys 1.._ZIPF_KEYS with P(k) ∝ 1/k
_ZIPF_MASS = 5000
_ZIPF_KEYS = 16


def _zipf_custkey(orderkey_col, custkey_col):
    """Deterministic Zipf-head remap: hash the order key to per-10000
    buckets; the first _ZIPF_MASS buckets map to hot custkeys 1..16
    with 1/k shares, the rest keep the original (shifted) key."""
    hh = [0.0]
    for k in range(1, _ZIPF_KEYS + 1):
        hh.append(hh[-1] + 1.0 / k)
    cum = [int(round(_ZIPF_MASS * x / hh[-1])) for x in hh]
    h = F.pmod(F.xxhash64(orderkey_col), F.lit(10000))
    expr = None
    for k in range(1, _ZIPF_KEYS + 1):
        cond = h < F.lit(cum[k])
        branch = F.lit(k).cast("long")
        expr = F.when(cond, branch) if expr is None else \
            expr.when(cond, branch)
    return expr.otherwise(custkey_col)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "replicated"
    unique_docs = mode == "unique"
    zipf = mode == "zipf"
    sf = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    spark = get_spark("make_stress")
    reps = spark.range(factor).withColumnRenamed("id", "rep")

    li = load_table(spark, sf, "lineitem")
    li = (li.crossJoin(reps)
            .withColumn("l_orderkey",
                        F.col("l_orderkey") + F.col("rep") * _ORDER_STRIDE)
            .withColumn("l_partkey",
                        F.col("l_partkey") + F.col("rep") * _PART_STRIDE)
            .withColumn("l_suppkey",
                        F.col("l_suppkey") + F.col("rep") * _SUPP_STRIDE)
            .drop("rep"))
    (li.repartition(32)
       .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    orders = load_table(spark, sf, "orders")
    orders = (orders.crossJoin(reps)
              .withColumn("o_orderkey",
                          F.col("o_orderkey") + F.col("rep") * _ORDER_STRIDE)
              .withColumn("o_custkey",
                          F.col("o_custkey") + F.col("rep") * _CUST_STRIDE)
              .drop("rep"))
    if zipf:
        orders = orders.withColumn(
            "o_custkey", _zipf_custkey(F.col("o_orderkey"),
                                       F.col("o_custkey")))
    (orders.repartition(16)
       .write.mode("overwrite").parquet(f"{out}/orders.parquet"))

    ev = load_table(spark, sf, "events")
    (ev.crossJoin(reps)
       .withColumn("event_id", F.col("event_id") + F.col("rep") * _ORDER_STRIDE)
       .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
       .drop("rep").repartition(16)
       .write.mode("overwrite").parquet(f"{out}/events.parquet"))

    # text/vector corpora scale at factor/4 (their operators are
    # explode-heavy: grams/tokens per doc multiply the row factor)
    corpus_factor = max(2, factor // 4)
    creps = spark.range(corpus_factor).withColumnRenamed("id", "rep")

    docs = load_table(spark, sf, "documents").crossJoin(creps)
    if unique_docs:
        # append the replica tag to EVERY token: every word n-gram and
        # every token chunk becomes replica-distinct, while the base
        # corpus's intra-replica duplicate structure is preserved
        salted = F.array_join(
            F.transform(F.split("text", " "),
                        lambda t: F.concat(t, F.lit("u"),
                                           F.col("rep").cast("string"))),
            " ")
        docs = docs.withColumn("text", salted)
    (docs.withColumn("doc_id", F.col("doc_id") + F.col("rep") * _ORDER_STRIDE)
         .drop("rep").repartition(16)
         .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    emb = load_table(spark, sf, "embeddings")
    (emb.crossJoin(creps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * _ORDER_STRIDE)
        .drop("rep").repartition(8)
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    # dimensions scale with the factor (r06 #4), matching the facts'
    # FK shifts; nation/region stay fixed like at any TPC-H SF.
    # Value DITHER (+rep·1e-4 on the measure columns): replicated
    # copies would otherwise share every value, so the distinct-value
    # tables the exact rank operators build stay base-sized and the
    # stress never measures their O(distinct)=O(rows) design regime;
    # the dither (≤ 0.01 total at 100×) makes values replica-distinct
    # while leaving every statistic within noise of the base corpus.
    cust = load_table(spark, sf, "customer")
    (cust.crossJoin(reps)
         .withColumn("c_custkey",
                     F.col("c_custkey") + F.col("rep") * _CUST_STRIDE)
         .withColumn("c_acctbal",
                     F.col("c_acctbal") + F.col("rep") * F.lit(1e-4))
         .drop("rep").repartition(8)
         .write.mode("overwrite").parquet(f"{out}/customer.parquet"))
    part = load_table(spark, sf, "part")
    (part.crossJoin(reps)
         .withColumn("p_partkey",
                     F.col("p_partkey") + F.col("rep") * _PART_STRIDE)
         .withColumn("p_retailprice",
                     F.col("p_retailprice") + F.col("rep") * F.lit(1e-4))
         .drop("rep").repartition(8)
         .write.mode("overwrite").parquet(f"{out}/part.parquet"))
    supp = load_table(spark, sf, "supplier")
    (supp.crossJoin(reps)
         .withColumn("s_suppkey",
                     F.col("s_suppkey") + F.col("rep") * _SUPP_STRIDE)
         .drop("rep").repartition(4)
         .write.mode("overwrite").parquet(f"{out}/supplier.parquet"))

    for t in ("region", "nation"):
        load_table(spark, sf, t).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
    print(f"stress data at {out} (factor {factor}, corpus {corpus_factor}, "
          f"mode {mode})")


if __name__ == "__main__":
    main()
