#!/usr/bin/env python
"""Generate a N× stress copy of the sf0.1 testdata (default 20×) with
shifted keys so join cardinalities scale, written multi-file so scans
parallelize. Usage:

    python scripts/make_stress.py [out_dir] [factor]

Then: SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_bigdata_spark.io import load_table  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    # "unique" mode (VERDICT r05 #3): salt every document token with
    # the replica index, so replicated docs share NO word n-grams /
    # chunks — the production-shaped UNIQUE-HEAVY corpus the counting-
    # filter prefilters are designed for (the default replicated mode
    # is all-duplicate: adversarial for any prefilter, since every
    # candidate is a true duplicate nothing can prune)
    unique_docs = len(sys.argv) > 3 and sys.argv[3] == "unique"
    sf = os.environ.get("SPARK_GRAFT_BASE_SF", "/root/testdata/sf0.1")
    spark = get_spark("make_stress")
    reps = spark.range(factor).withColumnRenamed("id", "rep")

    li = load_table(spark, sf, "lineitem")
    (li.crossJoin(reps)
       .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
       .drop("rep").repartition(32)
       .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    orders = load_table(spark, sf, "orders")
    (orders.crossJoin(reps)
       .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
       .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * 1_000_000)
       .drop("rep").repartition(16)
       .write.mode("overwrite").parquet(f"{out}/orders.parquet"))

    ev = load_table(spark, sf, "events")
    (ev.crossJoin(reps)
       .withColumn("event_id", F.col("event_id") + F.col("rep") * 10_000_000)
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
    (docs.withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
         .drop("rep").repartition(16)
         .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    emb = load_table(spark, sf, "embeddings")
    (emb.crossJoin(creps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 10_000_000)
        .drop("rep").repartition(8)
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, sf, t).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
    print(f"stress data at {out} (factor {factor}, corpus {corpus_factor})")


if __name__ == "__main__":
    main()
