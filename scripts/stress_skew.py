#!/usr/bin/env python
"""Measured skew-join comparison (VERDICT r06 #4): the salted join
(A32, operators/joins.salted_join) vs AQE's automatic skew-join split
vs a plain shuffle join, on the Zipf-skewed stress corpus
(make_stress.py <dir> <factor> zipf — 50% of orders land on 16 hot
custkeys with 1/k shares; the hottest key alone carries ~15% of the
fact table).

Workload: orders ⋈ customer on o_custkey, then revenue by segment —
the canonical skewed dimension enrichment. The broadcast threshold is
disabled for the measurement (emulating a dimension too large to
broadcast, which is exactly when key skew matters; with broadcast on,
Spark never shuffles the fact and skew is a non-event — that is the
first remedy and it is measured too as the baseline).

Variants:
  broadcast : F.broadcast dim (the default plan at this dim size)
  plain     : shuffle join, AQE skew split OFF
  aqe       : shuffle join, AQE skew split ON (thresholds lowered to
              trigger at this data size: 8 MiB / 2× median — the
              defaults, 256 MiB, are tuned for real clusters)
  salted    : operators/joins.salted_join, n_salts=8, AQE skew OFF

Usage: python scripts/stress_skew.py [stress_dir] [min_of]
Record the numbers in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_bigdata_spark.io import load_table  # noqa: E402
from parking_bigdata_spark.operators.joins import salted_join  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402


def _agg(joined):
    return (joined.groupBy("c_mktsegment")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("o_totalprice").cast("double"))
                        .alias("rev")))


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_zipf"
    min_of = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("stress-skew")
    conf = spark.conf
    orders = load_table(spark, stress, "orders").select(
        "o_custkey", "o_totalprice")
    cust = load_table(spark, stress, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")

    # skew evidence: top-key share of the fact table
    tot = orders.count()
    top = (orders.groupBy("o_custkey").count()
                 .orderBy(F.desc("count")).limit(3).collect())
    print(f"orders={tot}, top keys: "
          + ", ".join(f"{r['o_custkey']}={r['count']} "
                      f"({100.0 * r['count'] / tot:.1f}%)" for r in top))

    def run(tag, make_df, **confs):
        saved = {k: conf.get(k, None) for k in confs}
        for k, v in confs.items():
            conf.set(k, v)
        try:
            best = None
            for _ in range(min_of):
                t0 = time.time()
                rows = make_df().collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            # the consistency check compares the FULL per-segment
            # result (segment, n, revenue rounded to cents), not just
            # a global row-count sum — a bug that duplicated one
            # segment while dropping another could keep the total
            # identical (code-review r07)
            chk = tuple(sorted((r["c_mktsegment"], r["n"],
                                round(r["rev"], 2)) for r in rows))
            print(f"{tag:10s} {best:7.2f} s   (rows={len(rows)}, "
                  f"n_total={sum(r['n'] for r in rows)})")
            return chk
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)

    NOBC = {"spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    checks = set()
    checks.add(run("broadcast", lambda: _agg(
        orders.join(F.broadcast(cust), "o_custkey"))))
    checks.add(run("plain", lambda: _agg(orders.join(cust, "o_custkey")),
                   **NOBC,
                   **{"spark.sql.adaptive.skewJoin.enabled": "false"}))
    checks.add(run("aqe", lambda: _agg(orders.join(cust, "o_custkey")),
                   **NOBC,
                   **{"spark.sql.adaptive.skewJoin.enabled": "true",
                      "spark.sql.adaptive.skewJoin."
                      "skewedPartitionThresholdInBytes": "8m",
                      "spark.sql.adaptive.skewJoin.skewedPartitionFactor":
                          "2",
                      "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                          "4m"}))
    checks.add(run("salted", lambda: _agg(
        salted_join(orders, cust, "o_custkey", n_salts=8)),
        **NOBC,
        **{"spark.sql.adaptive.skewJoin.enabled": "false"}))
    assert len(checks) == 1, f"variants disagree on segment values: {checks}"
    print("all variants agree on the full per-segment values")


if __name__ == "__main__":
    main()
