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
            # result (segment, n, revenue), not just a global
            # row-count sum — a bug that duplicated one segment while
            # dropping another could keep the total identical
            # (code-review r07). Revenue is kept as the raw double for
            # a RELATIVE-tolerance compare in main() (ADVICE r07:
            # cents-rounded bit-equality across four summation orders
            # can flip spuriously once per-segment sums reach ~1e12)
            chk = tuple(sorted((r["c_mktsegment"], r["n"], r["rev"])
                               for r in rows))
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
    _assert_agree(checks)


def _assert_agree(checks: set) -> None:
    """(segment, n) must be EXACTLY equal across variants; revenue
    within 1e-9 relative (different summation orders accumulate fp
    drift that can exceed half a cent on ~1e12-magnitude sums)."""
    base, *rest = list(checks)
    for other in rest:
        assert len(other) == len(base), (base, other)
        for (s1, n1, r1), (s2, n2, r2) in zip(base, other):
            assert s1 == s2 and n1 == n2, (s1, n1, s2, n2)
            assert abs(r1 - r2) <= 1e-9 * max(abs(r1), 1.0), (s1, r1, r2)
    print("all variants agree on the full per-segment values "
          "(n exact, revenue within 1e-9 relative)")


def agg_study() -> None:
    """Measured AGGREGATION-skew study (VERDICT r07 #4): where does
    A32-style salting actually pay on a skewed groupBy, given that AQE
    cannot split a skewed aggregation?

    Two aggregate classes on the Zipf corpus (hottest custkey ~15% of
    the fact):

    * ALGEBRAIC (count+sum) over a composite high-cardinality key
      (o_custkey × week): partial (map-side) aggregation combines each
      mapper's hot-key rows to ONE row before the shuffle, so the hot
      reducer receives #mappers rows like everyone else — the
      hypothesis is that salting (a second shuffle + merge pass) is
      pure overhead here, i.e. "map-side combine already absorbs it".
      variants: sum_plain, sum_salted (two-phase: groupBy(key, salt)
      partial → groupBy(key) merge; algebraically exact).
    * HOLISTIC (exact median) per custkey: F.median buffers every
      value of a group in ONE aggregation buffer THROUGH the shuffle —
      partial state is the value list, so the hot key ships ~15% of
      the corpus to one reducer and sorts it in one task. Salting by a
      VALUE hash cannot split a median (not mergeable); the engine's
      documented remedy is the rank/range-partitioned form
      (stats.grouped_median, what every registered median rides).
      variants: med_plain (F.median), med_rangecum (grouped_median).

    Usage: python scripts/stress_skew.py <stress_dir> [min_of] agg
    Record the numbers in SCALE.md (r08 table).
    """
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_zipf"
    min_of = int(sys.argv[2]) if len(sys.argv) > 2 \
        and sys.argv[2] != "agg" else 2
    spark = get_spark("stress-skew-agg")
    from parking_bigdata_spark.operators import stats  # noqa: E402
    orders = load_table(spark, stress, "orders").select(
        "o_custkey", "o_orderdate",
        F.col("o_totalprice").cast("double").alias("v"))
    tot = orders.count()
    top = (orders.groupBy("o_custkey").count()
                 .orderBy(F.desc("count")).limit(1).collect()[0])
    print(f"orders={tot}, hottest custkey carries "
          f"{100.0 * top['count'] / tot:.1f}%")
    key = [F.col("o_custkey"), F.weekofyear("o_orderdate").alias("wk")]

    def timed(tag, make_df):
        # noop sink for the TIMED runs (a 7M-row collect would
        # otherwise dominate the wall and hide the shuffle cost being
        # measured); one untimed collect feeds the equality check
        best = None
        for _ in range(min_of):
            t0 = time.time()
            make_df().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out = make_df().collect()
        print(f"{tag:14s} {best:7.2f} s   (rows={len(out)})")
        return out

    plain = timed("sum_plain", lambda: (
        orders.groupBy(*key)
              .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))))
    salt = F.pmod(F.xxhash64("o_orderdate", F.lit(42)), F.lit(16))
    salted = timed("sum_salted", lambda: (
        orders.groupBy(*key, salt.alias("__salt"))
              .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
              .groupBy("o_custkey", "wk")
              .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))))
    a = {(r["o_custkey"], r["wk"]): (r["n"], r["s"]) for r in plain}
    b = {(r["o_custkey"], r["wk"]): (r["n"], r["s"]) for r in salted}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0], k
        assert abs(a[k][1] - b[k][1]) <= 1e-9 * max(abs(a[k][1]), 1.0), k
    print("sum variants agree (n exact, sums within 1e-9 relative)")

    mp = timed("med_plain", lambda: (
        orders.groupBy("o_custkey").agg(F.median("v").alias("med"))))
    mr = timed("med_rangecum", lambda: (
        stats.grouped_median(orders, "o_custkey", "v")
             .withColumnRenamed("med", "med")))
    m1 = {r["o_custkey"]: r["med"] for r in mp}
    m2 = {r["o_custkey"]: r["med"] for r in mr}
    assert set(m1) == set(m2)
    for k in m1:
        assert abs(m1[k] - m2[k]) <= 1e-9 * max(abs(m1[k]), 1.0), k
    print("median variants agree (within 1e-9 relative)")

    # EXTREME hot-group holistic agg: one group owns half of 50M rows.
    # F.median buffers those 25M doubles in ONE aggregation task
    # (partial state = the value list, so partial aggregation cannot
    # shrink it) and single-task-sorts them; grouped_median's
    # range-partitioned distinct-value machinery keeps every task
    # bounded. This is the wall-clock crossover probe for the regime
    # the exact operators' docstrings claim.
    hot = (spark.range(0, 50_000_000, 1, 64)
           .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                    .otherwise(F.pmod(F.col("id"), F.lit(63)) + 1)
                    .alias("g"),
                   F.pmod(F.col("id") * 2654435761, F.lit(1_000_003))
                    .cast("double").alias("v")))
    hp = timed("hotmed_plain", lambda: (
        hot.groupBy("g").agg(F.median("v").alias("med"))))
    hr = timed("hotmed_rangecum", lambda: (
        stats.grouped_median(hot, "g", "v")))
    h1 = {r["g"]: r["med"] for r in hp}
    h2 = {r["g"]: r["med"] for r in hr}
    assert h1 == h2, "hot-median variants disagree"
    print("hot-median variants agree exactly")


if __name__ == "__main__":
    # min_of is optional per agg_study's usage line, so accept "agg"
    # anywhere after the dir (code-review r08: `<dir> agg` previously
    # fell through to main() and crashed on int("agg"))
    if "agg" in sys.argv[2:]:
        agg_study()
    else:
        main()
