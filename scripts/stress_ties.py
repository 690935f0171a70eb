#!/usr/bin/env python
"""Tie-heavy stress tier for the quantile machinery (VERDICT r03 #8).

The RLE bracket-refine in stats.grouped_quantiles exists precisely
because TIES break the naive candidate bound (a bracket endpoint's
full tie run joins the candidate set), yet the 20x ledger measured
mostly near-unique prices. This script measures the SAME operators in
both regimes on the 20x stress copy:

  near-unique : l_extendedprice  (~millions of distinct doubles)
  tie-heavy   : l_quantity       (50 distinct values, giant tie runs)

and additionally asserts neither plan contains a data-sized
single-task window (every Window in these plans partitions by the
group column / (group, fraction)).

Usage: python scripts/stress_ties.py [stress_dir] [min_of]
Record the numbers in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parking_bigdata_spark.io import load_table  # noqa: E402
from parking_bigdata_spark.operators import stats  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402


def _mad(li, value_col):
    med = stats.grouped_median(li, "l_returnflag", value_col) \
               .localCheckpoint(eager=True)
    dev = (li.join(F.broadcast(med), "l_returnflag")
             .select("l_returnflag",
                     F.abs(F.col(value_col) - F.col("med")).alias("adev")))
    return stats.grouped_median(dev, "l_returnflag", "adev", alias="mad")


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    min_of = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("stress-ties")
    li_price = load_table(spark, stress, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    li_qty = load_table(spark, stress, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("qty"))

    cases = {
        "quantiles/near-unique(price)": lambda: stats.grouped_quantiles(
            li_price, "l_returnflag", "l_extendedprice",
            [0.25, 0.5, 0.75], ["p25", "p50", "p75"]),
        "quantiles/tie-heavy(qty,50 distinct)": lambda: stats.grouped_quantiles(
            li_qty, "l_returnflag", "qty",
            [0.25, 0.5, 0.75], ["p25", "p50", "p75"]),
        "mad/near-unique(price)": lambda: _mad(li_price, "l_extendedprice"),
        "mad/tie-heavy(qty)": lambda: _mad(li_qty, "qty"),
        "trimmed/near-unique(price)": lambda: stats.grouped_trimmed_mean(
            li_price, "l_returnflag", "l_extendedprice", trim=0.1),
        "trimmed/tie-heavy(qty)": lambda: stats.grouped_trimmed_mean(
            li_qty, "l_returnflag", "qty", trim=0.1),
    }
    for name, fn in cases.items():
        # plan audit: no unpartitioned (single-task) window anywhere
        plan = fn()._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition(" in line.lower():
                assert "windowspecdefinition(l_returnflag" in line.lower() \
                    or "windowspecdefinition(__" in line.lower() \
                    or "partitionby" not in line.lower(), line
        best = float("inf")
        for _ in range(min_of):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.2f}s")


if __name__ == "__main__":
    main()
