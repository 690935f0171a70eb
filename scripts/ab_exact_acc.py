#!/usr/bin/env python
"""A/B the exact quantile-family GK accuracy knob (VERDICT r08 #6).

Runs the registered exact keys that ride grouped_quantiles /
grouped_median / grouped_trimmed_mean at the accuracy given by
$SPARK_GRAFT_EXACT_QUANTILE_ACC, at sf0.1, steady-state (one untimed
warmup execution per key), and prints one JSON line of per-key
seconds. Invoke once per setting (the knob is read at module import):

    SPARK_GRAFT_EXACT_QUANTILE_ACC=10000 python scripts/ab_exact_acc.py
    SPARK_GRAFT_EXACT_QUANTILE_ACC=2000  python scripts/ab_exact_acc.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.operators import stats  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402

KEYS = [
    "mad_price_by_flag",
    "trimmed_mean_price",
    "quantile_summary",
    "funnel_latency_quantiles",
    "outlier_fences",
    "rfm_customer_segments",
    "winsorized_price_stats",
    "conformal_interval_coverage",
    "qq_deciles_priority",
    "length_filter_by_lang",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-exact-acc")
    reg = Q.queries()
    # steady-state: one untimed pass compiles codegen/JIT
    for k in KEYS:
        reg[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    timings = {}
    for k in KEYS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        reg[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[k] = round(time.perf_counter() - t0, 3)
        print(f"# {k}: {timings[k]:.3f}s", file=sys.stderr)
    print(json.dumps({"accuracy": stats.EXACT_QUANTILE_ACC,
                      "sf_dir": sf_dir,
                      "total": round(sum(timings.values()), 3),
                      "queries": timings}))


if __name__ == "__main__":
    main()
