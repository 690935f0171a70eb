#!/usr/bin/env python
"""Generate the committed GOLDEN SVGs for the three plot families
(VERDICT r07 #7 stretch): one distribution panel (hist+box), one LOESS
scatter+curve, one correlation heatmap, all at sf0.001. The companion
test (tests/test_viz.py golden tests) byte-compares fresh renders
against these files so any rendering regression is visible in CI.

Inclusion rule (same as gen_expected.py): the rendered geometry must
be partition-INDEPENDENT — distribution stats ride the exact
grouped-quantiles machinery + integer histogram counts, the LOESS
curve is a fused conditional-sum aggregate over integer-backed columns
rounded before formatting, the heatmap annotates 2-dp correlations,
and the scatter sample is md5-thresholded (layout-free). Verified by
rendering under two hostile session layouts before committing
(the determinism_scan.py discipline).

Usage: python scripts/gen_viz_golden.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parking_bigdata_spark import viz  # noqa: E402
from parking_bigdata_spark.io import load_table  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


#: Full per-column distribution sweep (VERDICT r08 #7): the reference
#: ships 15 per-column hist+box PNGs (변수별_분포그림/training_*.png —
#: vacancy/bus-stop/subway/parking counts, 8 area-band columns, total
#: area, total households; rendered by the R script's plot loop around
#: 20210803_이승하.R:363-392). This sweep is the parity surface over
#: OUR tables: one hist+box panel per numeric column of every core
#: table — count-like integers (l_quantity, l_linenumber, p_size,
#: n_chars, label), money/amount columns (prices, balances,
#: totalprice), and bounded ratios (discount, tax) — 13 panels, plus
#: the LOESS scatter (R:527 smooth) and the correlation heatmap
#: (R:386-392 corrplot) = 15 golden files, matching the reference's
#: per-plot-family inventory. tests/test_viz.py asserts this inventory
#: covers every reference plot family and byte-compares each render.
DIST_SWEEP: dict[str, list[str]] = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_linenumber"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_size", "p_retailprice"],
    "events": ["value"],
    "documents": ["n_chars"],
    "embeddings": ["label"],
}


def generate(sf_dir: str, out_dir: str, spark=None) -> list[str]:
    spark = spark or get_spark("gen-viz-golden")
    os.makedirs(out_dir, exist_ok=True)
    # the sweep writes to a flat training_<col>.svg namespace — a
    # cross-table column-name collision would silently clobber an
    # earlier golden and leave one panel untested (code-review r09)
    sweep_cols = [c for cols in DIST_SWEEP.values() for c in cols]
    if len(sweep_cols) != len(set(sweep_cols)):
        # a real exception, not assert: python -O would compile the
        # guard out and bring back the silent golden clobber
        dupes = sorted({c for c in sweep_cols if sweep_cols.count(c) > 1})
        raise ValueError(f"DIST_SWEEP column names collide across "
                         f"tables: {dupes}")
    paths = []
    loaded = {}
    for table, cols in DIST_SWEEP.items():
        loaded[table] = load_table(spark, sf_dir, table)
        paths += viz.save_distribution_plots(loaded[table], cols,
                                             out_dir, n_buckets=12)
    # the loess/corr panels are lineitem-based regardless of what the
    # sweep dict contains (second code-review pass r09: dropping
    # lineitem from DIST_SWEEP must not crash them)
    li = (loaded["lineitem"] if "lineitem" in loaded
          else load_table(spark, sf_dir, "lineitem"))
    paths.append(viz.save_loess_plot(
        li, "l_quantity", "l_extendedprice",
        os.path.join(out_dir, "loess_qty_price.svg")))
    paths.append(viz.save_corr_heatmap(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        os.path.join(out_dir, "corr_lineitem.svg")))
    for p in paths:
        print(p, os.path.getsize(p), "bytes", file=sys.stderr)
    return paths


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = (sys.argv[2] if len(sys.argv) > 2
           else os.path.join(REPO, "expected", "viz_sf0.001"))
    generate(sf, out)
