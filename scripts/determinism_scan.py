#!/usr/bin/env python
"""Determinism scan: run every registry query under TWO deliberately
different session layouts and diff the canonicalized outputs.

Motivation (round 6): `residual_diagnostics` hash-flipped at the 4th
decimal between runs of the SAME build — the testdata has thousands
of duplicate (l_orderkey, l_linenumber) keys, so a lag over that
order was tie-ambiguous and the realized tie order depended on the
shuffle layout. The oracle gate can't catch this class when both
engines happen to pick the same lucky order; forcing two hostile
layouts (1 vs 32 shuffle partitions, tiny vs default scan splits,
with AQE coalescing on) makes tie-order dependence reproduce
deterministically instead of once a week.

Usage: python scripts/determinism_scan.py [sf_dir] [out.json] [names]

Exit 1 if any query's two runs differ (rows, schema, or values),
unless the query is in EXPECTED_UNSTABLE with a documented reason.

First full-registry run (round 6, sf0.001): 356/357 stable; the one
expected exception is below.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402
from scripts.check_expected import _canon  # noqa: E402

# Documented exceptions: queries whose VALUES legitimately depend on
# the physical layout. Each needs a reason a reviewer can check.
# (empty since round 7 — sketch_hll_union no longer emits the raw
# merge-order-sensitive HLL estimate; its output is the exact audit
# count plus the in-band boolean, stable across layouts)
EXPECTED_UNSTABLE: set[str] = set()

LAYOUTS = (
    # (shuffle partitions, files.maxPartitionBytes): one layout forces
    # everything through a single reducer (one big partition, one tie
    # run), the other splits scans into ~1 MiB tasks and 32-way
    # shuffles — if a query's value depends on tie order or partition
    # count anywhere, the two disagree
    ("1", str(128 * 1024 * 1024)),
    ("32", str(1024 * 1024)),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/determinism.json"
    base = get_spark("determinism-scan")
    reg = Q.queries()
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        missing = only - set(reg)
        if missing:
            print(f"unknown names: {sorted(missing)}")
            return 1
        reg = {n: f for n, f in reg.items() if n in only}

    sessions = []
    for parts, split in LAYOUTS:
        s = base.newSession()
        s.conf.set("spark.sql.shuffle.partitions", parts)
        s.conf.set("spark.sql.files.maxPartitionBytes", split)
        sessions.append(s)

    results: dict[str, dict] = {}
    fails = 0
    for name, fn in reg.items():
        rec: dict = {"stable": None, "err": None}
        try:
            outs = [_canon(fn(s, sf_dir).toPandas()) for s in sessions]
            rec["stable"] = bool(outs[0].equals(outs[1]))
            if not rec["stable"]:
                diff = outs[0].compare(outs[1])
                rec["err"] = f"diff rows={len(diff)} cols={list(diff.columns)[:6]}"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        ok = rec["stable"] is True
        if not ok and name in EXPECTED_UNSTABLE:
            rec["expected"] = True
            ok = True
            tag = "UNSTABLE-EXPECTED"
        else:
            tag = "OK" if ok else "UNSTABLE " + str(rec)[:200]
        if not ok:
            fails += 1
        print(f"{name}: {tag}", flush=True)
        results[name] = rec
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(results)} queries, {fails} unstable -> {out_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
