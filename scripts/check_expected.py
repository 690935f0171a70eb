#!/usr/bin/env python
"""Determinism audit for the expected-output oracles: re-run every
query in EXPECTED_ORACLE_QUERIES under a deliberately different
execution geometry (core count, shuffle partitions) and compare
value-for-value against the committed parquet. A diff means the query
is NOT partitioning-deterministic and must go back to rows-only.

Usage: SPARK_GRAFT_CPUS=7 python scripts/check_expected.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402
from scripts.gen_expected import EXPECTED_ORACLE_QUERIES, REPO  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Shared canonicalizer for both audit scripts: arrays stringify as
    lists; str AND bytes stay scalar (bytes would otherwise become a
    byte-int list in one script and a b'..' repr in the other)."""
    def _scalar(x):
        return x.item() if hasattr(x, "item") else x

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: str([_scalar(x) for x in v])
            if hasattr(v, "__len__")
            and not isinstance(v, (str, bytes, bytearray))
            else str(bytes(v)) if isinstance(v, bytearray)
            else str(_scalar(v)))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    spark = get_spark("check-expected")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    reg = Q.queries()
    failures = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        tag = os.path.basename(sf_dir)
        for name in EXPECTED_ORACLE_QUERIES:
            path = os.path.join(REPO, "expected", tag, f"{name}.parquet")
            want = _canon(pd.read_parquet(path))
            got = _canon(reg[name](spark, sf_dir).toPandas())
            ok = want.equals(got)
            print(f"{tag}/{name}: {'OK' if ok else 'DIFF'}")
            if not ok:
                failures += 1
                merged = want.compare(got) if want.shape == got.shape else None
                print(f"  shapes {want.shape} vs {got.shape}")
                if merged is not None and len(merged):
                    print(merged.head(5))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
