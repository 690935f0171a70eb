#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to
plans/<round>/<name>_<tag>.txt (optimization-round evidence files;
round defaults to r11, override with SPARK_GRAFT_PLANS_DIR).

Usage: python scripts/dump_plans.py <tag> name1,name2,... [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    reg = Q.queries()
    for name in names:
        df = reg[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('BatchEvalPython')} BatchEvalPython -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
