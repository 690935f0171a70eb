#!/usr/bin/env python
"""Local mirror of the build driver's t2 correctness gate: run EVERY
registry query at sf0.01 against its DuckDB oracle (rows, columns,
sorted-value equality) and write a CORRECTNESS-shaped JSON. Use before
each round lands so the driver never sees a surprise.

Usage: python scripts/driver_gate_local.py [sf_dir] [out.json] [names]

``names`` (optional) is a comma-separated subset of registry keys —
gate only those (fast re-check after touching a query).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402
from scripts.check_expected import _canon  # noqa: E402 — ONE canonicalizer
                                           # for both audit scripts

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gate.json"
    spark = get_spark("driver-gate-local")
    if os.environ.get("SPARK_GRAFT_HOSTILE"):
        # foreign-session ritual: the build driver supplies its OWN
        # session — simulate the hostile variant (wrong timezone, odd
        # shuffle partitioning, nanos conf unset) for the whole gate
        spark = spark.newSession()
        spark.conf.set("spark.sql.session.timeZone",
                       "America/Los_Angeles")
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        try:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:  # noqa: BLE001 — conf may be absent already
            pass
        print("# HOSTILE session: America/Los_Angeles, 13 shuffle "
              "partitions, nanosAsLong unset", flush=True)
    reg, oracles = Q.queries(), Q.oracle_sql()
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        missing = only - set(reg)
        if missing:
            print(f"unknown names: {sorted(missing)}")
            return 1
        reg = {n: f for n, f in reg.items() if n in only}
    results: dict[str, dict] = {}
    fails = 0
    for name, fn in reg.items():
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            got = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(got)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                # expected-parquet oracles are per-SF: point the driver
                # default (sf0.01) at the SF under test
                sql = oracles[name].replace(
                    "/expected/sf0.01/",
                    f"/expected/{os.path.basename(sf_dir.rstrip('/'))}/")
                con = duckdb.connect()
                for t in TABLES:
                    tp = f"{sf_dir}/{t}.parquet"
                    # stress tables are Spark output DIRECTORIES of
                    # part files — DuckDB needs the glob form there
                    if os.path.isdir(tp):
                        tp = f"{tp}/*.parquet"
                    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                                f"'{tp}'")
                exp = con.execute(sql).df()
                rec["oracle_rows"] = len(exp)
                rec["rows_match"] = len(got) == len(exp)
                rec["schema_match"] = sorted(got.columns) == sorted(exp.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    rec["hash_match"] = _canon(got).equals(_canon(exp))
                else:
                    rec["hash_match"] = False
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        ok = rec["hash_match"] is True or rec["err"] == "no_oracle"
        if not ok:
            fails += 1
        print(f"{name}: {'OK' if ok else 'FAIL ' + str(rec)[:200]}",
              flush=True)
        results[name] = rec
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(results)} queries, {fails} failures -> {out_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
