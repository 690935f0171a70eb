"""Round-11 repro (VERDICT r10 #5): can a deterministic
repartitionByRange layout replace the eager localCheckpoint pin in the
__pid offset-join machinery (tie_avg_ranks / range_cumsum)?

Answer: NO — documented negative result. Variants:
  A  current code (eager pin)                  -> 0 failures
  B  pin removed, implicit partition count     -> ad_ksample_priority
                                                  wrong 4/4 at sf0.1
  C  pin removed, EXPLICIT numPartitions on
     every repartitionByRange (disables AQE
     partition coalescing for those exchanges) -> STILL wrong 4/4
  C+ variant C with AQE disabled entirely      -> STILL wrong 3/3

So the round-5 incoherence is not only the AQE re-read: ANY
re-evaluation of an un-materialized range exchange can reassign rows
(the range partitioner samples its boundaries per evaluation), and
spark_partition_id() is only meaningful within one physical
evaluation. The eager pin — one materialized layout for all
consumers — is load-bearing; the hypothesized
repartitionByRange+explicit-N replacement is refuted.

Usage: python scripts/repro_pid_pin.py  (runs at sf0.1, ~2 min)
"""

import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from parking_bigdata_spark.session import get_spark
from parking_bigdata_spark.operators import stats
from parking_bigdata_spark import queries as Q
from scripts.check_expected import _canon

spark = get_spark("exp")
sf = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf}/region.parquet").count()
sc = spark.sparkContext
def njobs(): return int(sc._jsc.sc().dagScheduler().nextJobId())

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

NAMES = ["ad_ksample_priority", "mannwhitney_order_value",
         "wilcoxon_signed_rank", "kaplan_meier_retention",
         "spearman_qty_price", "kendall_tau_qty_discount"]
reg, osql = Q.queries(), Q.oracle_sql()
oracle = {}
for n in NAMES:
    oracle[n] = _canon(con.execute(osql[n]).df())

orig_pin = stats.pin
orig_rbr = DataFrame.repartitionByRange

def no_pin(df):
    return df

def explicit_rbr(self, *args):
    if args and isinstance(args[0], int):
        return orig_rbr(self, *args)
    n = int(self.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return orig_rbr(self, n, *args)

def run_variant(tag, pin_fn, rbr_fn, reps):
    stats.pin = pin_fn
    DataFrame.repartitionByRange = rbr_fn
    fails, walls, jobs = {}, {}, {}
    try:
        for rep in range(reps):
            for n in NAMES:
                j0 = njobs(); t0 = time.perf_counter()
                got = _canon(reg[n](spark, sf).toPandas())
                w = time.perf_counter() - t0
                walls.setdefault(n, []).append(w)
                jobs[n] = njobs() - j0
                if not got.equals(oracle[n]):
                    fails[n] = fails.get(n, 0) + 1
    finally:
        stats.pin = orig_pin
        DataFrame.repartitionByRange = orig_rbr
    tot = sum(min(v) for v in walls.values())
    print(f"{tag:28} fails={fails or 0} total_best={tot:6.3f} "
          f"jobs={ {n: jobs[n] for n in NAMES} }", flush=True)

run_variant("A pin (current)", orig_pin, orig_rbr, 3)
run_variant("B no-pin implicit-N", no_pin, orig_rbr, 4)
run_variant("C no-pin explicit-N", no_pin, explicit_rbr, 4)
run_variant("A pin (again)", orig_pin, orig_rbr, 2)
