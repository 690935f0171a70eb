"""Executor-loss recovery proof (VERDICT r06 #5): stats.pin upgrades
localCheckpoint → RELIABLE checkpoint when a checkpoint dir is set
(operators/stats.py) — r06 unit-tested the value parity of that switch
but never demonstrated the fault-tolerance claim itself. This test
runs a real multi-process `local-cluster[2,1,1024]`, pins a frame
through the reliable-checkpoint path, SIGKILLs one executor JVM, and
asserts the consuming aggregate still completes with exact values
(the checkpoint files, not executor-local blocks, serve the re-read).

The cluster runs in a SUBPROCESS: pytest's session fixture owns this
process's one-per-JVM SparkContext, and an in-process local-cluster
would collide with it. Skipped (not failed) where local-cluster
cannot start — e.g. no loopback worker spawn in a sandbox.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The in-cluster scenario. Prints exactly one of:
#   CLUSTER_UNAVAILABLE <why>   → the harness skips
#   RECOVERY_OK                 → pass
# anything else / nonzero exit  → fail
_SCRIPT = r"""
import glob, os, signal, subprocess, sys, time

sys.path.insert(0, sys.argv[1])
ckpt = sys.argv[2]

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

try:
    spark = (SparkSession.builder
             .master("local-cluster[2,1,1024]")
             .appName("recovery-test")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.executor.memory", "1g")
             .config("spark.network.timeout", "60s")
             .getOrCreate())
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    # wait for both executors to register (bounded)
    deadline = time.time() + 90
    while time.time() < deadline:
        execs = [str(e) for e in
                 sc._jsc.sc().statusTracker().getExecutorInfos()]
        if len(execs) >= 3:  # driver + 2 executors
            break
        time.sleep(1)
    else:
        print("CLUSTER_UNAVAILABLE executors never registered")
        sys.exit(0)
except Exception as exc:  # noqa: BLE001 — env cannot start a cluster
    print(f"CLUSTER_UNAVAILABLE {type(exc).__name__}: {exc}")
    sys.exit(0)

from parking_bigdata_spark.operators import stats

N = 200_000
df = (spark.range(0, N, 1, 8)
      .select((F.col("id") % 97).alias("g"),
              F.col("id").cast("double").alias("v")))
pinned = stats.pin(df)  # checkpoint dir is set => RELIABLE checkpoint

# the pin must have materialized reliable checkpoint files
files = glob.glob(os.path.join(ckpt, "**", "part-*"), recursive=True)
assert files, "reliable checkpoint wrote no files — pin took the wrong path"

# SIGKILL one executor JVM (not the driver). The backend class name is
# assembled at runtime so OUR OWN `python -c <script>` command line
# never contains the literal — pgrep -f would otherwise match this
# driver process and the kill would be suicide (observed: rc=-9).
pat = "CoarseGrained" + "ExecutorBackend"


# Only OUR cluster's executors are kill candidates: walk the ppid
# chain to this driver (a machine-wide pgrep could otherwise kill a
# concurrently-running foreign Spark job's executor — and leave our
# own cluster untouched, passing the test without exercising recovery).
def _is_descendant(pid: int) -> bool:
    me = os.getpid()
    for _ in range(32):
        if pid == me:
            return True
        try:
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            return False
        if pid <= 1:
            return False
    return False


try:
    out = subprocess.run(["pgrep", "-f", pat],
                         capture_output=True, text=True)
except FileNotFoundError:
    # a slim host without procps is an environment limitation, not a
    # recovery failure — take the documented skip path
    print("CLUSTER_UNAVAILABLE pgrep not installed")
    sys.exit(0)
pids = []
for p in out.stdout.split():
    p = int(p)
    if p == os.getpid():
        continue
    try:
        with open(f"/proc/{p}/cmdline", "rb") as fh:
            cmd = fh.read().decode(errors="replace").split("\x00")
    except OSError:
        continue
    if (cmd and "java" in os.path.basename(cmd[0])
            and any(pat in c for c in cmd) and _is_descendant(p)):
        pids.append(p)
assert len(pids) >= 2, f"expected 2 executor JVMs of THIS driver, saw {pids}"
os.kill(pids[0], signal.SIGKILL)
time.sleep(3)  # let the loss propagate

# the consuming aggregate must still complete, serving the dead
# executor's partitions from the checkpoint files — and exactly
row = (pinned.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("v").alias("s")).collect()[0])
assert row["n"] == N, row
assert row["s"] == float(N * (N - 1) // 2), row

# sanity: grouped path too (a shuffle over the recovered frame)
k = pinned.groupBy("g").count().count()
assert k == 97, k
print("RECOVERY_OK")
spark.stop()
"""


def test_reliable_pin_survives_executor_kill(tmp_path):
    # (subprocess.run carries its own 340 s timeout — no pytest-timeout
    # dependency needed)
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, _REPO, str(tmp_path / "ckpt")],
        capture_output=True, text=True, timeout=340, env=env,
        cwd=_REPO)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    marker = [ln for ln in proc.stdout.splitlines()
              if ln.startswith(("RECOVERY_OK", "CLUSTER_UNAVAILABLE"))]
    if marker and marker[-1].startswith("CLUSTER_UNAVAILABLE"):
        pytest.skip(marker[-1])
    assert proc.returncode == 0 and marker, (
        f"recovery scenario failed (rc={proc.returncode}):\n{tail}")


# The shuffle-refetch scenario (VERDICT r07 #5): kill an executor
# while a MULTI-STAGE rank-family query (stats.grouped_median — GK
# bracket pass → below-count pass → candidate window) is mid-flight,
# and assert the result still matches the healthy-cluster baseline
# exactly. This exercises shuffle-loss recovery (stage retry /
# refetch + standalone-worker executor respawn), not checkpointed-pin
# re-reads — the complement of the test above.
_SHUFFLE_SCRIPT = r"""
import os, signal, subprocess, sys, threading, time

sys.path.insert(0, sys.argv[1])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

try:
    spark = (SparkSession.builder
             .master("local-cluster[2,1,1024]")
             .appName("shuffle-recovery-test")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.executor.memory", "1g")
             .config("spark.network.timeout", "60s")
             .getOrCreate())
    sc = spark.sparkContext
    deadline = time.time() + 90
    while time.time() < deadline:
        execs = [str(e) for e in
                 sc._jsc.sc().statusTracker().getExecutorInfos()]
        if len(execs) >= 3:  # driver + 2 executors
            break
        time.sleep(1)
    else:
        print("CLUSTER_UNAVAILABLE executors never registered")
        sys.exit(0)
except Exception as exc:  # noqa: BLE001 — env cannot start a cluster
    print(f"CLUSTER_UNAVAILABLE {type(exc).__name__}: {exc}")
    sys.exit(0)

from parking_bigdata_spark.operators import stats

N = 4_000_000
df = (spark.range(0, N, 1, 16)
      .select((F.col("id") % 13).alias("g"),
              (F.col("id") % 100_003).cast("double").alias("v")))


def run_query():
    return sorted(
        (r["g"], round(r["med"], 4))
        for r in stats.grouped_median(df, "g", "v").collect())


# healthy-cluster baseline (also warms codegen so the killed run's
# wall-clock is execution, not compilation)
baseline = run_query()
assert len(baseline) == 13, baseline

# find OUR executors before the in-flight kill (see the sibling test
# for the assembled-literal + descendant-walk rationale)
pat = "CoarseGrained" + "ExecutorBackend"


def _is_descendant(pid: int) -> bool:
    me = os.getpid()
    for _ in range(32):
        if pid == me:
            return True
        try:
            with open(f"/proc/{pid}/stat") as fh:
                pid = int(fh.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            return False
        if pid <= 1:
            return False
    return False


def _executor_pids():
    try:
        out = subprocess.run(["pgrep", "-f", pat],
                             capture_output=True, text=True)
    except FileNotFoundError:
        return None
    pids = []
    for p in out.stdout.split():
        p = int(p)
        if p == os.getpid():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace").split("\x00")
        except OSError:
            continue
        if (cmd and "java" in os.path.basename(cmd[0])
                and any(pat in c for c in cmd) and _is_descendant(p)):
            pids.append(p)
    return pids

pids = _executor_pids()
if pids is None:
    print("CLUSTER_UNAVAILABLE pgrep not installed")
    sys.exit(0)
assert len(pids) >= 2, f"expected 2 executor JVMs of THIS driver, saw {pids}"

res = {}


def _target():
    t0 = time.time()
    try:
        res["rows"] = run_query()
    except Exception as exc:  # noqa: BLE001 — surfaced below
        res["err"] = f"{type(exc).__name__}: {exc}"
    res["done_at"] = time.time()


t = threading.Thread(target=_target)
t.start()
time.sleep(1.0)  # let the first stage get airborne
kill_at = time.time()
os.kill(pids[0], signal.SIGKILL)
t.join(timeout=240)
assert not t.is_alive(), "query hung after executor kill"
assert "err" not in res, f"query failed after executor kill: {res['err']}"
assert res["rows"] == baseline, "post-kill result diverged from baseline"
if res["done_at"] <= kill_at:
    # the query finished before the kill landed — recovery was never
    # exercised; report an honest inconclusive skip, not a pass
    print("CLUSTER_UNAVAILABLE query finished before the kill landed")
    sys.exit(0)
print("RECOVERY_OK")
spark.stop()
"""


def test_shuffle_query_survives_executor_kill(tmp_path):
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SHUFFLE_SCRIPT, _REPO],
        capture_output=True, text=True, timeout=520, env=env,
        cwd=_REPO)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    marker = [ln for ln in proc.stdout.splitlines()
              if ln.startswith(("RECOVERY_OK", "CLUSTER_UNAVAILABLE"))]
    if marker and marker[-1].startswith("CLUSTER_UNAVAILABLE"):
        pytest.skip(marker[-1])
    assert proc.returncode == 0 and marker, (
        f"shuffle-recovery scenario failed (rc={proc.returncode}):\n{tail}")
