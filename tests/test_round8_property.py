"""Randomized adversarial check of the r08 bound-as-oracle theorems
(the hypothesis companion of tests/test_round8.py's fixed-SF checks):
on ARBITRARY tiny grouped frames — tie-heavy values, group sizes 1..24,
the regime where the r07 sub-rank probe collapse lived — the registered
mad/trimmed twins' containment booleans must be TRUE and the exact
audit columns must equal an independent pure-Python percentile_cont.

Each example writes a real lineitem parquet and runs the REGISTERED
queries end-to-end (not the internals), so the whole chain — probe
floor, clamp, GK pass, exact bracket-refine, audit join, outward
rounding — is under test. derandomized + bounded examples keep CI
deterministic and fast.
"""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

try:
    from hypothesis import (HealthCheck, example, given, settings,
                            strategies as st)
except ImportError:  # pragma: no cover — hypothesis is baked in here
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from parking_bigdata_spark import queries as Q


def _r4(x: float) -> float:
    """HALF_UP 4-dp round matching Spark's F.round (BigDecimal.valueOf
    on the double's shortest repr, setScale HALF_UP) — Python's built-in
    round() is banker's and disagrees on exact half-ticks (e.g.
    21.15625 -> 21.1562 vs Spark's 21.1563; code-review r08)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def _percentile_cont(values: list[float], p: float) -> float:
    """The SQL-standard interpolated percentile both engines implement."""
    v = sorted(values)
    if not v:
        return math.nan
    pos = p * (len(v) - 1)
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    frac = pos - lo
    return v[lo] + (v[hi] - v[lo]) * frac


# tie-heavy value pool: a handful of magnitudes, forced collisions
_VALS = st.sampled_from([10.0, 10.0, 20.0, 20.0, 20.0, 35.5, 50.0,
                         99.25, 1000.0])
_GROUP = st.lists(_VALS, min_size=1, max_size=24)


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_GROUP, r=_GROUP)
# pinned adversarial cases (code-review r08): an EMPTY trimmed band
# (2 distinct values) and a trimmed mean landing exactly on a
# 4-dp half-tick (21.15625 — HALF_UP vs banker's rounding)
@example(a=[20.0, 10.0], r=[10.0] * 7 + [99.25, 1000.0])
def test_registered_twin_theorems_random_tiny_groups(spark, tmp_path_factory,
                                                     a, r):
    d = str(tmp_path_factory.mktemp("prop"))
    vals = a + r
    flags = ["A"] * len(a) + ["R"] * len(r)
    n = len(vals)
    pd.DataFrame({
        "l_orderkey": range(1, n + 1),
        "l_linenumber": [1] * n,
        "l_quantity": [1.0] * n,
        "l_extendedprice": vals,
        "l_discount": [0.0] * n,
        "l_tax": [0.0] * n,
        "l_returnflag": flags,
        "l_linestatus": ["F"] * n,
        "l_shipdate": pd.to_datetime(["2024-01-02"] * n).date,
        "l_partkey": range(1, n + 1),
        "l_suppkey": [1] * n,
    }).to_parquet(os.path.join(d, "lineitem.parquet"), index=False)
    groups = {"A": a, "R": r}

    mad = {row["l_returnflag"]: row
           for row in Q.queries()["mad_approx_price_by_flag"](
               spark, d).collect()}
    assert set(mad) == set(groups)
    for flag, vs in groups.items():
        row = mad[flag]
        med = _percentile_cont(vs, 0.5)
        dev_med = _percentile_cont([abs(x - med) for x in vs], 0.5)
        assert row["median_price_exact"] == _r4(med), (flag, vs)
        assert row["mad_exact"] == _r4(dev_med), (flag, vs)
        assert row["med_in_bracket"] is True, (flag, vs)
        assert row["mad_in_bracket"] is True, (flag, vs)

    tm = {row["l_returnflag"]: row
          for row in Q.queries()["trimmed_mean_approx_price"](
              spark, d).collect()}
    for flag, vs in groups.items():
        row = tm[flag]
        c10 = _percentile_cont(vs, 0.1)
        c90 = _percentile_cont(vs, 0.9)
        inside = [x for x in vs if c10 <= x <= c90]
        assert row["n"] == len(vs), (flag, vs)
        assert row["c10_exact"] == _r4(c10), (flag, vs)
        assert row["c90_exact"] == _r4(c90), (flag, vs)
        # a 2-distinct-value group can have an EMPTY trimmed band
        # (c10 > min, c90 < max) — Spark's avg over zero WHEN-matches
        # is NULL, and the pure-Python side must expect exactly that
        # instead of dividing by zero (code-review r08)
        exp_tm = _r4(sum(inside) / len(inside)) if inside else None
        assert row["trimmed_mean_exact"] == exp_tm, (flag, vs)
        assert row["c10_in_bracket"] is True, (flag, vs)
        assert row["c90_in_bracket"] is True, (flag, vs)
