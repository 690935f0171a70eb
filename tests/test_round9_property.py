"""Randomized adversarial checks for the 7 remaining bound-as-oracle
twin contracts (VERDICT r08 #2 — extends tests/test_round8_property.py,
which drives mad + trimmed): winsorized, fences, quantile summary,
rfm, funnel, median-CI and catalog each get hypothesis-generated
tie-heavy / tiny / degenerate frames with an independent pure-Python
exact side. Every example writes real parquet and runs the REGISTERED
query end-to-end, so probe floors, GK passes, exact bracket-refine,
audit joins and outward rounding are all under test. derandomized +
bounded examples keep CI deterministic and fast.
"""

from __future__ import annotations

import datetime as dt
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
    """HALF_UP 4-dp round matching Spark's F.round (see
    test_round8_property._r4)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def _pcont(values: list[float], p: float) -> float:
    """SQL-standard interpolated percentile_cont."""
    v = sorted(values)
    pos = p * (len(v) - 1)
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    return v[lo] + (v[hi] - v[lo]) * (pos - lo)


# tie-heavy value pool (exactly-representable doubles, 2-dp money)
_VALS = st.sampled_from([10.0, 10.0, 20.0, 20.0, 20.0, 35.5, 50.0,
                         99.25, 1000.0])
_GROUP = st.lists(_VALS, min_size=1, max_size=20)


def _write_lineitem(d: str, vals, flags) -> None:
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


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_GROUP, r=_GROUP)
# n=1 group: stddev_samp undefined -> NULL; and an all-tied group
# (p01 == p99, zero clamps)
@example(a=[35.5], r=[20.0] * 9)
def test_winsorized_twin_random_tiny_groups(spark, tmp_path_factory,
                                            a, r):
    d = str(tmp_path_factory.mktemp("prop_w"))
    _write_lineitem(d, a + r, ["A"] * len(a) + ["R"] * len(r))
    rows = {row["l_returnflag"]: row
            for row in Q.queries()["winsorized_approx_price_stats"](
                spark, d).collect()}
    for flag, vs in {"A": a, "R": r}.items():
        row = rows[flag]
        p01, p99 = _pcont(vs, 0.01), _pcont(vs, 0.99)
        cl = [min(max(x, p01), p99) for x in vs]
        m = sum(cl) / len(cl)
        sd = (math.sqrt(sum((x - m) ** 2 for x in cl) / (len(cl) - 1))
              if len(cl) > 1 else None)
        assert row["n"] == len(vs), (flag, vs)
        assert row["p01_exact"] == _r4(p01), (flag, vs)
        assert row["p99_exact"] == _r4(p99), (flag, vs)
        assert row["winsorized_mean_exact"] == _r4(m), (flag, vs)
        if sd is None:
            assert row["winsorized_sd_exact"] is None, (flag, vs)
        else:
            # Spark's moment-based stddev vs the two-pass formula can
            # differ in the last ulp: allow one 4-dp quantum
            assert abs(row["winsorized_sd_exact"] - _r4(sd)) \
                <= 1.0001e-4, (flag, vs)
        assert row["n_clamped_exact"] == \
            sum(1 for x in vs if x < p01 or x > p99), (flag, vs)
        assert row["p01_in_bracket"] is True, (flag, vs)
        assert row["p99_in_bracket"] is True, (flag, vs)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(b=_GROUP, m=_GROUP)
# one-customer segment + an all-tied segment (IQR = 0: fences collapse
# onto the point, outliers = values != the tie)
@example(b=[99.25], m=[20.0] * 7)
def test_outlier_fences_twin_random_segments(spark, tmp_path_factory,
                                             b, m):
    d = str(tmp_path_factory.mktemp("prop_f"))
    vals = b + m
    segs = ["BUILDING"] * len(b) + ["MACHINERY"] * len(m)
    n = len(vals)
    pd.DataFrame({
        "c_custkey": range(1, n + 1),
        "c_name": [f"Customer#{i}" for i in range(1, n + 1)],
        "c_nationkey": [i % 3 for i in range(n)],
        "c_acctbal": vals,
        "c_mktsegment": segs,
    }).to_parquet(os.path.join(d, "customer.parquet"), index=False)
    rows = {row["c_mktsegment"]: row
            for row in Q.queries()["outlier_fences_approx"](
                spark, d).collect()}
    for seg, vs in {"BUILDING": b, "MACHINERY": m}.items():
        row = rows[seg]
        q1, q3 = _pcont(vs, 0.25), _pcont(vs, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert row["q1_exact"] == _r4(q1), (seg, vs)
        assert row["q3_exact"] == _r4(q3), (seg, vs)
        assert row["fence_lo_exact"] == _r4(lo), (seg, vs)
        assert row["fence_hi_exact"] == _r4(hi), (seg, vs)
        assert row["n_outliers_exact"] == \
            sum(1 for x in vs if x < lo or x > hi), (seg, vs)
        assert row["q1_in_bracket"] is True, (seg, vs)
        assert row["q3_in_bracket"] is True, (seg, vs)


_DATES = [dt.date(2024, 1, 5), dt.date(2024, 1, 20), dt.date(2024, 2, 2),
          dt.date(2024, 3, 1)]
_ORDER = st.tuples(st.integers(1, 3),              # custkey
                   _VALS,                           # totalprice
                   st.sampled_from(range(4)),       # date index
                   st.sampled_from(["1-URGENT", "5-LOW"]))
_ORDERS = st.lists(_ORDER, min_size=1, max_size=16)


@settings(max_examples=4, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=_ORDERS)
# single order: n=1 ranks clamp to [1, 1]; one customer, one metric
# value per R/F/M — every quartile equals it
@example(orders=[(2, 35.5, 1, "5-LOW")])
def test_orders_twins_random_frames(spark, tmp_path_factory, orders):
    """quantile_summary + median_ci + rfm on ONE generated orders
    frame (shared parquet, three registered twins)."""
    d = str(tmp_path_factory.mktemp("prop_o"))
    n = len(orders)
    pd.DataFrame({
        "o_orderkey": range(1, n + 1),
        "o_custkey": [o[0] for o in orders],
        "o_orderstatus": ["F"] * n,
        "o_totalprice": [o[1] for o in orders],
        "o_orderdate": [_DATES[o[2]] for o in orders],
        "o_orderpriority": [o[3] for o in orders],
    }).to_parquet(os.path.join(d, "orders.parquet"), index=False)
    reg = Q.queries()

    # --- quantile_summary_approx -------------------------------------
    rows = {row["o_orderpriority"]: row
            for row in reg["quantile_summary_approx"](spark, d).collect()}
    by_prio = {}
    for o in orders:
        by_prio.setdefault(o[3], []).append(o[1])
    assert set(rows) == set(by_prio)
    for prio, vs in by_prio.items():
        row = rows[prio]
        for name, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75),
                        ("p95", 0.95)):
            assert row[f"{name}_exact"] == _r4(_pcont(vs, p)), (prio, vs)
            assert row[f"{name}_in_bracket"] is True, (prio, vs)
        assert row["lo"] == _r4(min(vs)) and row["hi"] == _r4(max(vs))

    # --- median_ci_approx_order_value --------------------------------
    row = reg["median_ci_approx_order_value"](spark, d).collect()[0]
    v = sorted(o[1] for o in orders)
    z = 1.959964
    lo = max(int(math.floor(n / 2.0 - z * math.sqrt(n) / 2.0)), 1)
    hi = min(int(math.ceil(1 + n / 2.0 + z * math.sqrt(n) / 2.0)), n)
    med = (v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]) / 2.0
    assert row["n"] == n
    assert row["rank_lo"] == lo and row["rank_hi"] == hi
    assert row["median_exact"] == _r4(med), v
    assert row["ci_lo_exact"] == _r4(v[lo - 1]), v
    assert row["ci_hi_exact"] == _r4(v[hi - 1]), v
    assert row["approx_median_in_ci"] is True
    assert row["approx_ci_brackets_median"] is True

    # --- rfm_bounds_approx -------------------------------------------
    rows = {row["metric"]: row
            for row in reg["rfm_bounds_approx"](spark, d).collect()}
    ref_date = max(_DATES[o[2]] for o in orders)
    per_cust: dict[int, list] = {}
    for o in orders:
        per_cust.setdefault(o[0], []).append(o)
    metrics = {"rec": [], "freq": [], "mon": []}
    for os_ in per_cust.values():
        metrics["rec"].append(
            float((ref_date - max(_DATES[o[2]] for o in os_)).days))
        metrics["freq"].append(float(len(os_)))
        metrics["mon"].append(float(sum(Decimal(repr(o[1]))
                                        for o in os_)))
    assert set(rows) == {"rec", "freq", "mon"}
    for metric, vs in metrics.items():
        row = rows[metric]
        for name, p in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
            assert row[f"{name}_exact"] == _r4(_pcont(vs, p)), \
                (metric, vs)
            assert row[f"{name}_in_bracket"] is True, (metric, vs)


_TS = [dt.datetime(2024, 1, 1, 9, 0, 0), dt.datetime(2024, 1, 1, 9, 30, 0),
       dt.datetime(2024, 1, 1, 10, 0, 0), dt.datetime(2024, 1, 1, 12, 0, 0),
       dt.datetime(2024, 1, 1, 18, 0, 0)]
_EVENT = st.tuples(st.integers(1, 3),                  # user_id
                   st.sampled_from(["view", "click", "purchase"]),
                   st.sampled_from(range(5)))          # ts index
_EVENTS = st.lists(_EVENT, min_size=1, max_size=14)


def _funnel_expected(events):
    """Pure-Python strict view->click->purchase funnel."""
    lats = []
    users = {}
    for u, ty, ti in events:
        users.setdefault(u, []).append((ty, _TS[ti]))
    for evs in users.values():
        tv = min((t for ty, t in evs if ty == "view"), default=None)
        tc = (min((t for ty, t in evs
                   if ty == "click" and t >= tv), default=None)
              if tv else None)
        tp = (min((t for ty, t in evs
                   if ty == "purchase" and t >= tc), default=None)
              if tc else None)
        if tp is not None:
            lats.append((tp - tv).total_seconds())
    return lats


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_EVENTS)
# zero conversions (no purchase after a click) -> 0 rows; and a
# same-instant funnel (view/click/purchase all at one ts: latency 0)
@example(events=[(1, "view", 0), (1, "click", 1)])
@example(events=[(1, "view", 2), (1, "click", 2), (1, "purchase", 2)])
def test_funnel_twin_random_events(spark, tmp_path_factory, events):
    d = str(tmp_path_factory.mktemp("prop_e"))
    n = len(events)
    pd.DataFrame({
        "event_id": range(1, n + 1),
        "ts": pd.to_datetime([_TS[e[2]] for e in events]),
        "user_id": [e[0] for e in events],
        "event_type": [e[1] for e in events],
        "value": [1.0] * n,
    }).to_parquet(os.path.join(d, "events.parquet"), index=False)
    out = Q.queries()["funnel_latency_approx_quantiles"](
        spark, d).collect()
    lats = _funnel_expected(events)
    if not lats:
        assert out == [], events
        return
    row = out[0]
    assert row["n_converted"] == len(lats), events
    assert row["p50_exact"] == _r4(_pcont(lats, 0.5)), (events, lats)
    assert row["p90_exact"] == _r4(_pcont(lats, 0.9)), (events, lats)
    assert row["p50_in_bracket"] is True, events
    assert row["p90_in_bracket"] is True, events


@settings(max_examples=2, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2 ** 16))
@example(seed=7)
def test_catalog_twin_random_frames(spark, tmp_path_factory, seed):
    """catalog_profile_approx over ALL 10 tables with random tiny
    frames + sprinkled NULLs: exact n_rows / n_nulls / distinct audit
    columns vs pure Python, in-band boolean TRUE everywhere (at tiny
    cardinality the rsd-0.01 HLL is exact)."""
    import random
    rng = random.Random(seed)
    d = str(tmp_path_factory.mktemp("prop_c"))

    def col(vals, n, nullable):
        out = [rng.choice(vals) for _ in range(n)]
        if nullable and n > 1:
            for i in rng.sample(range(n), rng.randint(0, n // 2)):
                out[i] = None
        return out

    nr = {t: rng.randint(1, 6) for t in
          ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings")}
    frames = {
        "region": pd.DataFrame({
            "r_regionkey": pd.array(col([0, 1, 2], nr["region"], True),
                                    dtype="Int32"),
            "r_name": col(["ASIA", "EUROPE"], nr["region"], True)}),
        "nation": pd.DataFrame({
            "n_nationkey": pd.array(col([0, 1], nr["nation"], True),
                                    dtype="Int32"),
            "n_name": col(["JAPAN", "FRANCE"], nr["nation"], True),
            "n_regionkey": pd.array(col([0, 1], nr["nation"], True),
                                    dtype="Int32")}),
        "customer": pd.DataFrame({
            "c_custkey": pd.array(col([1, 2, 3], nr["customer"], True),
                                  dtype="Int64"),
            "c_name": col(["a", "b"], nr["customer"], True),
            "c_nationkey": pd.array(col([0, 1], nr["customer"], True),
                                    dtype="Int32"),
            "c_acctbal": col([10.0, 20.5], nr["customer"], True),
            "c_mktsegment": col(["BUILDING"], nr["customer"], True)}),
        "supplier": pd.DataFrame({
            "s_suppkey": pd.array(col([1, 2], nr["supplier"], True),
                                  dtype="Int64"),
            "s_name": col(["s1", "s2"], nr["supplier"], True),
            "s_nationkey": pd.array(col([0, 1], nr["supplier"], True),
                                    dtype="Int32"),
            "s_acctbal": col([5.0, 7.25], nr["supplier"], True)}),
        "part": pd.DataFrame({
            "p_partkey": pd.array(col([1, 2], nr["part"], True),
                                  dtype="Int64"),
            "p_name": col(["pa", "pb"], nr["part"], True),
            "p_brand": col(["B1", "B2"], nr["part"], True),
            "p_type": col(["T1"], nr["part"], True),
            "p_size": pd.array(col([1, 5], nr["part"], True),
                               dtype="Int32"),
            "p_retailprice": col([9.99, 19.99], nr["part"], True)}),
        "orders": pd.DataFrame({
            "o_orderkey": pd.array(range(1, nr["orders"] + 1),
                                   dtype="Int64"),
            "o_custkey": pd.array(col([1, 2], nr["orders"], True),
                                  dtype="Int64"),
            "o_orderstatus": col(["F", "O"], nr["orders"], True),
            "o_totalprice": col([100.0, 250.5], nr["orders"], True),
            "o_orderdate": pd.to_datetime(
                col(["2024-01-01", "2024-02-01"], nr["orders"], True)),
            "o_orderpriority": col(["1-URGENT"], nr["orders"], True)}),
        "lineitem": pd.DataFrame({
            "l_orderkey": pd.array(col([1, 2], nr["lineitem"], True),
                                   dtype="Int64"),
            "l_partkey": pd.array(col([1], nr["lineitem"], True),
                                  dtype="Int64"),
            "l_suppkey": pd.array(col([1], nr["lineitem"], True),
                                  dtype="Int64"),
            "l_linenumber": pd.array(col([1, 2], nr["lineitem"], True),
                                     dtype="Int32"),
            "l_quantity": col([1.0, 2.0], nr["lineitem"], True),
            "l_extendedprice": col([10.0], nr["lineitem"], True),
            "l_discount": col([0.0, 0.05], nr["lineitem"], True),
            "l_tax": col([0.0], nr["lineitem"], True),
            "l_returnflag": col(["A", "R"], nr["lineitem"], True),
            "l_linestatus": col(["F"], nr["lineitem"], True),
            "l_shipdate": pd.to_datetime(
                col(["2024-01-02", "2024-01-09"], nr["lineitem"],
                    True))}),
        "events": pd.DataFrame({
            "event_id": pd.array(range(1, nr["events"] + 1),
                                 dtype="Int64"),
            "ts": pd.to_datetime(
                col(["2024-01-01 09:00", "2024-01-01 10:00"],
                    nr["events"], True)),
            "user_id": pd.array(col([1, 2], nr["events"], True),
                                dtype="Int64"),
            "event_type": col(["view", "click"], nr["events"], True),
            "value": col([1.0, 2.0], nr["events"], True)}),
        "documents": pd.DataFrame({
            "doc_id": pd.array(range(1, nr["documents"] + 1),
                               dtype="Int64"),
            "text": col(["hello world", "lorem ipsum"],
                        nr["documents"], True),
            "lang": col(["en", "fr"], nr["documents"], True),
            "source": col(["web"], nr["documents"], True),
            "n_chars": pd.array(col([11, 20], nr["documents"], True),
                                dtype="Int64")}),
        "embeddings": pd.DataFrame({
            "vec_id": pd.array(range(1, nr["embeddings"] + 1),
                               dtype="Int64"),
            "embedding": [[0.1, 0.2]] * nr["embeddings"],
            "label": pd.array(col([0, 1], nr["embeddings"], True),
                              dtype="Int32")}),
    }
    for t, df in frames.items():
        df.to_parquet(os.path.join(d, f"{t}.parquet"), index=False)

    out = Q.queries()["catalog_profile_approx"](spark, d).collect()
    by_tc = {(r["table_name"], r["column_name"]): r for r in out}
    from parking_bigdata_spark.queries.a_stats2 import _CATALOG_COLUMNS
    for t, cols in _CATALOG_COLUMNS.items():
        for c in cols:
            row = by_tc[(t, c)]
            series = frames[t][c]
            nn = int(series.isna().sum())
            nd = int(series.dropna().nunique())
            assert row["n_rows"] == len(series), (t, c)
            assert row["n_nulls"] == nn, (t, c)
            assert row["n_distinct_exact"] == nd, (t, c)
            assert row["hll_within_5pct"] is True, (t, c)
