"""Property-based invariants (hypothesis) — the structural laws that
must hold for ANY input, not just the test corpus."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parking_bigdata_spark.operators import features, profile

SLOW = dict(deadline=None, max_examples=12,
            suppress_health_check=[HealthCheck.function_scoped_fixture,
                                   HealthCheck.too_slow])


@given(vals=st.lists(st.floats(min_value=-1e4, max_value=1e4,
                               allow_nan=False), min_size=1, max_size=40))
@settings(**SLOW)
def test_histogram_partitions_all_rows(spark, vals):
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    hist = profile.histogram(df, "x", lo=-1e4, width=1000.0, n_buckets=21)
    rows = hist.collect()
    assert sum(r["n"] for r in rows) == len(vals)   # every row lands in a bucket
    assert all(0 <= r["bucket"] <= 20 for r in rows)  # clamped


@given(vals=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                               st.integers(0, 100)),
                     min_size=1, max_size=40))
@settings(**SLOW)
def test_pivot_preserves_total(spark, vals):
    df = spark.createDataFrame(pd.DataFrame(vals, columns=["k", "v"]))
    pv = features.pivot_wider(df, "k", "k", "v", ["a", "b", "c"],
                              agg="sum", prefix="c_")
    total = pv.select(
        F.sum(F.col("c_a") + F.col("c_b") + F.col("c_c")).alias("s")
    ).collect()[0]["s"]
    assert total == sum(v for _, v in vals)  # pivot never loses mass


@given(vals=st.lists(st.floats(min_value=-1e3, max_value=1e3,
                               allow_nan=False), min_size=2, max_size=30),
       lo=st.floats(min_value=-100, max_value=0),
       hi=st.floats(min_value=1, max_value=100))
@settings(**SLOW)
def test_bin_clamp_bounds(spark, vals, lo, hi):
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    out = features.bin_clamp(df, "x", "b", scale=0, lo=lo, hi=hi).collect()
    assert all(lo <= r["b"] <= hi for r in out)
