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


@given(base=st.text(alphabet="abcdef ", min_size=30, max_size=60),
       prefix=st.text(alphabet="xyz ", min_size=0, max_size=20),
       suffix=st.text(alphabet="uvw ", min_size=0, max_size=20))
@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_winnowing_guarantee_shared_substring(spark, base, prefix, suffix):
    """Schleimer's winnowing guarantee: two documents sharing a
    substring of length >= k + window - 1 MUST share at least one
    fingerprint (here the shared block is far longer than k+w-1)."""
    from parking_bigdata_spark.operators import text as text_ops
    d1, d2 = base, prefix + base + suffix
    df = spark.createDataFrame([(1, d1), (2, d2)],
                               "doc_id long, text string")
    out = {r["doc_id"]: set(r["winnow_fps"]) for r in
           text_ops.winnow_fingerprints(df, k=8, window=4).collect()}
    assert out[1] & out[2], "shared block produced no common fingerprint"


@given(n_shared=st.integers(min_value=0, max_value=20))
@settings(deadline=None, max_examples=6,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_minhash_estimate_tracks_jaccard(spark, n_shared):
    """MinHash property: the banded-signature estimate of Jaccard
    similarity must track the exact value — identical sets agree on
    every permutation; disjoint sets agree on (almost) none; partial
    overlap lands in between, monotonically."""
    from parking_bigdata_spark.operators import dedup

    words_a = [f"tok{i}" for i in range(20)]
    words_b = [f"tok{i}" for i in range(20 - n_shared, 40 - n_shared)]
    # build texts whose 3-gram sets overlap in proportion to n_shared
    df = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))],
        "doc_id long, text string")
    sig = dedup.minhash_signatures(df, n_perm=32, ngram=3)
    rows = {r["doc_id"]: [r[f"mh{i}"] for i in range(32)]
            for r in sig.collect()}
    agree = sum(a == b for a, b in zip(rows[1], rows[2])) / 32.0

    g = dedup.word_ngrams(df, n=3)
    gs = {r["doc_id"]: set(r["grams"]) for r in g.collect()}
    inter = len(gs[1] & gs[2])
    union = len(gs[1] | gs[2])
    exact = inter / union if union else 1.0
    assert abs(agree - exact) <= 0.35  # 32 perms: ±1.96/sqrt(32) ≈ 0.35


def test_grouped_quantiles_matches_exact_percentile(spark):
    """Adversarial check of the bracket-refine quantile machinery:
    heavy ties, skewed group sizes, and both code paths — accuracy=16
    forces wide brackets (real refinement work), accuracy=10000 forces
    the small-group all-candidates path."""
    import numpy as np
    import pyspark.sql.functions as F

    from parking_bigdata_spark.operators.stats import grouped_quantiles

    rng = np.random.default_rng(7)
    rows = []
    for g, n in [("a", 7), ("b", 50), ("c", 333), ("d", 1000)]:
        # half the values drawn from a tiny tie-heavy set, half continuous
        ties = rng.choice([1.0, 2.5, 2.5, 99.0], size=n // 2)
        cont = rng.uniform(-50, 50, size=n - n // 2).round(2)
        rows += [(g, float(v)) for v in np.concatenate([ties, cont])]
    df = spark.createDataFrame(rows, ["g", "v"])

    fr = [0.05, 0.25, 0.5, 0.75, 0.95]
    names = [f"q{int(p*100)}" for p in fr]
    exact = {r["g"]: [r[n] for n in names]
             for r in df.groupBy("g").agg(
                 *[F.percentile("v", F.lit(p)).alias(n)
                   for p, n in zip(fr, names)]).collect()}
    for accuracy in (16, 10000):
        got = {r["g"]: [r[n] for n in names]
               for r in grouped_quantiles(df, "g", "v", fr, names,
                                          accuracy=accuracy).collect()}
        assert set(got) == set(exact)
        for g in exact:
            for a, b in zip(got[g], exact[g]):
                assert abs(a - b) < 1e-9, (accuracy, g, a, b)


def test_grouped_trimmed_mean_exact(spark):
    """Rank-trim parity vs numpy across tie-heavy, tiny, and large
    groups, on both the bracket-refine and all-candidates paths."""
    import numpy as np

    from parking_bigdata_spark.operators.stats import grouped_trimmed_mean

    rng = np.random.default_rng(11)
    data = {
        "tiny": [5.0],                          # k=0 → plain mean
        "nine": list(range(9)),                 # k=0 boundary (n<10)
        "ties": [1.0] * 40 + [2.0] * 30 + [9.0] * 30,  # cutoff inside tie blocks
        "big": rng.uniform(-100, 100, 2500).round(3).tolist(),
        "const": [7.0] * 100,
    }
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    for accuracy in (64, 10000):
        got = {r["g"]: (r["tm"], r["n"])
               for r in grouped_trimmed_mean(df, "g", "v", trim=0.1,
                                             alias="tm",
                                             accuracy=accuracy).collect()}
        for g, vs in data.items():
            a = np.sort(np.asarray(vs))
            k = int(len(a) * 0.1)
            exp = float(a[k: len(a) - k].mean())
            assert got[g][1] == len(vs)
            assert abs(got[g][0] - exp) < 1e-9, (accuracy, g, got[g][0], exp)


def test_trimmed_mean_registered_query_has_no_python(spark, sf_dir):
    # the registered query must be pure JVM; the pandas-UDF twin is the
    # only sanctioned Python form and must agree with it
    from parking_bigdata_spark import queries as Q
    from parking_bigdata_spark.plans import audit

    df = Q.queries()["trimmed_mean_price"](spark, sf_dir)
    a = audit(df)
    assert a.python_evals == 0 and a.arrow_evals == 0
    got = {r["l_returnflag"]: (r["trimmed_mean_price"], r["n"])
           for r in df.collect()}
    twin = {r["l_returnflag"]: (r["trimmed_mean_price"], r["n"])
            for r in Q.trimmed_mean_price_pandas(spark, sf_dir).collect()}
    assert got == twin
