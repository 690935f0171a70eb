"""Round-5 additions (VERDICT r04 next-round asks #2/#3): approx
scale twins for the rank-statistic family, each bound-checked against
its exact counterpart at TWO SFs — the A18gb/A142b discipline (the
five grid twins additionally carry full value-level DuckDB oracles;
the MAD sketch twin earns its rows-only oracle here)."""

from __future__ import annotations

import pytest

from parking_bigdata_spark import queries as Q

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SFS)
def test_spearman_approx_close_to_exact(spark, sf):
    """Spearman of the 256-bucket discretized pair converges to the
    exact rho; measured |delta| <= 1e-4 at both driver SFs."""
    exact = Q.spearman_qty_price(spark, sf).collect()[0]
    ap = Q.spearman_approx_qty_price(spark, sf).collect()[0]
    assert ap["n_rows"] == exact["n_rows"]
    assert abs(ap["spearman_rho_approx"] - exact["spearman_rho"]) < 0.005


@pytest.mark.parametrize("sf", SFS)
def test_roc_auc_approx_brackets_exact(spark, sf):
    """Cross-bucket (pos, neg) pairs are strictly ordered by
    construction, so [auc_lo, auc_hi] is a PROOF bracket for the exact
    AUC (modulo the 4-dp output rounding) — and it must be useful,
    not vacuous."""
    exact = Q.roc_auc_order_status(spark, sf).collect()[0]
    ap = Q.roc_auc_approx_order_status(spark, sf).collect()[0]
    assert ap["n_pos"] == exact["n_pos"]
    assert ap["n_neg"] == exact["n_neg"]
    assert ap["auc_lo"] - 1e-4 <= exact["auc"] <= ap["auc_hi"] + 1e-4
    assert ap["auc_hi"] - ap["auc_lo"] < 0.01
    assert abs(ap["auc_approx"] - exact["auc"]) < 0.005


@pytest.mark.parametrize("sf", SFS)
def test_kruskal_approx_close_to_exact(spark, sf):
    """Binned tie-corrected H converges to the exact statistic;
    measured ~0.5% at the driver SFs, asserted within 2%."""
    exact = Q.kruskal_acctbal_by_segment(spark, sf).collect()[0]
    ap = Q.kruskal_approx_acctbal_by_segment(spark, sf).collect()[0]
    assert ap["n"] == exact["n"] and ap["k"] == exact["k"]
    rel = abs(ap["h_stat_approx"] - exact["h_stat"]) / max(
        1.0, abs(exact["h_stat"]))
    assert rel < 0.02, (ap["h_stat_approx"], exact["h_stat"])


@pytest.mark.parametrize("sf", SFS)
def test_mannwhitney_approx_brackets_exact(spark, sf):
    """U and AUC share the Hanley-McNeil identity, so [u_lo, u_hi]
    brackets the exact tie-averaged U the same way (exact U uses
    half-credit ties, which lie inside the within-bucket unknown)."""
    exact = Q.mannwhitney_order_value(spark, sf).collect()[0]
    ap = Q.mannwhitney_approx_order_value(spark, sf).collect()[0]
    assert ap["n_urgent"] == exact["n_urgent"]
    assert ap["n_low"] == exact["n_low"]
    assert ap["u_lo"] - 1e-4 <= exact["u_stat"] <= ap["u_hi"] + 1e-4
    assert abs(ap["z_approx"] - exact["z_stat"]) < 0.05


@pytest.mark.parametrize("sf", SFS)
def test_gini_approx_close_to_exact(spark, sf):
    """Rank coarsening keeps the exact per-bucket value sums, so the
    per-segment Gini moves only by the within-bucket rank-value
    covariance; measured |delta| <= 1e-4 per segment."""
    exact = {r["c_mktsegment"]: r
             for r in Q.gini_acctbal_by_segment(spark, sf).collect()}
    ap = {r["c_mktsegment"]: r
          for r in Q.gini_approx_acctbal_by_segment(spark, sf).collect()}
    assert set(ap) == set(exact)
    for seg, row in ap.items():
        assert row["n_customers"] == exact[seg]["n_customers"]
        assert abs(row["gini_approx"] - exact[seg]["gini"]) < 0.005, seg


@pytest.mark.parametrize("sf", SFS)
def test_mad_approx_close_to_exact(spark, sf):
    """GK rank error <= n/accuracy translates to a tiny value error on
    these smooth distributions; measured <= 0.15% relative per flag,
    asserted within 1% — this bound is what earns the rows-only
    oracle (t-digest vs GK sketches differ engine-to-engine)."""
    exact = {r["l_returnflag"]: r
             for r in Q.mad_price_by_flag(spark, sf).collect()}
    ap = {r["l_returnflag"]: r
          for r in Q.mad_approx_price_by_flag_detail(spark, sf).collect()}
    assert set(ap) == set(exact)
    for flag, row in ap.items():
        e = exact[flag]
        assert abs(row["median_price_approx"] - e["median_price"]) \
            / e["median_price"] < 0.01, flag
        assert abs(row["mad_approx"] - e["mad"]) / e["mad"] < 0.01, flag


@pytest.mark.parametrize("sf", SFS)
def test_cms_prefilter_twins_equal_exact(spark, sf):
    """The CMS prefilter is lossless BY THEOREM (zero false negatives
    + exact candidate pass): both twins must equal their exact forms
    row-for-row."""
    for exact_fn, twin_fn, key in (
            (Q.gram_novelty_by_source, Q.gram_novelty_bloom_by_source,
             "source"),
            (Q.duplicate_chunks, Q.duplicate_chunks_bloom, "chunk_md5")):
        exact = sorted(map(tuple, exact_fn(spark, sf).collect()))
        twin = sorted(map(tuple, twin_fn(spark, sf).collect()))
        assert twin == exact, key


@pytest.mark.parametrize("sf", SFS)
def test_cms_prefilter_actually_prunes(spark, sf):
    """The prefilter must DROP rows at driver SFs (the scale claim:
    only candidates reach the digest shuffle) — guards against a
    saturated cell table silently degrading to the exact plan."""
    from pyspark.sql import functions as F
    from parking_bigdata_spark.io import load_table
    from parking_bigdata_spark.operators import text as text_ops
    from parking_bigdata_spark.queries.b_llm_ext import (
        _CMS_CHUNKS_PER_DOC, _cms_split)

    docs = load_table(spark, sf, "documents")
    ch = (text_ops.chunk_tokens(docs, size=3, stride=3)
          .select("doc_id", "chunk_md5"))
    j = _cms_split(ch, "chunk_md5", docs.count() * _CMS_CHUNKS_PER_DOC)
    total = ch.count()
    cand = j.where(F.col("__hot").isNotNull()).count()
    assert cand < total, (cand, total)
