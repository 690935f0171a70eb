"""The functions/ expression layer must agree with the operators that
inline the same semantics, and plans.audit must read plan structure."""

from __future__ import annotations

import pyspark.sql.functions as F

from parking_bigdata_spark import functions as X
from parking_bigdata_spark import plans as P
from parking_bigdata_spark.io import load_table


def test_tokenize_and_ngrams_roundtrip(spark):
    df = spark.createDataFrame(
        [("Héllo,  wörld! a b c",), ("x",), ("",), (None,)], ["text"])
    rows = (df.select(X.tokenize("text").alias("t"))
              .select(F.col("t"), X.word_ngrams("t", 2).alias("g"))
              .collect())
    assert rows[0]["t"][:2] == ["h", "llo"]  # non-ascii folds to space
    assert rows[0]["g"][0] == "h llo"
    assert rows[1]["g"] == []  # shorter than n -> empty, no ANSI throw


def test_fingerprint_matches_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    from parking_bigdata_spark.operators.dedup import exact_dedup_groups
    a = (docs.select(X.doc_fingerprint("text").alias("h"))
             .distinct().count())
    b = exact_dedup_groups(docs).count()
    assert a == b


def test_money_sum_equals_decimal_sum(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = li.agg(X.money_sum("l_extendedprice").alias("s")).collect()[0]["s"]
    exp = li.agg(F.round(F.sum(F.col("l_extendedprice")
                               .cast("decimal(18,2)")).cast("double"), 4)
                  .alias("s")).collect()[0]["s"]
    assert got == exp


def test_sortable_key_orders_like_tuple(spark):
    df = spark.createDataFrame(
        [(1000, 5), (1000, 10), (999, 99)], ["us", "id"])
    rows = (df.select(F.timestamp_micros("us").alias("ts"), "id")
              .select("id", X.sortable_event_key("ts", "id").alias("k"))
              .orderBy("k").collect())
    assert [r["id"] for r in rows] == [99, 5, 10]


def test_plan_audit_reads_structure(spark, sf_dir):
    from parking_bigdata_spark import queries as Q
    a = P.audit(Q.queries()["q1_pricing_summary"](spark, sf_dir))
    assert a.shuffles == 1
    assert a.file_scans == 1
    assert a.python_evals == 0
    assert any("l_shipdate" in f for f in a.pushed_filters)
    assert "l_quantity" in a.read_schemas[0]
