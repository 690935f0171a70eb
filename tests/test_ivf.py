"""IVF ANN: recall against brute force, and candidate-set reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from parking_bigdata_spark.io import load_table
from parking_bigdata_spark.operators import similarity as sim


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["cand_id"])
             for r in sim.cosine_topk(emb, queries, k=5).collect()}
    ivf = {(r["query_id"], r["cand_id"])
           for r in sim.ivf_topk(emb, queries, k=5, n_cells=8,
                                 nprobe=4).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall} too low"
    # probing all cells == brute force (sanity: approximation → exact)
    full = {(r["query_id"], r["cand_id"])
            for r in sim.ivf_topk(emb, queries, k=5, n_cells=8,
                                  nprobe=8).collect()}
    assert full == exact


def test_ivf_assignment_partitions_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = sim.ivf_fit_centroids(emb, n_cells=8)
    assigned = sim.ivf_assign(emb, model)
    cells = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == emb.count()
    assert len(cells) > 1  # corpus actually split across cells
