"""Similarity search over embedding columns: brute-force cosine top-k
and LSH-bucketed ANN (SURVEY.md §2 B5-B6).

Scale design: brute force is only ever computed against a broadcast
query set (queries × corpus is a map-side nested loop — the corpus
streams, nothing shuffles). The LSH path buckets the corpus by
random-hyperplane signs so candidate generation is an equi-join on the
bucket id; the plane matrix is a fixed literal folded into codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query_df: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 4) -> DataFrame:
    """Brute-force cosine top-k (B5): broadcast the (small) query set,
    score every corpus row with a pure `zip_with`/`aggregate` expression
    (JVM codegen, no UDF), keep top-k per query with a window.

    Deterministic: rank orders by rounded score desc, candidate id asc.
    """
    from pyspark.sql import Window
    q = query_df.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
    c = df.select(F.col(id_col).alias("cand_id"),
                  _as_double(F.col(vec_col)).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
               .where(F.col("cand_id") != F.col("query_id"))
               .withColumn("score",
                           F.round(_dot(F.col("qv"), F.col("cv")) /
                                   (_norm(F.col("qv")) * _norm(F.col("cv"))),
                                   round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "cand_id", "score", "rank"))


def lsh_hyperplane_buckets(df: DataFrame, n_planes: int = 12, dim: int = 64,
                           seed: int = 42, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucketing (B6): sign(v·p_i) bits packed into
    an int bucket id. The plane matrix is generated once with a fixed
    seed and folded into the plan as array literals — a pure map, no
    shuffle; downstream candidate joins are equi-joins on `bucket`.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(w)) for w in planes[i]])
        bit = (_dot(v, plane) > 0).cast("int")
        bucket = bucket + bit * (1 << i)
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ann_lsh_topk(df: DataFrame, query_df: DataFrame, k: int = 3,
                 n_planes: int = 8, dim: int = 64,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 4) -> DataFrame:
    """ANN via LSH buckets (B6): candidates = corpus rows sharing the
    query's bucket (equi-join), then exact cosine re-rank inside the
    bucket. Recall trades off with n_planes; the join never blows up
    because bucket occupancy ~ n/2^planes."""
    from pyspark.sql import Window
    cb = lsh_hyperplane_buckets(df, n_planes, dim, id_col=id_col,
                                vec_col=vec_col)
    qb = lsh_hyperplane_buckets(query_df, n_planes, dim, id_col=id_col,
                                vec_col=vec_col)
    c = (df.select(F.col(id_col).alias("cand_id"),
                   _as_double(F.col(vec_col)).alias("cv"))
           .join(cb.select(F.col(id_col).alias("cand_id"), "bucket"), "cand_id"))
    q = (query_df.select(F.col(id_col).alias("query_id"),
                         _as_double(F.col(vec_col)).alias("qv"))
                 .join(qb.select(F.col(id_col).alias("query_id"), "bucket"),
                       "query_id"))
    scored = (c.join(F.broadcast(q), "bucket")
               .where(F.col("cand_id") != F.col("query_id"))
               .withColumn("score",
                           F.round(_dot(F.col("qv"), F.col("cv")) /
                                   (_norm(F.col("qv")) * _norm(F.col("cv"))),
                                   round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "cand_id", "score", "rank"))
