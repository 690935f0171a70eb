"""Join strategies for scale: broadcast enrichment and salted joins for
skewed keys.

The reference's joins (20210803_이승하.R:272,909,1043) are all
dimension enrichments — `broadcast_enrich` is that shape. `salted_join`
is the standard remedy when a shuffle join's key distribution is skewed
(a handful of hot keys put one reducer hours behind): the skewed side
gets a random salt in [0, n), the other side is replicated n ways, and
the join key becomes (key, salt). AQE's skew-join split handles
moderate skew automatically; explicit salting is for the pathological
keys AQE can't split (single-key hot spots in hash aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Dimension enrichment with an explicit broadcast hint — never let a
    small dim fall into a shuffle join plan."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(big: DataFrame, skewed: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join.

    ``big`` (the side with skewed key frequencies) gets a salt from a
    row-position hash (``monotonically_increasing_id`` — uniform even
    when a hot key's rows are byte-identical, which a content hash
    would send to one reducer); ``skewed``'s rows are replicated across
    all salts via a small explode — the replication factor is
    n_salts × |skewed|, acceptable when the right side is the smaller
    one. Hot keys now spread over n_salts reducers instead of one.

    Only inner/left joins are valid: under right/full outer, an
    unmatched right row would surface once per salt replica.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: "
            "right/full outer would duplicate unmatched replicated rows")
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"))
    replicated = (skewed
                  .withColumn("__salt", F.explode(
                      F.array(*[F.lit(i) for i in range(n_salts)]))))
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
