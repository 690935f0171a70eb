"""Deterministic distributed tree ensembles (random forest / bagged
trees / gradient boosting) — the Spark-first re-expression of the
reference's tree models (``randomForest`` at R:1260, ``xgboost`` at
R:57, ``ipred::bagging`` at R:59 in 20210803_이승하.R).

Why not MLlib here: MLlib's tree induction seeds its bootstrap from
the PARTITION index, so importances move when the file layout does —
they can never pass the expected-parquet determinism audit
(scripts/check_expected.py re-runs every oracle query under a
different core/shuffle geometry). This engine is partition-independent
BY CONSTRUCTION, in the sufficient-statistics style the repo uses
everywhere:

- **Integer statistics.** Features and target are scaled to integer
  fixed-point (2-decimal money/ratio columns → exact ×100 longs).
  Every distributed aggregate is then a sum of integers — associative,
  so bit-identical under ANY partitioning (the float-sum ulp drift
  that makes near-tie splits geometry-dependent cannot occur). Sums
  of squares ride in DECIMAL(38,0) (exact, no int64 overflow at
  100 TB row counts).
- **Hash-based bootstrap.** Each (row, tree) draws a Poisson(1)
  weight from ``xxhash64(id, tree_seed)`` through an integer inverse-
  CDF — a function of the DATA, not the partition (MLlib's
  per-partition Poisson streams are exactly what broke determinism).
- **Deterministic feature subsetting** per (tree, node) via md5 on
  the driver (mtry = ⌈k/3⌉ for RF; all k = bagged trees).
- **Histogram splits.** One scan per DEPTH LEVEL grows every tree of
  the forest level-synchronously: a generated array-of-structs
  explode emits (tree, node, feature, bin, w, w·y, w·y²) facts whose
  map-side combine collapses to ≤ trees×nodes×features×bins groups —
  a few-KB shuffle regardless of input size. Split scoring happens
  driver-side on the aggregated EXACT integers with Fraction
  arithmetic (cross-multiplied rational compares — no float argmax
  ties at all).
- **Codegen scoring.** A fitted forest renders to nested CASE
  expressions (bin lookup + per-tree leaf CASE), so prediction is
  whole-stage-codegen'd JVM arithmetic — no UDF, no model broadcast.

At 100 TB: per level the plan is scan → project(bins) → explode
(trees×features fan-out, CPU-parallel) → partial agg (tiny key space)
→ one tiny shuffle. Depth·(1 scan) total for a forest; boosting adds
one residual-projection per round (still scan-bound, no shuffle).
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import spread_for_cpu

# Poisson(1) inverse CDF on a 1e6 integer grid: P(X<=k)·1e6, exact
# thresholds so every engine run derives identical weights.
_POISSON_CDF_1E6 = [367879, 735759, 919699, 981012, 996340, 999406,
                    999917, 999990, 999999]


def _poisson_weight(key: Column, seed: int) -> Column:
    """Deterministic Poisson(1) bootstrap weight for (row ``key``,
    tree ``seed``): uniform int in [0, 1e6) from xxhash64, then
    inverse CDF. Partition-independent by construction."""
    u = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(1_000_000))
    w: Column = F.lit(len(_POISSON_CDF_1E6))
    for k in range(len(_POISSON_CDF_1E6) - 1, -1, -1):
        w = F.when(u < _POISSON_CDF_1E6[k], F.lit(k)).otherwise(w)
    return w


def _mtry(tree: int, level: int, feats: list[int], m: int,
          seed: int) -> list[int]:
    """Deterministic feature subset for one (tree, level): the m
    features with the smallest md5(seed:tree:level:feat) digest.
    hashlib, not hash() — stable across interpreter runs. Level-wise
    (every node of a tree-level shares the subset) so each level's
    histogram pass emits only the subset's facts — a k/m cut in
    explode volume; the cross-tree subsets still decorrelate trees,
    which is what the Breiman subsampling is for."""
    ranked = sorted(
        feats,
        key=lambda f: hashlib.md5(
            f"{seed}:{tree}:{level}:{f}".encode()).hexdigest())
    return sorted(ranked[:m])


class _Node:
    __slots__ = ("feature", "bin_thr", "value_int", "gain")

    def __init__(self):
        self.feature: int | None = None   # split feature index
        self.bin_thr: int | None = None   # go left iff bin <= bin_thr
        self.value_int: int | None = None # leaf value, fixed-point int
        self.gain: int = 0                # scaled variance reduction


def _fit_forest(binned: DataFrame, n_feats: int, *, n_trees: int,
                max_depth: int, seed: int, mtry: int, y_col: str,
                min_leaf: int = 2) -> list[dict[int, _Node]]:
    """Grow ``n_trees`` histogram trees level-synchronously over a
    pre-binned frame (columns ``__b0..__b{k-1}`` int bins, ``y_col``
    fixed-point long, ``__w{t}`` integer weights).

    Returns one {node_id: _Node} dict per tree (root = 0, children of
    ``i`` are ``2i+1`` / ``2i+2``). All split decisions are exact
    integer/rational arithmetic on aggregated sums.

    Node membership rides in per-tree columns ``__n{t}`` updated with
    ONE small descend-a-level CASE per level (only the splits chosen
    at that level) — incremental column state keeps the analyzed plan
    linear in depth, instead of re-deriving assignments from scratch
    inside every explode struct (the first cut did that and Catalyst
    analysis dominated the fit wall time ~10x over execution)."""
    trees: list[dict[int, _Node]] = [dict() for _ in range(n_trees)]
    cur = binned
    for t in range(n_trees):
        cur = cur.withColumn(f"__n{t}", F.lit(0))

    assert max_depth <= 7, "node id packing uses 16 bits"
    n_bins = 0  # discovered from data below
    for depth in range(max_depth):
        last = depth == max_depth - 1
        # one fact per (tree, allowed feature) — or a single leaf-stat
        # fact on the LAST level (no split will be scored there, so no
        # per-feature/per-bin histogram is needed). Facts are lean
        # (packed int key, w, w·y): no sum of squares rides along —
        # SSE-drop scoring only needs (n, Σwy) per side.
        level_mtry = {t: _mtry(t, depth, list(range(n_feats)), mtry,
                               seed) for t in range(n_trees)}
        facts = []
        for t in range(n_trees):
            w = F.col(f"__w{t}")
            ne = F.col(f"__n{t}")
            feats_here = [0] if last else level_mtry[t]
            for f_idx in feats_here:
                bin_col = F.lit(0) if last else F.col(f"__b{f_idx}")
                key = (F.lit(t * (1 << 24)) + ne * F.lit(1 << 16)
                       + F.lit(f_idx * 256) + bin_col)
                facts.append(F.struct(
                    key.alias("k"), w.alias("w"),
                    (w * F.col(y_col)).alias("wy")))
        hist = (cur
                .select(F.explode(F.array(*facts)).alias("s"))
                .select("s.*")
                .where(F.col("w") > 0)
                .groupBy("k")
                .agg(F.sum("w").alias("n"), F.sum("wy").alias("s1"))
                .collect())
        # organize: (tree, node) -> feat -> {bin: (n, s1)}
        by_node: dict[tuple[int, int], dict[int, dict[int, tuple]]] = {}
        for r in hist:
            k = int(r["k"])
            t, rest = divmod(k, 1 << 24)
            nid, rest = divmod(rest, 1 << 16)
            f_idx, b = divmod(rest, 256)
            by_node.setdefault((t, nid), {}) \
                   .setdefault(f_idx, {})[b] = (int(r["n"]),
                                                int(r["s1"]))
            n_bins = max(n_bins, b + 1)

        any_split = False
        new_splits: dict[int, list[tuple[int, _Node]]] = {}
        for (t, nid), feat_hists in sorted(by_node.items()):
            if nid in trees[t]:     # already a leaf/split from earlier
                continue
            node = _Node()
            # node totals from any emitted histogram (all identical)
            h0 = next(iter(feat_hists.values()))
            n_tot = sum(v[0] for v in h0.values())
            s1_tot = sum(v[1] for v in h0.values())
            node.value_int = _round_div(s1_tot, n_tot)
            best = None  # (score Fraction, feat, bin_thr)
            if n_tot >= 2 * min_leaf and not last:
                base = Fraction(s1_tot * s1_tot, n_tot)
                for f_idx in level_mtry[t]:
                    h = feat_hists.get(f_idx, {})
                    nl = s1l = 0
                    for b in range(n_bins - 1):
                        cell = h.get(b)
                        if cell:
                            nl += cell[0]
                            s1l += cell[1]
                        nr, s1r = n_tot - nl, s1_tot - s1l
                        if nl < min_leaf or nr < min_leaf:
                            continue
                        score = (Fraction(s1l * s1l, nl)
                                 + Fraction(s1r * s1r, nr))
                        if score <= base:
                            continue  # no variance reduction
                        # deterministic tie-break: higher score, then
                        # smaller feature index, then smaller bin
                        if best is None or score > best[0]:
                            best = (score, f_idx, b)
            if best is not None:
                node.feature, node.bin_thr = best[1], best[2]
                # gain = SSE drop numerator, kept exact via Fraction
                node.gain = best[0] - Fraction(s1_tot * s1_tot, n_tot)
                any_split = True
                new_splits.setdefault(t, []).append((nid, node))
            trees[t][nid] = node
        if not any_split:
            break
        # descend one level: per tree, one small CASE over only the
        # splits chosen at THIS level
        for t, splits in new_splits.items():
            e = F.col(f"__n{t}")
            upd = e
            for nid, node in splits:
                go = (F.col(f"__b{node.feature}") <= F.lit(node.bin_thr))
                child = F.when(go, F.lit(2 * nid + 1)) \
                         .otherwise(F.lit(2 * nid + 2))
                upd = F.when(e == F.lit(nid), child).otherwise(upd)
            cur = cur.withColumn(f"__n{t}", upd)
    return trees


def _round_div(a: int, b: int) -> int:
    """Exact round-half-away-from-zero integer division (leaf means
    in fixed-point units) — no float involved."""
    if b == 0:
        return 0
    q, r = divmod(abs(a), b)
    q += 1 if 2 * r >= b else 0
    return q if a >= 0 else -q


def _leaf_case(tree: dict[int, _Node], leaf_val) -> Column:
    """Render one fitted tree as a nested bin-compare CASE returning
    ``leaf_val(node)`` (a Column per leaf) — pure codegen scoring."""
    def walk(nid: int, depth: int) -> Column:
        node = tree.get(nid)
        if node is None or node.feature is None:
            src = tree.get(nid)
            # unreachable empty node: inherit nearest ancestor value
            anc = nid
            while src is None or src.value_int is None:
                anc = (anc - 1) // 2
                src = tree.get(anc)
            return leaf_val(src)
        return F.when(F.col(f"__b{node.feature}") <= F.lit(node.bin_thr),
                      walk(2 * nid + 1, depth + 1)) \
                .otherwise(walk(2 * nid + 2, depth + 1))
    return walk(0, 0)


def _bin_cols(df: DataFrame, xs: list[str], edges: list[tuple[int, int]],
              n_bins: int, scale: int) -> DataFrame:
    """Add integer bin columns ``__b{i}``: pure-integer equi-width
    binning over fixed-point values — exact, so bin membership cannot
    drift between train and score passes."""
    for i, (c, (lo, hi)) in enumerate(zip(xs, edges)):
        v = F.round(F.col(c) * scale).cast("long")
        rng = max(hi - lo + 1, 1)
        num = (v - F.lit(lo)) * F.lit(n_bins)
        # EXACT integer division (num - num%rng is divisible, so the
        # double divide is exact) — a true float divide could round a
        # hair above an integer boundary and shift a bin
        b = ((num - F.pmod(num, F.lit(rng))) / F.lit(rng)).cast("int")
        df = df.withColumn(
            f"__b{i}",
            F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)))
    return df


def _feature_edges(df: DataFrame, xs: list[str],
                   scale: int) -> list[tuple[int, int]]:
    aggs = []
    for c in xs:
        v = F.round(F.col(c) * scale).cast("long")
        aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
    r = df.agg(*aggs).collect()[0]
    return [(r[f"lo_{c}"], r[f"hi_{c}"]) for c in xs]


class ForestModel:
    """Fitted deterministic forest: driver-side tree dicts plus the
    binning metadata needed to score new rows with codegen CASEs."""

    def __init__(self, trees, xs, edges, n_bins, scale, kind,
                 base_int: int = 0):
        self.trees, self.xs, self.edges = trees, xs, edges
        self.n_bins, self.scale, self.kind = n_bins, scale, kind
        self.base_int = base_int  # gbt F0 (global mean, fixed-point)

    def predict_col(self) -> Column:
        """Prediction as a pure Column over the ``__b*`` bin columns
        (call `_bin_cols` first): mean of leaf values for rf/bagged
        (fixed-point → currency), base + sum of shrunken contributions
        for gbt."""
        if self.kind == "gbt":
            total = F.lit(self.base_int).cast("long")
            for tree in self.trees:
                total = total + _leaf_case(
                    tree, lambda nd: F.lit(nd.value_int).cast("long"))
            return total.cast("double") / F.lit(float(self.scale))
        total = F.lit(0).cast("long")
        for tree in self.trees:
            total = total + _leaf_case(
                tree, lambda nd: F.lit(nd.value_int).cast("long"))
        return total.cast("double") / F.lit(float(len(self.trees)
                                                  * self.scale))

    def importances(self, round_to: int = 4) -> list[tuple[str, float]]:
        """Gain-based importances, normalized to sum 1. Gains are
        exact Fractions summed exactly; only the final normalized
        ratio touches floats (deterministic: one float op per
        feature on identical rationals)."""
        gains = [Fraction(0)] * len(self.xs)
        for tree in self.trees:
            for node in tree.values():
                if node.feature is not None:
                    gains[node.feature] += node.gain
        total = sum(gains)
        if total == 0:
            return [(c, 0.0) for c in self.xs]
        return [(c, round(float(g / total), round_to))
                for c, g in zip(self.xs, gains)]


def fit_random_forest(df: DataFrame, xs: list[str], y: str, *,
                      n_trees: int = 10, max_depth: int = 4,
                      n_bins: int = 32, seed: int = 42,
                      scale: int = 100,
                      feature_subset: str = "onethird") -> ForestModel:
    """Deterministic RF / bagged trees (``feature_subset="all"``).
    ``scale`` is the fixed-point multiplier — 100 makes 2-decimal
    money/ratio columns exact integers."""
    data = df.select(*xs, y).dropna()
    edges = _feature_edges(data, xs, scale)
    binned = _bin_cols(data, xs, edges, n_bins, scale).withColumn(
        "__y", F.round(F.col(y) * scale).cast("long"))
    # row identity for the bootstrap hash: the full feature+target
    # tuple (works for any frame; duplicate rows draw identical
    # weights, which is fine — weights need only be deterministic).
    # Hashed ONCE to a long, then each tree re-hashes the long — the
    # n_trees string-concat hashes per row were the cache-build
    # hotspot at 12M rows.
    binned = binned.withColumn(
        "__k", F.xxhash64(F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in [*xs, y]])))
    for t in range(n_trees):
        binned = binned.withColumn(
            f"__w{t}", _poisson_weight(F.col("__k"), seed + t))
    # the per-level histogram explode is CPU-bound; a compact parquet
    # input plans to fewer scan tasks than cores, which would serialize
    # every level. Safe to reshuffle: the engine is partition-
    # independent by construction (integer sums + hash bootstrap).
    binned = spread_for_cpu(binned).persist()
    try:
        k = len(xs)
        mtry = k if feature_subset == "all" else max(1, (k + 2) // 3)
        trees = _fit_forest(binned, k, n_trees=n_trees,
                            max_depth=max_depth, seed=seed, mtry=mtry,
                            y_col="__y")
    finally:
        binned.unpersist()
    return ForestModel(trees, xs, edges, n_bins, scale, "rf")


def fit_gbt(df: DataFrame, xs: list[str], y: str, *, n_trees: int = 5,
            max_depth: int = 3, n_bins: int = 32, seed: int = 42,
            scale: int = 100, shrinkage: Fraction = Fraction(1, 10),
            ) -> ForestModel:
    """Deterministic gradient boosting (squared loss): F0 is the
    exact-integer global mean, then each round fits one full-data tree
    (weight 1 — boosting's variance control is the shrinkage, not a
    bootstrap) to the current INTEGER residuals and subtracts the
    shrunken leaf contribution exactly. Residuals stay fixed-point
    longs throughout, so determinism survives every round
    (contributions are rationally rounded driver-side to integers).
    """
    data = df.select(*xs, y).dropna()
    edges = _feature_edges(data, xs, scale)
    binned = _bin_cols(data, xs, edges, n_bins, scale).withColumn(
        "__y", F.round(F.col(y) * scale).cast("long")) \
        .withColumn("__w0", F.lit(1))
    binned = spread_for_cpu(binned).persist()  # see fit_random_forest
    k = len(xs)
    all_trees: list[dict[int, _Node]] = []
    try:
        # F0 = round(mean(y)) from exact integer sums
        b = binned.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("__y").alias("s1")).collect()[0]
        base_int = _round_div(int(b["s1"]), int(b["n"])) if b["n"] else 0
        resid = F.col("__y") - F.lit(base_int)
        for t in range(n_trees):
            rb = binned.withColumn("__r", resid.cast("long"))
            trees = _fit_forest(rb, k, n_trees=1, max_depth=max_depth,
                                seed=seed + t, mtry=k,
                                y_col="__r")
            tree = trees[0]
            # shrink leaf values exactly: v <- round(shrinkage * v)
            for node in tree.values():
                if node.value_int is not None:
                    node.value_int = _round_div(
                        node.value_int * shrinkage.numerator,
                        shrinkage.denominator)
            all_trees.append(tree)
            resid = resid - _leaf_case(
                tree, lambda nd: F.lit(nd.value_int).cast("long"))
    finally:
        binned.unpersist()
    return ForestModel(all_trees, xs, edges, n_bins, scale, "gbt",
                       base_int=base_int)


def importance_df(model: ForestModel, spark) -> DataFrame:
    return spark.createDataFrame(
        model.importances(), "feature string, importance double")


def score_df(model: ForestModel, df: DataFrame, key_cols: list[str],
             y: str, round_to: int = 4) -> DataFrame:
    """Score ``df`` with a fitted model: per-row prediction/residual
    frame (the reference's submission output, R:1280-1373) — binning
    uses the TRAIN edges, scoring is one codegen projection."""
    d = df
    for c in [*model.xs, y]:
        d = d.where(F.col(c).isNotNull())
    d = _bin_cols(d, model.xs, model.edges, model.n_bins, model.scale)
    pred = model.predict_col()
    return d.select(
        *key_cols, F.col(y).alias("actual"),
        F.round(pred, round_to).alias("predicted"),
        F.round(F.col(y) - pred, round_to).alias("residual"))
