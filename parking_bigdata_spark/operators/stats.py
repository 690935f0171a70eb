"""Statistical analysis operators: correlation matrix, Welch t-test,
one-way ANOVA.

Reference parity: Pearson correlation matrix with pairwise-complete
observations (20210803_이승하.R:386-392), ``t.test`` two-group mean
comparison (R:756-762), ``anova`` on a one-factor linear model
(R:765-772).

Scale notes: all three reduce to O(k²) or O(#groups) sufficient
statistics computed in ONE fused aggregation over the fact table; the
closed-form statistic is then a tiny projection. Nothing iterates, and
nothing returns more rows than k² / #groups.
"""

from __future__ import annotations

import os
from itertools import combinations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _parse_acc(raw: str | None, default: int = 2000,
               name: str = "SPARK_GRAFT_EXACT_QUANTILE_ACC") -> int:
    """Parse a positive-int env knob defensively (second code-review
    pass r09): a typo'd or non-positive value must degrade to the
    default with a stderr note, not crash every import of the package
    (or divide by zero in eps = 4/accuracy later). Shared by every
    positive-int env knob (``name`` labels the warning)."""
    try:
        v = int(raw) if raw is not None else default
    except (TypeError, ValueError):
        v = -1
    if v < 1:
        if raw is not None:
            import sys
            print(f"# {name}={raw!r} invalid "
                  f"(need a positive int); using {default}",
                  file=sys.stderr)
        return default
    return v


#: Default GK accuracy for the EXACT bracket-refine machinery
#: (grouped_quantiles / grouped_median / grouped_trimmed_mean). A pure
#: performance knob — exactness NEVER depends on it (the 4x-cushioned
#: bracket always contains the true quantile and the below-count pass
#: pins the exact rank; outputs verified identical at 10000/2000/500,
#: tests/test_round8.py + the r09 A/B). It trades GK insert cost
#: (~linear in accuracy) against in-bracket candidate volume
#: (~8n/accuracy distinct runs). The r09 sf0.1 A/B across the 10
#: registered exact quantile-family keys (VERDICT r08 #6, min of 2
#: reps per setting, SCALE.md r09 has the per-key table) measured a
#: WASH: 17.13 s at 2000 vs 17.27 s at 10000 (0.99x), per-key swings
#: ±12% inside the ~9% rep-to-rep noise — at driver SFs both cost
#: terms are small against the fixed scan+shuffle floor. 2000 is kept
#: as the default for the marginal win, the r08-measured ~17% lower
#: GK insert cost per pass (which grows with rows, i.e. with scale),
#: and consistency with the audit passes' `_AUDIT_ACC`. The scale
#: claim was then MEASURED: at 100x (600M-row lineitem stress set)
#: 2000 wins 0.92x overall — up to 0.74x on the GK-bound keys, the
#: one loss being the small-dimension-table key (SCALE.md r09).
#: Env-overridable for future retuning; the APPROX forms keep their
#: own explicit accuracy because there the knob changes RESULTS, not
#: just cost.
EXACT_QUANTILE_ACC = _parse_acc(
    os.environ.get("SPARK_GRAFT_EXACT_QUANTILE_ACC"))


def pin(df: DataFrame) -> DataFrame:
    """Pin ONE physical evaluation of ``df`` so every consumer reads
    the same layout (the round-5 ``__pid`` coherence requirement).

    Local mode / no checkpoint dir: ``localCheckpoint(eager=True)`` —
    fast, but lineage-truncating to executor-local storage, so on a
    real cluster a single executor loss fails the job (the documented
    fault-tolerance tradeoff in SCALE.md). When the application has
    configured a RELIABLE checkpoint directory
    (``sc.setCheckpointDir(...)`` — HDFS/object store on a cluster),
    the pin automatically upgrades to ``checkpoint(eager=True)``:
    same layout-pinning semantics, executor-loss-safe. This is the
    switch the r05 ADVICE asked for instead of comment-only guidance.
    """
    try:
        # sparkContext itself raises under Spark Connect — keep the
        # attribute access inside the guard so connect-mode falls back.
        sc = df.sparkSession.sparkContext
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # noqa: BLE001 — connect-mode or API drift
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def noise_floor(val: Column, scale: Column, eps: float = 1e-12) -> Column:
    """``val`` when it exceeds float-noise scale, else NULL.

    Central second-moment forms (SST = Σy² − (Σy)²/n, m2 = r2 − m1²)
    cancel two ~Σy² magnitudes; near-constant data leaves the result at
    engine sum-order noise (~1e-14 relative after tree aggregation)
    rather than exactly zero, so an exact ``nullif(·, 0)`` passes
    garbage downstream (r06 ADVICE #2) — e.g. an R² of ±1e9 instead of
    NULL. Statistics derived from such a value are numerically
    meaningless, so degrade to NULL below a RELATIVE threshold:
    ``val > scale·eps`` keeps any analytically meaningful ratio
    (relative variance ≥ 1e-12 ⇔ CV ≥ 1e-6) and nulls the
    cancellation-noise regime with two orders of margin. Negative
    float-noise values null as well (the old nullif let them through
    as NaN^1.5 etc.). Both engines evaluate their OWN val/scale, and
    the DuckDB oracles mirror the same CASE expression — away from the
    measure-zero threshold boundary the predicate agrees, so rounded
    outputs stay bit-identical on non-degenerate data (gate-verified).

    KNOWN TRADEOFF (ADVICE r07): a genuinely low-relative-variance
    response (CV ≤ 1e-6 — e.g. a large-offset measurement with small
    real spread) also lands below the floor and comes back NULL even
    though its R²/skewness is finite and computable. No current input
    has that shape; if one ever does, CENTER the column (subtract a
    per-group mean before the moment pass, turning CV back into O(1))
    or switch to a variance-of-deltas form instead of widening eps —
    both remove the cancellation rather than the guard.
    """
    return F.when(val > scale * F.lit(eps), val)


def safe_corr(x, y) -> Column:
    """Pearson correlation that degrades to NULL instead of an ANSI
    DIVIDE_BY_ZERO job abort when either column has zero variance
    (Spark 4's ``corr`` aggregate divides by sqrt(M2x·M2y) inside
    codegen, so a constant column aborts the whole job under the
    default ANSI mode; DuckDB's ``corr`` returns NULL on the same
    input). Algebraically identical to ``F.corr`` — corr =
    covar_samp/(sd_x·sd_y); both forms reduce to ck/sqrt(xMk·yMk)
    over the same co-moments, so rounded outputs (4-6 dp) are
    unchanged on non-degenerate data (gate-verified at three SFs)."""
    return F.covar_samp(x, y) / F.nullif(
        F.stddev_samp(x) * F.stddev_samp(y), F.lit(0.0))


def corr_matrix(df: DataFrame, cols: list[str], round_to: int = 4) -> DataFrame:
    """Pearson correlation for every column pair (R:388-392).

    One ``agg`` containing k*(k-1)/2 ``corr`` expressions — a single
    distributed pass regardless of k; contrast with calling ``df.corr``
    per pair, which would launch k²/2 jobs. Output long-form
    (col_x, col_y, corr), upper triangle + diagonal.
    """
    aggs = [
        F.round(safe_corr(F.col(a), F.col(b)), round_to)
         .alias(f"{a}__{b}")
        for a, b in combinations(cols, 2)
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{a}', '{b}', {a}__{b}"
                      for a, b in combinations(cols, 2))
    n = len(list(combinations(cols, 2)))
    return wide.selectExpr(
        f"stack({n}, {pairs}) as (col_x, col_y, corr)")


def welch_ttest(df: DataFrame, group_col: str, value_col: str,
                group_a, group_b, round_to: int = 4) -> DataFrame:
    """Welch's unequal-variance t statistic between two groups (R:762).

    Group moments (n, mean, variance) via one groupBy over just the two
    groups (filter pushed to the scan), then the closed-form t and
    Welch-Satterthwaite df. Returns one row.
    """
    moments = (df.where(F.col(group_col).isin(group_a, group_b))
                 .groupBy(group_col)
                 .agg(F.count(value_col).alias("n"),
                      F.avg(value_col).alias("mean"),
                      F.var_samp(value_col).alias("var")))
    a = moments.where(F.col(group_col) == group_a).alias("a")
    b = moments.where(F.col(group_col) == group_b).alias("b")
    j = a.crossJoin(b)  # both sides are 1 row
    se2 = F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    # nullif: two constant groups zero the pooled SE — t and the
    # Welch-Satterthwaite df are undefined => NULL, never an ANSI abort
    t = ((F.col("a.mean") - F.col("b.mean"))
         / F.nullif(F.sqrt(se2), F.lit(0.0)))
    dof = (se2 * se2) / F.nullif(
        (F.col("a.var") / F.col("a.n")) ** 2 / (F.col("a.n") - 1)
        + (F.col("b.var") / F.col("b.n")) ** 2 / (F.col("b.n") - 1),
        F.lit(0.0))
    return j.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"),
        F.round(F.col("a.mean"), round_to).alias("mean_a"),
        F.round(F.col("b.mean"), round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("df"),
    )


def chisq_independence(df: DataFrame, col_a: str, col_b: str,
                       round_to: int = 4) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (the contingency-table analysis behind the reference's
    categorical EDA, R:228-238): χ² = Σ (obs − exp)²/exp with
    exp = row_total·col_total/n.

    One groupBy builds the observed contingency table (tiny —
    |A|×|B| cells); margins ride window sums over it, so the fact table
    is scanned exactly once. NULL categories are excluded up front —
    otherwise their cells would enter χ² while countDistinct-based
    degrees of freedom ignored them (an inconsistent statistic).
    """
    obs = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
             .groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("obs")))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wall = Window.partitionBy()
    cell = (obs
            .withColumn("row_tot", F.sum("obs").over(wa))
            .withColumn("col_tot", F.sum("obs").over(wb))
            .withColumn("n", F.sum("obs").over(wall))
            .withColumn("exp", F.col("row_tot") * F.col("col_tot") / F.col("n"))
            .withColumn("contrib", (F.col("obs") - F.col("exp")) ** 2 / F.col("exp")))
    return cell.agg(
        F.max("n").alias("n"),
        F.countDistinct(col_a).alias("n_a"),
        F.countDistinct(col_b).alias("n_b"),
        F.round(F.sum("contrib"), round_to).alias("chi2"),
        ((F.countDistinct(col_a) - 1) *
         (F.countDistinct(col_b) - 1)).alias("dof"))


def residual_diagnostics(df: DataFrame, x: str, y: str,
                         order_cols: list[str],
                         round_to: int = 4) -> DataFrame:
    """Residual diagnostics of a simple OLS fit — the reference's
    post-model checks (20210803_이승하.R): Jarque-Bera normality
    (R:601), Durbin-Watson autocorrelation (R:593), Breusch-Pagan
    heteroscedasticity (R:614).

    All three reduce to moment aggregates of the residual series:
      JB = n/6·(g1² + g2²/4) from raw residual moments m2,m3,m4
      DW = Σ(e_t − e_{t−1})² / Σe²   (lag in ``order_cols`` order)
      BP = n·corr(e², x)²            (score test with one regressor)

    Durbin-Watson is a statistic of ONE globally-ordered series, but the
    global lag does NOT need a global sort: the rows are range-
    partitioned on the order key, the lag runs inside each partition in
    parallel, and the Σ(e_t − e_{t−1})² terms that cross partition
    boundaries — exactly (#partitions − 1) of them — are stitched from
    a tiny per-partition first/last frame (bounded by the shuffle
    partition count, never by data). Same construction as
    :func:`tie_avg_ranks`; the result is bit-identical to the
    single-sort form because every consecutive pair is either within a
    partition or a boundary pair, never both, and moments/sums are
    order-free aggregates.

    The residual ``__e`` is appended to ``order_cols`` as a final
    tiebreaker in BOTH the range partitioner and the lag windows (and
    the oracle mirrors it): the driver testdata has thousands of
    duplicate (l_orderkey, l_linenumber) keys, and without the
    tiebreaker the DW pair sum depends on nondeterministic shuffle
    tie order — observed as a 4th-decimal flip at sf0.01 (1.9919 vs
    1.9920) between runs of the SAME build. With it, rows that still
    compare equal have identical ``__e``, so every (e_t − e_{t−1})²
    term — including across a partition split inside a tied run — is
    order-invariant and the statistic is well-defined.
    """
    d = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    # nullif: constant x has zero variance — the slope (and every
    # residual statistic) is undefined => NULL, never an ANSI abort
    fit = d.agg(
        (F.covar_pop(x, y) / F.nullif(F.var_pop(x), F.lit(0.0)))
         .alias("slope"),
        F.avg(y).alias("my"), F.avg(x).alias("mx"))
    d = d.crossJoin(F.broadcast(fit))
    e = F.col(y) - (F.col("my") + F.col("slope") * (F.col(x) - F.col("mx")))
    tie_cols = order_cols + ["__e"]
    # pin ONE evaluation (round-5 class fix): the two consumers
    # (global moments + the boundary-stitch frame) MUST read the
    # same physical layout — __pid and the per-partition lag
    # boundaries are layout-dependent, and AQE may plan a re-read
    # of an un-pinned exchange differently per consumer (observed
    # at sf0.1 in the hosmer-lemeshow twin of this construction:
    # 1- vs 64-partition layouts between branches). An earlier
    # A/B kept the stateless double-branch for lineage safety
    # (5.7 s vs 6.0 s at 20×, no perf win) — the layout-coherence
    # requirement overrides it.
    d = pin(d.withColumn("__e", e)
             .repartitionByRange(*[F.col(c) for c in tie_cols])
             .withColumn("__pid", F.spark_partition_id()))
    wl = Window.partitionBy("__pid").orderBy(*tie_cols)
    d = d.withColumn("__elag", F.lag("__e").over(wl))
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__e").alias("m1"),
        F.avg(F.col("__e") ** 2).alias("m2"),
        F.avg(F.col("__e") ** 3).alias("m3"),
        F.avg(F.col("__e") ** 4).alias("m4"),
        F.avg(F.col(y) * F.col(y)).alias("sy2"),
        F.sum(F.when(F.col("__elag").isNotNull(),
                     (F.col("__e") - F.col("__elag")) ** 2)).alias("sdiff"),
        F.sum(F.col("__e") ** 2).alias("se2"),
        safe_corr(F.col("__e") * F.col("__e"), F.col(x)).alias("r_e2x"),
    )
    # boundary stitching: one row per non-empty partition; range
    # partition ids ascend with the order key, so each partition's
    # predecessor in the global order is the largest smaller non-empty
    # pid. That "previous row" is found with a triangle join over the
    # ≤ #shuffle-partitions bounds frame instead of a global-order
    # window — same result, no WindowExec-single-partition path at all.
    key = F.struct(*[F.col(c) for c in tie_cols])
    bounds = d.groupBy("__pid").agg(F.min_by("__e", key).alias("__first"),
                                    F.max_by("__e", key).alias("__last"))
    prev = (bounds.alias("a")
            .join(F.broadcast(bounds.alias("b")),
                  F.col("a.__pid") > F.col("b.__pid"))
            .groupBy("a.__pid", "a.__first")
            .agg(F.max_by("b.__last", "b.__pid").alias("__prev_last")))
    bsum = prev.agg(F.coalesce(
        F.sum((F.col("__first") - F.col("__prev_last")) ** 2),
        F.lit(0.0)).alias("bsum"))
    agg = (agg.crossJoin(F.broadcast(bsum))
              .withColumn("sdiff", F.coalesce(F.col("sdiff"), F.lit(0.0))
                          + F.col("bsum")))
    # noise_floor (r06 ADVICE #2): a perfect/near-exact fit leaves the
    # residuals at fp-roundoff of y − fit (e ~ 1e-15·|y|, so m2 ~
    # 1e-30·avg(y²)); the moment ratios are then quotients of noise.
    # g1/g2 are scale-INVARIANT for genuine small residuals, so the
    # threshold separates "genuinely tiny residual" (fine at any
    # magnitude) from "roundoff noise": eps 1e-24 sits six orders
    # above the noise floor and twelve below a relative residual of
    # 1e-6. m2 = avg(e²) is not a cancellation, hence the tighter eps
    # than the SST sites.
    m2g = noise_floor(F.col("m2"), F.col("sy2"), eps=1e-24)
    g1 = F.col("m3") / F.nullif(m2g ** F.lit(1.5), F.lit(0.0))
    g2 = F.col("m4") / F.nullif(m2g ** 2, F.lit(0.0)) - 3
    jb = F.col("n") / 6 * (g1 * g1 + g2 * g2 / 4)
    dw = F.col("sdiff") / F.nullif(F.col("se2"), F.lit(0.0))
    bp = F.col("n") * F.col("r_e2x") * F.col("r_e2x")
    return agg.select(
        F.col("n"),
        F.round(g1, round_to).alias("skewness"),
        F.round(g2, round_to).alias("ex_kurtosis"),
        F.round(jb, round_to).alias("jarque_bera"),
        F.round(dw, round_to).alias("durbin_watson"),
        F.round(bp, round_to).alias("breusch_pagan"),
    )


def anova_oneway(df: DataFrame, group_col: str, value_col: str,
                 round_to: int = 4) -> DataFrame:
    """One-way ANOVA F statistic (R:768-772) from per-group sufficient
    statistics: F = (SSB/(k-1)) / (SSW/(n-k)), computed with two tiny
    aggregations (per-group, then global) — the per-group frame is a few
    rows, so the second agg is trivial.

    Numerical form matters: SSB as Σn_g·mean_g² − n·grand_mean² cancels
    two ~Σy² magnitudes down to a tiny difference, amplifying engine
    sum-order noise ~1e9× (observed 1e-4 divergence vs the oracle at
    600k rows). The deviation forms used here — SSW from the stable
    ``var_samp`` aggregate, SSB from (mean_g − grand_mean)² — keep both
    engines bit-identical after rounding.
    """
    g = (df.where(F.col(value_col).isNotNull())
           .groupBy(group_col)
           .agg(F.count(value_col).alias("n_g"),
                F.avg(value_col).alias("mean_g"),
                F.var_samp(value_col).alias("var_g")))
    gm = g.agg((F.sum(F.col("n_g") * F.col("mean_g")) / F.sum("n_g"))
               .alias("grand_mean"))
    dev = F.col("mean_g") - F.col("grand_mean")
    tot = (g.crossJoin(F.broadcast(gm))  # per-group frame is k rows
            .agg(F.sum("n_g").alias("n"),
                 F.count(F.lit(1)).alias("k"),
                 F.sum(F.col("n_g") * dev * dev).alias("ssb"),
                 F.sum((F.col("n_g") - 1) * F.col("var_g")).alias("ssw")))
    # nullif: a constant value column zeroes SSW (and k=1 or n=k zero
    # the dfs) — F is undefined => NULL, never an ANSI job abort
    fstat = ((F.col("ssb") / F.nullif((F.col("k") - 1).cast("double"),
                                      F.lit(0.0)))
             / F.nullif(F.col("ssw")
                        / F.nullif((F.col("n") - F.col("k"))
                                   .cast("double"), F.lit(0.0)),
                        F.lit(0.0)))
    return tot.select(
        F.col("n").alias("n_obs"), F.col("k").alias("n_groups"),
        F.round(F.col("ssb"), round_to).alias("ss_between"),
        F.round(F.col("ssw"), round_to).alias("ss_within"),
        F.round(fstat, round_to).alias("f_stat"),
    )


def tie_avg_ranks(counts: DataFrame, value_col: str,
                  count_col: str = "t",
                  alias: str = "avg_rank") -> DataFrame:
    """Tie-averaged ranks over a (value, count) table WITHOUT a
    single-partition global window.

    A near-unique numeric column (prices, balances) has a rows-sized
    distinct table; ``Window.orderBy(value)`` would sort it on ONE
    task. Instead the cumulative count is range-partitioned: equal
    values land in one partition by construction (no tie spans a
    boundary), the per-partition window runs in parallel, and the
    partition offsets — one row per partition, bounded by the shuffle
    partition count, never by data — are added back via a tiny
    broadcast prefix-sum.

    Returns (value_col, count_col, alias) with
    ``alias = global inclusive cum - (count-1)/2``.
    """
    d = (counts.repartitionByRange(F.col(value_col))
               .withColumn("__pid", F.spark_partition_id()))
    wl = (Window.partitionBy("__pid").orderBy(value_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    # pin ONE evaluation: __pid is only meaningful within a single
    # physical layout — AQE may plan a re-read of this exchange
    # differently per consumer (observed at sf0.1: 1- vs 64-partition
    # layouts between the offset agg and the rank join dropped rows),
    # so the offset table and the join must read the SAME materialized
    # frame (round-5 class fix; every __pid offset-join site pins)
    local = pin(d.withColumn("__cum", F.sum(count_col).over(wl)))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (local.groupBy("__pid").agg(F.max("__cum").alias("__t"))
           .withColumn("__off", F.coalesce(F.sum("__t").over(wo), F.lit(0))))
    return (local.join(F.broadcast(off.select("__pid", "__off")), "__pid")
            .select(value_col, count_col,
                    (F.col("__off") + F.col("__cum")
                     - (F.col(count_col) - 1) / 2.0).alias(alias)))


def tie_avg_ranks_by_group(counts: DataFrame, group_col: str,
                           value_col: str, count_col: str = "t",
                           alias: str = "avg_rank") -> DataFrame:
    """Per-group tie-averaged ranks over a (group, value, count) table,
    range-partitioned on value so no single group's rank window ever
    lands on one task.

    The low-cardinality-group trap (README perf notes): with a handful
    of groups, ``Window.partitionBy(group).orderBy(value)`` sorts each
    group's entire distinct-value table on ONE task. Here the table is
    range-partitioned by VALUE (ties can't span a boundary), the
    cumulative count runs per (partition, group) in parallel, and the
    per-(partition, group) totals — bounded by #partitions x #groups,
    never by data — are prefix-summed into offsets and broadcast back.

    Returns (group_col, value_col, count_col, alias) with
    ``alias`` = within-group tie-averaged rank (1-based).
    """
    d = (counts.repartitionByRange(F.col(value_col))
               .withColumn("__pid", F.spark_partition_id()))
    wl = (Window.partitionBy("__pid", group_col).orderBy(value_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    # pin ONE evaluation (see tie_avg_ranks)
    local = pin(d.withColumn("__cum", F.sum(count_col).over(wl)))
    wo = (Window.partitionBy(group_col).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = (local.groupBy("__pid", group_col)
           .agg(F.max("__cum").alias("__t"))
           .withColumn("__off", F.coalesce(F.sum("__t").over(wo), F.lit(0))))
    return (local.join(F.broadcast(off.select("__pid", group_col, "__off")),
                       ["__pid", group_col])
            .select(group_col, value_col, count_col,
                    (F.col("__off") + F.col("__cum")
                     - (F.col(count_col) - 1) / 2.0).alias(alias)))


def range_cumsum(df: DataFrame, order_col: str,
                 sum_cols: list[str]) -> DataFrame:
    """Global cumulative sums in ``order_col`` order without a
    single-partition window — the ECDF / sweep-line building block.

    Same construction as :func:`tie_avg_ranks`: range-partition on the
    order column, per-partition cumulative windows in parallel, then a
    broadcast prefix-sum of the per-partition totals (one row per
    shuffle partition). The per-partition total is the plain ``sum`` of
    the base column — exact for ANY sign (an earlier form read it off
    as ``max(cum)``, which restricted the helper to non-negative
    inputs; signed deltas enable ±1 sweep-line queries).

    Returns the input columns plus ``cum_<col>`` for each sum column.
    """
    d = (df.repartitionByRange(F.col(order_col))
           .withColumn("__pid", F.spark_partition_id()))
    wl = (Window.partitionBy("__pid").orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    local = d
    for c in sum_cols:
        local = local.withColumn(f"__cum_{c}", F.sum(c).over(wl))
    # pin ONE evaluation (see tie_avg_ranks)
    local = pin(local)
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    off = local.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols])
    for c in sum_cols:
        off = off.withColumn(
            f"__off_{c}", F.coalesce(F.sum(f"__t_{c}").over(wo), F.lit(0)))
    res = local.join(
        F.broadcast(off.select("__pid",
                               *[f"__off_{c}" for c in sum_cols])), "__pid")
    for c in sum_cols:
        res = res.withColumn(f"cum_{c}",
                             F.col(f"__off_{c}") + F.col(f"__cum_{c}"))
    return res.drop("__pid", *[f"__cum_{c}" for c in sum_cols],
                    *[f"__off_{c}" for c in sum_cols])


# NOTE (optimization round 10): the `_materialize_groups` bracket-table
# checkpoint+collect helper (ADVICE r03/r04/r05 lineage) is GONE — the
# fused bracket-refine rewrite below leaves the bracket table exactly
# one consumer, so it needs no materialization at all and the
# unbounded-group-cardinality driver-OOM concern it bounded no longer
# has a surface (nothing about the bracket table ever reaches the
# driver now; AQE picks the join strategy from its runtime size).


def grouped_median(df: DataFrame, group_col: str, value_col: str,
                   alias: str = "med",
                   accuracy: int | None = None) -> DataFrame:
    """Exact per-group median (percentile_cont(0.5) semantics: even n
    averages the two middle values) that stays parallel at any scale —
    a thin delegate to :func:`grouped_quantiles` at fraction 0.5, which
    carries the approximate-bracket + exact-RLE-refine machinery (and
    its tie-proof candidate bound) for the general case.
    """
    return grouped_quantiles(df, group_col, value_col, [0.5], [alias],
                             accuracy=accuracy)


def grouped_quantiles_approx(df: DataFrame, group_col: str,
                             value_col: str, fractions: list[float],
                             aliases: list[str],
                             accuracy: int = 10000) -> DataFrame:
    """Sketch-only scale path for :func:`grouped_quantiles` — the
    switch the exact operators' docstrings point to for 100 TB
    continuous columns: ONE mergeable GK pass (rank error ≤
    n/accuracy), no bracket refine, no candidate scan, output shape
    identical to the exact form so callers can swap per tier."""
    q = F.percentile_approx(value_col, list(map(float, fractions)),
                            accuracy).alias("__q")
    g = df.groupBy(group_col).agg(q)
    return g.select(group_col,
                    *[F.element_at("__q", i + 1).alias(a)
                      for i, a in enumerate(aliases)])


def grouped_median_approx(df: DataFrame, group_col: str, value_col: str,
                          alias: str = "med",
                          accuracy: int = 10000) -> DataFrame:
    """Scale twin of :func:`grouped_median` (see
    :func:`grouped_quantiles_approx`)."""
    return grouped_quantiles_approx(df, group_col, value_col, [0.5],
                                    [alias], accuracy=accuracy)


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      fractions: list[float], aliases: list[str],
                      accuracy: int | None = None) -> DataFrame:
    """Exact percentile_cont for several fractions per group, without
    per-group sort buffers — ``grouped_median`` generalized.

    One ``percentile_approx`` pass brackets every fraction (rank error
    4x-cushioned); ONE further fused pass (optimization round 10 —
    below-counts and candidates used to be two separate scans+shuffles)
    classifies every row against its fraction's bracket: rows BELOW
    the bracket collapse into a single NULL-valued "pseudo-run" per
    (group, fraction) carrying the exact below-count, in-bracket
    candidates are RLE-COMPRESSED by a distributed
    groupBy(group, fraction, value) count, and above-bracket rows are
    dropped — ties make the raw candidate set unbounded (a bracket
    endpoint's full tie run joins it: millions of rows for a
    low-cardinality column at corpus scale), but the DISTINCT values
    inside a bracket stay ~8n/accuracy regardless of ties. A tiny
    per-(group, fraction) window (ascending, nulls first, so the
    pseudo-run's count seeds the cumulation and ranks are GLOBAL)
    locates the runs covering the floor/ceil ranks and interpolates
    ``lo + (hi-lo)*frac`` — the percentile_cont formula. Returns one
    row per group, one column per alias. Total: two passes over the
    fact, one candidate-bounded shuffle, nothing driver-side.

    ``accuracy`` is a pure performance knob — EXACTNESS NEVER DEPENDS
    ON IT (the bracket always contains the true quantile thanks to the
    4x rank-error cushion, and the fused pass pins the exact rank).
    It trades sketch cost against candidate volume: GK insert
    cost grows ~linearly with accuracy, while the distinct-value runs
    per (group, fraction) are ~8n/accuracy rows sorted in ONE window
    task. Lower it (e.g. 2000) when groups are modest; raise it when
    per-group value cardinality is huge so the single-task run sort
    stays bounded.
    """
    if accuracy is None:
        accuracy = EXACT_QUANTILE_ACC
    k = len(fractions)
    eps = 4.0 / accuracy
    probes = []
    for p in fractions:
        probes += [max(0.0, p - eps), min(1.0, p + eps)]
    br = (df.groupBy(group_col)
            .agg(F.percentile_approx(value_col, probes, accuracy)
                  .alias("__q"),
                 F.count(value_col).alias("__n")))
    # NULL filter before candidacy — same rationale as grouped_median.
    # `br` has exactly ONE consumer (this join), so it needs no
    # materialization; AQE sees its runtime size and picks the join
    # strategy (broadcast while the group table is small, shuffle when
    # an unboundedly-high-cardinality group column makes it big).
    j = (df.select(group_col, value_col)
           .where(F.col(value_col).isNotNull())
           .join(br, group_col))
    # sub-row cushion guard: small groups take every row as candidate
    # (bounded by `accuracy` rows) with a zero below-count
    small = F.col("__n") <= accuracy
    # FUSED below-count + candidate pass (optimization round 10 — one
    # scan and one shuffle where two of each ran before): every row is
    # below its fraction's bracket, inside it, or above it. Above-rows
    # are dropped; in-bracket rows keep their value; below-rows map to
    # a NULL value, so the RLE aggregate collapses them into ONE
    # "pseudo-run" per (group, fraction) whose count IS the old
    # below-count. Ascending nulls-first ordering puts that pseudo-run
    # first in the rank window, so the cumulative count `__hi` becomes
    # the GLOBAL rank directly — no separate below-count aggregate, no
    # offset join, no bracket-table checkpoint+collect.
    i_col = (F.lit(0) if k == 1 else
             F.explode(F.array(*[F.lit(i) for i in range(k)])))
    v = F.col(value_col)
    lo_i = F.element_at("__q", F.col("__i") * 2 + 1)
    hi_i = F.element_at("__q", F.col("__i") * 2 + 2)
    is_cand = small | ((v >= lo_i) & (v <= hi_i))
    is_below = ~small & (v < lo_i)
    # RLE compression: one distributed aggregate collapses tie runs, so
    # the window below ranks value RUNS, never raw rows
    runs = (j.select(group_col, value_col, "__n", "__q",
                     i_col.alias("__i"))
             .where(is_cand | is_below)
             .groupBy(group_col, "__i", "__n",
                      F.when(is_cand, v).alias("__v"))
             .agg(F.count(F.lit(1)).alias("__c")))
    w = (Window.partitionBy(group_col, "__i")
               .orderBy(F.asc_nulls_first("__v")))
    ranked = runs.withColumn("__hi", F.sum("__c").over(w))
    p_i = F.element_at(F.array(*[F.lit(float(p)) for p in fractions]),
                       F.col("__i") + 1)
    pos = F.lit(1.0) + p_i * (F.col("__n") - 1)
    fl = F.floor(pos)
    frac = pos - fl
    vv = F.col("__v")
    # this run occupies global ranks (__hi-__c, __hi]; it contributes
    # the floor weight if it covers rank `fl`, plus the ceil weight if
    # it covers rank `fl`+1 (a single run covering both sums to exactly
    # value — identical to two tied rows). The NULL pseudo-run can
    # never hit (the 4x rank cushion keeps both target ranks past the
    # below-count); the isNotNull guard makes that explicit.
    lo_hit = ((fl > F.col("__hi") - F.col("__c")) & (fl <= F.col("__hi"))
              & vv.isNotNull())
    hi_hit = ((frac > 0) & (fl + 1 > F.col("__hi") - F.col("__c"))
              & (fl + 1 <= F.col("__hi")) & vv.isNotNull())
    contrib = (F.when(lo_hit, (1 - frac) * vv).otherwise(F.lit(0.0))
               + F.when(hi_hit, frac * vv).otherwise(F.lit(0.0)))
    piv = (ranked.where(lo_hit | hi_hit)
                 .groupBy(group_col)
                 .pivot("__i", list(range(k)))
                 .agg(F.sum(contrib)))
    return piv.select(group_col,
                      *[F.col(str(i)).alias(aliases[i]) for i in range(k)])


def grouped_trimmed_mean(df: DataFrame, group_col: str, value_col: str,
                         trim: float = 0.1, alias: str = "trimmed_mean",
                         accuracy: int | None = None) -> DataFrame:
    """Exact per-group trimmed mean (drop the lowest and highest
    floor(trim·n) rows BY RANK) that never materializes a group.

    The GROUPED_AGG pandas-UDF form sorts each group's entire value
    array in one executor buffer — a few huge groups OOM at corpus
    scale. Here the trim is resolved from two exact order statistics
    found by the same bracket-refine machinery as :func:`grouped_median`:

    1. one ``percentile_approx`` pass brackets the k-th smallest and
       k-th largest values (k = floor(trim·n), rank-cushion argument as
       in grouped_median — valid for n > accuracy; smaller groups take
       the all-candidates path);
    2. ONE fused pass (optimization round 10 — the side-count scan and
       the two candidate scans used to run separately) classifies each
       row against both brackets: outside-rows collapse into a
       NULL-valued pseudo-run per (group, side) carrying the exact
       outside-count, the ~8n/accuracy in-bracket candidates
       RLE-compress by value (tie-proof — see
       :func:`grouped_quantiles`);
    3. tiny per-(group, side) run windows (nulls first, so the
       pseudo-run seeds the cumulation and ranks are GLOBAL) select
       L = k-th smallest and H = k-th largest;
    4. one conditional aggregation assembles
       trimmed_sum = Σv − [Σ(v<L) + (k−c(v<L))·L] − [Σ(v>H) + (k−c(v>H))·H]
       which handles tie blocks spanning a cutoff exactly (the
       interchangeability of equal values makes rank-trim order-free).

    Returns (group_col, alias, n). Three parallel scans (down from
    five), zero data-sized windows, zero Python.
    """
    if accuracy is None:
        accuracy = EXACT_QUANTILE_ACC
    eps = 4.0 / accuracy
    probes = [max(0.0, trim - eps), min(1.0, trim + eps),
              max(0.0, 1.0 - trim - eps), min(1.0, 1.0 - trim + eps)]
    v = F.col(value_col)
    br = (df.groupBy(group_col)
            .agg(F.percentile_approx(value_col, probes, accuracy)
                  .alias("__q"),
                 F.count(value_col).alias("__n")))
    # `br` has exactly ONE consumer (this join) — no materialization;
    # AQE picks the join strategy from its runtime size (see
    # grouped_quantiles).
    j = (df.select(group_col, value_col)
           .where(v.isNotNull())
           .join(br, group_col))
    small = F.col("__n") <= accuracy
    k = F.floor(F.col("__n") * trim)
    # FUSED side-count + candidate pass (optimization round 10; the
    # grouped_quantiles null-pseudo-run construction, one per SIDE):
    # each row lands on side 0 (low cut) and/or side 1 (high cut) —
    # outside-rows map to a NULL value so the RLE aggregate collapses
    # them into one pseudo-run per (group, side) whose count is the
    # old __clo/__chi; in-bracket rows keep their value; rows beyond
    # either bracket's far edge are dropped. One scan and one shuffle
    # replace the three scans (sides, lo_cand, hi_cand) and their
    # shuffles, and the bracket table no longer checkpoint+collects.
    s_col = F.explode(F.array(F.lit(0), F.lit(1)))
    lo_s = F.when(F.col("__s") == 0, F.element_at("__q", 1)) \
            .otherwise(F.element_at("__q", 3))
    hi_s = F.when(F.col("__s") == 0, F.element_at("__q", 2)) \
            .otherwise(F.element_at("__q", 4))
    is_cand = small | ((v >= lo_s) & (v <= hi_s))
    is_out = ~small & F.when(F.col("__s") == 0, v < lo_s) \
                       .otherwise(v > hi_s)
    # RLE-compress candidates before ranking (ties would otherwise pull
    # unbounded tie runs through a single-task window — see
    # grouped_quantiles); `pin` the tiny run table once for its four
    # consumers (two rank windows, the n-frame, via cuts)
    runs = pin(j.select(group_col, value_col, "__n", "__q",
                        s_col.alias("__s"))
                .where(is_cand | is_out)
                .groupBy(group_col, "__s", "__n",
                         F.when(is_cand, v).alias("__v"))
                .agg(F.count(F.lit(1)).alias("__c")))
    vv = F.col("__v")
    # ascending nulls-first / descending nulls-first put each side's
    # pseudo-run FIRST in its window, so the cumulative count is the
    # side's GLOBAL trim rank directly (below-count absorbed)
    w_lo = Window.partitionBy(group_col).orderBy(F.asc_nulls_first("__v"))
    w_hi = Window.partitionBy(group_col).orderBy(F.desc_nulls_first("__v"))
    lo_runs = (runs.where(F.col("__s") == 0)
                   .withColumn("__hi", F.sum("__c").over(w_lo)))
    hi_runs = (runs.where(F.col("__s") == 1)
                   .withColumn("__hi", F.sum("__c").over(w_hi)))
    L = (lo_runs.where((k > F.col("__hi") - F.col("__c"))
                       & (k <= F.col("__hi")) & vv.isNotNull())
                .select(group_col, vv.alias("__L")))
    H = (hi_runs.where((k > F.col("__hi") - F.col("__c"))
                       & (k <= F.col("__hi")) & vv.isNotNull())
                .select(group_col, vv.alias("__H")))
    cuts = (runs.groupBy(group_col).agg(F.max("__n").alias("__n"))
                .join(L, group_col, "left").join(H, group_col, "left"))
    # no broadcast hint on the cuts join (optimization round 11,
    # VERDICT r10 #1-wrong): `cuts` is one row per GROUP — unbounded
    # group cardinality would make a forced driver-built broadcast the
    # same OOM the deleted bracket-collect machinery guarded against.
    # AQE sees the runtime size and still picks a broadcast join while
    # the group table is small (plan-verified), exactly like the
    # bracket join above.
    fin = (df.select(group_col, value_col)
             .where(v.isNotNull())
             .join(cuts, group_col)
             .groupBy(group_col)
             .agg(F.max("__n").alias("__n"),
                  F.max("__L").alias("__L"), F.max("__H").alias("__H"),
                  F.sum(v).alias("__tot"),
                  F.sum(F.when(v < F.col("__L"), v)).alias("__slt"),
                  F.sum((v < F.col("__L")).cast("long")).alias("__nlt"),
                  F.sum(F.when(v > F.col("__H"), v)).alias("__sgt"),
                  F.sum((v > F.col("__H")).cast("long")).alias("__ngt")))
    kk = F.floor(F.col("__n") * trim)
    trimmed = ((F.col("__tot")
                - (F.coalesce(F.col("__slt"), F.lit(0.0))
                   + (kk - F.coalesce(F.col("__nlt"), F.lit(0)))
                   * F.col("__L"))
                - (F.coalesce(F.col("__sgt"), F.lit(0.0))
                   + (kk - F.coalesce(F.col("__ngt"), F.lit(0)))
                   * F.col("__H")))
               / (F.col("__n") - 2 * kk))
    return fin.select(
        group_col,
        F.when(kk == 0, F.col("__tot") / F.col("__n"))
         .otherwise(trimmed).alias(alias),
        F.col("__n").alias("n"))


def loess_curve(df: DataFrame, x: str, y: str, grid: list[float],
                bandwidth: float, alias: str = "loess_fit",
                round_to: int = 4) -> DataFrame:
    """LOESS local-linear smoothing curve (the reference's repeated
    ``geom_smooth(method="loess")`` panels, 20210803_이승하.R:607,656,
    701,1114,1153) evaluated at a fixed grid — the single-pass
    fixed-bandwidth variant.

    At each grid point g, classic LOESS solves a tricube-weighted
    linear regression over the points within ``bandwidth``. Those G
    small regressions need only five weighted sums each (Σw, Σwx, Σwy,
    Σwxx, Σwxy), so ALL of them fuse into ONE aggregation over ONE
    scan — G×5 codegen'd conditional sums, no per-point passes, no
    sort, no Python. 100 TB cost: one map-side-combined aggregate.

    Differences from R's loess(): fixed bandwidth instead of a
    nearest-neighbor span, and no robustness iterations — the standard
    streaming formulation (each robustness iteration would simply be
    one more identical pass with reweighted sums).

    Returns (grid_x, alias, n_local) — n_local counts in-window rows.
    """
    xc, yc = F.col(x), F.col(y)
    d = df.where(xc.isNotNull() & yc.isNotNull())
    aggs = []
    for i, g in enumerate(grid):
        u = F.abs(xc - float(g)) / float(bandwidth)
        w = F.when(u < 1, (1 - u ** 3) ** 3).otherwise(F.lit(0.0))
        aggs += [
            F.sum(w).alias(f"sw_{i}"),
            F.sum(w * xc).alias(f"swx_{i}"),
            F.sum(w * yc).alias(f"swy_{i}"),
            F.sum(w * xc * xc).alias(f"swxx_{i}"),
            F.sum(w * xc * yc).alias(f"swxy_{i}"),
            F.sum((u < 1).cast("long")).alias(f"nl_{i}"),
        ]
    wide = d.agg(*aggs)
    fits = []
    for i, g in enumerate(grid):
        sw, swx, swy = (F.col(f"sw_{i}"), F.col(f"swx_{i}"),
                        F.col(f"swy_{i}"))
        swxx, swxy = F.col(f"swxx_{i}"), F.col(f"swxy_{i}")
        # nullif guards: an empty or constant-x window has no defined
        # local line — emit NULL rather than an ANSI divide-by-zero
        # (found by the hypothesis sweep in tests/test_properties.py)
        den = F.nullif(sw * swxx - swx * swx, F.lit(0.0))
        b = (sw * swxy - swx * swy) / den
        a = (swy - b * swx) / F.nullif(sw, F.lit(0.0))
        fits.append(F.struct(
            F.lit(float(g)).alias("grid_x"),
            F.round(a + b * float(g), round_to).alias(alias),
            F.col(f"nl_{i}").alias("n_local")))
    return (wide.select(F.explode(F.array(*fits)).alias("p"))
                .select("p.grid_x", f"p.{alias}", "p.n_local"))


def range_cumsum_by_group(df: DataFrame, group_col: str, order_col: str,
                          sum_cols: list[str]) -> DataFrame:
    """Per-group cumulative sums in ``order_col`` order without any
    single-task window — the grouped twin of :func:`range_cumsum`,
    built the same way as :func:`tie_avg_ranks_by_group`: rows are
    range-partitioned on the ORDER column (so no group's series lands
    on one task), per-(partition, group) cumulative windows run in
    parallel, and per-(partition, group) totals — bounded by
    #partitions × #groups — are prefix-summed into offsets and
    broadcast back. Adds ``cum_<col>`` for each sum column."""
    d = (df.repartitionByRange(F.col(order_col))
           .withColumn("__pid", F.spark_partition_id()))
    wl = (Window.partitionBy("__pid", group_col).orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    local = d
    for c in sum_cols:
        local = local.withColumn(f"__cum_{c}", F.sum(c).over(wl))
    # pin ONE evaluation (see tie_avg_ranks)
    local = pin(local)
    wo = (Window.partitionBy(group_col).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = local.groupBy("__pid", group_col).agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols])
    for c in sum_cols:
        off = off.withColumn(
            f"__off_{c}", F.coalesce(F.sum(f"__t_{c}").over(wo), F.lit(0)))
    res = local.join(
        F.broadcast(off.select("__pid", group_col,
                               *[f"__off_{c}" for c in sum_cols])),
        ["__pid", group_col])
    for c in sum_cols:
        res = res.withColumn(f"cum_{c}",
                             F.col(f"__off_{c}") + F.col(f"__cum_{c}"))
    return res.drop("__pid", *[f"__cum_{c}" for c in sum_cols],
                    *[f"__off_{c}" for c in sum_cols])
