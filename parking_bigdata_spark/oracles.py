"""DuckDB oracle-SQL generators for the linear-algebra queries.

The OLS / ridge / VIF operators solve normal-equation systems whose
sufficient statistics are one fused aggregate (operators/ml.py). Their
oracles were rows-only in round 1; these generators emit plain ANSI SQL
that rebuilds the same Gram matrix in DuckDB and solves the small
system symbolically via Cramer's rule (k ≤ 4 ⇒ ≤ 24-term determinant
expansions — generated, never handwritten).

Numerical note: Cramer's rule is only safe because these Gram matrices
are far from collinear (TPC-H quantity/discount/tax are independent);
the determinant cancellation factor is O(10), so the SQL solution
agrees with numpy's LU solve to ~1e-12 relative — far inside the
4-decimal rounding the queries emit.
"""

from __future__ import annotations

from itertools import permutations


def _perm_sign(p: tuple[int, ...]) -> int:
    s = 1
    for i in range(len(p)):
        for j in range(i + 1, len(p)):
            if p[i] > p[j]:
                s = -s
    return s


def sql_det(M: list[list[str]]) -> str:
    """Symbolic determinant of a small matrix of SQL expressions
    (Leibniz expansion — fine for n ≤ 4)."""
    n = len(M)
    terms = []
    for p in permutations(range(n)):
        sgn = "+" if _perm_sign(p) > 0 else "-"
        terms.append(f" {sgn} " + " * ".join(M[i][p[i]] for i in range(n)))
    return "(" + "".join(terms) + ")"


def _g(i: int, j: int) -> str:
    a, b = min(i, j), max(i, j)
    return f"g_{a}_{b}"


def _gram_select(xs: list[str], y: str | None, table: str) -> str:
    """The m CTE: upper triangle of [1,x..]ᵀ[1,x..] (+ Xᵀy, yᵀy),
    mirroring ml._gram_aggregate's one-pass statistics."""
    cols = ["__one__"] + xs
    items = []
    for i, a in enumerate(cols):
        for j in range(i, len(cols)):
            b = cols[j]
            if i == 0 and j == 0:
                expr = "CAST(count(*) AS DOUBLE)"
            elif i == 0:
                expr = f"sum({b})"
            else:
                expr = f"sum({a} * {b})"
            items.append(f"{expr} AS {_g(i, j)}")
        if y:
            expr = f"sum({y})" if i == 0 else f"sum({cols[i]} * {y})"
            items.append(f"{expr} AS xy_{i}")
    if y:
        items.append(f"sum({y} * {y}) AS yy")
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in xs + ([y] if y else []))
    return ("SELECT " + ",\n       ".join(items)
            + f"\nFROM {table} WHERE {notnull}")


def normal_eq_sql(xs: list[str], y: str, table: str = "lineitem",
                  lam: float | None = None, round_to: int = 4) -> str:
    """Oracle for ols_fit_df / ridge_fit_df: (term, estimate) rows from
    a Cramer solve of (XᵀX [+ λI, intercept unpenalized]) β = Xᵀy."""
    k = len(xs) + 1
    G = [[_g(i, j) for j in range(k)] for i in range(k)]
    if lam is not None:
        for i in range(1, k):
            G[i][i] = f"({_g(i, i)} + {float(lam)!r})"
    b = [f"xy_{i}" for i in range(k)]
    det = sql_det(G)
    names = ["intercept"] + [f"coef_{c}" for c in xs]
    sels = []
    for j, name in enumerate(names):
        Mj = [[b[i] if c == j else G[i][c] for c in range(k)]
              for i in range(k)]
        sels.append(
            f"SELECT '{name}' AS term,\n"
            f"  round({sql_det(Mj)}\n  / {det}, {round_to}) AS estimate"
            "\nFROM m")
    return ("WITH m AS (\n" + _gram_select(xs, y, table) + "\n)\n"
            + "\nUNION ALL\n".join(sels))


def vif_sql(cols: list[str], table: str = "lineitem",
            round_to: int = 4) -> str:
    """Oracle for ml.vif_scores: per feature j, R²_j of regressing j on
    intercept+others (Cramer submatrix solve, shared m CTE), then
    VIF = SST/SSE. Output (feature, r2, vif)."""
    k = len(cols) + 1
    sels = []
    for j, c in enumerate(cols):
        yi = j + 1
        others = [0] + [i + 1 for i in range(len(cols)) if i != j]
        A = [[_g(a, b) for b in others] for a in others]
        bvec = [_g(a, yi) for a in others]
        det = sql_det(A)
        dots = []
        for col_i in range(len(others)):
            Mi = [[bvec[r] if cc == col_i else A[r][cc]
                   for cc in range(len(others))] for r in range(len(others))]
            dots.append(f"{bvec[col_i]} * {sql_det(Mi)}")
        sse = (f"({_g(yi, yi)} - ({' + '.join(dots)})\n  / {det})")
        sst = f"({_g(yi, yi)} - {_g(0, yi)} * {_g(0, yi)} / g_0_0)"
        sels.append(
            f"SELECT '{c}' AS feature,\n"
            f"  round(1.0 - {sse} / {sst}, {round_to}) AS r2,\n"
            f"  round({sst} / {sse}, {round_to}) AS vif\nFROM m")
    assert k <= 5, "Leibniz expansion is for small systems only"
    return ("WITH m AS (\n" + _gram_select(cols, None, table) + "\n)\n"
            + "\nUNION ALL\n".join(sels))


def score_holdout_sql(xs: list[str], y: str, keys: list[str],
                      table: str = "lineitem", fold_mod: int = 5,
                      round_to: int = 4, out_round: int = 6) -> str:
    """Oracle for the train→test scoring query: fit OLS on the training
    folds (key % fold_mod ≠ 0) via the Cramer solve, round the
    coefficients to ``round_to`` (BOTH engines then score with the
    identical decimal coefficients, so per-row predictions are
    bit-identical IEEE arithmetic), and emit per-key
    actual/predicted/residual on the held-out fold.

    Outputs round at ``out_round`` = 6 decimals, NOT 4: 4-decimal coefs
    times 2-decimal inputs give 6-decimal-exact values, so a 4-decimal
    round would hit exact half-way ties (~1% of rows) that the two
    engines' last-ulp representations break differently; at 6 decimals
    the round is exact and tie-free."""
    k = len(xs) + 1
    G = [[_g(i, j) for j in range(k)] for i in range(k)]
    b = [f"xy_{i}" for i in range(k)]
    det = sql_det(G)
    coef_items = []
    for j in range(k):
        Mj = [[b[i] if c == j else G[i][c] for c in range(k)]
              for i in range(k)]
        coef_items.append(f"round({sql_det(Mj)}\n  / {det}, {round_to})"
                          f" AS b{j}")
    train = (f"(SELECT * FROM {table} "
             f"WHERE {keys[0]} % {fold_mod} <> 0) __tr")
    m = _gram_select(xs, y, train)
    pred = " + ".join([f"b0"] + [f"b{i + 1} * {c}"
                                 for i, c in enumerate(xs)])
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in xs + [y])
    return (
        "WITH m AS (\n" + m + "\n), c AS (\n"
        "SELECT " + ",\n       ".join(coef_items) + "\nFROM m\n)\n"
        f"SELECT {', '.join(keys)}, {y} AS actual,\n"
        f"       round({pred}, {out_round}) AS predicted,\n"
        f"       round({y} - ({pred}), {out_round}) AS residual\n"
        f"FROM {table}, c\n"
        f"WHERE {keys[0]} % {fold_mod} = 0 AND {notnull}")


def huber_sql(x: str, y: str, delta: float = 1000.0, n_iter: int = 2,
              table: str = "lineitem", round_to: int = 4) -> str:
    """Oracle for ml.huber_fit_df: the identical IRLS unrolled into
    chained CTEs — iteration t's weights come from iteration t−1's
    6-dp-rounded coefficients, so both engines score with the same
    decimal constants (the score_holdout_sql determinism recipe)."""
    notnull = f"{x} IS NOT NULL AND {y} IS NOT NULL"
    ctes = []
    for it in range(n_iter + 1):
        if it == 0:
            w = "1.0"
            src = table
        else:
            r = f"abs({y} - (c{it - 1}.b0 + c{it - 1}.b1 * {x}))"
            w = (f"CASE WHEN {r} <= {delta!r} THEN 1.0 "
                 f"ELSE {delta!r} / {r} END")
            src = f"{table}, c{it - 1}"
        ctes.append(
            f"s{it} AS (\n"
            f"  SELECT sum({w}) AS sw, sum(({w}) * {x}) AS swx,\n"
            f"         sum(({w}) * {y}) AS swy,\n"
            f"         sum(({w}) * {x} * {x}) AS swxx,\n"
            f"         sum(({w}) * {x} * {y}) AS swxy\n"
            f"  FROM {src} WHERE {notnull}\n)")
        ctes.append(
            f"c{it} AS (\n"
            f"  SELECT round((sw * swxy - swx * swy)\n"
            f"               / (sw * swxx - swx * swx), 6) AS b1,\n"
            f"         round((swy - round((sw * swxy - swx * swy)\n"
            f"                            / (sw * swxx - swx * swx), 6)\n"
            f"                      * swx) / sw, 6) AS b0\n"
            f"  FROM s{it}\n)")
    last = f"c{n_iter}"
    return ("WITH " + ",\n".join(ctes) + "\n"
            f"SELECT 'intercept' AS term, round(b0, {round_to}) AS estimate"
            f" FROM {last}\n"
            "UNION ALL\n"
            f"SELECT 'coef_{x}' AS term, round(b1, {round_to}) AS estimate"
            f" FROM {last}")


def poisson_glm_sql(xs: list[str], y: str, table: str, n_iter: int = 3,
                    round_to: int = 4) -> str:
    """Oracle for ml.poisson_glm_df: IRLS unrolled into chained CTEs.
    Iteration t computes μ = round(exp(η), 6) from iteration t−1's
    6-dp coefficients (identical decimal constants on both engines),
    aggregates the weighted Gram + working response, and Cramer-solves
    the (k+1)-system, rounding the new coefficients to 6 dp."""
    k = len(xs) + 1
    cols = ["1.0"] + xs
    names = ["intercept"] + [f"coef_{c}" for c in xs]
    # same row filter as ml.poisson_glm_df: a row with ANY null feature
    # or target is dropped entirely (code-review r02 — sum() skipping
    # only the null PRODUCTS would silently diverge from the operator)
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in xs + [y])
    ctes = [f"c0 AS (\n  SELECT round(ln(avg({y})), 6) AS b0, "
            + ", ".join(f"0.0 AS b{i}" for i in range(1, k))
            + f"\n  FROM {table} WHERE {notnull}\n)"]
    for it in range(1, n_iter + 1):
        p = f"c{it - 1}"
        eta = f"({p}.b0" + "".join(
            f" + {p}.b{i} * {c}" for i, c in enumerate(xs, 1)) + ")"
        mu = f"round(exp({eta}), 6)"
        items = []
        for i in range(k):
            for j in range(i, k):
                items.append(f"sum({mu} * {cols[i]} * {cols[j]})"
                             f" AS h_{i}_{j}")
            items.append(f"sum({cols[i]} * ({mu} * {eta} + {y} - {mu}))"
                         f" AS r_{i}")
        ctes.append(f"m{it} AS (\n  SELECT "
                    + ",\n         ".join(items)
                    + f"\n  FROM {table}, {p} WHERE {notnull}\n)")
        H = [[f"h_{min(i, j)}_{max(i, j)}" for j in range(k)]
             for i in range(k)]
        det = sql_det(H)
        sols = []
        for col in range(k):
            Mj = [[f"r_{i}" if c == col else H[i][c] for c in range(k)]
                  for i in range(k)]
            sols.append(f"round({sql_det(Mj)}\n  / {det}, 6) AS b{col}")
        ctes.append(f"c{it} AS (\n  SELECT "
                    + ",\n         ".join(sols) + f"\n  FROM m{it}\n)")
    last = f"c{n_iter}"
    sels = [f"SELECT '{nm}' AS term, round(b{i}, {round_to}) AS estimate"
            f" FROM {last}" for i, nm in enumerate(names)]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def lad_sql(x: str, y: str, eps: float = 1.0, n_iter: int = 2,
            table: str = "lineitem", round_to: int = 4) -> str:
    """Oracle for ml.lad_fit_df: the 1/max(|r|, eps) IRLS unrolled into
    chained CTEs with the same 6-dp inter-iteration rounding as
    huber_sql."""
    notnull = f"{x} IS NOT NULL AND {y} IS NOT NULL"
    ctes = []
    for it in range(n_iter + 1):
        if it == 0:
            w = "1.0"
            src = table
        else:
            r = f"abs({y} - (c{it - 1}.b0 + c{it - 1}.b1 * {x}))"
            w = f"1.0 / greatest({r}, {eps!r})"
            src = f"{table}, c{it - 1}"
        ctes.append(
            f"s{it} AS (\n"
            f"  SELECT sum({w}) AS sw, sum(({w}) * {x}) AS swx,\n"
            f"         sum(({w}) * {y}) AS swy,\n"
            f"         sum(({w}) * {x} * {x}) AS swxx,\n"
            f"         sum(({w}) * {x} * {y}) AS swxy\n"
            f"  FROM {src} WHERE {notnull}\n)")
        ctes.append(
            f"c{it} AS (\n"
            f"  SELECT round((sw * swxy - swx * swy)\n"
            f"               / (sw * swxx - swx * swx), 6) AS b1,\n"
            f"         round((swy - round((sw * swxy - swx * swy)\n"
            f"                            / (sw * swxx - swx * swx), 6)\n"
            f"                      * swx) / sw, 6) AS b0\n"
            f"  FROM s{it}\n)")
    last = f"c{n_iter}"
    return ("WITH " + ",\n".join(ctes) + "\n"
            f"SELECT 'intercept' AS term, round(b0, {round_to}) AS estimate"
            f" FROM {last}\n"
            "UNION ALL\n"
            f"SELECT 'coef_{x}' AS term, round(b1, {round_to}) AS estimate"
            f" FROM {last}")


def gmm_em_sql(x: str, table: str, n_iter: int = 3,
               round_to: int = 4) -> str:
    """Oracle for ml.gmm_em_1d: the two-component EM unrolled into
    chained CTEs with the same 6-dp inter-iteration parameter rounding
    (σ from the ROUNDED mean, matching the operator exactly)."""
    notnull = f"{x} IS NOT NULL"
    ctes = [
        # nullif: a zero stddev (constant or empty input) must yield
        # all-NULL parameters like ml.gmm_em_1d's early return — NULL
        # propagates through every CTE, NaN would not (code-review r02)
        f"c0 AS (\n"
        f"  SELECT 0.5 AS p1,\n"
        f"         round(avg({x}) - nullif(stddev_samp({x}), 0), 6)"
        f" AS mu1,\n"
        f"         round(avg({x}) + nullif(stddev_samp({x}), 0), 6)"
        f" AS mu2,\n"
        f"         round(nullif(stddev_samp({x}), 0), 6) AS s1,\n"
        f"         round(nullif(stddev_samp({x}), 0), 6) AS s2\n"
        f"  FROM {table} WHERE {notnull}\n)"]
    for it in range(1, n_iter + 1):
        p = f"c{it - 1}"
        d1 = (f"({p}.p1 / {p}.s1) * exp(-(({x} - {p}.mu1) * ({x} - {p}.mu1))"
              f" / (2.0 * {p}.s1 * {p}.s1))")
        d2 = (f"((1.0 - {p}.p1) / {p}.s2) * exp(-(({x} - {p}.mu2)"
              f" * ({x} - {p}.mu2)) / (2.0 * {p}.s2 * {p}.s2))")
        r = f"round(({d1}) / (({d1}) + ({d2})), 9)"
        ctes.append(
            f"m{it} AS (\n"
            f"  SELECT count(*) AS n, sum({r}) AS sr,\n"
            f"         sum({r} * {x}) AS srx,\n"
            f"         sum({r} * {x} * {x}) AS srx2,\n"
            f"         sum((1 - {r}) * {x}) AS scx,\n"
            f"         sum((1 - {r}) * {x} * {x}) AS scx2\n"
            f"  FROM {table}, {p} WHERE {notnull}\n)")
        ctes.append(
            f"c{it} AS (\n"
            f"  SELECT round(sr / n, 6) AS p1,\n"
            f"         round(srx / sr, 6) AS mu1,\n"
            f"         round(scx / (n - sr), 6) AS mu2,\n"
            f"         round(sqrt(greatest(srx2 / sr\n"
            f"               - round(srx / sr, 6) * round(srx / sr, 6),\n"
            f"               1e-12)), 6) AS s1,\n"
            f"         round(sqrt(greatest(scx2 / (n - sr)\n"
            f"               - round(scx / (n - sr), 6)\n"
            f"                 * round(scx / (n - sr), 6),\n"
            f"               1e-12)), 6) AS s2\n"
            f"  FROM m{it}\n)")
    last = f"c{n_iter}"
    return ("WITH " + ",\n".join(ctes) + "\n"
            f"SELECT 1 AS component, round(p1, {round_to}) AS weight,\n"
            f"       round(mu1, {round_to}) AS mean,"
            f" round(s1, {round_to}) AS std FROM {last}\n"
            "UNION ALL\n"
            f"SELECT 2 AS component, round(1.0 - p1, {round_to}) AS weight,\n"
            f"       round(mu2, {round_to}) AS mean,"
            f" round(s2, {round_to}) AS std FROM {last}")


def quantile_reg_sql(x: str, y: str, tau: float = 0.9, eps: float = 1.0,
                     n_iter: int = 2, table: str = "lineitem",
                     round_to: int = 4) -> str:
    """Oracle for ml.quantile_fit_df: the asymmetric-check IRLS
    unrolled into chained CTEs — lad_sql with the τ/(1−τ) sign weight."""
    notnull = f"{x} IS NOT NULL AND {y} IS NOT NULL"
    ctes = []
    for it in range(n_iter + 1):
        if it == 0:
            w = "1.0"
            src = table
        else:
            r = f"({y} - (c{it - 1}.b0 + c{it - 1}.b1 * {x}))"
            w = (f"(CASE WHEN {r} >= 0 THEN {tau!r} ELSE {1.0 - tau!r} END"
                 f" / greatest(abs({r}), {eps!r}))")
            src = f"{table}, c{it - 1}"
        ctes.append(
            f"s{it} AS (\n"
            f"  SELECT sum({w}) AS sw, sum(({w}) * {x}) AS swx,\n"
            f"         sum(({w}) * {y}) AS swy,\n"
            f"         sum(({w}) * {x} * {x}) AS swxx,\n"
            f"         sum(({w}) * {x} * {y}) AS swxy\n"
            f"  FROM {src} WHERE {notnull}\n)")
        ctes.append(
            f"c{it} AS (\n"
            f"  SELECT round((sw * swxy - swx * swy)\n"
            f"               / (sw * swxx - swx * swx), 6) AS b1,\n"
            f"         round((swy - round((sw * swxy - swx * swy)\n"
            f"                            / (sw * swxx - swx * swx), 6)\n"
            f"                      * swx) / sw, 6) AS b0\n"
            f"  FROM s{it}\n)")
    last = f"c{n_iter}"
    return ("WITH " + ",\n".join(ctes) + "\n"
            f"SELECT 'intercept' AS term, round(b0, {round_to}) AS estimate"
            f" FROM {last}\n"
            "UNION ALL\n"
            f"SELECT 'coef_{x}' AS term, round(b1, {round_to}) AS estimate"
            f" FROM {last}")
