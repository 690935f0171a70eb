"""Distribution-plot rendering — the reference's per-column EDA plots.

Reference parity: the R script saves one image per numeric column with
a histogram and boxplot side-by-side (20210803_이승하.R:363-379,
``hist`` + ``boxplot`` into ``변수별_분포그림/``) and a mixed
correlation plot (R:387-392, ``corrplot::corrplot.mixed``). This
module re-expresses both for a 100 TB engine:

- **Everything data-sized runs distributed** and returns bounded
  aggregates: histogram counts via the bucket-index aggregation
  (operators/profile.histogram — one shuffle, ≤ n_buckets rows),
  quartiles via the tie-proof bracket-refine
  (operators/stats.grouped_quantiles — never a per-group sort), and
  whisker ends / outlier counts via ONE fused conditional aggregate.
- **Only rendering happens on the driver**, from those ≤ n_buckets-row
  frames, with a dependency-free SVG writer (no matplotlib/ggplot in
  a cluster image; SVG is deterministic and diff-able, so the tests
  assert geometry, not pixels).

One deliberate divergence from R's boxplot: individual outlier points
are NOT rendered (at corpus scale they are millions of dots); the
plot prints the outlier COUNT beyond each Tukey fence instead, with
whiskers at the most extreme values inside the fences — the same
statistics, a scale-safe visual.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import profile, stats

__all__ = ["distribution_stats", "save_distribution_plots",
           "save_loess_plot", "save_corr_heatmap"]


# --------------------------------------------------------------------------
# distributed statistics gathering (bounded outputs)
# --------------------------------------------------------------------------

def distribution_stats(df: DataFrame, cols: list[str],
                       n_buckets: int = 30) -> dict:
    """All statistics the plots need, computed distributed:

    returns ``{col: {"hist": [(bucket_lo, n), ...], "min": .., "max":
    .., "p25": .., "p50": .., "p75": .., "lo_whisker": ..,
    "hi_whisker": .., "n_lo_out": .., "n_hi_out": .., "n": ..}}``.

    Cost: one fused min/max/count agg, one bucket aggregation per
    column (single shuffle each, ≤ n_buckets output rows), ONE melted
    bracket-refine pass for every column's quartiles, and one fused
    whisker/outlier agg — nothing driver-side scales with rows.
    """
    mm_aggs = []
    for c in cols:
        mm_aggs += [F.min(F.col(c).cast("double")).alias(f"{c}__mn"),
                    F.max(F.col(c).cast("double")).alias(f"{c}__mx"),
                    F.count(F.col(c)).alias(f"{c}__n")]
    mm = df.agg(*mm_aggs).collect()[0].asDict()

    melted_args = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
    melted = df.selectExpr(
        f"stack({len(cols)}, {melted_args}) as (column_name, __v)")
    q = {r["column_name"]: r for r in stats.grouped_quantiles(
        melted, "column_name", "__v", [0.25, 0.5, 0.75],
        ["p25", "p50", "p75"], accuracy=2000).collect()}

    # Tukey fences + whiskers + outlier counts in ONE fused agg: the
    # fence constants fold into codegen per column
    w_aggs = []
    fences = {}
    for c in cols:
        if c not in q:      # all-NULL column
            continue
        iqr = q[c]["p75"] - q[c]["p25"]
        lo_f, hi_f = q[c]["p25"] - 1.5 * iqr, q[c]["p75"] + 1.5 * iqr
        fences[c] = (lo_f, hi_f)
        v = F.col(c).cast("double")
        w_aggs += [
            F.min(F.when(v >= lo_f, v)).alias(f"{c}__lw"),
            F.max(F.when(v <= hi_f, v)).alias(f"{c}__hw"),
            F.sum(F.when(v < lo_f, 1).otherwise(0)).alias(f"{c}__nlo"),
            F.sum(F.when(v > hi_f, 1).otherwise(0)).alias(f"{c}__nhi"),
        ]
    w = df.agg(*w_aggs).collect()[0].asDict() if w_aggs else {}

    out = {}
    for c in cols:
        mn, mx, n = mm[f"{c}__mn"], mm[f"{c}__mx"], mm[f"{c}__n"]
        if n == 0 or mn is None:
            out[c] = {"n": 0, "hist": []}
            continue
        width = (mx - mn) / n_buckets if mx > mn else 1.0
        hist = [(r["bucket_lo"], r["n"]) for r in
                profile.histogram(df.select(F.col(c).cast("double")
                                             .alias(c)),
                                  c, mn, width, n_buckets)
                .orderBy("bucket").collect()]
        out[c] = {
            "n": int(n), "min": mn, "max": mx, "width": width,
            "n_buckets": n_buckets, "hist": hist,
            "p25": q[c]["p25"], "p50": q[c]["p50"], "p75": q[c]["p75"],
            "lo_whisker": w[f"{c}__lw"], "hi_whisker": w[f"{c}__hw"],
            "n_lo_out": int(w[f"{c}__nlo"]), "n_hi_out": int(w[f"{c}__nhi"]),
        }
    return out


# --------------------------------------------------------------------------
# driver-side SVG rendering (pure stdlib)
# --------------------------------------------------------------------------

_W, _H, _PAD = 1000, 500, 55


def _svg_header(title: str) -> list[str]:
    return [f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
            f'height="{_H}" viewBox="0 0 {_W} {_H}">',
            f'<title>{escape(title)}</title>',
            f'<rect width="{_W}" height="{_H}" fill="white"/>',
            f'<text x="{_W // 2}" y="24" text-anchor="middle" '
            f'font-size="18" font-family="sans-serif">'
            f'{escape(title)}</text>']


def _render_hist(lines: list[str], st: dict, x0: int, panel_w: int) -> None:
    top, bot = 50, _H - _PAD
    hist = st["hist"]
    peak = max((n for _, n in hist), default=1)
    # The bucket aggregation omits EMPTY buckets, so bar x must come
    # from each row's value range, not its position in the collected
    # list — otherwise any gap in the distribution compacts the bars
    # leftward and x stops corresponding to the value axis.
    nb = max(st.get("n_buckets", len(hist)), 1)
    bw = panel_w / nb
    for blo, n in hist:
        idx = min(max(int(round((blo - st["min"]) / st["width"])), 0),
                  nb - 1)
        h = (bot - top) * n / peak
        lines.append(
            f'<rect class="bar" x="{x0 + idx * bw:.1f}" '
            f'y="{bot - h:.1f}" width="{bw:.1f}" height="{h:.1f}" '
            f'fill="#7aa6c2" stroke="white" stroke-width="0.5">'
            f'<desc>[{blo:g}, {blo + st["width"]:g}): {n}</desc></rect>')
    # x axis + min/max tick labels (right tick = true axis end)
    lines.append(f'<line x1="{x0}" y1="{bot}" x2="{x0 + panel_w}" '
                 f'y2="{bot}" stroke="black"/>')
    lines.append(f'<text x="{x0}" y="{bot + 18}" font-size="11" '
                 f'font-family="sans-serif">{st["min"]:g}</text>')
    lines.append(f'<text x="{x0 + panel_w}" y="{bot + 18}" '
                 f'text-anchor="end" font-size="11" '
                 f'font-family="sans-serif">'
                 f'{st["min"] + st["width"] * nb:g}</text>')


def _render_box(lines: list[str], st: dict, x0: int, panel_w: int) -> None:
    top, bot = 60, _H - _PAD
    lo = min(st["lo_whisker"], st["p25"])
    hi = max(st["hi_whisker"], st["p75"])
    rng = (hi - lo) or 1.0

    def y(v: float) -> float:          # value -> vertical pixel
        return bot - (bot - top) * (v - lo) / rng

    cx = x0 + panel_w / 2
    bx, bw2 = cx - panel_w / 6, panel_w / 3
    lines.append(f'<line class="whisker" x1="{cx}" y1="{y(st["lo_whisker"]):.1f}" '
                 f'x2="{cx}" y2="{y(st["p25"]):.1f}" stroke="black"/>')
    lines.append(f'<line class="whisker" x1="{cx}" y1="{y(st["p75"]):.1f}" '
                 f'x2="{cx}" y2="{y(st["hi_whisker"]):.1f}" stroke="black"/>')
    lines.append(f'<rect class="box" x="{bx:.1f}" y="{y(st["p75"]):.1f}" '
                 f'width="{bw2:.1f}" '
                 f'height="{y(st["p25"]) - y(st["p75"]):.1f}" '
                 f'fill="#d8e6f0" stroke="black"/>')
    lines.append(f'<line class="median" x1="{bx:.1f}" y1="{y(st["p50"]):.1f}" '
                 f'x2="{bx + bw2:.1f}" y2="{y(st["p50"]):.1f}" '
                 f'stroke="black" stroke-width="2"/>')
    for v in (st["lo_whisker"], st["hi_whisker"]):
        lines.append(f'<line x1="{cx - bw2 / 4:.1f}" y1="{y(v):.1f}" '
                     f'x2="{cx + bw2 / 4:.1f}" y2="{y(v):.1f}" '
                     f'stroke="black"/>')
    # scale-safe outlier readout instead of per-point dots
    lines.append(f'<text class="outliers" x="{cx}" y="{bot + 18}" '
                 f'text-anchor="middle" font-size="11" '
                 f'font-family="sans-serif">outliers: '
                 f'{st["n_lo_out"]} low / {st["n_hi_out"]} high</text>')


def save_distribution_plots(df: DataFrame, cols: list[str], out_dir: str,
                            n_buckets: int = 30,
                            prefix: str = "training_") -> list[str]:
    """R:363-379 counterpart: one ``<prefix><col>.svg`` per column with
    histogram (left) + boxplot (right). Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    all_stats = distribution_stats(df, cols, n_buckets)
    paths = []
    panel_w = (_W - 3 * _PAD) // 2
    for c in cols:
        st = all_stats[c]
        lines = _svg_header(f"{c} (n={st.get('n', 0)})")
        if st["n"] > 0:
            _render_hist(lines, st, _PAD, panel_w)
            _render_box(lines, st, 2 * _PAD + panel_w, panel_w)
        else:
            lines.append(f'<text x="{_W // 2}" y="{_H // 2}" '
                         f'text-anchor="middle" font-family="sans-serif">'
                         f'no non-null values</text>')
        lines.append("</svg>")
        path = os.path.join(out_dir, f"{prefix}{c}.svg")
        with open(path, "w") as f:
            f.write("\n".join(lines))
        paths.append(path)
    return paths


def save_loess_plot(df: DataFrame, x: str, y: str, out_path: str,
                    n_grid: int = 25, n_points: int = 2000,
                    bandwidth: float | None = None) -> str:
    """R's repeated ``geom_smooth(method="loess")`` EDA panels
    (R:607,656,701,1114,1153): scatter + smoothing curve.

    Scale-safe construction: the CURVE comes from the fused one-pass
    LOESS aggregate (operators/stats.loess_curve — G×5 conditional
    sums in one scan) over ALL rows; the SCATTER is a deterministic
    md5-thresholded sample of ≤ ``n_points`` rows (plotting every
    point at 100 TB is neither possible nor useful — the curve is the
    statistic, the dots are context). Grid and bandwidth derive from
    the exact min/max."""
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    d = (df.where(xc.isNotNull() & yc.isNotNull())
           .select(xc.alias("__x"), yc.alias("__y")))
    mm = d.agg(F.min("__x").alias("xmn"), F.max("__x").alias("xmx"),
               F.min("__y").alias("ymn"), F.max("__y").alias("ymx"),
               F.count(F.lit(1)).alias("n")).collect()[0]
    if mm["n"] == 0:
        lines = _svg_header(f"{y} ~ {x} (n=0)") + ["</svg>"]
        with open(out_path, "w") as f:
            f.write("\n".join(lines))
        return out_path
    xmn, xmx = mm["xmn"], mm["xmx"]
    span = (xmx - xmn) or 1.0
    grid = [xmn + span * i / (n_grid - 1) for i in range(n_grid)]
    bw = bandwidth if bandwidth is not None else span / 4.0
    from .operators import stats as _stats
    curve = {r["grid_x"]: r["loess_fit"] for r in
             _stats.loess_curve(d, "__x", "__y", grid, bw).collect()}
    # deterministic sample: md5 of the row content, threshold scaled
    # by an exact count — no sample() RNG, reproducible across runs
    frac = min(1.0, n_points / mm["n"])
    thr = int(frac * (1 << 31))
    pts = (d.where(F.conv(F.substring(F.md5(
                F.concat_ws("|", F.col("__x"), F.col("__y"))), 1, 8),
                16, 10).cast("long") % (1 << 31) < thr)
             .limit(n_points).collect())
    ymn = min(mm["ymn"], *(v for v in curve.values() if v is not None))
    ymx = max(mm["ymx"], *(v for v in curve.values() if v is not None))
    yspan = (ymx - ymn) or 1.0
    top, bot, x0, x1 = 50, _H - _PAD, _PAD, _W - _PAD

    def px(v):
        return x0 + (x1 - x0) * (v - xmn) / span

    def py(v):
        return bot - (bot - top) * (v - ymn) / yspan

    lines = _svg_header(f"{y} ~ {x} (loess, n={mm['n']}, "
                        f"{len(pts)} sampled)")
    for r in pts:
        lines.append(f'<circle class="pt" cx="{px(r["__x"]):.1f}" '
                     f'cy="{py(r["__y"]):.1f}" r="1.6" fill="#7aa6c2" '
                     f'fill-opacity="0.5"/>')
    path = " ".join(
        f'{"M" if i == 0 else "L"} {px(g):.1f} {py(curve[g]):.1f}'
        for i, g in enumerate(grid) if curve.get(g) is not None)
    lines.append(f'<path class="loess" d="{path}" fill="none" '
                 f'stroke="#c24b4b" stroke-width="2.5"/>')
    lines.append(f'<line x1="{x0}" y1="{bot}" x2="{x1}" y2="{bot}" '
                 f'stroke="black"/>')
    lines.append(f'<line x1="{x0}" y1="{top}" x2="{x0}" y2="{bot}" '
                 f'stroke="black"/>')
    lines.append("</svg>")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return out_path


def save_corr_heatmap(df: DataFrame, cols: list[str],
                      out_path: str) -> str:
    """R:387-392 counterpart (``corrplot.mixed``): the fused one-pass
    correlation matrix (operators/stats.corr_matrix — k²/2 corr
    expressions in ONE aggregate) rendered as a value-annotated
    heatmap. Diverging blue-white-red fill on [-1, 1]."""
    pairs = {(r["col_x"], r["col_y"]): r["corr"]
             for r in stats.corr_matrix(df, cols).collect()}

    def corr(a: str, b: str):
        if a == b:
            return 1.0
        return pairs.get((a, b), pairs.get((b, a)))

    k = len(cols)
    cell = min(90, (_W - 2 * _PAD - 120) // max(k, 1))
    size = 2 * _PAD + cell * k + 120
    lines = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
             f'height="{size}" viewBox="0 0 {size} {size}">',
             f'<rect width="{size}" height="{size}" fill="white"/>']
    for i, a in enumerate(cols):
        lines.append(f'<text x="{_PAD + 110}" '
                     f'y="{_PAD + i * cell + cell * 0.6:.0f}" '
                     f'text-anchor="end" font-size="12" '
                     f'font-family="sans-serif">{escape(a)}</text>')
        for j, b in enumerate(cols):
            r = corr(a, b)
            if r is None:
                fill = "#eeeeee"
            elif r >= 0:
                g = int(255 * (1 - r))
                fill = f"rgb(255,{g},{g})"
            else:
                g = int(255 * (1 + r))
                fill = f"rgb({g},{g},255)"
            x = _PAD + 120 + j * cell
            y = _PAD + i * cell
            lines.append(f'<rect class="cell" x="{x}" y="{y}" '
                         f'width="{cell}" height="{cell}" fill="{fill}" '
                         f'stroke="white"/>')
            if r is not None:
                lines.append(f'<text x="{x + cell / 2:.0f}" '
                             f'y="{y + cell * 0.6:.0f}" '
                             f'text-anchor="middle" font-size="11" '
                             f'font-family="sans-serif">{r:.2f}</text>')
    lines.append("</svg>")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return out_path
