"""Automated network profiling → self-contained HTML report.

Reference: /root/reference/networkit/profiling/profiling.py (class
Profile: properties table + per-measure statistics/histograms +
measure-correlation matrix, rendered to HTML). The reference renders
through matplotlib/seaborn into an IPython page; this engine renders a
dependency-free HTML string with inline SVG histograms — every number
in the artifact is a DISTRIBUTED aggregate (stats in one agg per
measure, histograms as bucket counts, Spearman correlations as Pearson
over window ranks), so the report stays one driver-side page even when
the graph is 100 TB: only (bucket, count) and scalar rows ever reach
the driver.

Presets mirror the reference (profiling.py create(preset=...)):
  minimal  — properties + degree
  default  — + core number, local clustering, PageRank
  complete — + estimated betweenness (sampled sources)

Chart conventions: single-series monochrome bars (identity needs no
palette), text in ink tokens (never the mark color), native <title>
hover on every bar, and the bucket table shipped alongside each figure
as a <details> fallback.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph

#: single data hue on a white surface; text never wears it
_BAR = "#5778a4"
_INK = "#1a1a1a"
_MUT = "#707070"


def measure_stats(df: DataFrame, col: str) -> dict:
    """location/dispersion stats of one measure in ONE aggregation
    (the reference's stat.py battery, reduced to the distributed set)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.avg(col).alias("mean"),
        F.stddev_pop(col).alias("stddev"),
        F.expr(f"percentile_approx({col}, 0.5, 10000)").alias("median"),
        F.expr(f"percentile_approx({col}, 0.25, 10000)").alias("q1"),
        F.expr(f"percentile_approx({col}, 0.75, 10000)").alias("q3"),
    ).collect()[0]
    return {k: (float(row[k]) if row[k] is not None else 0.0)
            for k in ("min", "max", "mean", "stddev", "median", "q1", "q3")} \
        | {"n": int(row["n"])}


def measure_histogram(df: DataFrame, col: str, bins: int = 40) -> list:
    """[(bucket_lo, count)] — fixed-width buckets over [min, max]; the
    only rows collected are the ≤ ``bins`` bucket counts."""
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    lo, hi = float(lo or 0.0), float(hi or 0.0)
    if hi <= lo:
        n = df.count()
        return [(lo, n)]
    w = (hi - lo) / bins
    b = F.least(F.floor((F.col(col) - lo) / w).cast("int"), F.lit(bins - 1))
    rows = (df.groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b").collect())
    return [(lo + r["b"] * w, int(r["c"])) for r in rows]


def spearman(a: DataFrame, b: DataFrame, col: str = "score") -> float:
    """Spearman rank correlation of two (id, score) vectors — Pearson of
    window ranks (the reference's measure-correlation cell)."""
    ra = a.select("id", F.rank().over(
        Window.orderBy(F.col(col))).alias("ra"))
    rb = b.select("id", F.rank().over(
        Window.orderBy(F.col(col))).alias("rb"))
    row = ra.join(rb, "id").agg(F.corr("ra", "rb").alias("r")).collect()[0]
    return float(row["r"]) if row["r"] is not None else float("nan")


def _collect_measures(g: Graph, preset: str,
                      seed: int = 42) -> dict[str, DataFrame]:
    from networkit_spark.operators.degrees import degree_centrality

    out: dict[str, DataFrame] = {
        "Degree": degree_centrality(g).select("id", "score")}
    if preset == "minimal":
        return out
    from networkit_spark.operators.kcore import core_decomposition
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.operators.triangles import (
        local_clustering_coefficients)

    out["k-Core Decomposition"] = core_decomposition(g).select(
        "id", F.col("core").cast("double").alias("score"))
    out["Local Clustering Coefficient"] = \
        local_clustering_coefficients(g).select(
            "id", F.col("lcc").alias("score"))
    out["PageRank"] = pagerank(g).select(
        "id", F.col("rank").alias("score"))
    if preset == "complete":
        from networkit_spark.operators.betweenness import (
            estimate_betweenness)
        out["Betweenness (est.)"] = estimate_betweenness(
            g, n_samples=16, seed=seed).select("id", "score")
    return out


def _svg_hist(hist: list, width: int = 460, height: int = 120) -> str:
    """Monochrome SVG bar histogram: thin bars, 2px gaps, native <title>
    hover per bar, min/max tick labels only (selective labeling)."""
    if not hist:
        return "<svg/>"
    peak = max(c for _, c in hist) or 1
    n = len(hist)
    pad, axis_h = 4, 16
    bw = max(1.0, (width - pad * 2) / n - 2)
    bars = []
    for i, (lo, c) in enumerate(hist):
        h = (height - axis_h - pad) * c / peak
        x = pad + i * ((width - pad * 2) / n)
        y = height - axis_h - h
        bars.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" '
            f'height="{h:.1f}" rx="1" fill="{_BAR}">'
            f'<title>{lo:.6g}: {c}</title></rect>')
    lab_lo = f'{hist[0][0]:.4g}'
    lab_hi = f'{hist[-1][0]:.4g}'
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" role="img">'
        f'<line x1="{pad}" y1="{height - axis_h}" x2="{width - pad}" '
        f'y2="{height - axis_h}" stroke="#d0d0d0" stroke-width="1"/>'
        + "".join(bars)
        + f'<text x="{pad}" y="{height - 3}" font-size="10" '
          f'fill="{_MUT}">{lab_lo}</text>'
        + f'<text x="{width - pad}" y="{height - 3}" font-size="10" '
          f'fill="{_MUT}" text-anchor="end">{lab_hi}</text>'
        + "</svg>")


def _stats_table(stats: dict) -> str:
    keys = ["n", "min", "q1", "median", "mean", "q3", "max", "stddev"]
    cells = "".join(
        f"<tr><td>{k}</td><td>{stats[k]:.6g}</td></tr>" for k in keys)
    return f'<table class="st">{cells}</table>'


def _hist_details(hist: list) -> str:
    rows = "".join(f"<tr><td>{lo:.6g}</td><td>{c}</td></tr>"
                   for lo, c in hist)
    return ("<details><summary>histogram data</summary>"
            f'<table class="st"><tr><th>bucket&nbsp;≥</th><th>count</th>'
            f"</tr>{rows}</table></details>")


def profile_report(g: Graph, name: str = "graph",
                   preset: str = "default", seed: int = 42) -> str:
    """The HTML profile artifact (reference Profile.output('HTML', …)):
    properties table, per-measure stats + SVG histogram + data table,
    and the Spearman correlation matrix between node measures."""
    from networkit_spark.operators.graph_tools import profile as _props

    if preset not in ("minimal", "default", "complete"):
        raise ValueError(f"unknown preset {preset!r} "
                         "(minimal | default | complete)")
    props = _props(g)
    measures = _collect_measures(g, preset, seed=seed)
    names = list(measures)

    sections = []
    for mname, df in measures.items():
        st = measure_stats(df, "score")
        hist = measure_histogram(df, "score")
        sections.append(
            f"<h2>{_html.escape(mname)}</h2>"
            '<div class="row">' + _svg_hist(hist) + _stats_table(st)
            + "</div>" + _hist_details(hist))

    corr_rows = []
    if len(names) > 1:
        header = "".join(f"<th>{_html.escape(n)}</th>" for n in names[1:])
        corr_rows.append(f"<tr><th></th>{header}</tr>")
        for i, a in enumerate(names[:-1]):
            cells = []
            for b in names[1:]:
                j = names.index(b)
                if j <= i:
                    cells.append("<td></td>")
                else:
                    r = spearman(measures[a], measures[b])
                    cells.append(f"<td>{r:+.3f}</td>")
            corr_rows.append(
                f"<tr><th>{_html.escape(a)}</th>{''.join(cells)}</tr>")
    corr_html = (f'<h2>Spearman rank correlations</h2>'
                 f'<table class="st">{"".join(corr_rows)}</table>'
                 if corr_rows else "")

    prop_rows = "".join(
        f"<tr><td>{_html.escape(str(k))}</td><td>{v:.6g}</td></tr>"
        if isinstance(v, float) else
        f"<tr><td>{_html.escape(str(k))}</td><td>{v}</td></tr>"
        for k, v in props.items())
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>networkit_spark profile: {_html.escape(name)}</title>
<style>
 body {{ font: 14px system-ui, sans-serif; color: {_INK};
         margin: 2rem auto; max-width: 56rem; background: #fff; }}
 h1, h2 {{ font-weight: 600; }}
 .row {{ display: flex; gap: 1.5rem; align-items: flex-start;
          flex-wrap: wrap; }}
 table.st {{ border-collapse: collapse; }}
 table.st td, table.st th {{ border: 1px solid #e0e0e0;
    padding: 2px 8px; text-align: right; font-variant-numeric: tabular-nums; }}
 table.st th {{ color: {_MUT}; font-weight: 500; }}
 details {{ color: {_MUT}; margin: .3rem 0 1rem; }}
</style></head><body>
<h1>Network profile — {_html.escape(name)} <small>({preset})</small></h1>
<h2>Properties</h2><table class="st">{prop_rows}</table>
{''.join(sections)}
{corr_html}
</body></html>"""


def write_report(g: Graph, path: str, name: str = "graph",
                 preset: str = "default", seed: int = 42) -> str:
    """Render and write the HTML profile; returns the path."""
    doc = profile_report(g, name=name, preset=preset, seed=seed)
    with open(path, "w") as f:
        f.write(doc)
    return path
