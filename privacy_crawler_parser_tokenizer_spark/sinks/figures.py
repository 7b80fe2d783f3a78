"""Figure sinks: the reference's matplotlib artifacts as dependency-free
SVG (no matplotlib in the sandbox; SVG is plain XML, so the renderer is
~string building and the output opens in any browser).

Reference artifacts re-expressed:
  * per-policy / corpus rule bar chart   (src/statistics/sentences.py:113-124)
  * domain link-count histogram          (src/statistics/domains.py:22-28,
                                          bins [0..10, 20, 50])
  * verification histogram + boxplot     (src/verification/verify.py:276-288)
  * list-stats visualization             (src/statistics/lists.py:62-76)

Division of labor is the engine's usual one: every aggregate (counts,
bins, quantiles) is computed IN SPARK and only the handful of summary
rows reach the driver, which renders them to SVG — figures never pull
row-level data driver-side.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

W, H = 640, 400
MARGIN = 60
_STYLE = (
    "text{font-family:sans-serif;font-size:12px}"
    ".title{font-size:15px;font-weight:bold}"
    ".bar{fill:#4472c4}.box{fill:#9dc3e6;stroke:#2e5f8a}"
    ".axis{stroke:#333;stroke-width:1}.whisker{stroke:#2e5f8a}"
)


def _svg(body: str, width: int = W, height: int = H) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f"<style>{_STYLE}</style>{body}</svg>"
    )


def _axes(title: str, xlabel: str, ylabel: str,
          width: int = W, height: int = H) -> str:
    cx = width // 2
    return (
        f'<text class="title" x="{cx}" y="20" text-anchor="middle">'
        f"{escape(title)}</text>"
        f'<line class="axis" x1="{MARGIN}" y1="{height - MARGIN}" '
        f'x2="{width - 20}" y2="{height - MARGIN}"/>'
        f'<line class="axis" x1="{MARGIN}" y1="30" x2="{MARGIN}" '
        f'y2="{height - MARGIN}"/>'
        f'<text x="{cx}" y="{height - 8}" text-anchor="middle">'
        f"{escape(xlabel)}</text>"
        f'<text x="14" y="{height // 2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {height // 2})">{escape(ylabel)}</text>'
    )


def bar_chart_svg(items: list[tuple[str, float]], title: str,
                  xlabel: str = "", ylabel: str = "",
                  width: int = W, height: int = H) -> str:
    """Vertical bar chart; one bar per (label, value)."""
    body = _axes(title, xlabel, ylabel, width, height)
    if items:
        vmax = max(v for _, v in items) or 1
        plot_w, plot_h = width - MARGIN - 20, height - MARGIN - 30
        bw = plot_w / len(items)
        for i, (label, v) in enumerate(items):
            bh = v / vmax * (plot_h - 10)
            x = MARGIN + i * bw + bw * 0.125
            y = height - MARGIN - bh
            body += (
                f'<rect class="bar" x="{x:.1f}" y="{y:.1f}" '
                f'width="{bw * 0.75:.1f}" height="{bh:.1f}">'
                f"<title>{escape(str(label))}: {v:g}</title></rect>"
                f'<text x="{x + bw * 0.375:.1f}" y="{y - 3:.1f}" '
                f'text-anchor="middle">{v:g}</text>'
                f'<text x="{x + bw * 0.375:.1f}" y="{height - MARGIN + 14}" '
                f'text-anchor="middle">{escape(str(label))}</text>'
            )
    return _svg(body, width, height)


def boxplot_svg(groups: list[tuple[str, tuple[float, float, float, float, float]]],
                title: str, ylabel: str = "",
                width: int = W, height: int = H) -> str:
    """Boxplots; each group is (label, (min, q1, median, q3, max))."""
    body = _axes(title, "", ylabel, width, height)
    if groups:
        lo = min(g[1][0] for g in groups)
        hi = max(g[1][4] for g in groups)
        span = (hi - lo) or 1.0
        plot_h = height - MARGIN - 40
        gw = (width - MARGIN - 20) / len(groups)

        def y(v: float) -> float:
            return height - MARGIN - (v - lo) / span * plot_h

        for i, (label, (mn, q1, med, q3, mx)) in enumerate(groups):
            cx = MARGIN + (i + 0.5) * gw
            bw = gw * 0.4
            body += (
                f'<line class="whisker" x1="{cx:.1f}" y1="{y(mn):.1f}" '
                f'x2="{cx:.1f}" y2="{y(mx):.1f}"/>'
                f'<rect class="box" x="{cx - bw / 2:.1f}" y="{y(q3):.1f}" '
                f'width="{bw:.1f}" height="{max(y(q1) - y(q3), 1):.1f}">'
                f"<title>{escape(str(label))}: min {mn:g} q1 {q1:g} "
                f"med {med:g} q3 {q3:g} max {mx:g}</title></rect>"
                f'<line class="axis" x1="{cx - bw / 2:.1f}" y1="{y(med):.1f}" '
                f'x2="{cx + bw / 2:.1f}" y2="{y(med):.1f}"/>'
                f'<text x="{cx:.1f}" y="{height - MARGIN + 14}" '
                f'text-anchor="middle">{escape(str(label))}</text>'
            )
    return _svg(body, width, height)


def panel_svg(figures: list[str], cols: int = 2,
              cell_w: int = W, cell_h: int = H) -> str:
    """Small-multiples grid by nesting the member SVGs (verify.py's
    subplot(121)/(122) layout; sentences.py's histogram grid)."""
    rows = (len(figures) + cols - 1) // cols
    body = ""
    for i, fig in enumerate(figures):
        x, ycell = (i % cols) * cell_w, (i // cols) * cell_h
        inner = fig.replace(
            "<svg ", f'<svg x="{x}" y="{ycell}" ', 1
        )
        body += inner
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{cols * cell_w}" height="{rows * cell_h}">{body}</svg>'
    )


# ---------------------------------------------------------------------------
# engine-facing sinks (Spark aggregates in, SVG file out)
# ---------------------------------------------------------------------------

DOMAIN_BINS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 20, 50]  # domains.py:25


def save_rule_bar(rule_counts, path: str,
                  title: str = "Sentence Rule Hits") -> str:
    """reference generate_rule_bar_fig: DataFrame(rule, cnt) -> bar SVG."""
    items = [(r[0], float(r[1])) for r in rule_counts.orderBy(rule_counts.columns[0]).collect()]
    svg = bar_chart_svg(items, title, "rule", "# of Sentences")
    with open(path, "w") as fp:
        fp.write(svg)
    return svg


def save_domain_hist(link_counts, path: str) -> str:
    """reference generate_domain_hist: DataFrame(domain, n_links) ->
    histogram over the reference's fixed bins.  Binning runs IN SPARK
    (a width_bucket-style expression over the bin array), only one row
    per bin is collected."""
    from pyspark.sql import functions as F

    col = link_counts.columns[1]
    edges = F.array(*[F.lit(e) for e in DOMAIN_BINS])
    binned = (
        link_counts.select(
            (F.size(F.filter(edges, lambda e: e <= F.col(col))) - 1).alias("b")
        )
        .groupBy("b")
        .count()
    )
    by_bin = {r.b: r["count"] for r in binned.collect()}
    labels = [
        f"{DOMAIN_BINS[i]}-{DOMAIN_BINS[i + 1]}" for i in range(len(DOMAIN_BINS) - 1)
    ] + [f">={DOMAIN_BINS[-1]}"]
    items = [
        (labels[i], float(by_bin.get(i, 0))) for i in range(len(labels))
    ]
    svg = bar_chart_svg(items, "Links per Domain", "# of Links from Domain",
                        "# of Domains")
    with open(path, "w") as fp:
        fp.write(svg)
    return svg


def save_verification_figure(scores, path: str, n_bins: int = 10) -> str:
    """reference verify.py:276-288: histogram + boxplot of the cosine
    similarity scores, side by side.  Bin counts and the five-number
    summary are Spark aggregates; the driver sees n_bins + 5 values."""
    from pyspark.sql import functions as F

    col = scores.columns[-1]
    stats = scores.agg(
        F.min(col).alias("mn"),
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.5)").alias("med"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
        F.max(col).alias("mx"),
    ).collect()[0]
    # explicit None checks: `or` would replace a legitimate 0.0 max
    # (cosine scores can be <= 0) and corrupt the bin range
    lo = 0.0 if stats.mn is None else float(stats.mn)
    hi = 1.0 if stats.mx is None else float(stats.mx)
    span = (hi - lo) or 1.0
    binned = (
        scores.select(
            F.least(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(span) * n_bins),
                F.lit(n_bins - 1),
            ).cast("int").alias("b")
        )
        .groupBy("b")
        .count()
    )
    by_bin = {r.b: r["count"] for r in binned.collect()}
    items = [
        (f"{lo + i * span / n_bins:.2f}", float(by_bin.get(i, 0)))
        for i in range(n_bins)
    ]
    hist = bar_chart_svg(items, "Cosine Similarity Score Histogram",
                         "Cosine Similarity Score", "Number of Policies")
    box = boxplot_svg(
        [("sim", (float(stats.mn or 0), float(stats.q1 or 0),
                  float(stats.med or 0), float(stats.q3 or 0),
                  float(stats.mx or 0)))],
        "Cosine Similarity Score Boxplot", "Cosine Similarity Score",
    )
    svg = panel_svg([hist, box], cols=2)
    with open(path, "w") as fp:
        fp.write(svg)
    return svg
