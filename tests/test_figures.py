"""SVG figure sinks: well-formed XML, values encoded, Spark-side
aggregation (SURVEY §2.1 plot-sink row — the reference's matplotlib
artifacts re-expressed dependency-free)."""

import xml.etree.ElementTree as ET

from privacy_crawler_parser_tokenizer_spark.sinks.figures import (
    bar_chart_svg,
    boxplot_svg,
    panel_svg,
    save_domain_hist,
    save_rule_bar,
    save_verification_figure,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


def _parse(svg: str):
    return ET.fromstring(svg)


def test_bar_chart_well_formed_and_scaled():
    svg = bar_chart_svg(
        [("GOOD", 10), ("SHORT", 5), ("META", 0)], "t", "x", "y"
    )
    root = _parse(svg)
    bars = root.findall(f".//{SVG_NS}rect")
    assert len(bars) == 3
    heights = [float(b.get("height")) for b in bars]
    assert heights[0] > heights[1] > 0 and heights[2] == 0.0
    assert "GOOD" in svg and "SHORT" in svg


def test_boxplot_and_panel():
    box = boxplot_svg([("a", (0.0, 0.2, 0.5, 0.8, 1.0))], "box", "v")
    root = _parse(box)
    assert root.findall(f".//{SVG_NS}rect")
    panel = panel_svg([box, box], cols=2)
    proot = _parse(panel)
    assert len(proot.findall(f"{SVG_NS}svg")) == 2


def test_spark_figure_sinks(spark, tmp_path):
    rules = spark.createDataFrame(
        [("GOOD", 120), ("SHORT", 30), ("END_PUNC", 15)], "rule string, cnt long"
    )
    p1 = tmp_path / "rules.svg"
    svg1 = save_rule_bar(rules, str(p1))
    assert p1.exists() and _parse(svg1) is not None and "120" in svg1

    links = spark.createDataFrame(
        [(f"d{i}", n) for i, n in enumerate([0, 1, 1, 3, 7, 12, 55])],
        "domain string, n_links int",
    )
    p2 = tmp_path / "domains.svg"
    svg2 = save_domain_hist(links, str(p2))
    root = _parse(svg2)
    # 13 bins: the 12 reference ranges plus an explicit >=50 overflow
    # (plt.hist silently DROPS values beyond the last edge; we label them)
    bars = root.findall(f".//{SVG_NS}rect")
    assert len(bars) == 13
    total = sum(float(t.text) for t in root.findall(f".//{SVG_NS}text")
                if t.text and t.text.replace(".", "").isdigit())
    assert total == 7.0

    scores = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)], "doc_id int, sim double"
    )
    p3 = tmp_path / "verify.svg"
    svg3 = save_verification_figure(scores, str(p3))
    proot = _parse(svg3)
    assert len(proot.findall(f"{SVG_NS}svg")) == 2  # hist + box panel
