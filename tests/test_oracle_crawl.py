"""Crawl-oracle behavior tests — the canonical frontier semantics the
Spark engine must match (SURVEY.md §5 step 3)."""

from privacy_crawler_parser_tokenizer_spark.core import CrawlOracle
from privacy_crawler_parser_tokenizer_spark.sources.synth import (
    gen_web,
    make_dictionary,
    make_ground_truth,
)


def mini_oracle(pages, seeds, **kw):
    kw.setdefault("ground_truth", make_ground_truth())
    kw.setdefault("dictionary", make_dictionary())
    kw.setdefault("threshold", 0.3)
    return CrawlOracle(pages, seeds, **kw)


POLICY = (
    "<html><body><h1>Privacy Policy</h1><p>We collect personal data and "
    "information about cookies tracking consent rights access deletion "
    "retention security for the service and we share information with "
    "partners and advertising analytics providers.</p></body></html>"
)


def test_seen_set_suppresses_cross_domain():
    landing = '<a href="/privacy">privacy</a><p>welcome to the site</p>'
    pages = {
        "http://a.com": landing,
        "http://a.com/privacy": POLICY,
        "http://b.com": landing,  # same raw href '/privacy'
        "http://b.com/privacy": POLICY,
    }
    res = mini_oracle(pages, ["a.com", "b.com"]).run()
    assert res.outcomes == {"a.com": "successful", "b.com": "no_links"}
    assert res.seen == {"/privacy": 1}


def test_junk_hrefs_enter_seen_set():
    # reference: seen probe precedes junk filters (crawler.py:110-120)
    pages = {
        "http://a.com": '<a href="mailto:privacy@a.com">privacy</a><p>t</p>',
    }
    res = mini_oracle(pages, ["a.com"]).run()
    assert "mailto:privacy@a.com" in res.seen
    assert res.outcomes["a.com"] == "no_links"


def test_expansion_budget_counts_pages_not_depth():
    # chain p1 -> p2 -> p3 -> p4; budget 2 expands only first 2 fetched
    # non-empty pages; p4's link never discovered
    def page(n):
        return f'<a href="/privacy{n}">privacy</a><p>filler text page</p>'

    pages = {
        "http://a.com": page(1),
        "http://a.com/privacy1": page(2),
        "http://a.com/privacy2": page(3),
        "http://a.com/privacy3": page(4),
        "http://a.com/privacy4": page(5),
    }
    res = mini_oracle(pages, ["a.com"], threshold=0.99, max_depth=2).run()
    visited = [r.url for r in res.crawl_log]
    assert visited == [
        "http://a.com/privacy1",
        "http://a.com/privacy2",
        "http://a.com/privacy3",
    ]


def test_duplicate_policy_first_writer_wins():
    landing_a = '<a href="/privacy-a">privacy</a><p>t</p>'
    landing_b = '<a href="/privacy-b">privacy</a><p>t</p>'
    pages = {
        "http://a.com": landing_a,
        "http://a.com/privacy-a": POLICY,
        "http://b.com": landing_b,
        "http://b.com/privacy-b": POLICY,  # identical text
    }
    res = mini_oracle(pages, ["a.com", "b.com"]).run()
    rows = {r.domain: r for r in res.crawl_log}
    assert not rows["a.com"].duplicate and rows["a.com"].doc_id == "a_1"
    assert rows["b.com"].duplicate and rows["b.com"].doc_id is None
    # duplicates log sim 0.0 (crawler.py:210)
    assert rows["b.com"].sim == 0.0 and rows["b.com"].valid


def test_politeness_budget_defers_to_next_round():
    landing = '<a href="http://shared.com/privacy-{n}">privacy</a><p>t</p>'
    pages = {
        "http://a.com": landing.format(n=1),
        "http://b.com": landing.format(n=2),
        "http://shared.com/privacy-1": POLICY,
        "http://shared.com/privacy-2": POLICY.replace("cookies", "beacons"),
    }
    res = mini_oracle(pages, ["a.com", "b.com"], host_budget=1).run()
    rounds = {r.domain: r.round for r in res.crawl_log}
    # both landings fetched round 0 (different hosts); shared.com link
    # fetches serialized: a.com in round 1, b.com deferred to round 2
    assert rounds["a.com"] == 1 and rounds["b.com"] == 2


def test_robots_blocks_fetch():
    pages = {
        "http://a.com": '<a href="/privacy">privacy</a><p>t</p>',
        "http://a.com/privacy": POLICY,
    }
    robots = {"a.com": "User-agent: *\nDisallow: /privacy\n"}
    res = mini_oracle(pages, ["a.com"], robots=robots).run()
    (row,) = res.crawl_log
    assert not row.fetched and res.outcomes["a.com"] == "failed_links"


def test_gen_web_runs_end_to_end():
    pages, seeds, robots = gen_web(n_domains=30, seed=42)
    oracle = mini_oracle(pages, seeds, robots=robots, host_budget=4, max_depth=3)
    res = oracle.run()
    assert len(res.crawl_log) > 20
    assert any(r.duplicate for r in res.crawl_log), "dup policies exercised"
    assert any(not r.fetched for r in res.crawl_log), "failed fetches exercised"
    assert any(o == "successful" for o in res.outcomes.values())
    assert len(res.documents) > 5
    # determinism: same seed -> identical outcome
    res2 = mini_oracle(pages, seeds, robots=robots, host_budget=4, max_depth=3).run()
    assert [r.__dict__ for r in res2.crawl_log] == [r.__dict__ for r in res.crawl_log]
    assert res2.seen == res.seen
