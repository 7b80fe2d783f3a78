"""Spark frontier engine vs the sequential oracle — exact equivalence
(SURVEY.md §5 step 3): crawl order, URL-seen set, documents, outcomes,
and resume-from-checkpoint identity."""

import math

import pytest

from privacy_crawler_parser_tokenizer_spark.core import CrawlOracle
from privacy_crawler_parser_tokenizer_spark.plans.frontier import (
    FixtureFetcher,
    FrontierConfig,
    FrontierCrawler,
    PythonFetcher,
)
from privacy_crawler_parser_tokenizer_spark.sources.synth import (
    gen_web,
    make_dictionary,
    make_ground_truth,
)

GT = make_ground_truth()
DICT = make_dictionary()


def run_oracle(pages, seeds, **kw):
    kw.setdefault("ground_truth", GT)
    kw.setdefault("dictionary", DICT)
    kw.setdefault("threshold", 0.3)
    return CrawlOracle(pages, seeds, **kw).run()


def run_frontier(spark, tmpdir, pages, seeds, *, fetcher=None, **kw):
    cfg = FrontierConfig(
        threshold=kw.pop("threshold", 0.3),
        max_depth=kw.pop("max_depth", 3),
        host_budget=kw.pop("host_budget", None),
        bloom_capacity=1 << 12,
        **kw.pop("config_kw", {}),
    )
    pages_df = spark.createDataFrame(
        list(pages.items()) or [("", "")], "url string, html string"
    )
    fc = FrontierCrawler(
        spark,
        str(tmpdir),
        pages=pages_df if fetcher is None else None,
        fetcher=fetcher,
        seeds=seeds,
        ground_truth=GT,
        dictionary=DICT,
        robots=kw.pop("robots", None),
        config=cfg,
        debug_invariants=kw.pop("debug_invariants", False),
    )
    fc.run()
    return fc


def assert_matches_oracle(fc, res):
    # crawl-order parity: (seed_rank, discovery_rank) plus every field
    got = [
        (r.seed_rank, r.url, r.discovery_rank, r.round, r.fetched, r.valid,
         r.duplicate, r.doc_id, round(r.sim, 9))
        for r in fc.crawl_log().collect()
    ]
    want = [
        (r.seed_rank, r.url, r.discovery_rank, r.round, r.fetched, r.valid,
         r.duplicate, r.doc_id, round(r.sim, 9))
        for r in res.crawl_log
    ]
    assert got == want

    # URL-seen set with revisit counts (raw pre-clean hrefs)
    got_seen = {r.href: r.revisits for r in fc.seen().collect()}
    assert got_seen == res.seen

    # emitted documents
    got_docs = {(r.doc_id, r.url, r.text) for r in fc.documents().collect()}
    want_docs = {(d[0], d[1], d[3]) for d in res.documents}
    assert got_docs == want_docs

    # outcome classification + running sim mean
    for row in fc.outcomes().collect():
        assert res.outcomes[row.domain] == row.outcome, row.domain
        assert math.isclose(res.sim_avg[row.domain], row.sim_avg,
                            rel_tol=0, abs_tol=1e-12), row.domain

    # per-round scheduler metrics
    got_m = [
        (m.round, m.granted, m.fetched, m.new_links, m.policies, m.active_domains)
        for m in fc.metrics().collect()
    ]
    want_m = [
        (m["round"], m["granted"], m["fetched"], m["new_links"], m["policies"],
         m["active_domains"])
        for m in res.metrics
    ]
    assert got_m == want_m


POLICY = (
    "<html><body><h1>Privacy Policy</h1><p>We collect personal data and "
    "information about cookies tracking consent rights access deletion "
    "retention security for the service and we share information with "
    "partners and advertising analytics providers.</p></body></html>"
)


def test_frontier_micro_web(spark, tmp_path):
    landing = '<a href="/privacy">privacy</a><p>welcome to the site</p>'
    pages = {
        "http://a.com": landing,
        "http://a.com/privacy": POLICY,
        "http://b.com": landing,  # same raw href: global seen suppression
        "http://b.com/privacy": POLICY,  # identical text: content dedupe
    }
    seeds = ["a.com", "b.com"]
    res = run_oracle(pages, seeds)
    fc = run_frontier(spark, tmp_path / "wh", pages, seeds)
    assert_matches_oracle(fc, res)


def test_frontier_cross_round_reprobe_counts(spark, tmp_path):
    """An href probed in THREE distinct rounds: each earlier round wrote
    its own seen-delta row, so the probe join must dedupe the seen side
    or the later probes multi-match and inflate the revisit count (the
    oracle counts one probe per page occurrence, revisits = probes - 1).
    Regression: the engine reported revisits=3 here instead of 2."""
    common = "http://common.example.com/x"
    landing = (
        '<a href="http://a.com/p1">privacy</a>'
        '<a href="http://a.com/p2">privacy</a>'
        '<a href="http://a.com/p3">privacy</a>'
    )
    with_common = POLICY.replace(
        "</body>", f'<a href="{common}">privacy link</a></body>'
    )
    pages = {
        "http://a.com": landing,
        # p1/p2/p3 visited on consecutive rounds, each probing `common`
        "http://a.com/p1": with_common,
        "http://a.com/p2": with_common,
        "http://a.com/p3": with_common,
        common: POLICY,
    }
    seeds = ["a.com"]
    res = run_oracle(pages, seeds)
    assert res.seen[common] == 2  # the fixture exercises the 3-round case
    fc = run_frontier(spark, tmp_path / "wh", pages, seeds)
    assert_matches_oracle(fc, res)


def test_frontier_matches_oracle_gen_web(spark, tmp_path):
    pages, seeds, robots = gen_web(n_domains=12, seed=42)
    res = run_oracle(pages, seeds, robots=robots, host_budget=2, max_depth=2)
    fc = run_frontier(
        spark, tmp_path / "wh", pages, seeds,
        robots=robots, host_budget=2, max_depth=2,
    )
    assert_matches_oracle(fc, res)


def test_frontier_no_bloom_same_result(spark, tmp_path):
    pages, seeds, robots = gen_web(n_domains=6, seed=7)
    res = run_oracle(pages, seeds, robots=robots, host_budget=3)
    fc = run_frontier(
        spark, tmp_path / "wh", pages, seeds, robots=robots, host_budget=3,
        config_kw={"use_bloom": False},
    )
    assert_matches_oracle(fc, res)


def test_frontier_python_fetcher(spark, tmp_path):
    """mapInPandas fetch path (production shape) == fixture join path."""
    pages, seeds, _ = gen_web(n_domains=5, seed=3)
    res = run_oracle(pages, seeds)
    fetcher = PythonFetcher(pages.get, fetch_partitions=3)
    fc = run_frontier(spark, tmp_path / "wh", pages, seeds, fetcher=fetcher)
    assert_matches_oracle(fc, res)


def test_frontier_resume_is_exact(spark, tmp_path):
    """Stop after N rounds, resume in a new crawler over the same
    warehouse -> byte-identical final state vs an uninterrupted run."""
    pages, seeds, robots = gen_web(n_domains=8, seed=11)
    res = run_oracle(pages, seeds, robots=robots, host_budget=2)

    wh = tmp_path / "wh"
    pages_df = spark.createDataFrame(list(pages.items()), "url string, html string")

    def crawler(max_rounds):
        return FrontierCrawler(
            spark, str(wh), pages=pages_df, seeds=seeds,
            ground_truth=GT, dictionary=DICT, robots=robots,
            config=FrontierConfig(threshold=0.3, host_budget=2,
                                  bloom_capacity=1 << 12, max_rounds=max_rounds),
        )

    first = crawler(max_rounds=2)
    first.run()
    assert first.wh.last_committed_round() == 1  # stopped mid-crawl

    resumed = crawler(max_rounds=10_000)
    resumed.run()
    assert_matches_oracle(resumed, res)


def test_frontier_with_compaction(spark, tmp_path):
    """Aggressive delta compaction (every 2 rounds) must not change any
    result, and must bound the snapshot count."""
    pages, seeds, robots = gen_web(n_domains=6, seed=21)
    res = run_oracle(pages, seeds, robots=robots, host_budget=2)
    fc = run_frontier(
        spark, tmp_path / "wh", pages, seeds, robots=robots, host_budget=2,
        config_kw={"compact_every": 2},
    )
    assert_matches_oracle(fc, res)
    assert len(fc.wh.snapshots("seen")) <= 3


def test_frontier_priority_queue(spark, tmp_path):
    """Priority-ordered politeness grants (north-rule priority queue):
    the VIP URL wins the contended shared-host budget ahead of the
    lower-ranked seed's URL; oracle and engine agree exactly."""
    from pyspark.sql import functions as F

    pages = {
        "http://a.com": '<a href="http://shared.com/privacy-a">privacy</a><p>t</p>',
        "http://b.com": '<a href="http://shared.com/privacy-vip">privacy</a><p>t</p>',
        "http://shared.com/privacy-a": POLICY,
        "http://shared.com/privacy-vip": POLICY.replace("cookies", "beacons"),
    }
    seeds = ["a.com", "b.com"]

    def prio(url):
        return 0 if "vip" in url else 1

    res = CrawlOracle(
        pages, seeds, ground_truth=GT, dictionary=DICT, threshold=0.3,
        host_budget=1, priority_fn=prio,
    ).run()

    pages_df = spark.createDataFrame(list(pages.items()), "url string, html string")
    fc = FrontierCrawler(
        spark, str(tmp_path / "wh"), pages=pages_df, seeds=seeds,
        ground_truth=GT, dictionary=DICT,
        config=FrontierConfig(threshold=0.3, host_budget=1, bloom_capacity=1 << 12),
        priority_expr=lambda url: F.when(url.contains("vip"), 0).otherwise(1),
    )
    fc.run()
    assert_matches_oracle(fc, res)

    # priority actually reorders the contended grants: b's VIP url wins
    # round 1, a's is deferred to round 2 (FIFO would grant a first)
    rounds = {r.url: r.round for r in res.crawl_log}
    assert rounds["http://shared.com/privacy-vip"] == 1
    assert rounds["http://shared.com/privacy-a"] == 2
    res_fifo = CrawlOracle(
        pages, seeds, ground_truth=GT, dictionary=DICT, threshold=0.3,
        host_budget=1,
    ).run()
    rounds_fifo = {r.url: r.round for r in res_fifo.crawl_log}
    assert rounds_fifo["http://shared.com/privacy-a"] == 1


def test_frontier_lineage_partitions(spark, tmp_path):
    """Per-partition lineage rows must account for every granted fetch."""
    pages, seeds, _ = gen_web(n_domains=5, seed=3)
    fc = run_frontier(spark, tmp_path / "wh", pages, seeds)
    lineage = fc.lineage().collect()
    assert lineage, "lineage table populated"
    per_round = {}
    for r in lineage:
        assert r.stage == "fetch" and r.n_rows > 0
        per_round[r.round] = per_round.get(r.round, 0) + r.n_rows
    granted = {m.round: m.granted for m in fc.metrics().collect()}
    assert per_round == {k: v for k, v in granted.items() if v > 0}


def test_frontier_cuckoo_filter_same_result(spark, tmp_path):
    """Cuckoo pre-filter variant produces identical crawl results."""
    pages, seeds, robots = gen_web(n_domains=6, seed=7)
    res = run_oracle(pages, seeds, robots=robots, host_budget=3)
    fc = run_frontier(
        spark, tmp_path / "wh", pages, seeds, robots=robots, host_budget=3,
        config_kw={"seen_filter": "cuckoo"},
    )
    assert_matches_oracle(fc, res)


def test_summary_report_format(spark, tmp_path):
    """Audit-trail report in the reference's summary.txt shape
    (produce_summary, crawler.py:243-283)."""
    landing = '<a href="/privacy">privacy</a><p>welcome to the site</p>'
    pages = {
        "http://a.com": landing,
        "http://a.com/privacy": POLICY,
        "http://b.com": landing,
        "http://b.com/privacy": POLICY,
        # c.com inaccessible
    }
    seeds = ["a.com", "b.com", "c.com"]
    fc = run_frontier(spark, tmp_path / "wh", pages, seeds)
    rep = fc.summary_report(timestamp="_test")
    assert rep.startswith("Summary of Crawler Output (_test)")
    assert "# of Successful Domains = 1 (33.33%)." in rep
    assert "Could not access 1 (33.33%) domains." in rep
    assert "No links found for 1 (33.33%) domains." in rep
    assert "a.com (avg sim = " in rep
    assert "b.com -- NO_LINKS" in rep
    assert "c.com" not in rep          # inaccessible domains skipped
    assert "=> (0." in rep and "http://a.com/privacy -> a_1 & a_1.txt" in rep


def test_frontier_adversarial_web(spark, tmp_path):
    """Crafted edge-case web: link cycles across domains, self-links,
    links back to the landing page, query-string URLs (kept: only the
    fragment is stripped), unicode URLs, duplicate hrefs within one
    page (seen-set bump), and a link to an empty page.  Exact parity."""
    a_land = (
        '<a href="/privacy?lang=en#frag">privacy</a>'
        '<a href="/privacy?lang=en#other">privacy</a>'   # same url post-clean
        '<a href="http://b.com/privacy-b">privacy b</a>'
        '<p>welcome page</p>'
    )
    b_land = (
        '<a href="http://a.com/privacy?lang=en">privacy a</a>'  # cross link
        '<a href="/privacy-ü">privacy unicode</a>'
        '<p>second welcome</p>'
    )
    a_policy = (
        '<a href="http://a.com/privacy?lang=en">privacy self</a>'  # self-link
        '<a href="http://a.com">privacy home</a>'                  # back to landing
        + POLICY
    )
    pages = {
        "http://a.com": a_land,
        "http://a.com/privacy?lang=en": a_policy,
        "http://b.com": b_land,
        "http://b.com/privacy-b": POLICY.replace("cookies", "pixels"),
        "http://b.com/privacy-ü": "",   # fetch failure
    }
    seeds = ["a.com", "b.com"]
    res = run_oracle(pages, seeds, max_depth=3)
    # debug_invariants asserts per round that (seed_rank, page_pos) is
    # unique and hist_seen is href-constant — the two preconditions the
    # admission argmin rests on (ADVICE r3)
    fc = run_frontier(
        spark, tmp_path / "wh", pages, seeds, max_depth=3, debug_invariants=True
    )
    assert_matches_oracle(fc, res)
    # the quirks actually fired: the cycle back to a.com's landing
    # re-extracts it, bumping every landing href once; the two distinct
    # raw hrefs (#frag/#other) each entered the seen set separately and
    # deduped to ONE frontier entry post-clean; cross+self links probed
    assert res.seen["/privacy?lang=en#frag"] == 1
    assert res.seen["/privacy?lang=en#other"] == 1
    assert res.seen["http://a.com/privacy?lang=en"] >= 1
    a_urls = [r.url for r in res.crawl_log if r.domain == "a.com"]
    assert a_urls.count("http://a.com/privacy?lang=en") == 1


def test_frontier_kitchen_sink(spark, tmp_path):
    """Everything at once: 25 domains, politeness budget, robots,
    priority dequeue, cuckoo seen-filter, aggressive compaction,
    depth 3 — exact oracle equality across all outputs."""
    from pyspark.sql import functions as F

    pages, seeds, robots = gen_web(n_domains=25, seed=99)

    def prio(url):
        return 0 if "details" in url else 1

    res = CrawlOracle(
        pages, seeds, ground_truth=GT, dictionary=DICT, threshold=0.3,
        robots=robots, host_budget=2, max_depth=3, priority_fn=prio,
    ).run()

    fc = FrontierCrawler(
        spark, str(tmp_path / "wh"),
        pages=spark.createDataFrame(list(pages.items()), "url string, html string"),
        seeds=seeds, ground_truth=GT, dictionary=DICT, robots=robots,
        config=FrontierConfig(threshold=0.3, host_budget=2, max_depth=3,
                              bloom_capacity=1 << 12, seen_filter="cuckoo",
                              compact_every=3),
        priority_expr=lambda url: F.when(url.contains("details"), 0).otherwise(1),
    )
    fc.run()
    assert_matches_oracle(fc, res)


def test_bloom_broadcast_lifecycle(spark, tmp_path):
    """A multi-round crawl must keep exactly ONE live filter broadcast:
    every re-broadcast destroys the previous round's copy (a 10^4-round
    crawl with a growing ~GB filter would otherwise OOM the driver),
    and results stay oracle-exact."""
    pages, seeds, robots = gen_web(n_domains=8, seed=33)
    res = run_oracle(pages, seeds, robots=robots, host_budget=1)
    fc = run_frontier(
        spark, tmp_path / "whb", pages, seeds, robots=robots, host_budget=1
    )
    assert_matches_oracle(fc, res)
    # host_budget=1 on a shared-host web forces many rounds
    assert fc.bloom_broadcasts_created >= 3
    assert (
        fc.bloom_broadcasts_created - fc.bloom_broadcasts_destroyed == 1
    ), (fc.bloom_broadcasts_created, fc.bloom_broadcasts_destroyed)


def test_expire_seen_recrawl_path(spark, tmp_path):
    """TTL expiry removes a URL from the seen table (probe counts of
    the others preserved exactly) and unlearns it from the cuckoo
    filter, so a future discovery re-admits it — the deletable-filter
    recrawl path the Bloom cannot provide."""
    pages, seeds, robots = gen_web(n_domains=8, seed=5)
    fc = run_frontier(
        spark, tmp_path / "whx", pages, seeds, robots=robots,
        config_kw={"seen_filter": "cuckoo"},
    )
    before = {r.href: r.revisits for r in fc.seen().collect()}
    victim = sorted(before)[0]

    assert fc.expire_seen([victim]) == 1
    assert fc.expire_seen(["http://never-seen.example/x"]) == 0

    after = {r.href: r.revisits for r in fc.seen().collect()}
    assert victim not in after
    others = {k: v for k, v in before.items() if k != victim}
    assert after == others                      # everyone else untouched

    import pandas as pd

    probe = fc.bloom.might_contain(pd.Series(list(others) + [victim]))
    assert probe[:-1].all()                     # kept URLs still pass
    # the victim's fingerprint is gone (collision-free in this corpus)
    assert not probe[-1]

    # bloom path: filter rebuilt from the kept set, no false negatives
    fc2 = run_frontier(spark, tmp_path / "why", pages, seeds, robots=robots)
    v2 = sorted(r.href for r in fc2.seen().collect())[0]
    assert fc2.expire_seen([v2]) == 1
    kept2 = [r.href for r in fc2.seen().collect()]
    assert v2 not in kept2
    assert fc2.bloom.might_contain(pd.Series(kept2, dtype="object")).all()


def test_frontier_round_storage_hygiene(spark, tmp_path):
    """localCheckpoint block storage must be freed explicitly every
    round (DataFrame.unpersist cannot reach it): after a crawl, no new
    cached RDD blocks remain.  Over 10^4 production rounds a leak here
    is an executor-storage fill."""
    def stored():
        return {
            i.id()
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0
        }

    before = stored()
    pages, seeds, robots = gen_web(n_domains=6, seed=5)
    run_frontier(spark, tmp_path / "wh", pages, seeds, robots=robots)
    assert stored() - before == set()
