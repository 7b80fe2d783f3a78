"""Physical-plan regression tests: pushdown, pruning, broadcast,
partial aggregation, shuffle budgets — the properties that make the
same code survive a 100x scale-up (SURVEY.md §4)."""

import pytest

from privacy_crawler_parser_tokenizer_spark.plans.introspect import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    n_exchanges,
    pushed_filters,
    read_schemas,
)
from privacy_crawler_parser_tokenizer_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan(spark, name):
    return formatted_plan(QUERIES[name](spark, SF))


def test_filter_pushdown_reaches_parquet(spark):
    p = plan(spark, "embedding_topk")
    pushed = " ".join(pushed_filters(p))
    assert "vec_id" in pushed, p


def test_column_pruning(spark):
    # a 2-column projection must not scan the whole documents table
    p = plan(spark, "word_counts")
    (schema,) = read_schemas(p)
    assert "text" in schema and "lang" not in schema and "source" not in schema


def test_small_dims_broadcast(spark):
    # the benchmark n-gram side of decontamination is an eval set, not
    # a corpus — it must broadcast, never shuffle the document grams
    assert has_broadcast_join(plan(spark, "decontaminate"))


def test_partial_aggregation(spark):
    assert has_partial_aggregation(plan(spark, "mix_sample"))
    assert has_partial_aggregation(plan(spark, "lang_freq"))


def test_whole_stage_codegen_active(spark):
    # AQE's pre-execution plan hides codegen annotations; check the
    # statically planned query
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan(spark, "lang_freq")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert codegen_stage_count(p) >= 1, p


def test_shuffle_budgets(spark):
    # scans + narrow ops must not shuffle at all
    assert n_exchanges(plan(spark, "rule_hits")) == 0
    assert n_exchanges(plan(spark, "word_counts")) == 0
    assert n_exchanges(plan(spark, "token_counts")) == 0
    # one groupBy = one shuffle (plus AQE read)
    assert n_exchanges(plan(spark, "lang_freq")) <= 2
    # the whole extract->context->tokenize->rules pipeline is shuffle-
    # free up to the parse-gate semi-join (array-local context)
    assert n_exchanges(plan(spark, "sentence_pipeline")) <= 1


def test_sentence_pipeline_broadcast_gate(spark):
    # the parse-ok doc-gate must be a broadcast semi-join, not a shuffle
    assert has_broadcast_join(plan(spark, "sentence_pipeline"))


def test_spans_windowed_twin_is_identical(spark):
    """The zero-shuffle array-local context == the lag/lead window
    formulation, row for row."""
    from privacy_crawler_parser_tokenizer_spark.pipeline import (
        extract_documents,
        spans_table,
        spans_table_windowed,
    )

    docs = spark.createDataFrame(
        [
            ("d1", "<html><body><h1>T</h1><p>a.</p><ul><li>x</li></ul>"
                   "<p>b!</p><img src='m.png'></body></html>"),
            ("d2", "<html><body><p>only one</p></body></html>"),
        ],
        "doc_id string, html string",
    )
    ex = extract_documents(docs, auto_text=False)
    cols = ["doc_id", "kind", "text", "media_ref", "offset", "tag_index",
            "tag", "prec_by", "proc_by"]
    fast = {tuple(r) for r in spans_table(ex).select(cols).collect()}
    slow = {tuple(r) for r in spans_table_windowed(ex).select(cols).collect()}
    assert fast == slow and len(fast) >= 5
    assert n_exchanges(formatted_plan(spans_table(ex))) == 0

    # opt-in huge-doc guard: with a threshold that routes d1 (5 spans)
    # to the windowed path and keeps d2 array-local, the union is
    # row-identical to both pure formulations
    guarded = {
        tuple(r)
        for r in spans_table(ex, huge_span_threshold=2).select(cols).collect()
    }
    assert guarded == fast


def test_verify_scores_matches_kernel(spark):
    """The relational closed-form TF-IDF cosine == the Python kernel
    (which replicates sklearn pair-fit numerics) on ASCII docs."""
    import math

    from privacy_crawler_parser_tokenizer_spark.core.tfidf import tfidf_cosine_pair

    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()}
    gt = " ".join(docs[i] for i in sorted(docs) if i < 3)
    got = {r.doc_id: r.sim for r in QUERIES["verify_scores"](spark, SF).collect()}
    checked = 0
    for doc_id, text in sorted(docs.items()):
        if not text.isascii():
            continue  # Python \w is unicode; engine \w is ASCII
        want = tfidf_cosine_pair(gt, text)
        assert math.isclose(got[doc_id], want, abs_tol=5e-7), (doc_id, got[doc_id], want)
        checked += 1
        if checked >= 50:
            break
    assert checked >= 20


def test_fetch_stage_salts_by_host_hash(spark):
    """The fetch repartition key must be the RAW salted per-URL
    host-hash (north rule + tools/bench_hostskew.py): hash(host,
    round, url) in the exchange, with NO pmod pre-bucketing (pre-pmod
    re-hashes P small ints into P buckets — balls-in-bins clumps) and
    the url column present in the key (host-only keys put a hot host
    in one partition: measured straggler ratio 6.1-6.3 vs 1.05)."""
    from privacy_crawler_parser_tokenizer_spark.plans.frontier import FixtureFetcher

    pages = spark.createDataFrame([("http://a.com", "<p>x</p>")], "url string, html string")
    reqs = spark.createDataFrame([("http://a.com",)], "url string")
    plan = formatted_plan(FixtureFetcher(pages, fetch_partitions=4).fetch(reqs, 7))
    spec = [ln for ln in plan.splitlines() if "hashpartitioning(hash(" in ln]
    assert spec, plan
    assert "pmod" not in spec[0], spec[0]
    # raw url column rides the key next to the round salt: ", 7, url#"
    assert ", 7, url#" in spec[0], spec[0]


def test_new_quality_ops_stay_shuffle_free(spark):
    """gopher_quality and dup_ngram_fraction are per-row array ops —
    their plans must stay single-scan with zero exchanges."""
    assert n_exchanges(plan(spark, "gopher_quality")) == 0
    assert n_exchanges(plan(spark, "dup_ngram_fraction")) == 0


def test_english_gate_no_recompute_above_generate(spark):
    """The gate's per-doc scalars (token count, char ratio) must be
    attributes BELOW the explode: a Generate whose input carries the
    full document text re-evaluates size(ws)/regexp(text) once per
    exploded word (the r3 4-5x regression, commit 30ebf7d)."""
    from privacy_crawler_parser_tokenizer_spark.plans.introspect import (
        generate_inputs,
    )

    p = plan(spark, "english_gate")
    gens = generate_inputs(p)
    assert gens, p
    for g in gens:
        assert "text#" not in g, (g, p)


@pytest.mark.parametrize(
    "qname",
    [
        "verify_scores",
        "decontaminate",
        "ngram_jaccard_pairs",
        "minhash_bands",
        "sentence_pipeline",
        "simhash_candidates",
        "bpe_token_counts",
    ],
)
def test_no_wide_passthrough_above_generate(spark, qname):
    """Generalized r3-regression sweep: a wide column (full text) may
    feed a Generate's generator expression (evaluated once per input
    row) but must never ride through a Generate unreferenced — that is
    the signature of per-exploded-row recompute or row-width blowup."""
    import re

    p = plan(spark, qname)
    lines = p.splitlines()
    wide = re.compile(r"(?:text|html|content|body)#\d+")
    for i, line in enumerate(lines):
        if re.search(r"\(\d+\) Generate\b", line):
            inp = args = ""
            for j in range(i + 1, min(i + 5, len(lines))):
                if lines[j].startswith("Input"):
                    inp = lines[j]
                if lines[j].startswith("Arguments"):
                    args = lines[j]
            passthru = [c for c in set(wide.findall(inp)) if c not in args]
            assert not passthru, (qname, passthru, inp, args)


def test_exact_dedup_groupby_winners_shape(spark):
    """exact_dedup must shuffle the sha2 key, never the raw document
    text, and use the partial-aggregable winners shape, not a window
    sort over PARTITION BY text."""
    from privacy_crawler_parser_tokenizer_spark.plans.introspect import n_windows

    p = plan(spark, "exact_dedup")
    assert has_partial_aggregation(p), p
    assert n_windows(p) == 0, p
    assert "hashpartitioning(text" not in p, p


def test_frontier_links_chain_plan_shape(spark, tmp_path):
    """The frontier's admission dedupe (winner-per-href) and in-page
    dedupe (first occurrence per completed link) must be partial-
    aggregable groupBys — map-side combine collapses a viral href
    before the exchange instead of funneling every occurrence into one
    skewed Window sort partition.  The only Window left in the links
    chain is the per-seed append positioner (inherently ordered)."""
    from privacy_crawler_parser_tokenizer_spark.plans.frontier import (
        FrontierConfig,
        FrontierCrawler,
    )
    from privacy_crawler_parser_tokenizer_spark.plans.introspect import n_windows
    from privacy_crawler_parser_tokenizer_spark.sources.synth import (
        make_dictionary,
        make_ground_truth,
    )

    landing = '<a href="/privacy">privacy</a><p>welcome</p>'
    pages_df = spark.createDataFrame(
        [("http://a.com", landing), ("http://a.com/privacy", "<p>policy</p>")],
        "url string, html string",
    )
    fc = FrontierCrawler(
        spark,
        str(tmp_path / "wh"),
        pages=pages_df,
        seeds=["a.com"],
        ground_truth=make_ground_truth(),
        dictionary=make_dictionary(),
        config=FrontierConfig(
            threshold=0.3, bloom_capacity=1 << 12, host_budget=2
        ),
    )
    plans = {}
    fc.plan_probe = lambda name, df: plans.setdefault(name, formatted_plan(df))
    fc.run()
    cand3, links_delta = plans["cand3"], plans["links_delta"]
    assert has_partial_aggregation(cand3), cand3
    assert n_windows(cand3) == 0, cand3
    assert has_partial_aggregation(links_delta), links_delta
    assert n_windows(links_delta) == 1, links_delta
    # content first-writer dedupe: groupBy winners + join, no window
    visits = plans["visits"]
    assert has_partial_aggregation(visits), visits
    assert n_windows(visits) == 0, visits
    # politeness dequeue: the row_number <= budget filter must become a
    # WindowGroupLimit pair (partial map-side + final) — a hot host's
    # million due URLs ship as `budget` rows per map task, not a full
    # sort partition
    from privacy_crawler_parser_tokenizer_spark.plans.introspect import (
        n_window_group_limits,
    )

    assert n_window_group_limits(plans["granted"]) >= 2, plans["granted"]


def test_simhash_candidates_is_bucketed_not_all_pairs(spark):
    """The simhash pair generator must be the banded-bucket shape (agg
    + explode), never a cross join."""
    p = plan(spark, "simhash_candidates")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert has_partial_aggregation(p)


def test_kmeans_update_plan_stays_narrow(spark):
    # The Lloyd centroid update must keep an O(1)-width plan: one
    # posexplode Generate feeding a partial-aggregable 3-column
    # sum/count — never `dim` column-wise aggregates (each costs
    # Catalyst analysis per iteration, the serial driver floor of the
    # training loop; regression guard for operators/kmeans.py).
    from pyspark.sql import functions as F

    from privacy_crawler_parser_tokenizer_spark.operators.kmeans import (
        quantize_milli,
    )
    from privacy_crawler_parser_tokenizer_spark.queries import _t

    emb = _t(spark, SF, "embeddings").select(
        "vec_id", quantize_milli(F.col("embedding")).alias("q")
    )
    assigned = emb.select((F.col("vec_id") % 4).alias("cid"), "q")
    sums = (
        assigned.select("cid", F.posexplode("q").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    p = formatted_plan(sums)
    assert "Generate explode" in p or "posexplode" in p, p
    assert has_partial_aggregation(p), p
    # narrow: the aggregate carries 2 measures, not one per dimension
    assert p.count("sum(") < 8, p


def test_lm_bigram_score_orders_repetition(spark, tmp_path):
    # repetitive text = frequent transitions = LOW surprisal; diverse
    # text scores high — the filtering direction perplexity gives.
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in QUERIES["lm_bigram_score"](spark, str(tmp_path)).collect()
    }
    assert out[1].n_bigrams == 7 and out[2].n_bigrams == 8
    assert out[1].surprisal_milli < out[2].surprisal_milli


def test_perceptron_pocket_beats_majority(spark):
    # the pocket selection must beat the majority-class baseline — a
    # plain batch perceptron oscillates to exactly the baseline here
    from pyspark.sql import functions as F

    # sf0.001 has ~50 docs — too few for the signal; use sf0.01
    df = QUERIES["train_quality_perceptron"](spark, "/root/testdata/sf0.01")
    r = df.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.avg((F.col("label") == 1).cast("double")).alias("pos"),
    ).collect()[0]
    assert r.acc > max(r.pos, 1 - r.pos) + 0.05, (r.acc, r.pos)


def test_lm_bigram_score_plan_shape(spark):
    # count-table joins are equi-joins (broadcastable at small SF,
    # shuffleable at scale); partial aggregation everywhere; the ONLY
    # nested-loop join is the broadcast 1-row vocabulary-size scalar
    import re

    p = plan(spark, "lm_bigram_score")
    assert has_partial_aggregation(p), p
    # formatted plans print each node twice (tree + detail) — count ids
    bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", p))
    assert len(bnlj) <= 1, p
    assert "CartesianProduct" not in p, p


def test_salt_host_concurrency_caps_spread(spark):
    # budget-less politeness: with host_concurrency=2, one host's URLs
    # may occupy at most 2 partitions of the fetch wave; without it,
    # per-URL salt spreads them wave-wide (the skew-defusal mode)
    from pyspark.sql import functions as F

    from privacy_crawler_parser_tokenizer_spark.plans.frontier import (
        _salt_by_host,
    )

    reqs = spark.createDataFrame(
        [(f"http://hot.example/p{i}",) for i in range(64)]
        + [(f"http://cold{i}.example/",) for i in range(16)],
        "url string",
    )
    capped = _salt_by_host(reqs, 3, 16, host_concurrency=2)
    spread = (
        capped.withColumn("p", F.spark_partition_id())
        .where(F.col("url").startswith("http://hot."))
        .select("p").distinct().count()
    )
    assert spread <= 2, spread
    free = _salt_by_host(reqs, 3, 16, host_concurrency=None)
    spread_free = (
        free.withColumn("p", F.spark_partition_id())
        .where(F.col("url").startswith("http://hot."))
        .select("p").distinct().count()
    )
    assert spread_free > 2, spread_free
