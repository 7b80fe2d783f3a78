"""Exact-substring dedup (queries.q_exact_substring_dedup).

Semantics are checked against a from-scratch Python reference
implemented in this file (independent of both the Spark plan and the
DuckDB oracle), the DuckDB oracle itself is run on the same hand
corpus so the engine-parity covers the short/empty-doc edges the
testdata may not exercise, and the plan is asserted to keep the
winner aggregation partial (map-side combine before the exchange)
with no wide column riding the Generate.
"""

from __future__ import annotations

import duckdb
import pytest

from privacy_crawler_parser_tokenizer_spark.plans.introspect import (
    formatted_plan,
    generate_inputs,
    has_partial_aggregation,
)
from privacy_crawler_parser_tokenizer_spark.queries import (
    _ESUB_K,
    _esub_sql,
    q_exact_substring_dedup,
)

K = _ESUB_K


def esub_reference(docs: list[tuple[int, str]], k: int = K) -> dict[int, tuple]:
    """Independent reference: (n_tokens, dup_tokens, n_spans) per doc."""
    toks = {d: (t.strip().lower().split() if t.strip() else []) for d, t in docs}
    grams = []
    for d in sorted(toks):
        ws = toks[d]
        for i in range(len(ws) - k + 1):
            grams.append((d, i, tuple(ws[i : i + k])))
    winners: dict[tuple, tuple[int, int]] = {}
    for d, i, g in grams:
        if g not in winners or (d, i) < winners[g]:
            winners[g] = (d, i)
    dup_pos: dict[int, list[int]] = {}
    for d, i, g in grams:
        if winners[g] != (d, i):
            dup_pos.setdefault(d, []).append(i)
    out = {}
    for d, ws in toks.items():
        spans: list[list[int]] = []
        for i in sorted(dup_pos.get(d, [])):
            s, e = i, i + k - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        out[d] = (len(ws), sum(e - s + 1 for s, e in spans), len(spans))
    return out


def w(lo: int, hi: int) -> str:  # unique word run w<lo>..w<hi-1>
    return " ".join(f"w{i}" for i in range(lo, hi))


@pytest.fixture(scope="module")
def corpus():
    run = w(100, 115)  # one exact K-window, repeated in doc 3
    return [
        (1, w(0, 30)),  # 30 unique words
        (2, w(200, 205) + " " + w(5, 25) + " " + w(300, 305)),  # 20-word run from doc 1
        (3, run + " zz " + run),  # in-doc repetition
        (4, w(400, 410)),  # shorter than K
        (5, ""),  # empty
        (6, w(0, 30)),  # exact copy of doc 1
    ]


def expected(corpus):
    ref = esub_reference(corpus)
    # hand-checked anchors (the reference must agree before we trust it
    # for the full corpus comparison below)
    assert ref[1] == (30, 0, 0)
    assert ref[2] == (30, 20, 1)  # six K-windows merge into one 20-token span
    assert ref[3] == (31, 15, 1)  # second occurrence of the repeated run
    assert ref[4] == (10, 0, 0)
    assert ref[5] == (0, 0, 0)
    assert ref[6] == (30, 30, 1)  # full copy: every window loses to doc 1
    return ref


def test_spark_matches_reference(spark, corpus):
    # the query reads parquet via sf_dir; materialize the corpus there
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = q_exact_substring_dedup(spark, td)
        got = {
            r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans) for r in out.collect()
        }
    assert got == expected(corpus)


def test_oracle_matches_reference_on_edges(corpus):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    rows = con.execute(_esub_sql()).fetchall()
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == expected(corpus)
    assert {r[0]: r[4] for r in rows} == cut_reference(corpus)


def test_null_text_stays_null(spark):
    """NULL text must never be conflated with a fully-deduplicated
    doc's '' — both engines emit NULL n_tokens and NULL clean_text."""
    from privacy_crawler_parser_tokenizer_spark.operators.scrub import (
        exact_substring_cut,
    )

    rows = [(1, None), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.clean_text) for r in exact_substring_cut(df).collect()}
    assert got == {1: (None, None), 2: (0, "")}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    orc = {r[0]: (r[1], r[4]) for r in con.execute(_esub_sql()).fetchall()}
    assert orc == {1: (None, None), 2: (0, "")}


def cut_reference(corpus, k: int = K) -> dict[int, str]:
    ref_toks = {d: (t.strip().lower().split() if t.strip() else []) for d, t in corpus}
    grams = []
    for d in sorted(ref_toks):
        ws = ref_toks[d]
        for i in range(len(ws) - k + 1):
            grams.append((d, i, tuple(ws[i : i + k])))
    winners: dict[tuple, tuple[int, int]] = {}
    for d, i, g in grams:
        if g not in winners or (d, i) < winners[g]:
            winners[g] = (d, i)
    covered: dict[int, set[int]] = {}
    for d, i, g in grams:
        if winners[g] != (d, i):
            covered.setdefault(d, set()).update(range(i, i + k))
    return {
        d: " ".join(w for i, w in enumerate(ws) if i not in covered.get(d, set()))
        for d, ws in ref_toks.items()
    }


def test_cut_transform_matches_reference(spark, corpus):
    from privacy_crawler_parser_tokenizer_spark.operators.scrub import (
        exact_substring_cut,
    )

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r.doc_id: r.clean_text for r in exact_substring_cut(df).collect()}
    assert out == cut_reference(corpus)
    # the copy doc loses everything; the untouched docs keep all words
    assert out[6] == ""
    assert out[1] == " ".join(f"w{i}" for i in range(30))
    assert out[4] == " ".join(f"w{i}" for i in range(400, 410))
    assert out[5] == ""


def test_randomized_corpus_parity(spark):
    """Seeded random corpus with planted shared runs: report AND cut
    must match the independent reference on every doc."""
    import random

    rng = random.Random(421)
    vocab = [f"v{i}" for i in range(40)]  # small vocab -> natural collisions
    shared = [f"s{i}" for i in range(K + 5)]  # a >K-word run to plant
    corpus = []
    for d in range(1, 31):
        n = rng.randint(0, 60)
        ws = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4 and n > 4:  # plant the shared run mid-doc
            at = rng.randint(0, n - 1)
            ws[at:at] = shared
        corpus.append((d, " ".join(ws)))
    ref = esub_reference(corpus)
    cut_ref = cut_reference(corpus)

    import os
    import tempfile

    from privacy_crawler_parser_tokenizer_spark.operators.scrub import (
        exact_substring_cut,
    )

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (r.n_tokens, r.dup_tokens, r.n_spans)
            for r in q_exact_substring_dedup(spark, td).collect()
        }
        got_cut = {r.doc_id: r.clean_text for r in exact_substring_cut(df).collect()}
    assert got == ref
    assert got_cut == cut_ref
    # the plant must actually have fired for the test to mean anything
    assert sum(1 for v in ref.values() if v[1] > 0) >= 2


def test_plan_quality(spark, corpus):
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(
            os.path.join(td, "documents.parquet")
        )
        plan = formatted_plan(q_exact_substring_dedup(spark, td))
    # winner groupBy must combine map-side (viral boilerplate collapses
    # before the exchange) — scoped to the aggregation keyed on the
    # gram hash: the plan has three groupBys, so the global >=2
    # aggregate-line check would stay green even if THIS one lost its
    # partial/final split
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    winner_partials = [
        b
        for b in blocks
        if re.search(r"Keys \[1\]: \[g#", b) and "partial_min" in b
    ]
    assert winner_partials, plan
    assert has_partial_aggregation(plan)
    # the posexplode must read the projected words attribute, never the
    # raw text (english_gate's per-exploded-row recompute trap)
    gens = generate_inputs(plan)
    assert gens, plan
    for cols in gens:
        assert "text#" not in cols, (cols, plan)
