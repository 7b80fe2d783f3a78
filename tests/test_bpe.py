"""BPE trainer/encoder: distributed == sequential canon, exactly
(the frontier-oracle pattern applied to subword tokenization)."""

from collections import Counter

from privacy_crawler_parser_tokenizer_spark.core.bpe import (
    encode_text,
    encode_word,
    to_symbols,
    train_bpe,
    word_freqs,
)

CORPUS = [
    # NBSP-joined token: Java \s and Python \s disagree on U+00A0, so
    # the shared explicit-ASCII word class is what keeps the
    # distributed and sequential tokenizations identical
    "data\u00a0policy applies; see data\u00a0policy terms",
    "the privacy policy applies to the data we collect",
    "we collect data about the pages you visit",
    "the policy describes the data sharing practices",
    "cookies track pages; cookies store data",
    "low low lower lowest newer newest",
]


def test_sequential_trainer_known_merges():
    freqs = Counter({"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = train_bpe(freqs, 4)
    # classic Sennrich example family: 'es' (9) then 'est' (9) dominate
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert len(merges) == 4


def test_encode_roundtrip_consistency():
    freqs = word_freqs(CORPUS)
    merges = train_bpe(freqs, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("the", "data", "policy", "unseen"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == "".join(to_symbols(w))  # lossless
    assert encode_text("", merges) == []


def test_distributed_trainer_matches_sequential(spark):
    from pyspark.sql import functions as F

    from privacy_crawler_parser_tokenizer_spark.operators.bpe import (
        make_bpe_encode_udf,
        train_bpe_distributed,
        word_freq_table,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    ).repartition(4)  # partitioning must not change the merge list

    # word-frequency table parity
    got_freqs = {r.word: r.n for r in word_freq_table(docs).collect()}
    assert got_freqs == dict(word_freqs(CORPUS))

    n_merges = 24
    want = train_bpe(word_freqs(CORPUS), n_merges)
    got = train_bpe_distributed(docs, n_merges)            # vocab-collect path
    assert got == want  # exact merge-list equality, order included
    got_cluster = train_bpe_distributed(docs, n_merges, collect_vocab=False)
    assert got_cluster == want  # in-cluster iterative path, same merges

    # encoder UDF == sequential kernel, token for token
    enc = make_bpe_encode_udf(spark, got)
    rows = {r.doc_id: list(r.toks) for r in docs.select(
        "doc_id", enc(F.col("text")).alias("toks")).collect()}
    for i, t in enumerate(CORPUS):
        assert rows[i] == encode_text(t, want), i


def test_duckdb_oracle_matches_kernel_on_adversarial_corpus():
    """The 16-stage CTE oracle (_bpe_oracle_sql) == the sequential
    kernel on a corpus built to stress the string-replace merge
    semantics: runs of repeated symbols (aaaa must merge to aa/aa, not
    aa/a/a), merges that chain into longer symbols, and empty docs."""
    import duckdb

    from privacy_crawler_parser_tokenizer_spark.core.bpe import (
        encode_text,
        train_bpe,
        word_freqs,
    )
    from privacy_crawler_parser_tokenizer_spark.queries import _bpe_oracle_sql

    corpus = [
        "aaaa aaaa aa aaaaaaa",          # repeated-symbol runs
        "aaab aaba abaa baaa",           # overlap-adjacent merges
        "the the the them theme",        # chained merges t+h, th+e
        "",                              # empty doc -> 0 tokens
        "   ",                           # whitespace-only -> 0 tokens
        "Mixed CASE mixed case MIXED",   # lowercasing both sides
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(corpus))
    )
    oracle = dict(con.execute(_bpe_oracle_sql()).fetchall())

    merges = train_bpe(word_freqs(corpus), 16)
    for i, t in enumerate(corpus):
        assert oracle[i] == len(encode_text(t, merges)), (i, t)
