"""Cross-format source/sink round trips (SURVEY §2.1): the engine's
tables must survive parquet -> csv/jsonl -> DataFrame with full
fidelity, including multiline text and unicode."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang", "n_chars"
    )


def test_jsonl_round_trip(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs-jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    want = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want and len(got) > 0


def test_csv_round_trip_multiline(spark, tmp_path):
    # append a constructed row so multiline + quotes + unicode are
    # genuinely exercised regardless of the testdata's text shapes
    hard = spark.createDataFrame(
        [(999999, 'line one\nline "two"\n\tmit Umlauten: äöü', "de", 42)],
        "doc_id long, text string, lang string, n_chars int",
    )
    docs = _docs(spark).unionByName(hard)
    path = str(tmp_path / "docs-csv")
    # documents carry embedded newlines: quote-escape + multiLine reader
    docs.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.schema(docs.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    want = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    assert docs.filter(F.col("text").contains("\n")).count() > 0


def test_gen_web_fn_matches_gen_web():
    """The lazy per-URL regenerator (the 10^6-domain fetch path, no
    driver-side dict) is byte-identical to gen_web on every URL, seeds
    list, and robots map; unknown URLs fetch as ''."""
    from privacy_crawler_parser_tokenizer_spark.sources.synth import (
        gen_web,
        gen_web_fn,
    )

    pages, seeds, robots = gen_web(n_domains=120, seed=42)
    fetch, seeds2, robots2 = gen_web_fn(120, seed=42)
    assert seeds == seeds2
    assert robots == robots2
    assert all(fetch(u) == h for u, h in pages.items())
    assert fetch("http://site9999.com") == ""      # beyond n_domains
    assert fetch("http://elsewhere.example/") == ""
