"""Parse/tokenize batch pipeline (SURVEY.md §2.3, §3.2 rebuild).

One linear DataFrame dataflow replacing the reference's per-file
process-pool (src/parser-tokenizer.py:339-397):

    documents(doc_id, html[, auto_text])
      -> extract_doc UDF (spans + stripped text + parse self-check)
      -> posexplode(spans)                      [spans table]
      -> window (tag_index, lag/lead neighbor context)
      -> filter kind in (p,h) -> sentence UDF -> posexplode
      -> native rule expressions                [sentences table]
      -> explode(rule_hits) -> groupBy          [rule_counts tables]

Scale notes: the only Python is the two Arrow-batched UDFs (HTML parse,
sentence split); every window partitions by doc_id (narrow, no skew —
one doc is one partition key), and the aggregations are partial-agg
hash groupBys.  The parse-success gate (residual > 5 -> drop,
reference :306) is a plain filter pushed below the sentence stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.text import (
    rule_hits_col,
    spans_context_col,
    spans_tagged_col,
    word_count_col,
)
from .functions.udfs import extract_doc_udf, sentences_udf

RESIDUAL_TOLERANCE = 5  # reference: src/parser-tokenizer.py:306

# fixed histogram bin edges (reference: src/statistics/sentences.py:207,215)
RULE_HIST_BINS = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100,
                  120, 140, 160, 180, 200, 250, 300, 350, 400]


def extract_documents(docs: DataFrame, auto_text: bool = True) -> DataFrame:
    """documents(doc_id, html[, auto_text]) -> + (spans, stripped_text,
    residual_count, parse_ok).  Empty docs are kept with parse_ok=false
    (reference skips them at :256-263; downstream filters do the same)."""
    at = F.col("auto_text") if auto_text and "auto_text" in docs.columns else F.lit(None).cast("string")
    ex = extract_doc_udf(F.col("html"), at)
    out = docs.withColumn("_ex", ex).select(
        "*",
        F.col("_ex.spans").alias("spans"),
        F.col("_ex.stripped_text").alias("stripped_text"),
        F.col("_ex.residual_count").alias("residual_count"),
    ).drop("_ex")
    return out.withColumn(
        "parse_ok",
        (F.length(F.coalesce(F.col("html"), F.lit(""))) > 0)
        & (F.length(F.col("stripped_text")) > 0)
        & (F.col("residual_count") <= RESIDUAL_TOLERANCE),
    )


def spans_table(extracted: DataFrame,
                huge_span_threshold: int | None = None) -> DataFrame:
    """Explode spans with per-kind tag_index + neighbor context.

    tag label = kind || tag_index (reference 'p3' style,
    parser-tokenizer.py:87,225).  prec_by replicates the Python ``-1``
    wraparound (first span's predecessor is the LAST span, :87,211-213);
    proc_by is 'None' past the end (IndexError branch).

    Context is computed array-locally (functions.text.spans_tagged_col)
    BEFORE the explode — zero shuffles, vs 2-3 doc_id exchanges for the
    equivalent lag/lead window formulation.  The array-local tag_index
    is O(n^2) per document (size(filter(slice))) — harmless at real
    page sizes, pathological for a document with 10^5+ spans — so docs
    above ``huge_span_threshold`` spans route to the O(n log n)
    windowed twin and the two results union.  The guard is OPT-IN
    (``huge_span_threshold=None`` default): the union branch puts the
    window exchanges into every plan, and the zero-shuffle plan is the
    regression-tested common path."""
    base = extracted
    if huge_span_threshold is not None:
        base = extracted.filter(F.size("spans") <= F.lit(huge_span_threshold))
    small = (
        base
        .withColumn("_tagged", spans_tagged_col("spans"))
        .withColumn("_ctx", spans_context_col())
        .select("doc_id", F.explode("_ctx").alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
            F.col("s.tag_index").alias("tag_index"),
            F.col("s.tag").alias("tag"),
            F.col("s.prec_by").alias("prec_by"),
            F.col("s.proc_by").alias("proc_by"),
        )
    )
    if huge_span_threshold is None:
        return small
    huge = spans_table_windowed(
        extracted.filter(F.size("spans") > F.lit(huge_span_threshold))
    ).select(*small.columns)
    return small.unionByName(huge)


def spans_table_windowed(extracted: DataFrame) -> DataFrame:
    """lag/lead window formulation of spans_table — SURVEY.md §2.3's
    direct mapping of the reference's prec_by/proc_by.  Semantically
    identical (asserted in tests); kept for the operator-inventory row
    and as the shape to use when spans arrive pre-exploded."""
    w_doc = Window.partitionBy("doc_id").orderBy("offset")
    w_kind = Window.partitionBy("doc_id", "kind").orderBy("offset")
    w_full = Window.partitionBy("doc_id").orderBy("offset").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    df = (
        extracted.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
        .withColumn("tag_index", F.row_number().over(w_kind) - 1)
        .withColumn("tag", F.concat("kind", F.col("tag_index").cast("string")))
    )
    return (
        df.withColumn(
            "prec_by", F.coalesce(F.lag("tag").over(w_doc), F.last("tag").over(w_full))
        )
        .withColumn("proc_by", F.coalesce(F.lead("tag").over(w_doc), F.lit("None")))
    )


def sentences_table(spans: DataFrame, parse_ok_docs: DataFrame | None = None) -> DataFrame:
    """p/h spans -> sentence rows (FIXTURES.md §7 schema).

    ``parse_ok_docs``: optional (doc_id) frame of docs passing the
    parse-success gate; when given, failed docs are excluded from
    tokenization (reference: parser-tokenizer.py:304-317)."""
    df = spans.filter(F.col("kind").isin("p", "h"))
    if parse_ok_docs is not None:
        df = df.join(parse_ok_docs.select("doc_id"), "doc_id", "left_semi")
    df = df.withColumn("sents", sentences_udf(F.col("text")))
    df = df.select(
        "doc_id",
        F.col("offset").alias("seq_index"),
        "tag",
        "prec_by",
        "proc_by",
        F.posexplode("sents").alias("sent_idx", "sentence"),
    )
    return df.select(
        "doc_id",
        "seq_index",
        "tag",
        "prec_by",
        "proc_by",
        "sent_idx",
        F.col("sentence").alias("text"),
        word_count_col(F.col("sentence")).alias("n_words"),
        rule_hits_col(F.col("sentence")).alias("rule_hits"),
    )


def rule_counts_table(sentences: DataFrame) -> DataFrame:
    """Per-doc rule hit counts (reference: parser-tokenizer.py:221-227)."""
    return (
        sentences.select("doc_id", F.explode("rule_hits").alias("rule"))
        .groupBy("doc_id", "rule")
        .agg(F.count("*").alias("cnt"))
    )


def corpus_rule_histogram(rule_counts: DataFrame) -> DataFrame:
    """Bucket per-doc hit counts into the reference's fixed bins
    (sentences.py:207): (rule, bucket, n_docs)."""
    edges = ",".join(str(b) for b in RULE_HIST_BINS)
    # bucket = number of edges <= value (1-based, 0 = below first edge);
    # engine-portable replacement for variable-width width_bucket
    bucket = F.expr(
        f"size(filter(array({edges}), e -> e <= cnt))"
    ).alias("bucket")
    return (
        rule_counts.select("rule", bucket)
        .groupBy("rule", "bucket")
        .agg(F.count("*").alias("n_docs"))
    )


def save_reference_outputs(tables: dict[str, DataFrame], out_dir: str) -> None:
    """The reference's CSV sinks (src/parser-tokenizer.py:71-106,229-234)
    re-expressed as partitioned CSV datasets: per-kind span rows and the
    sentence table, partitioned by doc_id (one directory per document ==
    the reference's one-CSV-per-document layout), plus the corpus rule
    histogram.  Headers on; arrays joined with '-' as the reference
    does for rule hits."""
    spans = tables["spans"].select(
        "doc_id", "kind", "tag", "offset", "prec_by", "proc_by", "text"
    )
    spans.write.mode("overwrite").option("header", True).partitionBy(
        "doc_id"
    ).csv(f"{out_dir}/spans_csv")

    sentences = tables["sentences"].select(
        "doc_id", "seq_index", "tag", "prec_by", "proc_by", "sent_idx",
        "text", "n_words", F.array_join("rule_hits", "-").alias("rules"),
    )
    sentences.write.mode("overwrite").option("header", True).partitionBy(
        "doc_id"
    ).csv(f"{out_dir}/sentences_csv")

    tables["corpus_hist"].write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/rule_histogram_csv"
    )


def parse_tokenize(docs: DataFrame) -> dict[str, DataFrame]:
    """Full §3.2 pipeline; returns the named output tables."""
    extracted = extract_documents(docs)
    spans = spans_table(extracted)
    ok = extracted.filter("parse_ok").select("doc_id")
    sentences = sentences_table(spans, ok)
    rc = rule_counts_table(sentences)
    return {
        "extracted": extracted,
        "spans": spans,
        "sentences": sentences,
        "rule_counts": rc,
        "corpus_hist": corpus_rule_histogram(rc),
    }
