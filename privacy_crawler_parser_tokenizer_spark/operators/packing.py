"""Sequence packing for LLM pretraining: concat-and-chunk.

Production pretraining pipelines (GPT-2/3, Llama) pack the tokenized
corpus into fixed-length training sequences by concatenating all
documents in one deterministic order and slicing every ``seq_len``
tokens — a sequence may hold several short documents and a long
document may span several sequences.  This module computes the
(chunk, doc) segment map relationally: which token range of which
document lands at which offset of which training sequence.

100-TB shape: the global token offset of each document is a two-pass
distributed prefix sum.  Pass 1 is a partial-aggregable groupBy over a
coarse ``doc_id div bucket_width`` bucket whose result is tiny
(~n_docs / bucket_width rows), cumulated with a window on that tiny
frame (the ONLY unpartitioned window, over rows that fit one driver
page) and broadcast back.  Pass 2 is an in-bucket cumsum window
partitioned by bucket — parallel across buckets, never a full-corpus
single-partition sort.  The chunk fan-out explodes a ``sequence()``
range carrying only (doc_id, off, n_tok): no text or token array rides
the Generate (tests/test_plan_quality.py hygiene rule).

Zero-token documents must be filtered out by the caller: they occupy
no tokens, so they belong to no chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_segments(
    doc_tokens: DataFrame, seq_len: int, bucket_width: int = 4096
) -> DataFrame:
    """Map each doc to the training sequences it fills.

    ``doc_tokens`` must have columns ``doc_id`` (non-negative integral,
    UNIQUE — it IS the packing order; duplicate ids make the prefix sum
    ill-defined and the segment maps overlap, so dedupe upstream) and
    ``n_tok`` (> 0).  Returns one row per (chunk, doc) segment:

      chunk_id   — training-sequence index (seq_len tokens each)
      doc_id     — contributing document
      seg_offset — where in the chunk this doc's tokens start
      seg_tokens — how many of this doc's tokens land in this chunk
    """
    if seq_len <= 0 or bucket_width <= 0:
        raise ValueError("seq_len and bucket_width must be positive")

    # belt-and-braces: a zero-token row would make the chunk-range
    # sequence() run DESCENDING (start > stop) and emit garbage
    # segments — drop such rows here, not just at the caller
    b = doc_tokens.filter(F.col("n_tok") > 0).select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.expr(f"doc_id div {bucket_width}").alias("bucket"),
    )

    # pass 1: per-bucket subtotals (tiny), exclusive-cumulated and
    # broadcast back.  The unpartitioned window runs over the subtotal
    # frame only — n_docs / bucket_width rows, never the corpus.
    per_bucket = b.groupBy("bucket").agg(F.sum("n_tok").alias("btok"))
    w_bucket = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_bucket), F.lit(0)).alias("boff"),
    )

    # pass 2: exclusive in-bucket cumsum, parallel across buckets.
    w_doc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = (
        b.withColumn("loff", F.coalesce(F.sum("n_tok").over(w_doc), F.lit(0)))
        .join(F.broadcast(bucket_offsets), "bucket")
        .select(
            "doc_id", "n_tok", (F.col("boff") + F.col("loff")).alias("off")
        )
    )

    # chunk fan-out: doc [off, off+n_tok) overlaps chunks
    # off div L .. (off+n_tok-1) div L — a narrow sequence() explode.
    seg = with_off.select(
        "doc_id",
        "n_tok",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {seq_len}"),
                F.expr(f"(off + n_tok - 1) div {seq_len}"),
            )
        ).alias("chunk_id"),
    )
    start = F.greatest(F.col("off"), F.col("chunk_id") * seq_len)
    end = F.least(
        F.col("off") + F.col("n_tok"), (F.col("chunk_id") + 1) * seq_len
    )
    return seg.select(
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "doc_id",
        (start - F.col("chunk_id") * seq_len).cast("long").alias("seg_offset"),
        (end - start).cast("long").alias("seg_tokens"),
    )
