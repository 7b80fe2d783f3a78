"""Distributed BPE training + encoding (Sennrich et al. 2016).

The classic scale shape: the corpus collapses ONCE into a word-frequency
table (one shuffle, partial-agg), and each merge iteration is a single
pair-count aggregation over that table — cost O(vocab), not O(corpus).
The merge decision (a 1-row argmax) is the only driver-side value per
iteration; merge application is a native higher-order fold over the
symbol arrays, and lineage is truncated with ``localCheckpoint`` so the
plan (and its codegen) stays flat across iterations.

Exactness: ``core/bpe.py`` is the sequential canon; the distributed
trainer must produce the IDENTICAL merge list (deterministic
(count DESC, pair ASC) argmax — partitioning-independent), asserted in
tests/test_bpe.py the same way the frontier is pinned to its oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.bpe import END, encode_text

__all__ = ["word_freq_table", "train_bpe_distributed", "make_bpe_encode_udf"]


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table: the one corpus-sized shuffle."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    # characters + the end-of-word mark (split('', '') emits one empty
    # string per boundary on some engines — filter them)
    return F.array_append(
        F.filter(F.split(word, ""), lambda c: c != ""), F.lit(END)
    )


def _merge_fold(syms: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right non-overlapping replacement of (a, b) with
    a+b as a native fold.  Non-overlap falls out of the fold: a merge
    rewrites the accumulator tail to a+b, which can never equal ``a``
    again (b is non-empty), so the freshly-merged token never re-matches
    as a left element.

    ``a``/``b`` are COLUMNS (joined from a 1-row merge table), not
    literals: the expression tree — and its generated code — is then
    identical across training iterations, so janino compiles the fold
    once instead of once per merge."""
    ab = F.concat(a, b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_distributed(docs: DataFrame, n_merges: int,
                          text_col: str = "text", *,
                          collect_vocab: bool = True,
                          vocab_limit: int = 1_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over ``docs[text_col]``.

    Default path (``collect_vocab=True``): the O(corpus) work — the
    word-frequency collapse — runs distributed; training then iterates
    over the COLLECTED vocab on the driver (the vocab is bounded and
    tiny relative to any corpus; at 100 TB the ``vocab_limit``
    highest-frequency words are kept, deterministic (n DESC, word ASC)
    truncation).  Identical merges to the in-cluster path whenever the
    vocab fits the limit — asserted in tests.

    In-cluster path (``collect_vocab=False``) for unbounded vocab: per
    iteration ONE pair-count aggregation (explode the zipped bigrams of
    each word's symbol array, weighted by word frequency) + a 1-row
    ordered argmax + a constant-shape fold applying the merge (the pair
    arrives via a broadcast 1-row join so codegen compiles once).  The
    driver only ever sees winning pairs."""
    if collect_vocab:
        from collections import Counter

        from ..core.bpe import train_bpe

        rows = (
            word_freq_table(docs, text_col)
            .orderBy(F.desc("n"), F.asc("word"))
            .limit(vocab_limit)
            .collect()
        )
        return train_bpe(Counter({r.word: r.n for r in rows}), n_merges)

    spark = docs.sparkSession
    # the vocab table is tiny relative to the corpus — few partitions
    # keep each training iteration's jobs at a handful of tasks
    table = (
        word_freq_table(docs, text_col)
        .select(_initial_symbols(F.col("word")).alias("syms"), "n")
        .coalesce(8)
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        bigrams = F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
        )
        top = (
            table.filter(F.size("syms") > 1)
            .select(F.explode(bigrams).alias("p"), "n")
            .select(F.col("p.0").alias("a"), F.col("p.1").alias("b"), "n")
            .groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        # 1-row broadcast merge table: same plan (and same generated
        # code) every iteration — only the scanned values change
        mdf = spark.createDataFrame([(a, b)], "_ma string, _mb string")
        nxt = (
            table.crossJoin(F.broadcast(mdf))
            .select(
                _merge_fold(
                    F.col("syms"), F.col("_ma"), F.col("_mb")
                ).alias("syms"),
                "n",
            )
            .localCheckpoint()
        )
        table.unpersist()
        table = nxt
    table.unpersist()
    return merges


def make_bpe_encode_udf(spark, merges: list[tuple[str, str]]):
    """Arrow-batched encoder over the broadcast merge list — shares
    core.bpe.encode_text with the sequential canon."""
    bc = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_encode(text: pd.Series) -> pd.Series:
        m = [tuple(p) for p in bc.value]
        return text.map(lambda t: encode_text(t, m))

    return bpe_encode
