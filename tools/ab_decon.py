"""Same-window interleaved A/B for decontaminate (verdict r3 item 6):
is the string-shingle broadcast join the cost, or the shingle build?

A: current operator (string 13-gram shingles, string broadcast join)
B: hash shingle strings to int64 (xxhash64) before explode + join
C: struct-hash — xxhash64 over the 13 word slots directly, no concat_ws

Interleaved best-of-N on sf0.1 / local[32], noop sink (bench.py's action).
"""
import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from privacy_crawler_parser_tokenizer_spark.functions.text import shingles_col, words_col

SF = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
NGR = 13


def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def bench_side(d):
    return d.filter(F.col("doc_id") % 17 == 3)


def report(grams, bench):
    hit = grams.join(F.broadcast(bench).withColumn("_hit", F.lit(1)), "ngram", "left")
    return (
        hit.groupBy("doc_id")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_collisions"))
        .withColumn("contaminated", F.col("n_collisions") > 0)
    )


def variant_A(spark):
    d = docs(spark)
    grams = d.select(
        "doc_id",
        F.explode_outer(F.array_distinct(shingles_col(F.col("text"), k=NGR))).alias("ngram"),
    )
    bench = bench_side(d).select(
        F.explode(shingles_col(F.col("text"), k=NGR)).alias("ngram")
    ).distinct()
    return report(grams, bench)


def _hashed_shingles(text):
    return F.array_distinct(
        F.transform(shingles_col(text, k=NGR), lambda s: F.xxhash64(s))
    )


def variant_B(spark):
    d = docs(spark)
    grams = d.select(
        "doc_id", F.explode_outer(_hashed_shingles(F.col("text"))).alias("ngram")
    )
    bench = bench_side(d).select(
        F.explode(_hashed_shingles(F.col("text"))).alias("ngram")
    ).distinct()
    return report(grams, bench)


def _struct_hash_shingles(text):
    w = words_col(F.lower(text))
    n = F.size(w)
    m = n - F.lit(NGR - 1)
    z = F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(NGR)])
    mk = F.transform(z, lambda s: F.xxhash64(*[s[str(i)] for i in range(NGR)]))
    sh = F.when(n < F.lit(NGR), F.array().cast("array<bigint>")).otherwise(mk)
    return F.array_distinct(sh)


def variant_C(spark):
    d = docs(spark)
    grams = d.select(
        "doc_id", F.explode_outer(_struct_hash_shingles(F.col("text"))).alias("ngram")
    )
    bench = bench_side(d).select(
        F.explode(_struct_hash_shingles(F.col("text"))).alias("ngram")
    ).distinct()
    return report(grams, bench)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    variants = {"A_string": variant_A, "B_hash_concat": variant_B, "C_struct_hash": variant_C}
    # sanity: identical contaminated counts
    counts = {
        k: fn(spark).filter("contaminated").count() for k, fn in variants.items()
    }
    print("contaminated counts:", counts)
    times = {k: [] for k in variants}
    for _ in range(2):  # warmup interleaved once
        for k, fn in variants.items():
            fn(spark).write.format("noop").mode("overwrite").save()
    for i in range(N):
        for k, fn in variants.items():
            t = time.time()
            fn(spark).write.format("noop").mode("overwrite").save()
            times[k].append(time.time() - t)
    for k, ts in times.items():
        print(f"{k}: best={min(ts):.2f}s all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
