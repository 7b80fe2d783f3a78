"""Distributed Lloyd k-means in integer milli-space.

The ANN operators (ivf_topk / pq_topk, queries.py) need *trained*
codebooks — the reference pipeline's coarse quantizer / PQ codebook are
learned, not fixtures.  Training must also be hash-exact against a
DuckDB oracle, so every step is integer arithmetic:

  * inputs quantize once to int64 milli-units (floor(x*1000 + 0.5) —
    IEEE-exact in every engine),
  * assignment distance is exact int64 squared-L2,
  * the centroid update is floor(sum/count) per dimension — sums of
    milli-units stay far below 2^53, so the double division is exact
    and floor() agrees across engines,
  * argmin ties break on the lowest centroid id (min over
    struct(dist, cid) == row_number ORDER BY dist, cid).

Scale shape: centroids broadcast (k x dim ints); assignment is one
map-side crossJoin + partial-aggregable groupBy argmin; the update
posexplodes to (cid, pos) and runs ONE narrow sum/count aggregate —
executor rows multiply by dim (parallel; map-side combine collapses
them straight back to k x dim partials, so the shuffle is unchanged)
to keep the PLAN width O(1): per-iteration Catalyst analysis is the
serial driver floor of an iterative loop, and `dim` column-wise
aggregates made it O(dim) (measured 2x per-iteration win at dim=64).
Only k x dim integers cross the driver per iteration, the textbook
broadcast-Lloyd layout for a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_milli(col):
    """float embedding array -> int64 milli-units, engine-exact."""
    return F.transform(col.cast("array<double>"), lambda x: F.floor(x * 1000 + 0.5))


def int_sqdist(a, b):
    """Exact int64 squared L2 between two equal-length bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _centroid_df(spark, cents: list[tuple[int, list[int]]]) -> DataFrame:
    return spark.createDataFrame(
        [(cid, [int(v) for v in vec]) for cid, vec in cents],
        "cid int, cemb array<bigint>",
    )


def lloyd_int(
    vec_df: DataFrame,
    k: int,
    dim: int,
    iters: int,
    init: list[list[int]],
) -> list[list[int]]:
    """`iters` Lloyd iterations over ``vec_df(vec_id, q: array<bigint>)``.

    Returns the trained centroids as a k x dim int list (cid = row
    index).  Empty cells keep their previous centroid.  Each iteration
    collects exactly k x dim integers to the driver (the broadcast
    handoff), never the data."""
    spark = vec_df.sparkSession
    cents = [list(map(int, c)) for c in init]
    assert len(cents) == k and all(len(c) == dim for c in cents)
    for _ in range(iters):
        cent_df = _centroid_df(spark, list(enumerate(cents)))
        # argmin carries q through the aggregation (constant per group)
        # — no join-back shuffle of the vector table
        scored = vec_df.join(F.broadcast(cent_df)).withColumn(
            "_d", int_sqdist(F.col("q"), F.col("cemb"))
        )
        assigned = scored.groupBy("vec_id").agg(
            F.min(F.struct("_d", "cid")).alias("_w"),
            F.first("q").alias("q"),
        ).select(F.col("_w.cid").alias("cid"), "q")
        # centroid update: posexplode to (cid, pos) then ONE narrow sum/
        # count aggregate.  The explode multiplies executor rows by dim
        # (parallel, combined map-side back to k x dim partials — the
        # shuffle is identical), in exchange for an O(1)-width plan: the
        # alternative `dim` column-wise sum aggregates cost O(dim)
        # Catalyst analysis on the DRIVER per iteration, the serial
        # floor an iterative loop actually waits on (measured 2.5 s ->
        # 1.2 s per iteration at dim=64).  floor(sum/count) stays in
        # exact integer arithmetic driver-side (python // is floor).
        sums = (
            assigned.select("cid", F.posexplode("q").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        got = {}
        for r in sums.collect():
            got.setdefault(r["cid"], list(cents[r["cid"]]))[r["pos"]] = (
                int(r["s"]) // int(r["n"])
            )
        cents = [got.get(cid, cents[cid]) for cid in range(k)]
    return cents


def lloyd_int_grouped(
    sub_df: DataFrame,
    k: int,
    dim: int,
    iters: int,
    init: dict[int, list[list[int]]],
) -> dict[int, list[list[int]]]:
    """Per-group Lloyd over ``sub_df(vec_id, m, sv: array<bigint>)`` —
    one codebook per subspace ``m``, ALL groups trained in each single
    distributed pass (the PQ shape: M codebooks, one corpus scan per
    iteration).  Semantics per group identical to :func:`lloyd_int`."""
    spark = sub_df.sparkSession
    cents = {m: [list(map(int, c)) for c in cs] for m, cs in init.items()}
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [
                (m, cid, [int(v) for v in c])
                for m, cs in sorted(cents.items())
                for cid, c in enumerate(cs)
            ],
            "m int, cid int, cv array<bigint>",
        )
        scored = sub_df.join(F.broadcast(cent_df), "m").withColumn(
            "_d", int_sqdist(F.col("sv"), F.col("cv"))
        )
        assigned = (
            scored.groupBy("vec_id", "m")
            .agg(F.min(F.struct("_d", "cid")).alias("_w"),
                 F.first("sv").alias("sv"))
            .select("m", F.col("_w.cid").alias("cid"), "sv")
        )
        # same narrow posexplode update as lloyd_int (see the plan-width
        # rationale there), keyed by (m, cid, pos)
        sums = (
            assigned.select("m", "cid", F.posexplode("sv").alias("pos", "v"))
            .groupBy("m", "cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        got = {}
        for r in sums.collect():
            key = (r["m"], r["cid"])
            got.setdefault(key, list(cents[r["m"]][r["cid"]]))[r["pos"]] = (
                int(r["s"]) // int(r["n"])
            )
        cents = {
            m: [got.get((m, cid), cs[cid]) for cid in range(k)]
            for m, cs in cents.items()
        }
    return cents
