"""Connected components over a pair list (the dedup-cluster step).

Candidate generators (LSH, SimHash bands, embedding GEMM) emit PAIRS;
turning pairs into KEEP-sets needs the transitive closure — documents
a~b and b~c are one duplicate cluster even if a~c was never scored.
Components + min-id representative is the canonical final step of a
dedup pipeline at any scale.

Two algorithms:

* ``propagate`` (default): iterative min-label propagation — every
  vertex takes the min of its label and its neighbors' labels; stop at
  the exact fixed point (no label changed, checked via an Observation
  riding the update join).  A no-change round proves labels are equal
  across every edge AND component minima are preserved, so the fixed
  point IS the answer.  Rounds needed = graph diameter: right for
  dedup graphs (shallow), wrong for adversarial chains.
* ``star``: the alternating large-star/small-star rounds of Kiveris et
  al., "Connected Components in MapReduce and Beyond" (SoCC'14) —
  each round contracts the graph toward per-component stars in
  O(log d) rounds.  Star rounds stop on an (edge-count, hash-checksum)
  stability heuristic, then the SAME exact propagation loop finishes
  on the contracted (diameter <= 2 at star convergence) graph — so
  correctness never rests on the heuristic: an early heuristic exit
  only means propagation runs a few more rounds.

Fault tolerance: per-round lineage truncation uses ``localCheckpoint``
by default (fast, blocks live on executors — an executor loss mid-run
kills the job, fine on local mode).  Pass ``checkpoint_dir`` to use
reliable ``checkpoint()`` snapshots instead (HDFS/object-store backed
on a cluster): each round's state survives executor loss at the cost
of a write per round.

Determinism: min() over integer ids — partitioning-independent.
Sequential canon: a pure-Python union-find (``components_seq``), exact
equality asserted in tests (the frontier-oracle pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["components_seq", "connected_components"]


def components_seq(edges: list[tuple[int, int]],
                   vertices: list[int]) -> dict[int, int]:
    """Union-find canon: vertex -> min id of its component."""
    parent: dict[int, int] = {v: v for v in vertices}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to the min id per component
    return {v: find(v) for v in parent}


def _symmetrize(pairs: DataFrame) -> DataFrame:
    """Directed pair list -> symmetric adjacency (u, w), no self-loops."""
    return (
        pairs.select(F.col("u"), F.col("w"))
        .unionByName(pairs.select(F.col("w").alias("u"), F.col("u").alias("w")))
        .filter(F.col("u") != F.col("w"))
        .distinct()
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """Emit (v, m(u)) for every neighbor v > u, where m(u) = min({u} ∪
    N(u)) — strictly-larger neighbors re-attach to the local minimum."""
    mins = sym.groupBy("u").agg(
        F.least(F.first("u"), F.min("w")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("w") > F.col("u"))
        .select(F.col("w").alias("u"), F.col("m").alias("w"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Emit (v, m(u)) for every neighbor v < u plus (u, m(u)), where
    m(u) = min({u} ∪ {v ∈ N(u): v < u})."""
    mins = (
        sym.withColumn(
            "wl", F.when(F.col("w") < F.col("u"), F.col("w"))
        )
        .groupBy("u")
        .agg(
            F.least(F.first("u"), F.coalesce(F.min("wl"), F.first("u")))
            .alias("m")
        )
    )
    smaller = (
        sym.filter(F.col("w") < F.col("u"))
        .join(mins, "u")
        .select(F.col("w").alias("u"), F.col("m").alias("w"))
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("w"))
    return smaller.unionByName(self_edges)


def connected_components(edges: DataFrame, vertices: DataFrame,
                         max_iters: int = 50,
                         state_partitions: int | None = 8,
                         algorithm: str = "propagate",
                         checkpoint_dir: str | None = None,
                         stats: dict | None = None) -> DataFrame:
    """(vertex ``v``, representative ``rep``) for every vertex; ``rep``
    is the component's min id.  ``edges`` has columns (a, b);
    ``vertices`` one column ``v`` (singletons keep rep = v).

    ``state_partitions`` sizes the per-iteration label/edge state: the
    iteration tables are tiny relative to the corpus that produced the
    pairs, and a 32-task job per propagation round is pure scheduling
    overhead.  Pass None to inherit upstream partitioning (cluster-scale
    graphs).

    ``algorithm='star'`` prepends large-star/small-star contraction
    rounds (O(log d) instead of O(d) total rounds — use for graphs that
    may contain long chains); ``checkpoint_dir`` switches per-round
    lineage truncation from executor-local blocks to reliable
    checkpoints that survive executor loss (cluster runs).  ``stats``,
    if given, is filled with {'star_rounds', 'propagate_rounds'}."""
    if algorithm not in ("propagate", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    k = state_partitions
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df):
        df = df.coalesce(k) if k else df
        if checkpoint_dir is not None:
            return df.checkpoint()   # reliable: survives executor loss
        return df.localCheckpoint()
        # (no unpersist: checkpoint blocks/files are released by the
        # ContextCleaner when the round's frame is garbage-collected)

    if stats is not None:
        stats["star_rounds"] = 0
        stats["propagate_rounds"] = 0

    sym = _ckpt(_symmetrize(
        edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
    ))

    if algorithm == "star":
        prev_sig = None
        for i in range(max_iters):
            obs = Observation()
            contracted = _symmetrize(
                _small_star(_large_star(sym))
            ).observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("u", "w")).alias("chk"),
            )
            sym = _ckpt(contracted)
            sig = (int(obs.get["n"] or 0), int(obs.get["chk"] or 0))
            if stats is not None:
                stats["star_rounds"] = i + 1
            if sig == prev_sig:
                break            # heuristic exit only — exactness below
            prev_sig = sig

    # admit edge endpoints missing from ``vertices`` (the union-find
    # canon does via setdefault) — without a label row, propagation
    # through such a vertex would be silently severed.  Star rounds
    # preserve the connectivity partition over the same vertex set, so
    # admitting from the ORIGINAL edge list stays correct in both modes.
    all_verts = (
        vertices.select(F.col(vertices.columns[0]).alias("v"))
        .unionByName(
            edges.select(F.col("a").alias("v"))
        )
        .unionByName(
            edges.select(F.col("b").alias("v"))
        )
        .distinct()
    )
    labels = _ckpt(all_verts.select("v", F.col("v").alias("rep")))
    for i in range(max_iters):
        neigh_min = (
            sym.join(labels, sym["w"] == labels["v"])
            .groupBy("u")
            .agg(F.min("rep").alias("nrep"))
        )
        obs = Observation()
        updated = (
            labels.join(neigh_min, labels["v"] == neigh_min["u"], "left")
            .select(
                "v",
                F.least(F.col("rep"), F.coalesce("nrep", "rep")).alias("rep"),
                (F.coalesce("nrep", "rep") < F.col("rep")).alias("_chg"),
            )
            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("n"))
            .drop("_chg")
        )
        labels = _ckpt(updated)
        if stats is not None:
            stats["propagate_rounds"] = i + 1
        if int(obs.get["n"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        "(graph diameter exceeds max_iters — rerun with algorithm='star', "
        "which contracts diameters in O(log d) rounds) — raising instead "
        "of returning silently-wrong intermediate labels"
    )
