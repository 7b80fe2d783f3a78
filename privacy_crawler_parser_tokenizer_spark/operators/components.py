"""Connected components over a pair list (the dedup-cluster step).

Candidate generators (LSH, SimHash bands, embedding GEMM) emit PAIRS;
turning pairs into KEEP-sets needs the transitive closure — documents
a~b and b~c are one duplicate cluster even if a~c was never scored.
Components + min-id representative is the canonical final step of a
dedup pipeline at any scale.

Algorithm: iterative min-label propagation.  Every vertex starts as its
own label; each round every vertex takes the min of its label and its
neighbors' labels; stop when no label changes (checked via an
Observation riding the update join — no extra job).  Rounds needed =
graph diameter; duplicate clusters are shallow (diameter a handful), so
this converges in a few joins.  Each round is ONE shuffle join on the
edge list; lineage is truncated per round with ``localCheckpoint`` so
the plan and codegen stay flat.  (For adversarial high-diameter graphs
the alternating large-star/small-star variant halves diameters per
round; dedup graphs don't need it.)

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


def connected_components(edges: DataFrame, vertices: DataFrame,
                         max_iters: int = 50,
                         state_partitions: int | None = 8) -> DataFrame:
    """(vertex ``v``, representative ``rep``) for every vertex; ``rep``
    is the component's min id.  ``edges`` has columns (a, b);
    ``vertices`` one column ``v`` (singletons keep rep = v).

    ``state_partitions`` sizes the per-iteration label/edge state: the
    iteration tables are tiny relative to the corpus that produced the
    pairs, and a 32-task job per propagation round is pure scheduling
    overhead.  Pass None to inherit upstream partitioning (cluster-scale
    graphs)."""
    k = state_partitions

    def _sized(df):
        return (df.coalesce(k) if k else df).localCheckpoint()

    sym = _sized(
        edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
        .unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("w")))
        .distinct()
    )
    # admit edge endpoints missing from ``vertices`` (the union-find
    # canon does via setdefault) — without a label row, propagation
    # through such a vertex would be silently severed
    all_verts = (
        vertices.select(F.col(vertices.columns[0]).alias("v"))
        .unionByName(sym.select(F.col("u").alias("v")))
        .distinct()
    )
    labels = _sized(all_verts.select("v", F.col("v").alias("rep")))
    for _ in range(max_iters):
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
        updated = (updated.coalesce(k) if k else updated).localCheckpoint()
        # (no unpersist: localCheckpoint blocks are RDD-level and are
        # released by the ContextCleaner when the round's frame is
        # garbage-collected; DataFrame.unpersist would be a no-op)
        labels = updated
        if int(obs.get["n"] or 0) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        "(graph diameter exceeds max_iters) — raising instead of returning "
        "silently-wrong intermediate labels"
    )
