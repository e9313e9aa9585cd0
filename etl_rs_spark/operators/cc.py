"""Distributed connected components → duplicate clusters.

The fuzzy-dedup operators (operators/dedup.py) emit candidate PAIRS;
real training-data dedup needs transitive CLUSTERS (A~B, B~C ⇒ drop two
of {A,B,C} even when A~C was never emitted). ``connected_components``
computes them with the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public literature): provably O(log² n) rounds, in practice a
handful, and every round is a groupBy + broadcast-free equi-join on the
node id, so the shuffle key is stable and each round's cost is
O(|E|/partitions). No driver-side graph state — the edge list never
leaves the cluster; the driver sees only a per-round convergence
counter (one scalar per iteration).

This replaces the classic scale traps: label-propagation-until-fixpoint
needs O(diameter) rounds (a 10^6-long chain of near-dup docs = 10^6
shuffles), and a driver-side union-find needs the full edge list in
one process' memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: connect every strictly-larger neighbor to the
    minimum of u's closed neighborhood. Keeps (larger → smaller)
    orientation; strictly reduces large labels toward local minima."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("__mn"), F.col("u")).alias("v"),
        )
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For every node u over (larger → smaller)-oriented edges: hang u
    and all its ≤-neighbors off the minimum of the neighborhood."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("__mn"))
    hang_neighbors = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("__mn"))
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
    )
    hang_self = mins.select(F.col("u"), F.col("__mn").alias("v"))
    return hang_neighbors.unionByName(hang_self)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Union-find over an undirected edge list, distributed.

    Returns ``(id, cluster_id)`` for every node that appears in
    ``pairs``, where ``cluster_id`` is the MINIMUM node id of the
    component (deterministic, so downstream keeper choice is stable
    across runs and partitionings).

    Each round localCheckpoints the shrinking edge list — without it
    the iterated plan grows exponentially and Catalyst re-derives every
    prior round. Convergence = the small-star edge set is already
    star-shaped (every u maps straight to its component min), detected
    by one count of non-fixpoint edges per round.
    """
    # checkpoint the RAW pairs first: nodes and edges both derive from
    # them, and without this the whole upstream candidate pipeline
    # (typically a full LSH pass) evaluates twice
    raw = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    # node set from the RAW pairs: a self-loop contributes no edge but
    # its node is still a (singleton) component
    nodes = (
        raw.select(F.col("u").alias("id"))
        .unionByName(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).distinct().localCheckpoint()
        # fixpoint: star-shaped ⟺ large-star changes nothing, i.e. no
        # node is on the LARGE side of one edge and the small side of
        # another (two-level chains remain)
        chains = (
            edges.alias("e1")
            .join(
                edges.alias("e2"),
                F.col("e1.v") == F.col("e2.u"),
                "inner",
            )
            .limit(1)
            .count()
        )
        if chains == 0:
            break
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    # component minima label themselves
    roots = nodes.join(
        labels.select(F.col("id")), "id", "left_anti"
    ).select("id", F.col("id").alias("cluster_id"))
    return labels.unionByName(roots)


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Transitive fuzzy dedup: resolve candidate pairs to components and
    keep ONE deterministic row per component — the minimum id (every
    non-listed row is its own singleton component and survives).
    Left-anti join on the loser set, so df itself streams through with
    one shuffle-free pass plus the small loser-side hash join."""
    comps = connected_components(pairs, src=src, dst=dst)
    losers = comps.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
