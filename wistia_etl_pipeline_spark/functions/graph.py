"""Distributed graph connectivity for duplicate-cluster resolution.

Near-dup discovery (``functions/dedupe.py``) emits *pairs*; an actual
dedup pipeline must turn pairs into *clusters* (connected components)
and pick one canonical document per cluster. At 100 TB the component
structure cannot live on the driver, so we use the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14):

- **large-star**: every node connects its *larger* neighbors to its
  minimum neighbor;
- **small-star**: every node connects its *smaller-or-equal* neighbors
  to its minimum neighbor.

Alternating the two converges in O(log n) rounds to a forest of stars
whose centers are the component minima. Each round is one groupBy +
one self-join on the edge list — ~2 shuffles, all map-side
combinable, no driver-side adjacency. The only values ever collected
are the per-round convergence counters.

Lineage is truncated per round with ``localCheckpoint`` — iterative
DataFrame joins otherwise build an exponentially nested plan that
stalls the optimizer long before data size matters. (On a real
cluster, prefer ``spark.sparkContext.setCheckpointDir`` + reliable
``checkpoint`` for fault tolerance; the algorithm is unchanged.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both directions of each edge, self-loops dropped."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst"))


def _large_star(nbr: DataFrame) -> DataFrame:
    """(u, v>u) -> (v, m(u)) where m(u) = min(N(u) ∪ {u})."""
    mins = nbr.groupBy("src").agg(F.min("dst").alias("__mn"))
    mins = mins.select("src", F.least("__mn", F.col("src")).alias("m"))
    return (
        nbr.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(nbr: DataFrame) -> DataFrame:
    """(u, v<=u) -> (v, m(u)) ∪ (u, m(u)), m over the small neighbors."""
    small = nbr.where(F.col("dst") <= F.col("src"))
    mins = small.groupBy("src").agg(F.min("dst").alias("m"))
    moved = small.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    center = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        moved.unionByName(center)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", *, max_iter: int = 30
) -> DataFrame:
    """Component labels for an undirected edge list.

    Returns ``(node, component)`` for every node that appears in
    ``edges``, where ``component`` is the minimum node id of its
    connected component (a deterministic canonical label). Nodes with
    no edges are the caller's business (coalesce to self-labels).

    Convergence: a round is large-star + small-star; we stop when the
    small-star output equals the previous round's. Both outputs are
    distinct row sets, so equality is ``|nxt| == |cur|`` (two counts
    over already-checkpointed frames — near-free) plus ONE one-sided
    ``exceptAll`` only when the counts match; while the edge set is
    still contracting the counts differ and the expensive check is
    skipped entirely. Raises after ``max_iter`` rounds rather than
    returning a wrong answer.
    """
    # Truncate upstream lineage once: the edge list is typically the
    # output of an expensive pair-mining stage (MinHash LSH etc.), and
    # both derivations below would otherwise recompute it (rule #7 in
    # NOTES — no ReusedExchange across different downstream plans).
    raw = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    # Node universe up front: nodes whose only edges are self-loops
    # still deserve a (singleton) label.
    nodes = (
        raw.select(F.col("src").alias("node"))
        .unionByName(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    cur = _symmetric(raw).distinct().localCheckpoint(eager=True)
    cur_cnt = cur.count()

    for _ in range(max_iter):
        nxt = _small_star(_symmetric(_large_star(_symmetric(cur)))).localCheckpoint(
            eager=True
        )
        nxt_cnt = nxt.count()
        changed = nxt_cnt != cur_cnt or not nxt.exceptAll(cur).isEmpty()
        prev, cur, cur_cnt = cur, nxt, nxt_cnt
        if not changed:
            prev.unpersist()
            break
        prev.unpersist()
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # Fixpoint is a union of stars: every edge points node -> component
    # min. Centers (and isolated nodes) label themselves.
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return nodes.join(members, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    *,
    universe: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment from near-dup pairs.

    Returns ``(doc_id, cluster_id)``; ``cluster_id`` is the minimum
    doc id of the duplicate cluster — the conventional "keep the
    first, drop the rest" canonical-document rule. When ``universe``
    is given (the full corpus), documents with no duplicate partner
    come back as singleton clusters of themselves, so the output is a
    total assignment suitable for a keep-list join.
    """
    comp = connected_components(pairs, a_col, b_col).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    if universe is None:
        return comp
    base = universe.select(F.col(id_col).cast("long").alias(id_col))
    return base.join(comp, id_col, "left").select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
