"""Connected components over a pair graph: the cluster step of a dedup
pipeline.

Near-dup detection (MinHash / SimHash / embedding-cosine) emits *pairs*; to
actually deduplicate a corpus you need the transitive closure — if A~B and
B~C, then {A,B,C} is one duplicate cluster with one keeper.  This is the
standard iterative min-label-propagation (a.k.a. "hash-min") connected
components: every node starts labeled with itself; each round, every node
takes the min label among itself and its neighbors; fixpoint is reached in
O(diameter) rounds.

Scale: each round is one edge⋈label join + a groupBy(node) MIN — both shuffle
on node id, map-side combinable, no corpus-sized state on the driver (the
driver only sees the one-row convergence count).  Duplicate-cluster graphs
are overwhelmingly tiny cliques, so diameter — and the round count — is small
regardless of corpus size.  Labels are ``localCheckpoint``-ed every round to
cut the growing lineage that would otherwise re-run all prior rounds.  At
100 TB you would switch the round body to the large-star/small-star
alternating rule (Kiveris et al., "Connected Components in MapReduce",
SoCC'14), which shrinks high-degree paths in O(log²N) rounds; the per-round
dataflow (join + min-agg) is identical to this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Min-label propagation.

    ``nodes``: one column ``node``; ``edges``: columns ``src``/``dst``
    (undirected, any orientation).  Returns (node, label) with label = min
    node id of the component.  Isolated nodes keep their own id.
    """
    # materialize the (small, pair-graph) edge set once, symmetrized, so each
    # round's join doesn't recompute the upstream candidate pipeline
    sym = (
        edges.select("src", "dst")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    sym.count()

    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(max_rounds):
        msgs = sym.join(
            labels, sym.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def cluster_assign(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Dedup cluster assignment: (node, cluster_id, cluster_size, is_keeper)
    — cluster_id = min node id in the component, keeper = that node."""
    labels = connected_components(nodes, edges)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            "node",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("label")).alias("is_keeper"),
        )
    )
