"""Connected components over a pair graph: the cluster step of a dedup
pipeline.

Near-dup detection (MinHash / SimHash / embedding-cosine) emits *pairs*; to
actually deduplicate a corpus you need the transitive closure — if A~B and
B~C, then {A,B,C} is one duplicate cluster with one keeper.  Two phases:

1. **Partition-local union-find contraction** (``_partition_forest``): each
   partition collapses its slice of the edge list to a spanning forest of
   depth-1 stars — same components, but every locally-visible chain is gone.
2. **Min-label propagation ("hash-min") with path-halving**: every node
   starts labeled with itself; each round every node takes the min label
   among itself and its neighbors, then labels are shortcut one hop (label
   := label-of-label).  Plain propagation needs O(diameter) rounds; after
   contraction the remaining diameter is bounded by the number of
   cross-partition hops, and the halving step squares the reach per round —
   convergence like the large-star/small-star rule (Kiveris et al.,
   "Connected Components in MapReduce", SoCC'14) but with one extra tiny
   join instead of a reorientation pass.

Scale: each round is an edge⋈label join + a groupBy(node) MIN (both keyed
on node id, map-side combinable) + a label⋈label join (label-table-sized,
not edge-sized); no corpus-sized state ever reaches the driver (it only
sees the one-row convergence count).  The symmetrized edge set is built in
ONE pass over the (expensive) upstream candidate pipeline via explode —
a union of two selects would execute that pipeline twice.  Labels are
checkpointed every round (``stable_checkpoint``: reliable on clusters,
local on the single-JVM harness) to cut the growing lineage that would
otherwise re-run all prior rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_spotify.functions.checkpoint import stable_checkpoint

MAX_ROUNDS = 25


def _partition_forest(pairs: DataFrame, parts: int) -> DataFrame:
    """Partition-local union-find contraction: each partition runs a
    union-find over its slice of the edge list and emits its spanning
    forest as (node → local root) edges.

    The output graph has exactly the same connected components as the
    input (a union of per-partition spanning forests preserves every
    local connection), but each partition's chains collapse to depth-1
    stars — so the propagation loop that follows converges in O(log
    #partitions-spanning-hops) rounds instead of O(graph diameter).
    Near-dup chains (A~B~C~…) are precisely the worst case for label
    propagation, and precisely what this kills: locally a chain of any
    length becomes one star.  Arrow-batched ``mapInPandas`` accumulates
    the whole partition through the batch iterator; per-partition edge
    counts are bounded by the repartition below, so the Python-side
    union-find is microseconds-per-edge batch work, not per-row UDF
    dispatch.  Root choice (min by Python ordering) only shapes the
    forest — component membership, and therefore the final min-label
    answer, is ordering-independent."""

    def uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                rs, rd = find(s), find(d)
                if rs == rd:
                    continue
                if rd < rs:
                    rs, rd = rd, rs
                parent[rd] = rs
                parent.setdefault(rs, rs)
        out_n = []
        out_r = []
        for n in list(parent.keys()):
            r = find(n)
            if r != n:
                out_n.append(n)
                out_r.append(r)
        if out_n:
            yield pd.DataFrame({"src": out_n, "dst": out_r})

    return pairs.repartition(parts).mapInPandas(uf, pairs.schema)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS,
    parts: int | None = None,
) -> DataFrame:
    """Contraction + min-label propagation with path-halving.

    ``nodes``: one column ``node``; ``edges``: columns ``src``/``dst``
    (undirected, any orientation).  Returns (node, label) with label = min
    node id of the component.  Isolated nodes keep their own id.
    ``parts`` overrides the edge-count-derived partition sizing (tests use
    it to force the multi-partition propagation path on tiny graphs).
    """
    # Materialize the pair set ONCE before any derivation: the upstream
    # candidate pipeline is the expensive part (and its plan is costly to
    # codegen), while the pair set itself is output-sized — every later
    # derivation (symmetrize, per-round joins) runs against this cache.
    pairs = edges.select("src", "dst").persist()
    n_pairs = pairs.count()

    # Size the per-round shuffles AND the cached graph state to the duplicate
    # graph, not the session default: every round is 2 shuffles + a
    # checkpoint + an action, and ``localCheckpoint`` pins partitioning (AQE
    # can't re-coalesce an RDD-backed scan, and its parallelism-first
    # coalescing won't go below default parallelism anyway), so a 300-edge
    # graph would otherwise pay full-cluster task-scheduling overhead ×
    # stages × rounds.  The conf is set *before* ``sym`` is built so the
    # symmetrized cache itself lands in ``round_parts`` partitions — every
    # per-round map stage scans it.  ~64k edges per task keeps rounds
    # single-digit-task locally and wide on a real cluster, where the
    # session cap below scales with the executor count.
    spark = nodes.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    round_parts = parts or max(
        1, min(int(saved), (2 * n_pairs) // 65536 + 1)
    )
    spark.conf.set(conf_key, str(round_parts))
    sym = None
    try:
        forest = _partition_forest(pairs, round_parts)
        if round_parts == 1:
            # A single-partition contraction saw EVERY edge, so its forest
            # is already the transitive closure (each node points straight
            # at its component's min): propagation would only re-verify a
            # fixpoint.  Materialize the (output-sized) labels so the pair
            # cache can drop.
            f = forest.select(
                F.col("src").alias("node"), F.col("dst").alias("f_label")
            )
            labels = (
                nodes.join(f, "node", "left")
                .select(
                    "node",
                    F.coalesce("f_label", F.col("node")).alias("label"),
                )
                .transform(stable_checkpoint)
            )
            pairs.unpersist()
            return labels
        sym = (
            forest.select(
                F.explode(
                    F.array(
                        F.struct(F.col("src"), F.col("dst")),
                        F.struct(
                            F.col("dst").alias("src"),
                            F.col("src").alias("dst"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .distinct()
            .persist()
        )
        sym.count()
        pairs.unpersist()
        labels = _propagate(nodes, sym, max_rounds)
    finally:
        spark.conf.set(conf_key, saved)
    sym.unpersist()
    return labels


def _propagate(
    nodes: DataFrame, sym: DataFrame, max_rounds: int
) -> DataFrame:
    labels = nodes.select("node", F.col("node").alias("label"))
    for rnd in range(max_rounds):
        msgs = sym.join(
            labels, sym.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "label", F.lit(0).alias("own"))
        # change detection is fused into the propagation groupBy: the old
        # label rides along tagged own=1, so min(label) < old-label falls out
        # of the same shuffle.  A propagation fixpoint (chg=0 everywhere)
        # means labels are equal across every edge — i.e. constant per
        # component — so no separate old⋈new comparison join is needed.
        prop = (
            labels.withColumn("own", F.lit(1))
            .union(msgs)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                (
                    F.min("label")
                    < F.min(F.when(F.col("own") == 1, F.col("label")))
                ).cast("long").alias("chg"),
            )
        )
        if rnd == 0:
            # every label is still its own node id, so label(label) is the
            # identity — skip the halving join this round
            new_labels = stable_checkpoint(prop, eager=False)
        else:
            # path-halving: label := label(label).  Every label value is
            # itself a node id, so this lookup is a self-join on the label
            # table — it squares the propagation reach each round.
            parent = prop.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            new_labels = prop.join(
                parent, prop.label == parent.p_node, "left"
            ).select(
                "node",
                F.coalesce("p_label", "label").alias("label"),
                "chg",
            )
            new_labels = stable_checkpoint(new_labels, eager=False)
        # the one action per round: materializes the lazy checkpoint and
        # reads the fused change flags with a scan-only aggregate
        changed = new_labels.agg(
            F.coalesce(F.sum("chg"), F.lit(0))
        ).collect()[0][0]
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return labels


def cluster_assign(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Dedup cluster assignment: (node, cluster_id, cluster_size, is_keeper)
    — cluster_id = min node id in the component, keeper = that node.

    Only edge-touched nodes can end up in a multi-node component, so the
    iterative propagation runs on the pair-graph's node set (output-sized —
    near-dup pairs are a vanishing fraction of a 100 TB corpus), and the
    corpus-sized node table joins in exactly once at the end: untouched
    nodes are singletons labeled with themselves via coalesce.  This keeps
    every per-round shuffle proportional to the duplicate graph, not the
    corpus."""
    pairs = edges.select("src", "dst").persist()
    touched = (
        pairs.select(F.col("src").alias("node"))
        .union(pairs.select(F.col("dst").alias("node")))
        .distinct()
    )
    # by return time every round has executed and the final labels are
    # checkpointed, so the candidate-pair cache can be dropped
    edge_labels = connected_components(touched, pairs)
    pairs.unpersist()
    labels = nodes.join(
        edge_labels.withColumnRenamed("label", "e_label"), "node", "left"
    ).select(
        "node", F.coalesce("e_label", F.col("node")).alias("label")
    )
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
