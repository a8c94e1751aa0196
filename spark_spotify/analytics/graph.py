"""Graph analytics over the relational fixture — one exact PageRank
power-iteration step on the customer→supplier trade graph.

Connected components (``operators/components.py``) cover the
contraction-style iterative family; this adds the OTHER canonical
distributed-graph shape: score propagation along out-edges with in-edge
aggregation — the inner loop of PageRank / label propagation / belief-ish
updates.  A full PageRank run iterates this step to a fixed point
(checkpointing every few iterations to truncate lineage, as
``dedup_cluster_assign`` already demonstrates); the step itself is the
per-iteration cost that matters at scale.

Determinism: ranks are parts-per-billion BIGINTs — the uniform prior is
``10^9 // out_degree`` (floor division) and the damping update is
``150_000_000 + (85 * inflow) // 100`` — integer arithmetic end-to-end, so
the hash oracle is exact (no float fold-order dependence).

Scale: the edge list shuffles once to dedup, once on source for degrees
(Exchange reuse co-locates the contribution join), once on target for the
inflow sum — all map-side-combinable aggregates; no vertex state lives on
the driver.  At 100 TB the edge list is bucketed by source so iterations
re-use the layout instead of re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

PR_SCALE = 1_000_000_000  # rank unit: parts-per-billion
PR_TOP_K = 20


def q_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    # out-degree as a window count — one shuffle on the source key and no
    # degree join (a groupBy+join would shuffle the edge list twice more)
    from pyspark.sql import Window

    inflow = (
        edges.withColumn(
            "d", F.count(F.lit(1)).over(Window.partitionBy("c"))
        )
        .select("s", F.expr(f"{PR_SCALE} div d").alias("cb"))
        .groupBy("s")
        .agg(F.sum("cb").alias("cs"))
    )
    return (
        inflow.select(
            F.col("s").alias("supp_key"),
            (F.lit(150_000_000) + F.expr("85 * cs div 100"))
            .cast("bigint")
            .alias("rank_ppb"),
        )
        .orderBy(F.desc("rank_ppb"), F.asc("supp_key"))
        .limit(PR_TOP_K)
    )


QUERIES = {"graph_pagerank_step": q_pagerank_step}

ORACLE = {
    "graph_pagerank_step": f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT c, COUNT(*) AS d FROM e GROUP BY c),
inflow AS (
  SELECT e.s, CAST(SUM({PR_SCALE} // deg.d) AS BIGINT) AS cs
  FROM e JOIN deg ON e.c = deg.c
  GROUP BY e.s
)
SELECT s AS supp_key,
       CAST(150000000 + (85 * cs) // 100 AS BIGINT) AS rank_ppb
FROM inflow
ORDER BY rank_ppb DESC, supp_key ASC
LIMIT {PR_TOP_K}
""",
}
