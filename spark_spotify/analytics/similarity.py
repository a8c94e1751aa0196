"""Vector similarity search over the embeddings table.

Brute-force cosine top-k — the exact baseline for ANN (BASELINE.json
extension operator).  The dot product is a left-fold over zipped double
arrays (``zip_with`` + ``aggregate``), evaluated JVM-side; the anchor vector
is a one-row broadcast cross join, so the big side streams through a single
narrow stage.

Determinism: float->double casts are exact and both Spark's ``aggregate`` and
DuckDB's ``list_reduce`` fold left-to-right, so both engines produce the same
64-bit cosine; results round to 6dp and tie-break on vec_id.

Scale path (round 2+): LSH / IVF bucketing — random-hyperplane signatures via
the same fold primitives, bucket-join candidates, exact re-rank — turns the
O(N) scan per query into O(N/buckets); brute force here is the correctness
oracle for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

ANCHOR_ID = 0
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk(
    emb: DataFrame, anchor: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows against a 1-row ``anchor`` DataFrame
    with column ``q`` (array<double>)."""
    e = F.col("embedding").cast("array<double>")
    joined = emb.crossJoin(F.broadcast(anchor))
    cos = _dot(e, F.col("q")) / (_norm(e) * _norm(F.col("q")))
    return (
        joined.select(
            "vec_id",
            "label",
            F.round(cos, 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(k)
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    anchor = (
        emb.filter(F.col("vec_id") == ANCHOR_ID)
        .select(F.col("embedding").cast("array<double>").alias("q"))
    )
    others = emb.filter(F.col("vec_id") != ANCHOR_ID)
    return cosine_topk(others, anchor, TOP_K)


ORACLE = {
    "sim_ann_cosine_topk": """
WITH anchor AS (
  SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id, e.label,
         round(
           list_reduce(list_transform(
               list_zip(e.embedding::DOUBLE[], a.q),
               p -> p[1] * p[2]), (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_transform(e.embedding::DOUBLE[],
                                              x -> x * x), (acc, x) -> acc + x))
              * sqrt(list_reduce(list_transform(a.q, x -> x * x),
                                 (acc, x) -> acc + x))),
           6) AS cosine_sim
  FROM embeddings e CROSS JOIN anchor a
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id ASC
LIMIT 10
""",
}

QUERIES = {"sim_ann_cosine_topk": q_ann_cosine_topk}
