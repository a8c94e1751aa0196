"""Text analysis + deduplication over the documents table.

The training-data-pipeline operator family (BASELINE.json north star): token
counting, stopword/quality profiling, language profiling, exact dedup via
content fingerprinting.  All native column expressions (split/filter/
aggregate higher-order functions) — no Python UDFs, so the whole stage stays
in WholeStageCodegen and scales linearly with document count.

Scale: exact dedup is a hash-groupBy on a 128-bit fingerprint — the canonical
100 TB pattern (shuffle on md5(text), uniform key distribution, no skew).
MinHash/SimHash near-dup variants build on the same tokenization and land in
round 2+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens_col(text: F.Column) -> F.Column:
    return F.split(F.trim(text), " ")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count, stopword ratio, mean token length, quality
    bucket (reference quality-scoring shape, daily_etl_pipeline.py:259-270,
    applied to text)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    quality = (
        F.when(n_tokens < 5, "too_short")
        .when(n_stop / n_tokens > 0.5, "low_content")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        n_tokens.cast("int").alias("n_tokens"),
        n_stop.cast("int").alias("n_stopwords"),
        F.round(n_stop / n_tokens, 3).alias("stopword_ratio"),
        F.round(total_len / n_tokens, 3).alias("avg_token_len"),
        quality.alias("quality_bucket"),
    )


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by language: doc counts, char/token totals, source
    spread (language-ID aggregate surface; the lang column is ground truth,
    the heuristic classifier lands with the n-gram module)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    return (
        d.select("lang", "source", "n_chars", F.size(toks).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 2).alias("avg_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate grouping by normalized-content fingerprint
    (hash-groupBy dedup): md5(lower(trim(text))), group size via window,
    keeper = lowest doc_id in group."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    w = Window.partitionBy("fingerprint")
    wo = w.orderBy("doc_id")
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("dup_rank", F.row_number().over(wo))
        .select(
            "doc_id",
            "fingerprint",
            "group_size",
            "dup_rank",
            (F.col("dup_rank") == 1).alias("is_keeper"),
        )
    )


ORACLE = {
    "text_stats": """
WITH t AS (
  SELECT doc_id, lang, source, n_chars,
         string_split(trim(text), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang, source, n_chars,
         len(toks) AS n_tokens,
         len(list_filter(toks,
             x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
         list_sum(list_transform(toks, x -> length(x))) AS total_len
  FROM t
)
SELECT doc_id, lang, source, n_chars,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(n_stop AS INT) AS n_stopwords,
       round(n_stop / n_tokens, 3) AS stopword_ratio,
       round(total_len / n_tokens, 3) AS avg_token_len,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN n_stop / n_tokens > 0.5 THEN 'low_content'
            ELSE 'ok' END AS quality_bucket
FROM s
""",
    "text_lang_profile": """
WITH t AS (
  SELECT lang, source, n_chars,
         len(string_split(trim(text), ' ')) AS n_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       round(SUM(n_chars) / COUNT(*), 2) AS avg_chars,
       SUM(n_tokens) AS total_tokens,
       COUNT(DISTINCT source) AS n_sources
FROM t GROUP BY lang
""",
    "text_dedup_exact": """
SELECT doc_id,
       md5(lower(trim(text))) AS fingerprint,
       COUNT(*) OVER (PARTITION BY md5(lower(trim(text)))) AS group_size,
       CAST(row_number() OVER (PARTITION BY md5(lower(trim(text)))
                          ORDER BY doc_id) AS INT) AS dup_rank,
       row_number() OVER (PARTITION BY md5(lower(trim(text)))
                          ORDER BY doc_id) = 1 AS is_keeper
FROM documents
""",
}

QUERIES = {
    "text_stats": q_text_stats,
    "text_lang_profile": q_lang_profile,
    "text_dedup_exact": q_dedup_exact,
}
