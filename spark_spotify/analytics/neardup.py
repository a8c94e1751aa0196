"""Near-duplicate detection queries (MinHash/LSH) over documents.

Thin query wrappers around ``spark_spotify.operators.dedup``; the oracle twin
replays the identical shingle -> md5-minhash -> band -> verify pipeline in
ANSI SQL (md5-as-string MIN is engine-portable, which is exactly why the
signature hash was chosen — see operators/dedup.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.operators.dedup import minhash_near_dups, signatures
from spark_spotify.sources.tables import load_table


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dups(load_table(spark, sf_dir, "documents"))


def q_minhash_signature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature surface check: per-doc first 4 minhash components, one row
    per doc (deterministic regardless of banding)."""
    sig = signatures(load_table(spark, sf_dir, "documents"), k=4)
    return sig.select(
        "doc_id",
        F.col("sig")[0].alias("mh0"),
        F.col("sig")[1].alias("mh1"),
        F.col("sig")[2].alias("mh2"),
        F.col("sig")[3].alias("mh3"),
    )


_SH = """
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
  )
"""

ORACLE = {
    "dedup_minhash_signature": f"""
WITH sh AS ({_SH}),
sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
  FROM sh, generate_series(0, 3) g(seed)
  GROUP BY doc_id, seed
)
SELECT doc_id,
  MIN(CASE WHEN seed = 0 THEN mh END) AS mh0,
  MIN(CASE WHEN seed = 1 THEN mh END) AS mh1,
  MIN(CASE WHEN seed = 2 THEN mh END) AS mh2,
  MIN(CASE WHEN seed = 3 THEN mh END) AS mh3
FROM sig GROUP BY doc_id
""",
    "dedup_minhash_near_dups": f"""
WITH sh AS ({_SH}),
sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
  FROM sh, generate_series(0, 11) g(seed)
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(floor(seed / 2) AS INT) AS band,
         MIN(mh) || '|' || MAX(mh) AS band_val
  FROM sig GROUP BY doc_id, CAST(floor(seed / 2) AS INT)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
         round(COUNT(CASE WHEN sa.mh = sb.mh THEN 1 END) / COUNT(*), 3)
           AS est_jaccard
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
  GROUP BY p.doc_a, p.doc_b
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT e.doc_a, e.doc_b, e.est_jaccard,
       round(i.n_common / (sa.n_sh + sb.n_sh - i.n_common), 3) AS jaccard
FROM est e
JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
WHERE round(i.n_common / (sa.n_sh + sb.n_sh - i.n_common), 3) >= 0.5
""",
}

QUERIES = {
    "dedup_minhash_signature": q_minhash_signature_sample,
    "dedup_minhash_near_dups": q_minhash_near_dups,
}
