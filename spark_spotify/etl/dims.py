"""Gold dimensions: generated calendar + entity dims with deterministic keys.

Reference parity:
- dim_dates is a pre-populated generated calendar (SURVEY.md §1.1b, consumed at
  daily_etl_pipeline.py:458/:551) — built here with sequence+explode, the Spark
  analog of Postgres generate_series (main_heatmap.py:17-25).
- dim_tracks/artists/albums are DISTINCT + MIN(first-seen) + play-count upserts
  with md5 surrogate keys ('artist_' || MD5(name), daily_etl_pipeline.py:357).
  The event_type and user dims below reproduce that derivation set-wise.

Scale: dims aggregate the fact on low-cardinality keys — map-side partial agg
does nearly all the work; the result is tiny and gets broadcast into every
star join (J1/J4) so the 100 TB fact never shuffles for dim joins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

CAL_START = dt.date(2024, 1, 1)
CAL_END = dt.date(2024, 1, 31)


def date_dim(spark: SparkSession) -> DataFrame:
    """Generated calendar dimension (F7: sequence + explode)."""
    d = F.col("date_value")
    return (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(CAL_START), F.lit(CAL_END))).alias("date_value")
        )
        .select(
            d,
            (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d))
            .cast("int")
            .alias("date_key"),
            F.date_format(d, "EEEE").alias("day_name"),
            (F.dayofweek(d) - 1).cast("int").alias("day_of_week"),
            (F.dayofweek(d) - 1).isin(0, 6).alias("is_weekend"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.year(d).cast("int").alias("year"),
        )
    )


def event_type_dim(events: DataFrame) -> DataFrame:
    """Entity dim from the fact: surrogate key, first_seen, play totals.

    Reference: sync_tracks_to_dwh DISTINCT+MIN+NOT IN upsert
    (daily_etl_pipeline.py:309-324) with 'et_' || md5(name) keys (:357).
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.min(F.to_date("ts")).alias("first_seen"),
            F.count(F.lit(1)).alias("total_plays"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(
            F.concat(F.lit("et_"), F.md5(F.col("event_type"))).alias("event_type_key"),
            "event_type",
            "first_seen",
            "total_plays",
            "unique_users",
        )
    )


def user_dim(events: DataFrame) -> DataFrame:
    """User dim (dim_artists analog: first_discovered + total_plays,
    daily_etl_pipeline.py:354-367)."""
    return events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_seen"),
        F.count(F.lit(1)).alias("total_plays"),
    )


def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return date_dim(spark)


def q_event_type_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_type_dim(load_table(spark, sf_dir, "events"))


ORACLE = {
    "etl_date_dim": """
SELECT
  CAST(gs AS DATE) AS date_value,
  CAST(year(gs) * 10000 + month(gs) * 100 + day(gs) AS INT) AS date_key,
  dayname(gs) AS day_name,
  CAST(dayofweek(gs) AS INT) AS day_of_week,
  dayofweek(gs) IN (0, 6) AS is_weekend,
  monthname(gs) AS month_name,
  CAST(year(gs) AS INT) AS year
FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(gs)
""",
    "etl_event_type_dim": """
SELECT
  'et_' || md5(event_type) AS event_type_key,
  event_type,
  MIN(CAST(ts AS DATE)) AS first_seen,
  COUNT(*) AS total_plays,
  COUNT(DISTINCT user_id) AS unique_users
FROM events
GROUP BY event_type
""",
}

QUERIES = {
    "etl_date_dim": q_date_dim,
    "etl_event_type_dim": q_event_type_dim,
}
