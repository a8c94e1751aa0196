"""Gold fact build: the star join.

Reference: load_to_warehouse (daily_etl_pipeline.py:436-503) — cleaned events
INNER JOIN dim_dates ON date, INNER JOIN the entity dim, LEFT JOIN the
secondary dim (keeps plays whose artist is unknown, :460), NOT EXISTS dedup on
the natural key (:462-466).

Spark physics: the calendar and event-type dims are bounded-small forever ->
explicit ``broadcast`` hints so the fact side never shuffles for those
joins.  The USER dim is corpus-keyed (one row per distinct user — at 100 TB
that can be billions), so its hint is gated on a proven row bound
(``du_rows``); without one the join stays a plain equi-join and AQE
broadcasts at runtime iff the dim turns out small.  The dedup
``dropDuplicates`` on the already-unique event_id is a no-op kept for parity
with the reference's idempotent-load semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.etl.dims import date_dim, event_type_dim, user_dim
from spark_spotify.etl.silver import clean_events
from spark_spotify.sources.tables import load_table, table_rows

# (user_id bigint, first_seen date) ≈ 40 B/row => ~40 MB at this bound
BROADCAST_USER_DIM_MAX_ROWS = 1_000_000


def build_fact(
    spark: SparkSession, events: DataFrame, du_rows: int | None = None
) -> DataFrame:
    dd = date_dim(spark)
    det = event_type_dim(events)
    du = user_dim(events)
    return fact_from(clean_events(events), dd, det, du, du_rows=du_rows)


def fact_from(
    silver: DataFrame,
    dd: DataFrame,
    det: DataFrame,
    du: DataFrame,
    du_rows: int | None = None,
) -> DataFrame:
    """Star join against prebuilt dims — the incremental path
    (``etl.pipeline``) passes the MERGED warehouse dims here so a delta's
    fact rows see globally-correct dim attributes.  ``du_rows`` is the
    caller's proven upper bound on the user-dim size (e.g. the customer
    table's parquet-footer count); None = no broadcast hint."""
    du = du.select("user_id", F.col("first_seen").alias("user_first_seen"))
    det = det.select("event_type", "event_type_key")
    if du_rows is not None and du_rows <= BROADCAST_USER_DIM_MAX_ROWS:
        du = F.broadcast(du)
    return (
        silver.dropDuplicates(["event_id"])
        .join(F.broadcast(dd), silver.played_date == dd.date_value, "inner")
        .join(F.broadcast(det), "event_type", "inner")
        .join(du, "user_id", "left")
        .select(
            "event_id",
            "date_key",
            "event_type_key",
            "user_id",
            "played_hour",
            silver.is_weekend.alias("is_weekend"),
            "time_period",
            "value",
            "user_first_seen",
        )
    )


def q_fact_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct users are bounded by the customer key domain, so the
    # customer footer count is a proven (cheap, no-job) user-dim bound
    return build_fact(
        spark,
        load_table(spark, sf_dir, "events"),
        du_rows=table_rows(sf_dir, "customer"),
    )


ORACLE = {
    "etl_fact_star": """
WITH dd AS (
  SELECT CAST(gs AS DATE) AS date_value,
         CAST(year(gs) * 10000 + month(gs) * 100 + day(gs) AS INT) AS date_key
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(gs)
), det AS (
  SELECT event_type, 'et_' || md5(event_type) AS event_type_key FROM events GROUP BY event_type
), du AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS user_first_seen FROM events GROUP BY user_id
)
SELECT
  e.event_id,
  dd.date_key,
  det.event_type_key,
  e.user_id,
  CAST(EXTRACT(hour FROM e.ts) AS INT) AS played_hour,
  dayofweek(e.ts) IN (0, 6) AS is_weekend,
  CASE WHEN CAST(EXTRACT(hour FROM e.ts) AS INT) BETWEEN 6 AND 11 THEN 'morning'
       WHEN CAST(EXTRACT(hour FROM e.ts) AS INT) BETWEEN 12 AND 17 THEN 'afternoon'
       WHEN CAST(EXTRACT(hour FROM e.ts) AS INT) BETWEEN 18 AND 23 THEN 'evening'
       ELSE 'night' END AS time_period,
  e.value,
  du.user_first_seen
FROM events e
JOIN dd ON CAST(e.ts AS DATE) = dd.date_value
JOIN det ON e.event_type = det.event_type
LEFT JOIN du ON e.user_id = du.user_id
""",
}

QUERIES = {"etl_fact_star": q_fact_star}
