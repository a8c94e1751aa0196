"""Nested-JSON bronze source: the reference's MongoDB document shape as a
schema'd Spark JSON read + set-wise flatten.

The reference stores plays as nested documents — ``track_info{name,
artists[{id,name}], album{id,name}, duration_ms, explicit, popularity}`` plus
``batch_info`` (curl_spotify_tracker.py:569-595) — and flattens them row by
row in Python with ``.get()`` chains and defaults
(daily_etl_pipeline.py:159-183).  Here the same documents land as JSON lines,
are read with an EXPLICIT StructType (schema-on-read, never inference on the
hot path — inference is a full extra pass over 100 TB), and flatten as one
narrow projection: first-artist extraction is ``col("track_info.artists")[0]
["name"]`` with the reference's 'Unknown Artist'/'Unknown Album' defaults
(P1), and the ISO-8601 'Z' timestamp parse is ``to_timestamp`` (F13).

Scale: a JSON-lines directory is splittable, so the read parallelizes per
file split; the flatten is pure scan work inside one WholeStageCodegen; the
scan prunes to the referenced top-level columns (intra-struct pruning is a
Parquet/ORC optimization — at 100 TB the landing step rewrites raw JSON to
Parquet bronze precisely so downstream reads get nested pruning + column
statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARTIST = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

LISTENING_DOC_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), False),
        T.StructField("played_at", T.StringType(), False),  # ISO-8601 w/ Z
        T.StructField(
            "track_info",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("artists", T.ArrayType(ARTIST)),
                    T.StructField(
                        "album",
                        T.StructType(
                            [
                                T.StructField("id", T.StringType()),
                                T.StructField("name", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("explicit", T.BooleanType()),
                    T.StructField("popularity", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "batch_info",
            T.StructType(
                [
                    T.StructField("batch_id", T.StringType()),
                    T.StructField("collected_at", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_bronze_json(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd JSON-lines read of the nested listening documents."""
    return spark.read.schema(LISTENING_DOC_SCHEMA).json(path)


def flatten_listening(bronze: DataFrame) -> DataFrame:
    """The reference's raw-staging flatten (daily_etl_pipeline.py:159-183)
    as one projection: nested field access, first-array-element extraction
    with defaults, ISO-8601 'Z' parse, and the reference's literal defaults
    for explicit/popularity."""
    ti = F.col("track_info")
    return bronze.select(
        F.col("track_id"),
        F.to_timestamp(F.col("played_at")).alias("played_at"),
        F.coalesce(ti["name"], F.lit("Unknown Track")).alias("track_name"),
        F.coalesce(
            ti["artists"][0]["name"], F.lit("Unknown Artist")
        ).alias("artist_name"),
        F.coalesce(ti["album"]["name"], F.lit("Unknown Album")).alias(
            "album_name"
        ),
        F.coalesce(ti["duration_ms"], F.lit(0)).alias("duration_ms"),
        F.coalesce(ti["explicit"], F.lit(False)).alias("explicit"),
        F.coalesce(ti["popularity"], F.lit(0)).alias("popularity"),
        F.col("batch_info.batch_id").alias("batch_id"),
        F.to_timestamp(F.col("batch_info.collected_at")).alias(
            "collected_at"
        ),
    )
