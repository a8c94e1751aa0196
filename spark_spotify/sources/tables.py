"""Parquet table catalog over the driver's synthetic warehouse.

Replaces the reference's three storage tiers (MongoDB bronze, PostgreSQL
silver/gold — SURVEY.md §1.1) with columnar Parquet scans.  Catalyst pushes
filters and prunes columns into these scans for free; at 100 TB the same reads
would hit a date-partitioned Parquet/Delta layout and get partition pruning on
top (the reference's incremental watermark scan, daily_etl_pipeline.py:132-137,
becomes a pruned partition read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.session import pin_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. Plain column-pruned, filter-pushdown parquet
    scan — never collect, never infer.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as a nanos long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to a microsecond
    timestamp — the same ns->us truncation DuckDB applies, so event-time
    values are bit-identical across engines.
    """
    pin_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_partitions: int = 32) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row work (shingling,
    hashing, gram explosion).

    Small dimension-sized tables arrive as a single parquet row group — one
    input partition — so without this every downstream per-row expression
    runs on one core no matter how wide the cluster is.  The repartition
    shuffles only the *input* rows (cheap), not the exploded output.  At
    100 TB inputs already arrive in thousands of file splits and this becomes
    a no-op: we only widen, never coalesce."""
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so Spark SQL text queries can run
    against the same catalog names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
