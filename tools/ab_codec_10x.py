"""A/B the io compression codec (shuffle/broadcast/spill) at the 10x
probe corpus (VERDICT r10 #8, guide §2.3): lz4 (default) vs zstd over the
heavy-shuffle tail.  Each arm runs in its OWN Spark session (the codec is
a session-start conf), same queries, same methodology as bench.py.

Usage: python tools/ab_codec_10x.py <sf_dir> <query> [query ...]
Prints one JSON line per arm.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")


def run_arm(codec: str, sf_dir: str, names: list[str]) -> dict:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab_codec_{codec}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        .config(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "true"
        )
        .config("spark.io.compression.codec", codec)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from spark_spotify.registry import QUERIES

    QUERIES["etl_watermark"](spark, sf_dir).collect()  # warmup
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
    out = {
        "codec": codec,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    for codec in ("lz4", "zstd", "lz4", "zstd"):
        print(json.dumps(run_arm(codec, sf_dir, names)), flush=True)


if __name__ == "__main__":
    main()
