"""Scaling probe for a SUBSET of registry queries: same methodology as
bench.py (noop-format writes, best-of-2, cache cleared between queries)
against an arbitrary sf dir — used to probe late-round additions at the
10x corpus without re-running the whole suite.

Usage: python tools/probe_subset.py <sf_dir> <query> [query ...]
Prints one JSON line shaped like bench.py's output.
"""

from __future__ import annotations

import gc
import json
import sys
import time

sys.path.insert(0, ".")

from spark_spotify.registry import QUERIES  # noqa: E402
from spark_spotify.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("spark_spotify_probe_subset")
    QUERIES["etl_watermark"](spark, sf_dir).collect()  # warmup
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary:
                    spark.catalog.dropTempView(tbl.name)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "subset_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
