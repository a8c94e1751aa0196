"""Driver-side wall-time profile of ONE registry query.

The drills are driver-sequential (every Spark action blocks the Python
thread in a py4j call), so cProfile cumulative time per repo source line
attributes the query's wall clock to the phase that spent it.

Usage: python tools/profile_query.py <sf_dir> <query> [top_n]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, ".")

from spark_spotify.registry import QUERIES  # noqa: E402
from spark_spotify.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark("spark_spotify_profile")
    QUERIES["etl_watermark"](spark, sf_dir).collect()  # warmup
    # one untimed run first so codegen/JIT warmup doesn't pollute the profile
    QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    pr.disable()
    wall = time.perf_counter() - t0
    print(f"=== {name}: wall {wall:.2f}s (2nd run) ===")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    # repo-only lines: attribute time to our source, not pyspark internals
    print("--- repo frames by cumulative time ---")
    st.print_stats("spark_spotify|tools/", top_n)
    print("--- py4j blocking (total time in socket waits) ---")
    st.print_stats("java_gateway|clientserver", 6)
    spark.stop()


if __name__ == "__main__":
    main()
