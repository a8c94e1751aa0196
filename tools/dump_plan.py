"""Dump the .explain("formatted") physical plan of registry queries.

Usage: python tools/dump_plan.py <sf_dir> <out_dir> <suffix> <query> [...]
Writes <out_dir>/<query>_<suffix>.txt for each query.

The drills return a DataFrame whose plan is the SERVED result; side
jobs (commits, asserts) inside the factory run while building it and do
not appear in the returned plan — OPTIMIZATION_r10.md notes which
changes live in those side jobs instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from spark_spotify.registry import QUERIES  # noqa: E402
from spark_spotify.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("spark_spotify_plans")
    QUERIES["etl_watermark"](spark, sf_dir).collect()  # warmup
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
    spark.stop()


if __name__ == "__main__":
    main()
