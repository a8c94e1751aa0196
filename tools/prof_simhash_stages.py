"""Stage decomposition of dedup_simhash_near_dups at a given SF: times
each pipeline prefix with the noop sink (best-of-2, cache cleared) so the
round's optimization work targets the stage that actually burns the time.

Usage: python tools/prof_simhash_stages.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_spotify.operators.simhash import (  # noqa: E402
    N_BITS,
    simhash_signatures,
    simhash_near_dups,
)
from spark_spotify.session import get_spark  # noqa: E402
from spark_spotify.sources.tables import fan_out, load_table  # noqa: E402


def _time(spark, df, label: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{label}: {best:.3f}s", flush=True)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_simhash")
    docs = load_table(spark, sf_dir, "documents")
    out: dict[str, float] = {}

    tok = fan_out(docs).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
    )
    out["explode_only"] = _time(spark, tok, "explode_only")

    v = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    hv = tok.select("doc_id", v.alias("v"))
    out["explode_md5conv"] = _time(spark, hv, "explode_md5conv")

    n_only = hv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    out["agg_n_only"] = _time(spark, n_only, "agg_n_only")

    out["signatures_32agg"] = _time(
        spark, simhash_signatures(docs), "signatures_32agg"
    )

    # packed variant: 3 bit-counters per 64-bit sum (21-bit fields)
    def packed_signatures(d):
        t = fan_out(d).select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"),
        )
        vv = F.conv(
            F.substring(F.md5(F.col("tok")), 1, 8), 16, 10
        ).cast("bigint")
        groups = [list(range(b, min(b + 3, N_BITS))) for b in range(0, N_BITS, 3)]
        packed = [
            F.sum(
                sum(
                    F.shiftleft(
                        F.shiftright(F.col("v"), bit).bitwiseAND(F.lit(1)),
                        21 * j,
                    )
                    for j, bit in enumerate(g)
                )
            ).alias(f"p{i}")
            for i, g in enumerate(groups)
        ]
        counts = t.select("doc_id", vv.alias("v")).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"), *packed
        )
        simhash = sum(
            F.when(
                F.shiftright(F.col(f"p{i}"), 21 * j).bitwiseAND(
                    F.lit((1 << 21) - 1)
                )
                * 2
                >= F.col("n"),
                F.lit(2**bit).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            for i, g in enumerate(groups)
            for j, bit in enumerate(g)
        )
        return counts.select("doc_id", simhash.alias("simhash"))

    ps = packed_signatures(docs)
    out["signatures_packed11"] = _time(spark, ps, "signatures_packed11")

    # equality check packed vs reference
    ref = simhash_signatures(docs)
    diff = (
        ref.alias("r")
        .join(ps.alias("p"), "doc_id", "full")
        .filter("r.simhash IS DISTINCT FROM p.simhash")
        .count()
    )
    print(f"packed_vs_ref_mismatches: {diff}", flush=True)

    out["near_dups_full"] = _time(
        spark, simhash_near_dups(docs), "near_dups_full"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
