"""Tail decomposition of dedup_simhash_near_dups: the signature agg was
measured cheap (~0.9 s), so the time lives in the band self-join /
distinct / checkpoint tail.  Times CONSTRUCTION + materialization (the
bench's timed region includes the eager checkpoint inside the query fn).

Usage: python tools/prof_simhash_tail.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_spotify.operators.dedup import discriminative_bands  # noqa: E402
from spark_spotify.operators.simhash import (  # noqa: E402
    BAND_WIDTH,
    N_BANDS,
    simhash_signatures,
    simhash_near_dups,
)
from spark_spotify.session import get_spark  # noqa: E402
from spark_spotify.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_simhash_tail")
    docs = load_table(spark, sf_dir, "documents")
    # warmup
    docs.limit(1).collect()

    def stamp(label, fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label}: {best:.3f}s", flush=True)

    def full():
        df = simhash_near_dups(docs)
        df.write.format("noop").mode("overwrite").save()

    stamp("full_query", full)

    def sig_persist_only():
        sh = simhash_signatures(docs).persist()
        sh.count()
        sh.unpersist()

    stamp("sig_persist_count", sig_persist_only)

    def bands_df(sh):
        return discriminative_bands(
            sh.select(
                "doc_id",
                "simhash",
                F.posexplode(
                    F.array(
                        *[
                            F.shiftright(F.col("simhash"), band * BAND_WIDTH)
                            .bitwiseAND(F.lit(2**BAND_WIDTH - 1))
                            .cast("int")
                            for band in range(N_BANDS)
                        ]
                    )
                ).alias("band", "band_val"),
            )
        )

    def bands_only():
        sh = simhash_signatures(docs).persist()
        bands_df(sh).write.format("noop").mode("overwrite").save()
        sh.unpersist()

    stamp("sig+bands", bands_only)

    def join_nodistinct():
        sh = simhash_signatures(docs).persist()
        bands = bands_df(sh)
        a, b = bands.alias("a"), bands.alias("b")
        pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
        )
        pairs.write.format("noop").mode("overwrite").save()
        sh.unpersist()

    stamp("sig+bands+join", join_nodistinct)

    def join_distinct():
        sh = simhash_signatures(docs).persist()
        bands = bands_df(sh)
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("simhash_a"),
                F.col("b.simhash").alias("simhash_b"),
            )
            .distinct()
        )
        pairs.write.format("noop").mode("overwrite").save()
        sh.unpersist()

    stamp("sig+bands+join+distinct", join_distinct)
    spark.stop()


if __name__ == "__main__":
    main()
