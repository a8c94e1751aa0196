"""Stage decomposition of dedup_ngram_jaccard at a given SF (guide §1):
times each pipeline prefix with the noop sink so the optimization targets
the stage that actually burns the time — and A/Bs the signature
persist-vs-localCheckpoint materialization.

Usage: python tools/prof_ngram_stages.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_spotify.operators.dedup import (  # noqa: E402
    N_HASHES,
    _char_gram_rows,
    ngram_jaccard_near_dups,
)
from spark_spotify.session import get_spark  # noqa: E402
from spark_spotify.sources.tables import fan_out, load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("prof_ngram")
    docs = load_table(spark, sf_dir, "documents")
    docs.limit(1).collect()

    def stamp(label, fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label}: {best:.3f}s", flush=True)

    grams = _char_gram_rows(fan_out(docs))
    stamp(
        "grams_only",
        lambda: grams.write.format("noop").mode("overwrite").save(),
    )

    one = grams.select(
        "doc_id", F.md5(F.concat(F.lit("0|"), F.col("g"))).alias("h0")
    )
    stamp(
        "grams_1md5",
        lambda: one.write.format("noop").mode("overwrite").save(),
    )

    all12 = grams.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("g"))).alias(f"h{s}")
            for s in range(N_HASHES)
        ],
    )
    stamp(
        "grams_12md5",
        lambda: all12.write.format("noop").mode("overwrite").save(),
    )

    sig = grams.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("g")))).alias(
                f"mh{s}"
            )
            for s in range(N_HASHES)
        ]
    )
    stamp(
        "sig_agg_pipelined",
        lambda: sig.write.format("noop").mode("overwrite").save(),
    )

    def persist_count():
        s = sig.persist()
        s.count()
        s.unpersist()

    stamp("sig_persist_count", persist_count)

    def ckpt():
        s = sig.localCheckpoint(eager=True)
        del s

    stamp("sig_localckpt", ckpt)

    stamp(
        "full_query",
        lambda: ngram_jaccard_near_dups(docs)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
