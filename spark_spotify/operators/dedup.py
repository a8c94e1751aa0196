"""Near-duplicate detection: MinHash + LSH banding, n-gram Jaccard.

The canonical 100 TB dedup pipeline (BASELINE.json extension family):

1. shingle: w-token rolling shingles per document (explode, distinct);
2. minhash: K independent hash functions; hash_k(s) = md5(k || '|' || s) and
   the signature component is the lexicographic MIN — md5-as-string min is a
   perfectly valid uniform hash order, and (critically) computes identically
   in any engine with md5, which makes the whole pipeline oracle-checkable;
3. LSH banding: signature components pair up into bands; documents sharing
   any band value become candidate pairs (the only join is on band value —
   uniformly distributed keys, no skew);
4. verify: estimated Jaccard = fraction of matching signature components;
   optionally exact n-gram Jaccard on the surviving candidates.

Scale: the candidate join is |bands| × docs rows keyed by band hash —
shuffle-friendly; no all-pairs O(N²) stage exists anywhere. Everything is
built-in expressions (explode / groupBy / join) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 12
SHINGLE_W = 3
JACCARD_THRESHOLD = 0.5


def shingles(docs: DataFrame, w: int = SHINGLE_W) -> DataFrame:
    """doc_id -> distinct w-token shingles (joined by single spaces)."""
    toks = F.split(F.trim(F.col("text")), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - w)
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, w), " ")
    )
    return (
        docs.filter(n >= w)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signature(sh: DataFrame, k: int = N_HASHES) -> DataFrame:
    """Long-form signature: (doc_id, seed, mh) — mh = MIN(md5(seed|shingle)).

    Long (row-per-seed) layout instead of a signature array keeps everything
    in plain groupBy/join land and makes the band join a cheap reshuffle.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    hashed = sh.select("doc_id", "shingle").select(
        "doc_id",
        seeds,
        "shingle",
    )
    return (
        hashed.select(
            "doc_id",
            "seed",
            F.md5(
                F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


def candidate_pairs(sig: DataFrame) -> DataFrame:
    """LSH banding with rows-per-band = 2: band value = min||max of the two
    signature components (order-insensitive, so no collect_list needed)."""
    bands = sig.groupBy(
        "doc_id", F.floor(F.col("seed") / 2).cast("int").alias("band")
    ).agg(F.concat_ws("|", F.min("mh"), F.max("mh")).alias("band_val"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def estimate_jaccard(pairs: DataFrame, sig: DataFrame) -> DataFrame:
    """Estimated Jaccard = matching signature components / K."""
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("mh").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("mh").alias("mh_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.count(F.when(F.col("mh_a") == F.col("mh_b"), 1))
                / F.count(F.lit(1)),
                3,
            ).alias("est_jaccard")
        )
    )


def exact_jaccard(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle Jaccard for candidate pairs: |A∩B| / (|A|+|B|−|A∩B|)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                3,
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(docs: DataFrame) -> DataFrame:
    """Full pipeline: shingle -> minhash -> LSH candidates -> estimated +
    exact Jaccard, filtered at the threshold."""
    sh = shingles(docs)
    sig = minhash_signature(sh)
    pairs = candidate_pairs(sig)
    est = estimate_jaccard(pairs, sig)
    exact = exact_jaccard(pairs, sh)
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "est_jaccard", "jaccard")
    )
