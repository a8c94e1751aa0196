"""Batch REST ingestion source (SURVEY.md §2.1 S1/S2/S6/S7 semantics).

The reference's collector (curl_spotify_tracker.py:402-636) fetches
recently-played pages via curl, probes MongoDB row-by-row for existing ids
(:442-456), dedups with ``set()`` (:459-461), batch-fetches details (50/50/20
ids per call, :284-339) and upserts per-row (:102-153).  The Spark redesign
(SURVEY.md §3.1) keeps the network fetch driver-side (it is a ≤50-row API
page — not a distributed problem) and makes everything after it set-wise:

- ``fetch_fn`` is injectable (tests pass a fake; production passes an
  HTTP client with the reference's retry/rate-limit policy);
- new-id detection = one ``left_anti`` join against the dim, replacing the
  per-row existence probes;
- the upsert = operators.merge.insert_if_absent, replacing per-row
  ``replace_one``.

At scale the enrichment step flips to ``mapInPandas`` over an id-DataFrame
(noted at S2) — the driver-side batcher here is correct for API-bound
ingestion where the API itself caps throughput.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_spotify.operators.merge import insert_if_absent

PLAY_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), False),
        T.StructField("played_at", T.TimestampType(), False),
        T.StructField("track_name", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("album_name", T.StringType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("explicit", T.BooleanType()),
        T.StructField("popularity", T.IntegerType()),
    ]
)

DETAIL_BATCH = 50  # Spotify cap (curl_spotify_tracker.py:286)


def ingest_plays(
    spark: SparkSession,
    fetch_fn: Callable[[], Iterable[dict]],
    bronze: DataFrame | None,
) -> DataFrame:
    """One collection cycle: fetch a page, dedup set-wise, idempotent-append
    to bronze keyed (track_id, played_at)."""
    items = list(fetch_fn())
    incoming = spark.createDataFrame(items, PLAY_SCHEMA)
    if bronze is None:
        return incoming.dropDuplicates(["track_id", "played_at"])
    return insert_if_absent(bronze, incoming, ["track_id", "played_at"])


AUDIO_FEATURES_BATCH = 100  # Spotify audio-features cap (spotify_client.py:311)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), False),
        T.StructField("danceability", T.DoubleType()),
        T.StructField("energy", T.DoubleType()),
        T.StructField("loudness", T.DoubleType()),
        T.StructField("speechiness", T.DoubleType()),
        T.StructField("acousticness", T.DoubleType()),
        T.StructField("instrumentalness", T.DoubleType()),
        T.StructField("liveness", T.DoubleType()),
        T.StructField("valence", T.DoubleType()),
        T.StructField("tempo", T.DoubleType()),
    ]
)


def ingest_audio_features(
    spark: SparkSession,
    fetch_fn: Callable[[list[str]], Iterable[dict]],
    track_ids: Iterable[str],
    features: DataFrame | None = None,
) -> DataFrame:
    """S3: the dedicated audio-features source (spotify_client.py:300-321).

    Driver-side batched fetch at the API's 100-id cap, then a set-wise
    idempotent append keyed on track_id.  ``fetch_fn`` takes one id batch
    and yields feature dicts (the API drops unknown ids; so do we).  The
    reference enforces the cap by raising on >100 ids — here the batcher
    makes oversized requests impossible instead."""
    ids = sorted(set(track_ids))
    rows: list[dict] = []
    for i in range(0, len(ids), AUDIO_FEATURES_BATCH):
        rows.extend(r for r in fetch_fn(ids[i : i + AUDIO_FEATURES_BATCH]) if r)
    incoming = spark.createDataFrame(rows, AUDIO_FEATURES_SCHEMA)
    if features is None:
        return incoming.dropDuplicates(["track_id"])
    return insert_if_absent(features, incoming, ["track_id"])


SEARCH_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("search_type", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("item_id", T.StringType()),
        T.StructField("item_name", T.StringType()),
        T.StructField("popularity", T.IntegerType()),
    ]
)

SEARCH_LIMIT = 20  # reference default (spotify_client.py:374)


def search_source(
    spark: SparkSession,
    fetch_fn: Callable[[str, str, int], Iterable[dict]],
    queries: Iterable[str],
    search_type: str = "track",
    limit: int = SEARCH_LIMIT,
) -> DataFrame:
    """S4: the search source (spotify_client.py:374-397) as a DataFrame.

    One driver-side API call per query (``fetch_fn(query, type, limit)``
    yields result items in API rank order), flattened to one row per
    (query, rank) with the item's id/name/popularity — the columns the
    reference's search consumers read.  Rank is the API's result order,
    preserved explicitly so downstream sorts never depend on ingestion
    order."""
    rows = []
    for q in queries:
        for rank, item in enumerate(fetch_fn(q, search_type, limit), start=1):
            if rank > limit:
                break
            rows.append(
                {
                    "query": q,
                    "search_type": search_type,
                    "rank": rank,
                    "item_id": item.get("id"),
                    "item_name": item.get("name"),
                    "popularity": item.get("popularity"),
                }
            )
    return spark.createDataFrame(rows, SEARCH_SCHEMA)


# Ceiling on ids collected per enrichment cycle.  The REST APIs are the
# bottleneck by contract (50-id pages, rate limits), so novel-id sets are
# small; the guard turns a pathological backlog (e.g. an empty dim against
# a huge bronze) into bounded cycles instead of a driver-memory collect —
# leftover ids surface in the next cycle's anti-join.
MAX_ENRICH_IDS_PER_CYCLE = 100_000


def new_ids_for_enrichment(bronze: DataFrame, dim: DataFrame, key: str) -> list[list[str]]:
    """Ids present in bronze but absent from the dim, batched at the API cap —
    the set-wise replacement for the reference's per-row existence probes
    (left_anti join, then driver-side batching only over the *novel* ids).

    Collection is capped at MAX_ENRICH_IDS_PER_CYCLE (deterministic: the
    ordered head), so the driver payload is bounded no matter how far the
    dim lags bronze; repeated cycles drain the backlog idempotently."""
    new = (
        bronze.select(F.col(key)).distinct()
        .join(dim.select(F.col(key)), key, "left_anti")
        .orderBy(key)
        .limit(MAX_ENRICH_IDS_PER_CYCLE)
    )
    ids = [r[0] for r in new.collect()]
    return [ids[i : i + DETAIL_BATCH] for i in range(0, len(ids), DETAIL_BATCH)]
