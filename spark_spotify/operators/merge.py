"""MERGE / upsert emulation on plain Parquet.

The reference upserts everywhere: MongoDB ``replace_one(..., upsert=True)``
(curl_spotify_tracker.py:118-125), Postgres ``INSERT .. ON CONFLICT DO
UPDATE/NOTHING`` (daily_etl_pipeline.py:154, :322-324, :518-570).  Vanilla
Spark-on-Parquet has no MERGE, so this is the one reusable piece of engine
infrastructure (SURVEY.md §7.2): new-rows-win upsert as

    merged = incoming UNION ALL (existing ANTI-JOIN incoming ON keys)

Scale notes (100 TB): the anti-join shuffles both sides on the merge keys.
When ``incoming`` is a small delta (the common incremental case) pass
``broadcast_incoming=True`` so the anti-join broadcasts the delta and the big
``existing`` side never shuffles.  On a real deployment the existing side
would be a date-partitioned table and callers restrict it to the affected
partitions first (partition pruning), making the rewrite proportional to the
delta, not to history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    broadcast_incoming: bool = False,
) -> DataFrame:
    """Upsert ``incoming`` into ``existing`` on ``keys`` (incoming wins).

    Equivalent to Postgres INSERT .. ON CONFLICT (keys) DO UPDATE SET all
    columns = EXCLUDED.* — the reference's dim/stat upsert pattern
    (daily_etl_pipeline.py:322-324, :518-570).  Column sets must match;
    unionByName keeps the result schema stable regardless of select order.
    """
    keys = list(keys)
    inc_keys = incoming.select(*keys)
    if broadcast_incoming:
        inc_keys = F.broadcast(inc_keys)
    survivors = existing.join(inc_keys, on=keys, how="left_anti")
    return incoming.unionByName(survivors)


def insert_if_absent(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """INSERT .. ON CONFLICT DO NOTHING: keep existing rows, add only new keys.

    Reference: daily_etl_pipeline.py:149-191 (raw staging idempotent load) and
    the NOT EXISTS fact-dedup at :462-466.
    """
    keys = list(keys)
    fresh = incoming.dropDuplicates(keys).join(
        existing.select(*keys), on=keys, how="left_anti"
    )
    return existing.unionByName(fresh)
