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


def dynamic_insert(
    target: DataFrame,
    records: Sequence[dict],
) -> DataFrame:
    """S9 — the reference's generic dynamic INSERT
    (utils/database.py:195-211: columns taken from the first record's
    keys, VALUES placeholders, executemany into an existing table) as a
    schema-aligning Spark append.

    Alignment semantics match what Postgres would do:

    * a record key that is not a target column raises (Postgres: undefined
      column);
    * target columns absent from the records are filled with NULL
      (Postgres: unlisted columns take their default — NULL here);
    * values are cast to the target column types via the target schema —
      the insert can never drift the table's schema.

    The records list is an API-page-sized driver payload by contract (the
    reference's executemany has the same shape); the returned relation is
    ``target UNION ALL aligned`` — callers commit it via their sink
    (merge_upsert / insert_if_absent / append part)."""
    if not records:
        return target
    incoming_cols = set()
    for r in records:
        incoming_cols.update(r)
    unknown = incoming_cols - set(target.columns)
    if unknown:
        raise ValueError(
            f"dynamic_insert: columns {sorted(unknown)} do not exist on "
            f"the target (has {target.columns})"
        )
    spark = target.sparkSession
    # build against the target schema directly: missing keys surface as
    # None, and createDataFrame validates/casts per-field
    aligned = spark.createDataFrame(
        [tuple(r.get(c) for c in target.columns) for r in records],
        target.schema,
    )
    return target.unionByName(aligned)


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
