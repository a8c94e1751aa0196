"""Incremental medallion pipeline: batch-split invariance, redelivery
idempotence, and stats parity with the one-shot builds."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_spotify.etl.pipeline import read_table, run_incremental_etl, split_ts
from spark_spotify.etl.fact import q_fact_star
from spark_spotify.etl.stats import q_daily_stats
from spark_spotify.sources.tables import load_table


@pytest.fixture()
def warehouse():
    path = tempfile.mkdtemp(prefix="spark_spotify_test_wh_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _rows(df, keys):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def test_incremental_equals_batch(spark, sf_dir, warehouse):
    events = load_table(spark, sf_dir, "events")
    median = split_ts(events)
    r1 = run_incremental_etl(
        spark, events.filter(F.col("ts") <= F.lit(median)), warehouse, 1
    )
    r2 = run_incremental_etl(spark, events, warehouse, 2)
    assert not r1["skipped"] and not r2["skipped"]
    assert r1["n_new"] + r2["n_new"] == events.count()

    fact_inc = read_table(spark, warehouse, "fact")
    fact_batch = q_fact_star(spark, sf_dir)
    assert _rows(fact_inc, ["event_id"]) == _rows(fact_batch, ["event_id"])

    stats_inc = read_table(spark, warehouse, "agg_daily_stats")
    stats_batch = q_daily_stats(spark, sf_dir)
    assert _rows(stats_inc, ["played_date"]) == _rows(
        stats_batch, ["played_date"]
    )


def test_redelivery_is_noop(spark, sf_dir, warehouse):
    events = load_table(spark, sf_dir, "events")
    run_incremental_etl(spark, events, warehouse, 1)
    before = _rows(read_table(spark, warehouse, "fact"), ["event_id"])
    r = run_incremental_etl(spark, events, warehouse, 2)
    assert r["skipped"]
    assert _rows(read_table(spark, warehouse, "fact"), ["event_id"]) == before


def test_user_dim_combines_across_batches(spark, sf_dir, warehouse):
    events = load_table(spark, sf_dir, "events")
    median = split_ts(events)
    run_incremental_etl(
        spark, events.filter(F.col("ts") <= F.lit(median)), warehouse, 1
    )
    run_incremental_etl(spark, events, warehouse, 2)
    du = read_table(spark, warehouse, "dim_user")
    want = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_seen"),
        F.count(F.lit(1)).alias("total_plays"),
    )
    assert _rows(du, ["user_id"]) == _rows(want, ["user_id"])


def test_late_data_rows_are_dropped(spark, sf_dir):
    """stream_late_data must differ from the no-late-delivery rollup —
    proof the watermark actually dropped the withheld rows rather than
    absorbing them (which a single-batch replay silently would)."""
    from spark_spotify.streaming.pipeline import (
        q_stream_hourly_rollup,
        q_stream_late_data,
    )

    full = {
        (r.hour_start, r.event_type): r.n_events
        for r in q_stream_hourly_rollup(spark, sf_dir).collect()
    }
    late = {
        (r.hour_start, r.event_type): r.n_events
        for r in q_stream_late_data(spark, sf_dir).collect()
    }
    assert sum(full.values()) > sum(late.values())
