"""The reference-compatible façade must run end-to-end: every public
callable a reference user invokes today returns a non-degenerate Spark
DataFrame from this engine.  Deep correctness lives in the oracle gate
(the façade only delegates); these tests pin the API surface itself —
names, signatures, window filters, and the delegation actually wiring up.
"""

from __future__ import annotations

import pytest

from spark_spotify import api


WINDOWED = [
    api.heatmap_load_data,
    api.treemap_track_load_data,
    api.treemap_artist_load_data,
    api.treemap_album_load_data,
    api.band_violin_load_data,
    api.band_bar_load_data,
    api.gender_violin_load_data,
    api.gender_bar_load_data,
]
WHOLE_CORPUS = [
    api.hour_ratio_load_data,
    api.radar_load_data,
    api.basic_loyal_load_data,
    api.track_sankey_load_data,
    api.gender_bar_by_date,
    api.get_daily_stats,
    api.v_today_listening,
]


@pytest.mark.parametrize("fn", WINDOWED, ids=lambda f: f.__name__)
def test_windowed_loaders_run(spark, sf_dir, fn):
    df = fn(7, spark, sf_dir)
    assert df.columns
    assert df.limit(1).count() >= 0


@pytest.mark.parametrize("fn", WHOLE_CORPUS, ids=lambda f: f.__name__)
def test_whole_corpus_loaders_run(spark, sf_dir, fn):
    df = fn(spark, sf_dir)
    assert df.columns
    assert df.limit(1).count() >= 0


def test_trailing_window_actually_filters(spark, sf_dir):
    all_days = api.heatmap_load_data(10_000, spark, sf_dir)
    week = api.heatmap_load_data(7, spark, sf_dir)
    n_days = week.select("played_date").distinct().count()
    assert n_days <= 7
    assert all_days.count() > week.count()


def test_treemap_nondefault_window_matches_shape(spark, sf_dir):
    default = api.treemap_track_load_data(30, spark, sf_dir)
    custom = api.treemap_track_load_data(7, spark, sf_dir)
    assert default.columns == custom.columns
    assert custom.count() <= 10


def test_recent_stats_ordered_desc(spark, sf_dir):
    rows = api.get_recent_listening_stats(5, spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    days = [r["day"] for r in rows]
    assert days == sorted(days, reverse=True)
