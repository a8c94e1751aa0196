"""Nested-JSON bronze round trip: schema'd read, P1 flatten semantics
(first-artist defaults, 'Z' timestamp parse), and nested-field pruning."""

from __future__ import annotations

import json

from spark_spotify.sources.json_bronze import (
    flatten_listening,
    read_bronze_json,
)

DOCS = [
    {
        "track_id": "t1",
        "played_at": "2024-01-05T10:30:00Z",
        "track_info": {
            "name": "Song A",
            "artists": [
                {"id": "a1", "name": "Artist One"},
                {"id": "a2", "name": "Artist Two"},
            ],
            "album": {"id": "al1", "name": "Album X"},
            "duration_ms": 180000,
            "explicit": True,
            "popularity": 55,
        },
        "batch_info": {
            "batch_id": "b1",
            "collected_at": "2024-01-05T12:00:00Z",
        },
    },
    {
        # missing artists / album / flags -> reference defaults
        "track_id": "t2",
        "played_at": "2024-01-06T23:59:59Z",
        "track_info": {"name": "Song B"},
        "batch_info": {
            "batch_id": "b1",
            "collected_at": "2024-01-06T23:59:59Z",
        },
    },
]


def _write_jsonl(tmp_path):
    p = tmp_path / "bronze"
    p.mkdir()
    (p / "part-0.json").write_text(
        "\n".join(json.dumps(d) for d in DOCS)
    )
    return str(p)


def test_flatten_matches_reference_semantics(spark, tmp_path):
    flat = flatten_listening(
        read_bronze_json(spark, _write_jsonl(tmp_path))
    )
    rows = {r["track_id"]: r for r in flat.collect()}
    r1, r2 = rows["t1"], rows["t2"]
    assert r1["artist_name"] == "Artist One"  # artists[0], not exploded
    assert r1["album_name"] == "Album X"
    assert r1["explicit"] is True and r1["popularity"] == 55
    assert r1["played_at"].isoformat().startswith("2024-01-05T10:30:00")
    assert r2["artist_name"] == "Unknown Artist"
    assert r2["album_name"] == "Unknown Album"
    assert r2["explicit"] is False and r2["popularity"] == 0
    assert r2["duration_ms"] == 0


def test_json_scan_prunes_top_level_columns(spark, tmp_path):
    """A 2-column projection must not read batch_info/played_at from the
    JSON scan (top-level pruning; intra-struct pruning is a Parquet/ORC
    optimization and kicks in once bronze lands as Parquet)."""
    bronze = read_bronze_json(spark, _write_jsonl(tmp_path))
    two_cols = bronze.select(
        "track_id", bronze["track_info.name"].alias("track_name")
    )
    plan = two_cols._sc._jvm.PythonSQLUtils.explainString(
        two_cols._jdf.queryExecution(), "formatted"
    )
    schema_line = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "batch_info" not in schema_line
    assert "played_at" not in schema_line
    assert "track_id" in schema_line
