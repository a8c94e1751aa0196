"""Operator-level unit tests: merge semantics, as-of, ingestion, streaming."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_spotify.operators.merge import insert_if_absent, merge_upsert
from spark_spotify.sources.rest import ingest_plays, new_ids_for_enrichment
from spark_spotify.streaming.pipeline import run_hourly_rollup
from tests.oracle import compare


def test_merge_upsert_incoming_wins(spark):
    old = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    new = spark.createDataFrame([("b", 20), ("c", 30)], "k string, v int")
    got = {r.k: r.v for r in merge_upsert(old, new, ["k"]).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_insert_if_absent_keeps_existing(spark):
    old = spark.createDataFrame([("a", 1)], "k string, v int")
    new = spark.createDataFrame([("a", 99), ("b", 2), ("b", 3)], "k string, v int")
    got = {r.k: r.v for r in insert_if_absent(old, new, ["k"]).collect()}
    assert got["a"] == 1  # existing wins
    assert got["b"] in (2, 3)  # one of the duplicate incoming rows


def _play(tid, minute, name="t"):
    return {
        "track_id": tid,
        "played_at": dt.datetime(2024, 1, 1, 12, minute),
        "track_name": name,
        "artist_name": "x",
        "album_name": "y",
        "duration_ms": 1000,
        "explicit": False,
        "popularity": 5,
    }


def test_ingest_plays_idempotent(spark):
    page1 = [_play("t1", 0), _play("t2", 1)]
    bronze = ingest_plays(spark, lambda: page1, None)
    assert bronze.count() == 2
    # re-delivery of t2 plus one new play — re-sync must be idempotent
    page2 = [_play("t2", 1, name="renamed"), _play("t3", 2)]
    bronze2 = ingest_plays(spark, lambda: page2, bronze)
    assert bronze2.count() == 3
    kept = bronze2.filter(F.col("track_id") == "t2").collect()[0]
    assert kept.track_name == "t"  # original row survived re-delivery


def test_new_ids_batching(spark):
    bronze = spark.createDataFrame(
        [(f"id{i:03d}",) for i in range(120)], "track_id string"
    )
    dim = spark.createDataFrame([("id000",), ("id001",)], "track_id string")
    batches = new_ids_for_enrichment(bronze, dim, "track_id")
    assert [len(b) for b in batches] == [50, 50, 18]
    assert "id000" not in batches[0]


def test_streaming_rollup_matches_batch_oracle(spark, sf_dir):
    from spark_spotify.streaming.pipeline import ORACLE

    got = run_hourly_rollup(spark, sf_dir)
    report = compare(got, ORACLE["stream_hourly_rollup"], sf_dir)
    assert report["ok"], report["errors"]


def test_pandas_ann_matches_exact_path(spark, sf_dir):
    """The Arrow/numpy scorer has no fold-order oracle (BLAS re-associates
    float adds); gate it against the oracle-exact JVM path instead: same
    ranking, cosines within float tolerance."""
    from spark_spotify.registry import QUERIES

    fast = QUERIES["sim_ann_cosine_pandas"](spark, sf_dir).collect()
    exact = QUERIES["sim_ann_cosine_topk"](spark, sf_dir).collect()
    assert [r.vec_id for r in fast] == [r.vec_id for r in exact]
    assert all(
        abs(a.cosine_sim - b.cosine_sim) < 1e-6
        for a, b in zip(fast, exact)
    )


def test_connected_components_chain_and_isolates(spark):
    """A 6-node chain (worst-case diameter for min-label propagation) plus
    isolated nodes and a 2-clique; labels must be each component's min id."""
    from spark_spotify.operators.components import (
        cluster_assign,
        connected_components,
    )

    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(10)], "node string"
    )
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]  # n0..n5 one component
    edges = spark.createDataFrame(
        chain + [("n7", "n6")], "src string, dst string"
    )  # n6~n7 reversed orientation; n8, n9 isolated
    got = {r.node: r.label for r in connected_components(nodes, edges).collect()}
    want = {f"n{i}": "n0" for i in range(6)}
    want.update({"n6": "n6", "n7": "n6", "n8": "n8", "n9": "n9"})
    assert got == want

    ca = {
        r.node: (r.cluster_id, r.cluster_size, r.is_keeper)
        for r in cluster_assign(nodes, edges).collect()
    }
    assert ca["n3"] == ("n0", 6, False)
    assert ca["n0"] == ("n0", 6, True)
    assert ca["n9"] == ("n9", 1, True)


def test_connected_components_empty_edges(spark):
    """No duplicate pairs at all: every node is its own singleton and the
    loop terminates on the first round (empty-agg convergence path)."""
    from spark_spotify.operators.components import connected_components

    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    edges = spark.createDataFrame([], "src string, dst string")
    got = {r.node: r.label for r in connected_components(nodes, edges).collect()}
    assert got == {"a": "a", "b": "b"}
