"""Maintained-index gates: assignment tie-break parity with the
recompute path, footer-based row accounting, and the O(batch)
maintenance contract (a second batch must never touch v1 index parts).
The full gates are oracle-covered by test_oracle_parity; these tests
pin the pieces that could silently drift."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_spotify.analytics.maintained import (
    _part_rows,
    _vec_view,
    assign_cells,
)
from spark_spotify.analytics.similarity import N_CELLS, _dot
from spark_spotify.sources.tables import load_table


def _cents(vecs):
    return vecs.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("emb").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )


def test_assign_cells_matches_window_argmax(spark, sf_dir):
    """assign_cells' max_by(struct(cos, -cent_id)) must reproduce the
    recompute path's row_number tie order (cos DESC, cent_id ASC) on
    every corpus vector."""
    vecs = _vec_view(load_table(spark, sf_dir, "embeddings"))
    cents = _cents(vecs)
    got = assign_cells(vecs, cents)
    cos_c = _dot("emb", "cvec") / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("cent_id")
    )
    want = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("cos_c", cos_c)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    assert (
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )


def test_part_rows_counts_footers(spark, tmp_path):
    w = str(tmp_path)
    spark.range(123).write.parquet(os.path.join(w, "t", "p1"))
    spark.range(45).write.parquet(os.path.join(w, "t", "p2"))
    assert _part_rows(w, "t", ["p1"]) == 123
    assert _part_rows(w, "t", ["p1", "p2"]) == 168
    assert _part_rows(w, "t", []) == 0
