"""Self-tests for the local oracle harness.

Round-2 postmortem: the local harness compared DuckDB results via
``fetchall()`` (HUGEINT -> Python int) while the driver canonicalizes via
pandas ``.df()`` (HUGEINT -> float64; list cells -> crash), so four queries
were local-green / driver-red for two rounds.  These tests prove the
hardened harness (tests/oracle.py) now reproduces BOTH driver failure
classes, so a regression of either kind fails locally first.
"""

from __future__ import annotations

import pytest

from tests.oracle import compare


def test_uncast_hugeint_sum_fails_locally(spark, sf_dir):
    """DuckDB SUM(BIGINT) returns HUGEINT; the driver's pandas path renders
    it '500.0' against Spark's bigint '500'.  The harness must flag the
    divergence (the old fetchall() path was blind to it)."""
    sdf = spark.range(1).selectExpr("CAST(500 AS BIGINT) AS total")
    bad = "SELECT SUM(x) AS total FROM (SELECT CAST(500 AS BIGINT) AS x)"
    good = (
        "SELECT CAST(SUM(x) AS BIGINT) AS total "
        "FROM (SELECT CAST(500 AS BIGINT) AS x)"
    )
    assert not compare(sdf, bad, sf_dir)["ok"]
    assert compare(sdf, good, sf_dir)["ok"]


def test_array_column_crashes_locally(spark, sf_dir):
    """Complex-typed output cells crash the driver canonicalizer
    (unhashable type); the local harness must crash the same way rather
    than silently comparing."""
    sdf = spark.range(1).selectExpr("array('a', 'b') AS flags")
    with pytest.raises(Exception, match="unhashable|not supported"):
        compare(sdf, "SELECT ['a', 'b'] AS flags", sf_dir)


def test_date_vs_timestamp_midnight_renders_equal(spark, sf_dir):
    """A Spark DateType and DuckDB's DATE (datetime64 midnight under
    pandas) must canonicalize identically — no false mismatch on date
    columns."""
    sdf = spark.range(1).selectExpr("DATE '2024-03-05' AS d")
    assert compare(sdf, "SELECT DATE '2024-03-05' AS d", sf_dir)["ok"]


def test_float_bit_divergence_still_fails(spark, sf_dir):
    """The pandas path must not loosen value comparison: a 1-ulp float
    divergence still fails."""
    sdf = spark.range(1).selectExpr("CAST(0.1 AS DOUBLE) AS v")
    assert compare(sdf, "SELECT 0.1::DOUBLE AS v", sf_dir)["ok"]
    assert not compare(
        sdf, "SELECT 0.1::DOUBLE + 1e-17 AS v", sf_dir
    )["ok"]
