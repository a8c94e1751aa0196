"""Every registered query with an oracle must match DuckDB exactly at sf0.001
(the driver gate runs the identical comparison at sf0.01)."""

from __future__ import annotations

import pytest

from spark_spotify.registry import ORACLE, QUERIES
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    report = compare(df, ORACLE[name], sf_dir)
    assert report["ok"], f"{name}: {report['errors']}"


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
