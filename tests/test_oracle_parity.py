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
        # OUTPUT CONTRACT: every registered query returns a flat schema.
        # The driver's pandas canonicalizer cannot hash array/map/struct
        # cells (round-2: etl_silver_clean err'd for exactly this) —
        # complex types must be serialized at the gate boundary.
        for f in df.schema.fields:
            kind = f.dataType.typeName()
            assert kind not in ("array", "map", "struct"), (
                f"{name}.{f.name} is {kind}: serialize it at the gate "
                "boundary (array_join / to_json) — the driver canon "
                "crashes on complex-typed outputs"
            )


def test_oracle_outputs_are_scalar_typed(sf_dir):
    """Every oracle's DuckDB result, materialized the way the DRIVER does
    (``.df()`` -> pandas), must contain only scalar cells — ints, floats,
    bools, strings, datetimes.  A LIST-typed oracle column arrives as
    object-of-ndarray and crashes the driver's sort; catch it at authoring
    time."""
    from spark_spotify.registry import ORACLE as _O
    from tests.oracle import duck_con

    con = duck_con(sf_dir)
    for name, sql in _O.items():
        pdf = con.execute(sql).df()
        for col in pdf.columns:
            s = pdf[col]
            if s.dtype.kind in "biufM":
                continue
            bad = s.dropna().head(5)
            for v in bad:
                assert not isinstance(v, (list, dict, set, tuple)) and not (
                    hasattr(v, "__array__") and not hasattr(v, "capitalize")
                ), f"{name}.{col} yields non-scalar {type(v)} under .df()"
