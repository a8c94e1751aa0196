"""Local replica of the driver's DuckDB-oracle comparison.

Registers the parquet tables as DuckDB views, runs the oracle SQL and the
Spark query, and compares row count, column names, and values
order-insensitively.  Floats are compared both exactly (what a value-hash
would see) and with tolerance, so any bit-level divergence is caught before
the driver sees it.
"""

from __future__ import annotations

import math

import duckdb

from spark_spotify.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    con = duck_con(sf_dir)
    oracle = con.execute(oracle_sql).fetchall()
    oracle_cols = [d[0] for d in con.description]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    report = {
        "rows_spark": len(spark_rows),
        "rows_oracle": len(oracle),
        "cols_spark": sorted(spark_cols),
        "cols_oracle": sorted(oracle_cols),
        "ok": True,
        "errors": [],
    }
    if sorted(spark_cols) != sorted(oracle_cols):
        report["ok"] = False
        report["errors"].append(
            f"columns differ: {sorted(spark_cols)} vs {sorted(oracle_cols)}"
        )
        return report
    if len(spark_rows) != len(oracle):
        report["ok"] = False
        report["errors"].append(f"row counts {len(spark_rows)} vs {len(oracle)}")

    # re-order both to sorted-by-name column order, then sort rows
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s_sorted = sorted((_key([r[i] for i in s_idx]) for r in spark_rows))
    o_sorted = sorted((_key([r[i] for i in o_idx]) for r in oracle))
    mismatches = [
        (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
    ]
    if mismatches:
        report["ok"] = False
        report["errors"].append(
            f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
        )
    return report
