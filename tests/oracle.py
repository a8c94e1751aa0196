"""Local replica of the driver's DuckDB-oracle comparison.

Registers the parquet tables as DuckDB views, runs the oracle SQL and the
Spark query, and compares row count, column names, and rendered values
order-insensitively.

Canonicalization deliberately mirrors the DRIVER's path, which is stricter
than a naive ``fetchall()`` comparison (round-2 postmortem):

* the oracle result is materialized via ``con.execute(sql).df()`` — pandas —
  so DuckDB HUGEINT (uncast SUM(BIGINT)) degrades to float64 and renders
  "500.0", which must NOT match a Spark bigint's "500";
* the Spark result goes through ``toPandas()``;
* both frames are passed through ``DataFrame.sort_values`` over every
  column, which (like the driver) raises ``TypeError: unhashable type``
  on array/map/struct cells — complex-typed outputs must be serialized at
  the gate boundary, and this harness now crashes on them locally first;
* values are compared by exact string render (floats at full repr — any
  bit-level divergence fails), with date-like values normalized so a
  DuckDB DATE (datetime64 midnight) and a Spark DateType (datetime.date)
  render identically.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from spark_spotify.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _render(v) -> str:
    """One cell -> canonical string. Date-likes normalize to ISO with any
    bare-midnight time stripped so DATE round-trips agree across engines;
    numeric types render at native repr so int64 "500" != float64 "500.0"
    (the exact asymmetry the driver's hash sees)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        s = str(v)
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, _dt.datetime):
        s = str(v)
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, _dt.date):
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays etc. — sort_values has already rejected those
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    # Driver-parity canary: the driver sorts the pandas frame over all
    # columns before hashing, which factorizes object columns — unhashable
    # cells (lists, ndarrays, dicts) crash there, so they must crash here
    # too, REGARDLESS of row count (a small frame can slip through
    # sort_values' fast paths without hashing anything).
    for c in cols:
        if pdf[c].dtype.kind == "O":
            for v in pdf[c].dropna().head(100):
                hash(v)  # raises TypeError on list/ndarray/dict cells
    pdf.sort_values(by=cols, kind="mergesort")
    rows = [
        tuple(_render(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    con = duck_con(sf_dir)
    oracle_pdf = con.execute(oracle_sql).df()
    spark_pdf = spark_df.toPandas()
    spark_cols = list(spark_pdf.columns)
    oracle_cols = list(oracle_pdf.columns)

    report = {
        "rows_spark": len(spark_pdf),
        "rows_oracle": len(oracle_pdf),
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
    if len(spark_pdf) != len(oracle_pdf):
        report["ok"] = False
        report["errors"].append(
            f"row counts {len(spark_pdf)} vs {len(oracle_pdf)}"
        )

    s_sorted = _canon(spark_pdf)
    o_sorted = _canon(oracle_pdf)
    mismatches = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b]
    if mismatches:
        report["ok"] = False
        report["errors"].append(
            f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
        )
    return report
