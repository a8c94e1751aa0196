"""Deterministic-aggregation helpers.

Floating-point summation is order-dependent, and Spark's partial aggregation
order differs run-to-run and engine-to-engine — a plain ``SUM(double)`` will
not hash-match a DuckDB oracle bit-for-bit.  All source money-like columns in
the warehouse carry at most 2 decimal digits, so we sum them as exact
DECIMALs (associative, partitioning-independent) and only cast the final
result back to DOUBLE.  The DuckDB oracle applies the identical casts, so both
engines produce the same 64-bit value regardless of parallelism.

This is also the right call at 100 TB: decimal partial aggregation is still
map-side combinable and whole-stage-codegen'd; determinism costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column, scale: int = 4) -> Column:
    """Lossless exact-decimal view of a <=2dp money/metric column."""
    return col.cast(f"decimal(18,{scale})")


def dsum(col: Column, scale: int = 4) -> Column:
    """Deterministic SUM of a money-like double: exact decimal sum -> double."""
    return F.sum(dec(col, scale)).cast("double")


def money_expr(price: Column, discount: Column) -> Column:
    """price * (1 - discount) as a lossless decimal(18,6).

    2dp * 2dp has at most 4 true decimals, so the (18,6) cast never rounds and
    both engines compute the identical exact value.
    """
    return (dec(price) * (F.lit(1).cast("decimal(18,4)") - dec(discount))).cast(
        "decimal(18,6)"
    )


def dsum6(expr: Column) -> Column:
    """Deterministic SUM of a decimal(18,6) expression -> double."""
    return F.sum(expr).cast("double")


# SQL twins for the DuckDB oracle (keep in lockstep with the Column versions).
SQL_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"
SQL_MONEY = (
    "CAST(CAST({p} AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST({d} AS DECIMAL(18,4))) AS DECIMAL(18,6))"
)
