"""Time-derivation column expressions.

Mirrors the reference's Postgres time semantics (SURVEY.md §2.2 P5/P9, §2.8
F1-F7): Postgres ``EXTRACT(dow)`` is 0=Sunday..6=Saturday while Spark
``dayofweek`` is 1=Sunday..7=Saturday, so every dow here is offset by -1 to the
Postgres convention the reference (and the DuckDB oracle) uses.

All are native Column expressions — no Python UDFs — so they stay inside
whole-stage codegen (SURVEY.md §2.11: zero UDFs needed for reference parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_dow(col: Column) -> Column:
    """Postgres-convention day of week: 0=Sunday .. 6=Saturday.

    Reference: EXTRACT(dow FROM played_at) at daily_etl_pipeline.py:247,254.
    """
    return (F.dayofweek(col) - F.lit(1)).cast("int")


def is_weekend(col: Column) -> Column:
    """Reference: EXTRACT(dow ...) IN (0, 6) at daily_etl_pipeline.py:254."""
    return pg_dow(col).isin(0, 6)


def time_period(hour_col: Column) -> Column:
    """4-way CASE bucketing of hour-of-day.

    Reference: daily_etl_pipeline.py:248-253 (morning 6-11, afternoon 12-17,
    evening 18-23, else night) — also dashboard/sql_query/main_ratio.py:33-38.
    """
    return (
        F.when(hour_col.between(6, 11), F.lit("morning"))
        .when(hour_col.between(12, 17), F.lit("afternoon"))
        .when(hour_col.between(18, 23), F.lit("evening"))
        .otherwise(F.lit("night"))
    )


# ANSI-SQL twin of time_period() for the DuckDB oracle queries.
SQL_TIME_PERIOD = (
    "CASE WHEN {h} BETWEEN 6 AND 11 THEN 'morning' "
    "WHEN {h} BETWEEN 12 AND 17 THEN 'afternoon' "
    "WHEN {h} BETWEEN 18 AND 23 THEN 'evening' ELSE 'night' END"
)
