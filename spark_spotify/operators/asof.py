"""As-of join — an operator Spark lacks natively (SURVEY.md §2.3 notes the
reference has none either; it's table stakes for an event-analytics engine).

Implemented as the union-then-running-max composition (preference order (a)
from the build brief: built-in DataFrame ops, no applyInPandas):

    tag the probe rows, union with the reference rows, and take
    MAX(reference_ts) OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
    PRECEDING .. CURRENT ROW)

Because event time is monotone within the window frame, the running MAX of a
conditionally-null column IS "latest value at or before me" — no IGNORE
NULLS (which DuckDB and Spark spell differently) and no per-group pandas
merge_asof needed.

Scale: one shuffle on the join key, one window pass — same cost profile as
any sessionization; no range-explosion, no broadcast requirement.  Skewed
keys fall out of AQE skew handling like any other window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_last_event(
    events: DataFrame,
    key: str,
    ts: str,
    mark: Column,
    order_tiebreak: str,
) -> DataFrame:
    """Adds ``asof_ts`` = latest ``ts`` at-or-before the row (per ``key``)
    among rows where ``mark`` holds."""
    w = (
        Window.partitionBy(key)
        .orderBy(ts, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.withColumn(
        "asof_ts", F.max(F.when(mark, F.col(ts))).over(w)
    )
