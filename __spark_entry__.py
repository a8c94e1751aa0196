"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join daily rollup on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 via the central registry (spark_spotify/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spark_spotify import registry  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-day gold rollup (counts, distincts, exact-decimal
    sums, period buckets, window-argmax top event type) on sf0.001."""
    return registry.QUERIES["etl_daily_stats"](spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE)
