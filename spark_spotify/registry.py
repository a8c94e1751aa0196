"""Central query registry: name -> (Spark callable, DuckDB oracle SQL).

Single source of truth consumed by ``__spark_entry__.py`` (driver contract),
``tests/`` (local oracle harness) and ``bench.py``.  Every operator family in
SURVEY.md §2 has at least one entry here; each entry's Spark function and
oracle SQL are written side-by-side in the owning module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_spotify import multimodal
from spark_spotify.analytics import (
    advanced,
    audio,
    curation,
    graph,
    listening,
    maintained,
    neardup,
    relational,
    scaleops,
    similarity,
    textops,
)
from spark_spotify.etl import dims, expectations, fact, silver, stats
from spark_spotify.etl import pipeline as etl_pipeline
from spark_spotify.sources import csv_ingest
from spark_spotify.streaming import pipeline as streaming_pipeline

_MODULES = [
    curation,
    audio,
    silver,
    dims,
    fact,
    stats,
    expectations,
    graph,
    listening,
    relational,
    textops,
    similarity,
    neardup,
    maintained,
    advanced,
    scaleops,
    multimodal,
    csv_ingest,
    streaming_pipeline,
    etl_pipeline,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:  # survives python -O, unlike assert
            raise RuntimeError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLE.update(_m.ORACLE)

# Every query with an oracle must exist; oracle-less queries are allowed
# (driver falls back to a rows-only check) but flag typos loudly.
for _name in ORACLE:
    if _name not in QUERIES:
        raise RuntimeError(f"oracle without query: {_name}")
