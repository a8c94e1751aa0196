"""Declarative data-quality expectations over the warehouse fact table —
the Delta CHECK-constraint / Great-Expectations surface a production table
carries: a rule set (NOT NULL, key uniqueness, domain membership, value
range, cross-column ordering) evaluated as violation COUNTS, so the table
owner gates a publish on ``all counts == 0`` and alerts on drift.

The reference trusts its inserts blindly (daily_etl_pipeline.py writes
whatever the API returned); an engine feeding training runs cannot — a
constraint sweep is the cheapest place to catch a decode bug before it
poisons a dataset.

Scale shape: ALL single-row rules evaluate in ONE scan — each rule is a
conditional-sum column in a single aggregate (map-side combinable,
whole-stage-codegen'd), then one ``stack`` unpivots the 1-row result to
(rule, n_violations) rows.  The uniqueness rule rides the same aggregate
as ``COUNT(*) - COUNT(DISTINCT key)``.  No per-rule scans, no joins, no
Python: rule count scales the projection width, never the I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.etl.fact import q_fact_star

def _row_rules() -> dict[str, Column]:
    """rule name -> violation predicate (TRUE = row violates).  Built
    lazily: Column construction needs an active SparkContext."""
    return {
        "event_id_not_null": F.col("event_id").isNull(),
        "played_hour_in_range": ~F.col("played_hour").between(0, 23),
        "time_period_in_domain": ~F.col("time_period").isin(
            "morning", "afternoon", "evening", "night"
        ),
        "weekend_flag_not_null": F.col("is_weekend").isNull(),
        "first_seen_before_event": F.col("user_first_seen")
        > F.to_date(F.col("date_key").cast("string"), "yyyyMMdd"),
    }


def expectation_report(fact: DataFrame) -> DataFrame:
    """One-pass violation counts for every registered rule plus key
    uniqueness, as (rule, n_violations) rows sorted by rule name."""
    rules = _row_rules()
    aggs = [
        F.sum(pred.cast("bigint")).alias(name)
        for name, pred in rules.items()
    ]
    # non-null duplicate excess only — NULL keys are already attributed
    # to event_id_not_null, so they must not double-count here
    aggs.append(
        (F.count("event_id") - F.countDistinct("event_id")).alias(
            "event_id_unique"
        )
    )
    one = fact.agg(*aggs)
    names = sorted([*rules, "event_id_unique"])
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return one.select(
        F.expr(
            f"stack({len(names)}, {stack}) AS (rule, n_violations)"
        )
    ).orderBy("rule")


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expectation_report(q_fact_star(spark, sf_dir))


from spark_spotify.etl import fact as _fact  # noqa: E402

QUERIES = {"etl_expectations": q_expectations}

ORACLE = {
    "etl_expectations": f"""
WITH f AS ({_fact.ORACLE['etl_fact_star']})
SELECT rule, n_violations FROM (
  SELECT 'event_id_not_null' AS rule,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations FROM f
  UNION ALL
  SELECT 'event_id_unique',
         CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT) FROM f
  UNION ALL
  SELECT 'played_hour_in_range',
         CAST(SUM(CASE WHEN played_hour NOT BETWEEN 0 AND 23
                       THEN 1 ELSE 0 END) AS BIGINT) FROM f
  UNION ALL
  SELECT 'time_period_in_domain',
         CAST(SUM(CASE WHEN time_period NOT IN
                       ('morning', 'afternoon', 'evening', 'night')
                       THEN 1 ELSE 0 END) AS BIGINT) FROM f
  UNION ALL
  SELECT 'weekend_flag_not_null',
         CAST(SUM(CASE WHEN is_weekend IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM f
  UNION ALL
  SELECT 'first_seen_before_event',
         CAST(SUM(CASE WHEN user_first_seen >
                       CAST(strptime(CAST(date_key AS VARCHAR), '%Y%m%d')
                            AS DATE)
                       THEN 1 ELSE 0 END) AS BIGINT) FROM f
) ORDER BY rule
""",
}
