"""Dashboard analytics queries, re-expressed Spark-first over the events fact.

Each function reproduces one reference dashboard query's operator shape
(SURVEY.md §2.5-2.9), with the reference's join-back / correlated-subquery /
pandas patterns rewritten as window functions — the decorrelated, single-pass
plans Catalyst optimizes well.  All use the silver projection (narrow, no
UDFs); aggregations are map-side combinable; the only shuffles are the
groupBy/window keys themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_spotify.etl.dims import CAL_END, CAL_START
from spark_spotify.etl.silver import clean_events
from spark_spotify.functions.agg import lscale, lsum, unscale
from spark_spotify.operators.merge import merge_upsert
from spark_spotify.sources.tables import dim_broadcast, load_table

_H = "CAST(EXTRACT(hour FROM ts) AS INT)"
_TP = (
    f"CASE WHEN {_H} BETWEEN 6 AND 11 THEN 'morning' "
    f"WHEN {_H} BETWEEN 12 AND 17 THEN 'afternoon' "
    f"WHEN {_H} BETWEEN 18 AND 23 THEN 'evening' ELSE 'night' END"
)


def _silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_events(load_table(spark, sf_dir, "events"))


# --- heatmap: date × hour grid, zero-filled (main_heatmap.py:13-41, J6/F7/F10)


def q_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN of a generated date×hour axis onto hourly aggregates so hours
    with zero plays appear as 0 (reference generate_series + LEFT JOIN +
    COALESCE, main_heatmap.py:17-34)."""
    dates = spark.range(1).select(
        F.explode(F.sequence(F.lit(CAL_START), F.lit(CAL_END))).alias("played_date")
    )
    hours = spark.range(24).select(F.col("id").cast("int").alias("played_hour"))
    grid = dates.crossJoin(hours)
    hourly = (
        _silver(spark, sf_dir)
        .groupBy("played_date", "played_hour")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            lsum(F.col("value")).alias("sv"),
        )
    )
    return grid.join(hourly, ["played_date", "played_hour"], "left").select(
        "played_date",
        "played_hour",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("sv"), F.lit(0.0)).cast("double").alias("total_value"),
    )


# --- period ratio: share of each day's value by time period
# (main_ratio.py:14-79 — reference does a self-join of aggregates; we use the
#  window-sum rewrite, SURVEY.md §2.5/J8)


def q_period_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _silver(spark, sf_dir)
        .groupBy(
            F.date_format("played_date", "EEEE").alias("day_name"),
            F.col("time_period"),
        )
        .agg(
            # scale-4 long partial: exact, re-summable by the day window.
            # Concrete overflow bound for the plain F.sum re-sum (vs the
            # split-accumulator lsum_scaled used for corpus-wide totals):
            # values are bounded |value| < 10^6, so one scaled term is
            # < 10^10 and a signed long holds > 9.2*10^18 — safe up to
            # ~9*10^8 rows PER DAY-GROUP (~10,000 events/sec sustained
            # for a day).  Beyond that, switch this window re-sum to the
            # lsum_scaled split halves (functions/agg.py).
            F.sum(lscale(F.col("value"))).alias("pv_s4"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = Window.partitionBy("day_name")
    return (
        per.withColumn("dt_s4", F.sum("pv_s4").over(w))
        .select(
            "day_name",
            "time_period",
            unscale(F.col("pv_s4"), 4).alias("period_value"),
            "n_events",
            F.round(
                F.lit(100.0)
                * unscale(F.col("pv_s4"), 4)
                / unscale(F.col("dt_s4"), 4),
                1,
            ).alias("pct_of_day"),
        )
    )


# --- top-k users (treemap top-10 pattern, track_treemap.py:36-38, O1)


def q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _silver(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            lsum(F.col("value")).alias("total_value"),
            F.countDistinct("event_type").alias("unique_event_types"),
        )
        .orderBy(F.desc("n_plays"), F.asc("user_id"))
        .limit(10)
    )


# --- treemap with normalized color score (track_treemap.py:13-38 J7/O1 +
#     the client-side min-max normalization track.py:50-58, C6)


def q_treemap_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users of the trailing 30 days: the computed window start is a
    1-row scalar CROSS JOIN (reference date_range CTE, track_treemap.py:30-33)
    applied before the filter; the treemap color score is the reference's
    pandas min-max normalization done engine-side with an unpartitioned
    window over the 10-row top-k (presentation-sized, so the single-partition
    window is free)."""
    s = _silver(spark, sf_dir).select("user_id", "played_date", "value")
    rng = s.agg(F.max("played_date").alias("end_d")).select(
        F.date_sub(F.col("end_d"), 29).alias("start_d")
    )
    top = (
        s.crossJoin(F.broadcast(rng))
        .filter(F.col("played_date") >= F.col("start_d"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            lsum(F.col("value")).alias("total_value"),
        )
        .orderBy(F.desc("n_plays"), F.asc("user_id"))
        .limit(10)
    )
    w = Window.partitionBy()
    mn = F.min("n_plays").over(w)
    mx = F.max("n_plays").over(w)
    score = F.when(mx == mn, F.lit(0.5)).otherwise(
        (F.col("n_plays") - mn) / (mx - mn)
    )
    return top.withColumn("color_score", F.round(score, 3))


# --- loyalty (artist_loyal.py:14-54: A7 ratio arithmetic, A10 HAVING,
#     P8 filter-on-derived, O3 two-key top-100)


def q_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        _silver(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.countDistinct("played_date").alias("active_days"),
            F.min("played_date").alias("first_day"),
            F.max("played_date").alias("last_day"),
        )
        .withColumn(
            "span_days", F.datediff(F.col("last_day"), F.col("first_day")) + 1
        )
        .filter(F.col("n_plays") >= 3)
        .filter(F.col("span_days") > 3)
    )
    ratio = F.col("active_days") / F.col("span_days")
    loyalty_level = (
        F.when(ratio >= 0.8, "daily")
        .when(ratio >= 0.5, "regular")
        .when(ratio >= 0.3, "frequent")
        .otherwise("casual")
    )
    return (
        g.select(
            "user_id",
            "n_plays",
            "active_days",
            F.col("span_days").cast("int").alias("span_days"),
            F.round(F.col("n_plays") / F.col("active_days"), 3).alias(
                "plays_per_active_day"
            ),
            F.round(ratio, 3).alias("loyalty_ratio"),
            loyalty_level.alias("loyalty_level"),
        )
        .orderBy(F.desc("loyalty_ratio"), F.desc("n_plays"), F.asc("user_id"))
        .limit(100)
    )


# --- sankey lifecycle buckets (track_sankey.py:14-59: A6 conditional aggs,
#     P9 CASE buckets)


def q_sankey(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _silver(spark, sf_dir)
    w = Window.partitionBy("user_id")
    per_user = (
        s.withColumn("first_seen", F.min("played_date").over(w))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.count(
                F.when(
                    F.col("played_date") <= F.date_add(F.col("first_seen"), 6), 1
                )
            ).alias("first_week_plays"),
            F.min("played_date").alias("first_seen_d"),
            F.max("played_date").alias("last_seen_d"),
        )
        .withColumn(
            "span_days", F.datediff(F.col("last_seen_d"), F.col("first_seen_d"))
        )
    )
    conversion = (
        F.when(F.col("n_plays") == 1, "one_play")
        .when(F.col("n_plays") <= 5, "casual")
        .when(F.col("n_plays") <= 15, "regular")
        .otherwise("heavy")
    )
    lifecycle = (
        F.when(F.col("span_days") <= 3, "new")
        .when(F.col("span_days") <= 7, "exploring")
        .when(F.col("span_days") <= 14, "engaged")
        .otherwise("loyal")
    )
    return (
        per_user.select(
            conversion.alias("conversion_category"),
            lifecycle.alias("lifecycle_stage"),
            "n_plays",
            "first_week_plays",
        )
        .groupBy("conversion_category", "lifecycle_stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_plays").alias("total_plays"),
            F.sum("first_week_plays").alias("total_first_week_plays"),
        )
    )


# --- weekly delta (discovery metrics track.py:22-33 + C7 lag rewrite,
#     A9 integer-division week bucket)


def q_weekly_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = (
        _silver(spark, sf_dir)
        .groupBy(
            F.floor(
                F.datediff(F.col("played_date"), F.lit(CAL_START)) / 7
            )
            .cast("int")
            .alias("week_no")
        )
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )
    w = Window.orderBy("week_no")
    return wk.select(
        "week_no",
        "n_plays",
        "unique_users",
        (F.col("n_plays") - F.lag("n_plays").over(w)).alias("delta_plays"),
    )


# --- monthly discovery curve (A9 date_trunc-month grouping track.py:32 /
#     artist.py:34 + the C7 consecutive-period delta track.py:23-24, as lag)


def q_monthly_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _silver(spark, sf_dir).select("user_id", "played_date")
    firsts = s.groupBy("user_id").agg(
        F.to_date(F.date_trunc("month", F.min("played_date"))).alias("month")
    )
    monthly = firsts.groupBy("month").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "new_users",
        (F.col("new_users") - F.lag("new_users").over(w)).alias(
            "delta_new_users"
        ),
        F.sum("new_users")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_users"),
    )


# --- pivot day × period (pandas pivot C1, main_page.py:62)


PERIODS = ["morning", "afternoon", "evening", "night"]


def q_pivot_day_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _silver(spark, sf_dir)
        .groupBy(F.date_format("played_date", "EEEE").alias("day_name"))
        .pivot("time_period", PERIODS)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "day_name",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in PERIODS
        ],
    )


DAYS_ORDER = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
]


def q_pivot_first_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's C2 pandas recipe (main_page.py:139-152), set-wise:
    ``pivot_table(aggfunc='first')`` over the per-(day, period) aggregate,
    then ``reindex(days_order, fill_value=0)`` — a LEFT join from the
    CANONICAL day axis so absent days surface as zero rows in a fixed
    order, plus column-completion for periods with no data.  aggfunc
    ``first`` is well-defined because (day, period) is the grain of its
    input — one row per cell by construction.

    Scale: the pivot input is a 7x4-cell aggregate; the reindex join is a
    7-row broadcast.  Everything after the one groupBy shuffle is
    constant-sized."""
    s = _silver(spark, sf_dir)
    cells = s.groupBy(
        F.date_format("played_date", "EEEE").alias("day_name"),
        "time_period",
    ).agg(lsum(F.col("value")).alias("minutes"))
    p = (
        cells.groupBy("day_name")
        .pivot("time_period", PERIODS)
        .agg(F.first("minutes"))
    )
    axis = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DAYS_ORDER)],
        "day_ord int, day_name string",
    )
    return (
        axis.join(p, "day_name", "left")
        .select(
            "day_ord",
            "day_name",
            *[
                F.coalesce(F.col(c), F.lit(0.0)).alias(c)
                for c in PERIODS
            ],
        )
        .orderBy("day_ord")
    )


# --- sessionization (gap > 30 min).  Not in the reference (its "sessions" are
#     AVG minutes, main_ratio.py:105) — standard lag+cumsum sessionize, an op a
#     listening-history engine needs.  Scale: single shuffle on user_id; both
#     windows share the same partitioning so Catalyst plans one Exchange.


SESSION_GAP_MIN = 30


# Day-name normalization map (SURVEY.md C3): the reference maps mixed-locale
# day labels (incl. Chinese 週一..週日, main_page.py:128-137) onto canonical
# codes with a Python dict; here it is a map LITERAL looked up per row
# (F.element_at(F.create_map(...)) — stays in codegen, no UDF).
DAY_CODE = {
    "Monday": "Mon", "Tuesday": "Tue", "Wednesday": "Wed",
    "Thursday": "Thu", "Friday": "Fri", "Saturday": "Sat", "Sunday": "Sun",
    "週一": "Mon", "週二": "Tue", "週三": "Wed", "週四": "Thu",
    "週五": "Fri", "週六": "Sat", "週日": "Sun",
}


def q_day_code_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day-code event profile through the C3 map-literal lookup: the
    locale-tolerant day normalization applied before aggregation, plus each
    code's share of the corpus (window over the 7-row aggregate)."""
    s = _silver(spark, sf_dir)
    m = F.create_map(*[F.lit(x) for kv in DAY_CODE.items() for x in kv])
    day = F.date_format("played_date", "EEEE")
    agg = (
        s.select(F.element_at(m, day).alias("day_code"))
        .groupBy("day_code")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return agg.select(
        "day_code",
        "n_events",
        F.round(
            F.col("n_events") * 100.0 / F.sum("n_events").over(Window.partitionBy()),
            3,
        ).alias("pct_events"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _silver(spark, sf_dir).select("user_id", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    with_gap = s.withColumn(
        "new_session",
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wu)))
            > SESSION_GAP_MIN * 60 * 1_000_000
        )
        .cast("int"),
    ).withColumn(
        "session_no",
        F.sum(F.coalesce(F.col("new_session"), F.lit(1))).over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sessions = with_gap.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("session_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )
    # both 2dp roundings in exact integer arithmetic: round(double, 2) is
    # not engine-portable at the .005 boundary (Spark rounds the shortest
    # decimal repr, DuckDB the binary value; diverged at sf0.1).
    # half-up(100x/y) = (200x + y) div 2y; centi-minutes = (µs+3e5) div 6e5.
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("session_events").alias("n_events"),
            F.max(F.col("end_us") - F.col("start_us")).alias("_max_dur_us"),
        )
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            (
                F.expr("(200 * n_events + n_sessions) div (2 * n_sessions)")
                / 100.0
            ).alias("avg_events_per_session"),
            (F.expr("(_max_dur_us + 300000) div 600000") / 100.0).alias(
                "max_session_minutes"
            ),
        )
    )


# --- merge upsert exercised end-to-end (A14/S7 semantics via operators.merge)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a 'new' per-(user,event_type) snapshot over an 'old' one —
    incoming wins on key collision (ON CONFLICT DO UPDATE semantics,
    daily_etl_pipeline.py:322-324)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff_old = "2024-01-16"
    cutoff_new = "2024-01-08"

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n_plays"),
            lsum(F.col("value")).alias("total_value"),
        )

    old = snap(ev.filter(F.col("ts") < cutoff_old))
    new = snap(ev.filter(F.col("ts") >= cutoff_new))
    return merge_upsert(old, new, ["user_id", "event_type"])


ROLL_DAYS = 7


def q_nullable_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gender/band-style nullable-dim analytics (J5 end-to-end): fact LEFT
    JOIN a dimension whose attribute is nullable, filter the unknowns with
    IS NOT NULL, group by the attribute — the reference's artist-gender
    dashboard shape (dashboard/sql_query/artist_gender.py:19-28, the bar
    variant :40-66; artist_band.py:21-27 is the same join with NULLs kept).

    Here events play fact_listening and customer plays dim_artists; the
    nullable attribute is the market segment with one segment masked to
    NULL (NULLIF), standing in for dim_artists.gender being unknown for a
    slice of artists.

    Scale: the dim is customer-sized — broadcast, so the fact side never
    shuffles for the join; the groupBy is on a low-cardinality attribute
    and map-side combines."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.to_date("ts") >= F.lit(CAL_START)) & (F.to_date("ts") <= F.lit(CAL_END))
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("segment"),
        )
    )
    return (
        # customer-derived dim grows with SF — footer-gated hint
        ev.join(dim_broadcast(dim, sf_dir, "customer", 2_000_000),
                "user_id", "left")
        .filter(F.col("segment").isNotNull())
        .groupBy("segment")
        .agg(
            F.count("value").alias("n_plays"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def q_rolling_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day revenue over the daily rollup: RANGE-frame window
    (``rangeBetween`` on a day ordinal, so calendar gaps count as missing
    days rather than missing rows — a ROWS frame would silently widen the
    window across gaps).

    Scale: the expensive part is the groupBy(day) pre-aggregation, which is
    map-side combinable and shuffles one row per day; the unpartitioned
    window then runs over O(days) rows — thousands, not billions — so the
    single-partition window stage is trivially cheap at any corpus size.
    Rolling sums accumulate exact decimals (functions/agg.py) so the result
    is independent of both partitioning and frame evaluation order.

    Overflow bound for the plain F.sum re-sum of scale-4 longs (vs the
    split-accumulator lsum_scaled used for corpus-wide totals): |value| <
    10^6 keeps each scaled term under 10^10, so a signed long carries
    ~9*10^8 rows per day-group — ~10,000 events/sec sustained; past that,
    move the re-sum to lsum_scaled's split halves."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(lscale(F.col("value"))).alias("_s4"),
        F.count(F.lit(1)).alias("n_events"),
    )
    day_ord = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.orderBy(day_ord)
        .rangeBetween(-(ROLL_DAYS - 1), Window.currentRow)
    )
    return (
        daily.withColumn("rolling_s4", F.sum("_s4").over(w))
        .withColumn("rolling_days", F.count(F.lit(1)).over(w))
        .select(
            "day",
            "n_events",
            unscale(F.col("_s4"), 4).alias("day_value"),
            unscale(F.col("rolling_s4"), 4).alias("rolling_value"),
            F.col("rolling_days").cast("int").alias("rolling_days"),
            F.round(
                unscale(F.col("rolling_s4"), 4) / F.col("rolling_days"),
                4,
            ).alias("rolling_daily_avg"),
        )
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with FORWARD FILL (last-observation-carried-
    forward) — the time-series interpolation verb every per-entity
    daily metric feed needs: each user's daily value total is
    re-indexed onto the full corpus date spine, and days with no
    activity carry the user's most recent observed total
    (``last(_, ignorenulls=True)`` over a per-user ordered window —
    Spark's spelling of ``LAST_VALUE ... IGNORE NULLS``).  Days before
    a user's first observation stay NULL (there is no history to
    carry); ``observed`` distinguishes real measurements from fills.

    Scale shape: the daily pre-aggregation is map-side combinable
    (one row per (user, active day) shuffles); the spine is a
    broadcast 1-row bounds cross-join exploded per user (never a
    driver-side date loop); the fill window is PARTITIONED by user —
    thousands of independent O(days) windows, no global ordering
    stage.  Daily sums fold as exact scaled longs so the carried
    value is bit-identical to the oracle's decimal sum."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(lscale(F.col("value"))).alias("_s4"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id", F.explode(F.sequence("lo", "hi")).alias("day")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            unscale(
                F.last("_s4", ignorenulls=True).over(w), 4
            ).alias("filled_value"),
            F.col("_s4").isNotNull().alias("observed"),
        )
    )


def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, hour) OHLC resample — the downsampling verb every
    time-series store ships (candlesticks, sensor rollups): open/close
    are the values at the bucket's earliest/latest event (ties broken
    by event_id, so the election is total and engine-portable),
    high/low the bucket extremes.  ONE map-side-combinable aggregate —
    ``min_by``/``max_by`` over a (ts, event_id) struct, no window, no
    per-bucket sort — so at 100 TB the only shuffle is the (user, hour)
    groupBy and partial aggregation collapses each bucket to one row
    scan-side.  OHLC values are COPIED doubles (no arithmetic), so
    cross-engine equality is exact, not approximate."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test — the experiment-analysis verb every
    product-analytics warehouse runs: users split into variants by id
    parity, the metric is purchase-event share, and the z statistic is
    the classic pooled-proportion test.  ONE combinable scan produces
    the four integer counts; the statistic is a fixed chain of IEEE
    ops over them (every divide/multiply/sqrt correctly rounded, same
    order in both engines → bit-identical, no tolerance needed).
    Scale: a single map-side-combinable aggregate — the scan is the
    whole cost at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    a = (F.col("user_id") % 2) == 0
    purch = F.col("event_type") == "purchase"
    c = ev.agg(
        F.sum(a.cast("long")).alias("n_a"),
        F.sum((~a).cast("long")).alias("n_b"),
        F.sum((a & purch).cast("long")).alias("x_a"),
        F.sum(((~a) & purch).cast("long")).alias("x_b"),
    )
    # try_divide == DuckDB's double division: x/0 -> NULL (not ANSI
    # error, not IEEE Inf), so a degenerate corpus NULLs out in both
    # engines identically; on non-degenerate input it is the same
    # correctly-rounded IEEE op as '/'
    p_a = F.try_divide(F.col("x_a").cast("double"), F.col("n_a").cast("double"))
    p_b = F.try_divide(F.col("x_b").cast("double"), F.col("n_b").cast("double"))
    p_pool = F.try_divide(
        (F.col("x_a") + F.col("x_b")).cast("double"),
        (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    se = F.sqrt(
        p_pool
        * (F.lit(1.0) - p_pool)
        * (
            F.try_divide(F.lit(1.0), F.col("n_a").cast("double"))
            + F.try_divide(F.lit(1.0), F.col("n_b").cast("double"))
        )
    )
    return c.select(
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        # degenerate corpus (empty variant, or p_pool in {0,1}) → se = 0
        # or NaN; emit NULL rather than NaN/Inf so the cross-engine hash
        # never depends on NaN encoding (ADVICE r7) — same CASE in the
        # oracle
        F.when(se > F.lit(0.0), F.try_divide(p_b - p_a, se)).alias(
            "z_score"
        ),
    )


ORACLE = {
    "ana_resample_ohlc": """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM r GROUP BY user_id, hour
""",
    "ana_ab_test": """
WITH c AS (
  SELECT
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS x_b
  FROM events
)
, s AS (
  SELECT n_a, n_b, x_a, x_b,
         CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
         CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
         sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           AS se
  FROM c
)
SELECT n_a, n_b, x_a, x_b, p_a, p_b,
       CASE WHEN se > 0 THEN (p_b - p_a) / se ELSE NULL END AS z_score
FROM s
""",
    "ana_gap_fill": """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,4))) AS dsum
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), spine AS (
  SELECT u.user_id,
         CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT MIN(CAST(ts AS DATE)) AS lo,
                     MAX(CAST(ts AS DATE)) AS hi FROM events) b
)
SELECT s.user_id, s.day,
       CAST(last_value(d.dsum IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS filled_value,
       d.dsum IS NOT NULL AS observed
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
    "ana_today_listening": """
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS today FROM events)
SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS played_hour,
       COUNT(*) AS n_plays,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_event_types,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events CROSS JOIN mx
WHERE CAST(ts AS DATE) = today
GROUP BY 1
""",
    "ana_top_artists_month": """
WITH mx AS (
  SELECT date_trunc('month', MAX(CAST(ts AS DATE))) AS m0 FROM events
),
plays AS (
  SELECT user_id, COUNT(*) AS total_plays
  FROM events CROSS JOIN mx
  WHERE date_trunc('month', CAST(ts AS DATE)) = m0
  GROUP BY user_id
)
SELECT c.c_name AS artist_name, p.total_plays
FROM plays p JOIN customer c ON p.user_id = c.c_custkey
ORDER BY p.total_plays DESC, artist_name ASC
LIMIT 10
""",
    "ana_nullable_dim_profile": """
SELECT
  NULLIF(c.c_mktsegment, 'MACHINERY') AS segment,
  COUNT(e.value) AS n_plays,
  COUNT(DISTINCT e.user_id) AS n_users,
  round(AVG(e.value), 4) AS avg_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE NULLIF(c.c_mktsegment, 'MACHINERY') IS NOT NULL
  AND CAST(e.ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
GROUP BY NULLIF(c.c_mktsegment, 'MACHINERY')
""",
    "ana_rolling_value_7d": f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,4))) AS dsum,
         COUNT(*) AS n_events
  FROM events GROUP BY CAST(ts AS DATE)
), r AS (
  SELECT day, n_events, dsum,
         SUM(dsum) OVER (
           ORDER BY datediff('day', DATE '1970-01-01', day)
           RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
           AS rolling_value,
         COUNT(*) OVER (
           ORDER BY datediff('day', DATE '1970-01-01', day)
           RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
           AS rolling_days
  FROM daily
)
SELECT day, n_events,
       CAST(dsum AS DOUBLE) AS day_value,
       CAST(rolling_value AS DOUBLE) AS rolling_value,
       CAST(rolling_days AS INT) AS rolling_days,
       round(CAST(rolling_value AS DOUBLE) / rolling_days, 4)
         AS rolling_daily_avg
FROM r
""",
    "ana_heatmap": f"""
WITH grid AS (
  SELECT CAST(gs AS DATE) AS played_date, h AS played_hour
  FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(gs)
  CROSS JOIN (SELECT CAST(h AS INT) AS h FROM generate_series(0, 23) s(h))
), hourly AS (
  SELECT CAST(ts AS DATE) AS played_date, {_H} AS played_hour,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
  FROM events GROUP BY 1, 2
)
SELECT g.played_date, g.played_hour,
       COALESCE(h.cnt, 0) AS n_events,
       COALESCE(h.sv, 0.0) AS total_value
FROM grid g LEFT JOIN hourly h USING (played_date, played_hour)
""",
    "ana_period_ratio": f"""
WITH per AS (
  SELECT dayname(ts) AS day_name, {_TP} AS time_period,
         SUM(CAST(value AS DECIMAL(18,4))) AS pv_dec,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT day_name, time_period,
       CAST(pv_dec AS DOUBLE) AS period_value,
       n_events,
       round(100.0 * CAST(pv_dec AS DOUBLE)
             / CAST(SUM(pv_dec) OVER (PARTITION BY day_name) AS DOUBLE), 1)
         AS pct_of_day
FROM per
""",
    "ana_top_users": """
SELECT user_id, COUNT(*) AS n_plays,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT event_type) AS unique_event_types
FROM events
GROUP BY user_id
ORDER BY n_plays DESC, user_id ASC
LIMIT 10
""",
    "ana_monthly_discovery": """
WITH firsts AS (
  SELECT user_id,
         date_trunc('month', MIN(CAST(ts AS DATE))) AS month
  FROM events GROUP BY user_id
), monthly AS (
  SELECT month, COUNT(*) AS new_users FROM firsts GROUP BY month
)
SELECT month, new_users,
       new_users - lag(new_users) OVER (ORDER BY month) AS delta_new_users,
       CAST(SUM(new_users) OVER (ORDER BY month
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM monthly
""",
    "ana_treemap_norm": """
WITH rng AS (
  SELECT MAX(CAST(ts AS DATE)) - 29 AS start_d FROM events
), top AS (
  SELECT user_id, COUNT(*) AS n_plays,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
  FROM events CROSS JOIN rng
  WHERE CAST(ts AS DATE) >= start_d
  GROUP BY user_id
  ORDER BY n_plays DESC, user_id ASC
  LIMIT 10
)
SELECT user_id, n_plays, total_value,
       round(CASE WHEN MAX(n_plays) OVER () = MIN(n_plays) OVER () THEN 0.5
                  ELSE (n_plays - MIN(n_plays) OVER ())
                       / (MAX(n_plays) OVER () - MIN(n_plays) OVER ())
             END, 3) AS color_score
FROM top
""",
    "ana_loyalty": """
WITH g AS (
  SELECT user_id, COUNT(*) AS n_plays,
         COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
         MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY user_id
), g2 AS (
  SELECT *, CAST(date_diff('day', first_day, last_day) + 1 AS INT) AS span_days
  FROM g WHERE n_plays >= 3
)
SELECT user_id, n_plays, active_days, span_days,
       round(n_plays / active_days, 3) AS plays_per_active_day,
       round(active_days / span_days, 3) AS loyalty_ratio,
       CASE WHEN active_days / span_days >= 0.8 THEN 'daily'
            WHEN active_days / span_days >= 0.5 THEN 'regular'
            WHEN active_days / span_days >= 0.3 THEN 'frequent'
            ELSE 'casual' END AS loyalty_level
FROM g2
WHERE span_days > 3
ORDER BY loyalty_ratio DESC, n_plays DESC, user_id ASC
LIMIT 100
""",
    "ana_sankey": """
WITH per_event AS (
  SELECT user_id, CAST(ts AS DATE) AS played_date,
         MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_seen
  FROM events
), per_user AS (
  SELECT user_id, COUNT(*) AS n_plays,
         COUNT(CASE WHEN played_date <= first_seen + INTERVAL 6 DAY THEN 1 END)
           AS first_week_plays,
         MIN(played_date) AS first_seen_d,
         MAX(played_date) AS last_seen_d
  FROM per_event GROUP BY user_id
), buckets AS (
  SELECT CASE WHEN n_plays = 1 THEN 'one_play'
              WHEN n_plays <= 5 THEN 'casual'
              WHEN n_plays <= 15 THEN 'regular'
              ELSE 'heavy' END AS conversion_category,
         CASE WHEN date_diff('day', first_seen_d, last_seen_d) <= 3 THEN 'new'
              WHEN date_diff('day', first_seen_d, last_seen_d) <= 7 THEN 'exploring'
              WHEN date_diff('day', first_seen_d, last_seen_d) <= 14 THEN 'engaged'
              ELSE 'loyal' END AS lifecycle_stage,
         n_plays, first_week_plays
  FROM per_user
)
SELECT conversion_category, lifecycle_stage,
       COUNT(*) AS n_users,
       CAST(SUM(n_plays) AS BIGINT) AS total_plays,
       CAST(SUM(first_week_plays) AS BIGINT) AS total_first_week_plays
FROM buckets GROUP BY 1, 2
""",
    "ana_weekly_delta": """
WITH wk AS (
  SELECT CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT)
           AS week_no,
         COUNT(*) AS n_plays,
         COUNT(DISTINCT user_id) AS unique_users
  FROM events GROUP BY 1
)
SELECT week_no, n_plays, unique_users,
       n_plays - lag(n_plays) OVER (ORDER BY week_no) AS delta_plays
FROM wk
""",
    "ana_pivot_day_period": f"""
WITH silver AS (
  SELECT dayname(ts) AS day_name, {_TP} AS time_period FROM events
)
SELECT day_name,
       COUNT(CASE WHEN time_period = 'morning' THEN 1 END) AS morning,
       COUNT(CASE WHEN time_period = 'afternoon' THEN 1 END) AS afternoon,
       COUNT(CASE WHEN time_period = 'evening' THEN 1 END) AS evening,
       COUNT(CASE WHEN time_period = 'night' THEN 1 END) AS night
FROM silver GROUP BY day_name
""",
    "ana_pivot_first_reindex": f"""
WITH cells AS (
  SELECT dayname(ts) AS day_name, {_TP} AS time_period,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS minutes
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT day_name,
         MIN(CASE WHEN time_period = 'morning' THEN minutes END) AS morning,
         MIN(CASE WHEN time_period = 'afternoon' THEN minutes END)
           AS afternoon,
         MIN(CASE WHEN time_period = 'evening' THEN minutes END) AS evening,
         MIN(CASE WHEN time_period = 'night' THEN minutes END) AS night
  FROM cells GROUP BY day_name
),
axis(day_ord, day_name) AS (
  VALUES (0, 'Monday'), (1, 'Tuesday'), (2, 'Wednesday'), (3, 'Thursday'),
         (4, 'Friday'), (5, 'Saturday'), (6, 'Sunday')
)
SELECT CAST(axis.day_ord AS INT) AS day_ord, axis.day_name,
       COALESCE(p.morning, 0.0) AS morning,
       COALESCE(p.afternoon, 0.0) AS afternoon,
       COALESCE(p.evening, 0.0) AS evening,
       COALESCE(p.night, 0.0) AS night
FROM axis LEFT JOIN p ON axis.day_name = p.day_name
ORDER BY axis.day_ord
""",
    "ana_sessionize": """
WITH flagged AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged
), sessions AS (
  SELECT user_id, session_no, COUNT(*) AS session_events,
         epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us
  FROM numbered GROUP BY user_id, session_no
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(session_events) AS BIGINT) AS n_events,
       ((200 * SUM(session_events) + COUNT(*)) // (2 * COUNT(*))) / 100.0
         AS avg_events_per_session,
       ((MAX(end_us - start_us) + 300000) // 600000) / 100.0
         AS max_session_minutes
FROM sessions GROUP BY user_id
""",
    "op_merge_upsert": """
WITH snap_old AS (
  SELECT user_id, event_type, COUNT(*) AS n_plays,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2
), snap_new AS (
  SELECT user_id, event_type, COUNT(*) AS n_plays,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
  FROM events WHERE ts >= TIMESTAMP '2024-01-08' GROUP BY 1, 2
)
SELECT * FROM snap_new
UNION ALL
SELECT o.* FROM snap_old o
WHERE NOT EXISTS (SELECT 1 FROM snap_new n
                  WHERE n.user_id = o.user_id AND n.event_type = o.event_type)
""",
    "ana_day_code_profile": """
WITH d AS (
  SELECT CASE dayname(ts)
           WHEN 'Monday' THEN 'Mon' WHEN 'Tuesday' THEN 'Tue'
           WHEN 'Wednesday' THEN 'Wed' WHEN 'Thursday' THEN 'Thu'
           WHEN 'Friday' THEN 'Fri' WHEN 'Saturday' THEN 'Sat'
           WHEN 'Sunday' THEN 'Sun' END AS day_code
  FROM events
),
a AS (
  SELECT day_code, COUNT(*) AS n_events FROM d GROUP BY day_code
)
SELECT day_code, n_events,
       round(n_events * 100.0 / SUM(n_events) OVER (), 3) AS pct_events
FROM a
""",
}

def q_today_listening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``dwh.v_today_listening`` daily-summary view
    (README.md:201 — mentioned, never defined; semantics: today's listening
    drill-down).  "Today" is the corpus max date (deterministic), computed
    as a 1-row scalar broadcast cross join, then an hourly rollup of that
    single day's slice.

    Scale: the date filter lands on the scan (at 100 TB, a partition prune
    on a date-partitioned layout); the rollup shuffles <= 24 groups."""
    s = _silver(spark, sf_dir).select(
        "played_date", "played_hour", "user_id", "event_type", "value"
    )
    mx = s.agg(F.max("played_date").alias("today"))
    return (
        s.crossJoin(F.broadcast(mx))
        .filter(F.col("played_date") == F.col("today"))
        .groupBy("played_hour")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_event_types"),
            lsum(F.col("value")).alias("total_value"),
        )
    )


def q_top_artists_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README's second example query (README.md:203-210): top-10
    artists of a month via fact ⋈ dim_artists ⋈ dim_dates.  The customer
    table plays dim_artists (c_name = artist_name, the existing
    ana_nullable_dim_profile dim mapping); the month is the corpus max
    month (deterministic stand-in for the README's literal 'October 2025').

    Scale: month filter → partition prune; the name dim rides in as a
    broadcast hash join (dim-sized); top-10 is TakeOrderedAndProject."""
    s = _silver(spark, sf_dir).select("user_id", "played_date")
    mx = s.agg(
        F.trunc(F.max("played_date"), "month").alias("m0")
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("artist_name"),
    )
    return (
        s.crossJoin(F.broadcast(mx))
        .filter(F.trunc("played_date", "month") == F.col("m0"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total_plays"))
        .join(dim_broadcast(dim, sf_dir, "customer", 2_000_000),
              "user_id")
        .select("artist_name", "total_plays")
        .orderBy(F.desc("total_plays"), F.asc("artist_name"))
        .limit(10)
    )


QUERIES = {
    "ana_nullable_dim_profile": q_nullable_dim_profile,
    "ana_today_listening": q_today_listening,
    "ana_top_artists_month": q_top_artists_month,
    "ana_rolling_value_7d": q_rolling_value_7d,
    "ana_gap_fill": q_gap_fill,
    "ana_ab_test": q_ab_test,
    "ana_resample_ohlc": q_resample_ohlc,
    "ana_heatmap": q_heatmap,
    "ana_period_ratio": q_period_ratio,
    "ana_top_users": q_top_users,
    "ana_loyalty": q_loyalty,
    "ana_treemap_norm": q_treemap_norm,
    "ana_monthly_discovery": q_monthly_discovery,
    "ana_sankey": q_sankey,
    "ana_weekly_delta": q_weekly_delta,
    "ana_pivot_day_period": q_pivot_day_period,
    "ana_pivot_first_reindex": q_pivot_first_reindex,
    "ana_sessionize": q_sessionize,
    "ana_day_code_profile": q_day_code_profile,
    "op_merge_upsert": q_merge_upsert,
}
