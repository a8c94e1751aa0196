"""Reference-compatible API façade.

Every public query/util a user of donydony228/SpotifyDataPipeline calls
today, under the SAME names, backed by this engine — the switch-over
surface.  Three mechanical differences, applied uniformly:

* the ``_db_manager`` / connection argument becomes ``(spark, sf_dir)``
  (dashboard/database_manager.py's SupabaseManager and utils/database.py's
  connections are the storage tier this engine replaces);
* results are Spark DataFrames — call ``.toPandas()`` where the reference
  returned ``pd.DataFrame`` (the dashboards' next line anyway);
* "today"-anchored windows (the reference's ``CURRENT_DATE``) anchor on
  the corpus max date so results are deterministic and testable.

Window-boundary convention (DELIBERATE divergence): ``_trailing_days``
keeps exactly N calendar days INCLUSIVE of the anchor
(``>= date_sub(end, N-1)``).  The reference's ``>= CURRENT_DATE -
INTERVAL '30 days'`` keeps N+1 days (31 for a "30-day" window); this
façade fixes that off-by-one, so a user comparing side-by-side against
the live reference dashboard will see the single oldest boundary day
differ.  Pass ``day_count + 1`` to reproduce the reference's boundary
bit-for-bit.

Entity-role mapping (FIXTURES.md): the driver fixture universe carries no
track/artist/album tables, so ``user_id`` plays the artist/track key and
``customer`` the artist-attribute dim — the same mapping the registered
analytics queries document individually.

Every function delegates to the oracle-gated registry queries; nothing
here re-implements logic, so the façade inherits the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.analytics import advanced, audio, listening
from spark_spotify.etl import stats as etl_stats
from spark_spotify.operators.merge import dynamic_insert, merge_upsert
from spark_spotify.sources.tables import dim_broadcast, load_table


def _trailing_days(
    df: DataFrame, date_col: str, day_count: int
) -> DataFrame:
    """Reference WHERE played_at >= CURRENT_DATE - N days, anchored on the
    corpus max date (1-row scalar broadcast, prunes before any shuffle)."""
    mx = df.agg(F.max(date_col).alias("_end"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(date_col) >= F.date_sub(F.col("_end"), day_count - 1))
        .drop("_end")
    )


# --- dashboard/sql_query/* load functions ---------------------------------


def heatmap_load_data(
    day_count: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """main_heatmap.py:7 — date×hour grid, zero-filled, trailing window.

    The trailing window is anchored on the MAX EVENT DATE, not the
    zero-filled grid's calendar end: q_heatmap's grid always spans the
    full fixed calendar, so anchoring on its own max(played_date) would
    return only zero-filled rows whenever events end before the calendar
    does.  The event-max anchor is a 1-row broadcast, pruned before any
    shuffle."""
    grid = listening.q_heatmap(spark, sf_dir)
    evt_end = load_table(spark, sf_dir, "events").agg(
        F.max(F.to_date("ts")).alias("_evt_end")
    )
    grid = (
        grid.crossJoin(F.broadcast(evt_end))
        .filter(F.col("played_date") <= F.col("_evt_end"))
        .drop("_evt_end")
    )
    return _trailing_days(grid, "played_date", day_count)


def hour_ratio_load_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """main_ratio.py:7 — share of each day's value by time period."""
    return listening.q_period_ratio(spark, sf_dir)


def radar_load_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """main_ratio.py:92 — behavior radar summary."""
    return advanced.q_behavior_radar(spark, sf_dir)


def basic_loyal_load_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """artist_loyal.py:7 — loyalty ratio top-100."""
    return listening.q_loyalty(spark, sf_dir)


def track_sankey_load_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """track_sankey.py:7 — lifecycle sankey links."""
    return listening.q_sankey(spark, sf_dir)


def treemap_track_load_data(
    day_count: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """track_treemap.py:7 — top-10 treemap with normalized color score.
    The registered query fixes the reference's 30-day default; other
    windows recompute the same shape."""
    if day_count == 30:
        return listening.q_treemap_norm(spark, sf_dir)
    return _treemap_window(spark, sf_dir, day_count)


def treemap_artist_load_data(
    day_count: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """artist_treemap.py:7 — artist axis ≡ user_id in the fixture
    universe (same key the track treemap groups by; the reference's two
    queries differ only in the joined name column)."""
    return treemap_track_load_data(day_count, spark, sf_dir)


def treemap_album_load_data(
    day_count: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """album_treemap.py:7 — album axis ≡ event_type (the only other
    grouping entity the fixture universe carries)."""
    s = listening.clean_events(load_table(spark, sf_dir, "events")).select(
        "event_type", "played_date", "value"
    )
    win = _trailing_days(s, "played_date", day_count)
    return (
        win.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_plays"))
        .orderBy(F.desc("n_plays"), F.asc("event_type"))
    )


def band_violin_load_data(
    days_to_display: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """artist_band.py:7 — per-play value with the nullable dim attribute
    kept (LEFT JOIN, NULLs preserved)."""
    ev = listening.clean_events(
        load_table(spark, sf_dir, "events")
    ).select("user_id", "played_date", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("band"),
    )
    return _trailing_days(ev, "played_date", days_to_display).join(
        dim_broadcast(dim, sf_dir, "customer", 2_000_000), "user_id", "left"
    ).select("value", "band")


def band_bar_load_data(
    days_to_display: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """artist_band.py:40 — the aggregated bar variant."""
    return (
        band_violin_load_data(days_to_display, spark, sf_dir)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_plays"))
    )


def gender_violin_load_data(
    days_to_display: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """artist_gender.py:7 — same join with the attribute nulled for the
    'unknown' segment (the registered ana_nullable_dim_profile mapping)."""
    return band_violin_load_data(days_to_display, spark, sf_dir).select(
        "value", F.expr("nullif(band, 'MACHINERY')").alias("gender")
    )


def gender_bar_load_data(
    days_to_display: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """artist_gender.py:41 — aggregated, NULL attribute rows dropped."""
    return (
        gender_violin_load_data(days_to_display, spark, sf_dir)
        .filter(F.col("gender").isNotNull())
        .groupBy("gender")
        .agg(F.count(F.lit(1)).alias("n_plays"))
    )


def gender_bar_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """artist_gender.py:77 — the full-history per-attribute profile."""
    return listening.q_nullable_dim_profile(spark, sf_dir)


def _treemap_window(
    spark: SparkSession, sf_dir: str, day_count: int
) -> DataFrame:
    s = listening.clean_events(load_table(spark, sf_dir, "events")).select(
        "user_id", "played_date", "value"
    )
    from pyspark.sql import Window

    from spark_spotify.functions.agg import lsum

    top = (
        _trailing_days(s, "played_date", day_count)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_plays"),
            lsum(F.col("value")).alias("total_value"),
        )
        .orderBy(F.desc("n_plays"), F.asc("user_id"))
        .limit(10)
    )
    w = Window.partitionBy()
    mn, mx = F.min("n_plays").over(w), F.max("n_plays").over(w)
    score = F.when(mx == mn, F.lit(0.5)).otherwise(
        (F.col("n_plays") - mn) / (mx - mn)
    )
    return top.withColumn("color_score", F.round(score, 3))


# --- utils/database.py surface ---------------------------------------------


def execute_insert(
    target: DataFrame, data: list[dict]
) -> DataFrame:
    """utils/database.py:195 — generic dynamic INSERT; see
    operators/merge.dynamic_insert for the alignment contract."""
    return dynamic_insert(target, data)


def upsert_daily_stats(
    existing: DataFrame, stats_delta: DataFrame
) -> DataFrame:
    """utils/database.py:235 — ON CONFLICT (date) DO UPDATE over the daily
    stats table: keyed merge, incoming wins."""
    return merge_upsert(existing, stats_delta, ["day"])


def get_recent_listening_stats(
    days: int, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """utils/database.py:273 — trailing-days slice of daily_listening_stats,
    newest first."""
    return _trailing_days(
        audio.q_audio_daily_stats(spark, sf_dir), "day", days
    ).orderBy(F.desc("day"))


def get_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse daily rollup backing dwh views (daily_etl_pipeline
    update_daily_stats output shape)."""
    return etl_stats.q_daily_stats(spark, sf_dir)


def v_today_listening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:201 — SELECT * FROM dwh.v_today_listening."""
    return listening.q_today_listening(spark, sf_dir)
