"""Audio-feature and genre-array analytics — the reference's
``analytics.daily_listening_stats`` rollup (utils/database.py:241-255:
date, total_tracks, unique_artists, total_duration_ms, top_genre,
avg_energy, avg_valence) and the ``artist_profiles.genres`` array surface
(dags/spotify/curl_spotify_tracker.py:516-533) re-expressed over the
driver's fixture universe.

The fixtures carry no audio-features table, so the features are DERIVED
deterministically from ``events.props`` (``$.k``): energy/valence are
fixed modular projections of k, the genre is a k-indexed lookup in a
constant 8-genre vocabulary.  Every derivation is integer arithmetic or
an exact IEEE division ordered identically in Spark and the DuckDB
oracle, so the rollups are hash-portable without any round() of derived
doubles (the repo parity rule).

Scale: both queries are a scan-side projection feeding map-side-combinable
aggregates — one shuffle each, keyed by day / user — and the genre
vocabulary is a literal array, never a joined table.  Nothing here changes
shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_spotify.sources.tables import load_table

# constant 8-genre vocabulary; index = prop_k % 8 (deterministic stand-in
# for the Spotify artist genres the reference stores)
GENRES = [
    "classical",
    "electronic",
    "folk",
    "hiphop",
    "jazz",
    "metal",
    "pop",
    "rock",
]


def _with_features(ev: DataFrame) -> DataFrame:
    """Scan-side feature derivation: genre / energy-centi / valence-centi
    from the JSON prop (single get_json_object per row — the int cast is
    projected once and reused)."""
    k = F.get_json_object("props", "$.k").cast("int")
    genre = F.when(k.isNull(), F.lit("unknown")).otherwise(
        F.array(*[F.lit(g) for g in GENRES])[
            F.pmod(k, F.lit(len(GENRES))).cast("int")
        ]
    )
    return ev.select(
        F.to_date("ts").alias("day"),
        "user_id",
        "value",
        k.alias("k"),
        genre.alias("genre"),
        F.pmod(k, F.lit(101)).alias("e_centi"),  # energy  in centi-units
        F.pmod(k * 37 + 11, F.lit(101)).alias("v_centi"),  # valence
    )


def q_audio_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily_listening_stats upsert payload
    (utils/database.py:241-255), one row per day: play volume, distinct
    "artists" (user_id plays that role in the fixture universe), total
    duration in ms, the day's modal genre, and average energy/valence.

    top_genre is an exact argmax: per-(day, genre) counts (map-side
    combinable) then max_by over the day's handful of genre rows with a
    (count, genre) struct — ties break to the lexicographically larger
    genre, mirrored in the oracle's ORDER BY cnt DESC, genre DESC.
    Averages divide exact integer sums (centi-unit features; floor'd ms)
    as double divisions associated identically in both engines — no
    round() of derived doubles."""
    f = _with_features(load_table(spark, sf_dir, "events"))
    dur_ms = F.floor(F.col("value") * 1000).cast("long")
    per_day = f.groupBy("day").agg(
        F.count(F.lit(1)).alias("total_tracks"),
        F.countDistinct("user_id").alias("unique_artists"),
        F.sum(dur_ms).alias("total_duration_ms"),
        F.sum("e_centi").alias("_se"),
        F.sum("v_centi").alias("_sv"),
        F.count("e_centi").alias("_ne"),
    )
    top = (
        f.groupBy("day", "genre")
        .agg(F.count(F.lit(1)).alias("_gn"))
        .groupBy("day")
        .agg(
            F.max_by(
                "genre", F.struct(F.col("_gn"), F.col("genre"))
            ).alias("top_genre")
        )
    )
    return (
        per_day.join(top, "day")
        .select(
            "day",
            "total_tracks",
            "unique_artists",
            "total_duration_ms",
            "top_genre",
            (F.col("_se").cast("double") / F.col("_ne") / 100.0).alias(
                "avg_energy"
            ),
            (F.col("_sv").cast("double") / F.col("_ne") / 100.0).alias(
                "avg_valence"
            ),
        )
    )


def q_genre_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genre-array analytics over the artist_profiles.genres shape
    (curl_spotify_tracker.py:516-533): each "artist" (user) accumulates the
    sorted DISTINCT genre array their plays span — a true array<string>
    column, the reference's ``genres: [...]`` — which is then exploded and
    aggregated per genre: how many artists carry the genre, their total
    plays, and the mean genre-array width of those artists.

    The array is built and consumed INSIDE the query (collect_set →
    sort_array → explode), exercising the array machinery while the gate
    output stays flat.  Two shuffles, both keyed and map-side combinable
    (user → genre); the exploded relation is bounded by 8 genres per
    artist."""
    f = _with_features(load_table(spark, sf_dir, "events"))
    profiles = f.groupBy("user_id").agg(
        F.sort_array(F.collect_set("genre")).alias("genres"),
        F.count(F.lit(1)).alias("n_plays"),
    )
    return (
        profiles.select(
            "user_id",
            "n_plays",
            F.size("genres").alias("n_genres"),
            F.explode("genres").alias("genre"),
        )
        .groupBy("genre")
        .agg(
            F.count(F.lit(1)).alias("n_artists"),
            F.sum("n_plays").alias("total_plays"),
            (
                F.sum("n_genres").cast("double") / F.count(F.lit(1))
            ).alias("avg_genres_per_artist"),
        )
    )


_GENRE_ARR = "[" + ", ".join(f"'{g}'" for g in GENRES) + "]"

# DuckDB list indexing is 1-based; Spark's element_at-style [] above is
# 0-based — the oracle adds 1.
_SQL_FEATURES = f"""
  SELECT CAST(ts AS DATE) AS day, user_id, value, k,
         CASE WHEN k IS NULL THEN 'unknown'
              ELSE ({_GENRE_ARR})[(k % 8 + 8) % 8 + 1] END AS genre,
         (k % 101 + 101) % 101 AS e_centi,
         ((k * 37 + 11) % 101 + 101) % 101 AS v_centi
  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events)
"""

ORACLE = {
    "ana_audio_daily_stats": f"""
WITH f AS ({_SQL_FEATURES}),
per_day AS (
  SELECT day,
         COUNT(*) AS total_tracks,
         COUNT(DISTINCT user_id) AS unique_artists,
         CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
           AS total_duration_ms,
         CAST(SUM(e_centi) AS BIGINT) AS se,
         CAST(SUM(v_centi) AS BIGINT) AS sv,
         COUNT(e_centi) AS ne
  FROM f GROUP BY day
),
top AS (
  SELECT day, genre AS top_genre
  FROM (SELECT day, genre, COUNT(*) AS cnt FROM f GROUP BY day, genre)
  QUALIFY row_number() OVER (
    PARTITION BY day ORDER BY cnt DESC, genre DESC) = 1
)
SELECT p.day, p.total_tracks, p.unique_artists, p.total_duration_ms,
       t.top_genre,
       CAST(p.se AS DOUBLE) / p.ne / 100.0 AS avg_energy,
       CAST(p.sv AS DOUBLE) / p.ne / 100.0 AS avg_valence
FROM per_day p JOIN top t USING (day)
""",
    "ana_genre_explode": f"""
WITH f AS ({_SQL_FEATURES}),
profiles AS (
  SELECT user_id,
         list_sort(list(DISTINCT genre)) AS genres,
         COUNT(*) AS n_plays
  FROM f GROUP BY user_id
),
x AS (
  SELECT user_id, n_plays, len(genres) AS n_genres, unnest(genres) AS genre
  FROM profiles
)
SELECT genre,
       COUNT(*) AS n_artists,
       CAST(SUM(n_plays) AS BIGINT) AS total_plays,
       CAST(SUM(n_genres) AS DOUBLE) / COUNT(*) AS avg_genres_per_artist
FROM x GROUP BY genre
""",
}

QUERIES = {
    "ana_audio_daily_stats": q_audio_daily_stats,
    "ana_genre_explode": q_genre_explode,
}
