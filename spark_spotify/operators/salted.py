"""Skew-mitigating salted equi-join.

A shuffle join on a skewed key puts every row of a hot key into one reducer
partition; at 100 TB a single hot user/artist key can stall the whole stage.
Salting splits each hot key's rows across ``n_salt`` sub-partitions by
appending a uniform salt to the join key on the big side and replicating the
small side once per salt value, then joining on (key, salt).  The result is
row-identical to the plain join; only the shuffle layout changes.

When the small side fits in memory a broadcast join is strictly better (no
shuffle at all) — salting earns its keep for large-large joins where neither
side broadcasts, or under AQE-less engines.  With AQE's skew-join handling
(`spark.sql.adaptive.skewJoin.enabled`) Spark splits oversized partitions at
runtime; explicit salting remains the portable, planner-independent tool and
is exercised here so the engine carries it.

The salt must be deterministic (derived from a stable column, not rand()) so
reruns and retried tasks produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_source: Column,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on big_key == small_key with an n-way salt.

    ``salt_source`` is any stable big-side column (e.g. a row id); its pmod
    spreads each join key's rows over n_salt reducer partitions.  The small
    side is exploded once per salt value (n_salt× replication — the price of
    de-skewing; keep n_salt modest).
    """
    b = big.withColumn("_salt", F.pmod(salt_source, F.lit(n_salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop("_salt")
