"""Hypertable-style time-series rollups (continuous aggregates).

The pattern TimescaleDB calls a hypertable + continuous aggregate,
Spark-native: raw events land once; coarser resolutions are derived by
re-aggregating the NEXT-finer rollup, not the raw table — a 1-day
rollup reads the 1-hour rollup (24x fewer rows), never the events.
All aggregates used are decomposable (sum/count/min/max), so
re-aggregation is exact; avg is derived as sum/count at query time.

At 100 TB: each rollup is a partitioned table (partition by date of
``bucket_start``); refreshing a window means overwriting only the
affected date partitions (dynamic partition overwrite), and queries
pick the coarsest table that answers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# supported bucket widths, seconds (must each divide the next)
RESOLUTIONS = {"1 minute": 60, "1 hour": 3600, "1 day": 86400}


def rollup_events(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    width: str,
) -> DataFrame:
    """Aggregate raw rows into one bucket row per (window, keys):
    (bucket_start, *key_cols, n, sum_v, min_v, max_v)."""
    if width not in RESOLUTIONS:
        raise ValueError(f"width must be one of {sorted(RESOLUTIONS)}")
    return (
        df.groupBy(F.window(time_col, width).alias("w"), *key_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(F.col("w.start").alias("bucket_start"), *key_cols,
                "n", "sum_v", "min_v", "max_v")
    )


def reaggregate(rollup: DataFrame, key_cols: list[str], width: str) -> DataFrame:
    """Coarsen an existing rollup to a wider bucket — exact for the
    decomposable aggregates carried (count/sum/min/max)."""
    if width not in RESOLUTIONS:
        raise ValueError(f"width must be one of {sorted(RESOLUTIONS)}")
    return (
        rollup.groupBy(F.window("bucket_start", width).alias("w"), *key_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .select(F.col("w.start").alias("bucket_start"), *key_cols,
                "n", "sum_v", "min_v", "max_v")
    )


def rollup_ladder(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    widths: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Build the full resolution ladder, each level derived from the
    previous: events -> 1 minute -> 1 hour -> 1 day. Returns
    {width: rollup DataFrame}; callers persist each level to a
    partitioned table in production."""
    widths = widths or sorted(RESOLUTIONS, key=RESOLUTIONS.get)
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for w in widths:
        level = (
            rollup_events(df, time_col, key_cols, value_col, w)
            if prev is None
            else reaggregate(prev, key_cols, w)
        )
        out[w] = level
        prev = level
    return out


def refresh_rollup_incremental(
    prior: DataFrame,
    current: DataFrame,
    changes: DataFrame,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    width: str,
) -> DataFrame:
    """Continuous-aggregate refresh (TimescaleDB's invalidation model,
    Spark-native): given the ``prior`` rollup, the table's ``current``
    state, and a CDC delta (``WideColumnTable.read_changes`` output —
    upserts AND deletes, so ``time_col`` must be a primary-key column
    for deletes to carry their bucket), recompute ONLY the
    (bucket, keys) groups the delta touched and graft them onto the
    untouched prior rows.

    Work scales with the delta: affected groups come from the change
    feed, the recompute scan is semi-join-pruned to those groups (at
    scale, partitioning the rollup and raw tables by date of
    ``bucket_start`` turns both the prune and the overwrite into
    partition operations), and the merge is an anti-join on the same
    bounded key set. min/max stay exact under deletes — unlike a
    delta-merge scheme, which cannot retract a max — because affected
    buckets are recomputed from current state, not patched.
    """
    if width not in RESOLUTIONS:
        raise ValueError(f"width must be one of {sorted(RESOLUTIONS)}")
    affected = (
        changes.select(
            F.window(time_col, width)["start"].alias("bucket_start"), *key_cols
        )
        .distinct()
    )
    pruned = (
        current.withColumn("bucket_start", F.window(time_col, width)["start"])
        .join(affected, ["bucket_start", *key_cols], "left_semi")
        .drop("bucket_start")
    )
    recomputed = rollup_events(pruned, time_col, key_cols, value_col, width)
    kept = prior.join(affected, ["bucket_start", *key_cols], "left_anti")
    return kept.unionByName(recomputed)
