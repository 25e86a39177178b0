"""Window-style operators: per-group top-k, sessionization, range join.

All pure DataFrame compositions — one shuffle on the grouping key each,
window functions running linearly within partitions (SURVEY.md §2.4:
"top-N newest per channel" is the idiomatic analytical analogue of the
reference's clustering-ordered partition read, ``server.py:98,185``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number()-based per-group top-N. ``order_cols`` must end with a
    unique tie-break column for deterministic results."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    previous event of the same key exceeds ``gap_seconds``.

    lag + cumulative-sum over one window — the batch equivalent of a
    session window (the streaming version lives in
    ``cassandrastack_spark.streaming``). Gap comparison is done on
    integer microseconds (``unix_micros``) so engines agree exactly.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(time_col).asc(), F.col(tiebreak_col).asc())
    us = F.unix_micros(F.col(time_col))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def range_join_pairs(
    df: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    window_seconds: int,
    bin_time: bool = False,
) -> DataFrame:
    """Self range-join: pairs (a, b) with the same key, ``a.id < b.id``
    and ``0 <= b.time - a.time <= window_seconds``.

    Default plan: equi-join on the key (hash join, prunable) with the
    range as a post-join filter; AQE handles skewed keys. With
    ``bin_time=True`` (the 100 TB path for keys with very large groups),
    time is bucketed into ``window_seconds`` bins and the b-side joins
    on (key, bin) ∪ (key, bin+1): each a-row meets only rows of two
    adjacent bins instead of the key's whole history, bounding the
    quadratic blow-up; the exact range filter then prunes false
    positives. Identical output to the default plan.
    """
    win_us = window_seconds * 1_000_000
    a = df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(time_col)).alias("t_a"),
        F.col(id_col).alias("a_id"),
    )
    b = df.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(time_col)).alias("t_b"),
        F.col(id_col).alias("b_id"),
    )
    if bin_time:
        # a joins in its own bin; b appears in its bin AND the previous
        # one: t_b in [t_a, t_a+win] implies bin_b ∈ {bin_a, bin_a+1},
        # i.e. bin_a ∈ {bin_b, bin_b-1}, so every in-window pair shares
        # a join key.
        a = a.withColumn("bin", F.floor(F.col("t_a") / win_us))
        b = b.withColumn(
            "bin", F.explode(F.array(
                F.floor(F.col("t_b") / win_us),
                F.floor(F.col("t_b") / win_us) - 1,
            ))
        )
        joined = a.join(b, on=["k", "bin"]).drop("bin")
    else:
        joined = a.join(b, on="k")
    return joined.filter(
        (F.col("a_id") < F.col("b_id"))
        & (F.col("t_b") - F.col("t_a") >= 0)
        & (F.col("t_b") - F.col("t_a") <= win_us)
    )
