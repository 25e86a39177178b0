"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no ASOF JOIN (DuckDB does; we use that as the oracle). A naive
implementation is a range self-join + argmax — an O(n·m) shuffle
explosion at scale. This one is the union-sort trick: tag both sides,
union, and take ``last(right_payload, ignorenulls=True)`` over a window
``partitionBy(key).orderBy(time, side)`` — ONE shuffle on the key,
in-partition sort, linear scan. At 100 TB this is the plan you want: the
shuffle is on the join key (same as any equi-join would need) and state
per partition is a single running value, never a buffered range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join. Each left row gains ``payload_cols`` from the
    newest right row with ``right_time <= left_time`` and matching key
    (NULLs when no prior right row exists).

    Equal timestamps on the right side count as "at-or-before" (the
    right row sorts first via the side tag).
    """
    lcols = left.columns
    r = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias(left_time),
        *[F.col(c) for c in payload_cols],
    ).withColumn(_SIDE, F.lit(0))
    l = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    ).withColumn(_SIDE, F.lit(1))
    # align column order for union
    both = r.select(
        F.col(left_on), F.col(left_time), F.col(_SIDE),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (left_on, left_time)],
    ).unionByName(
        l.select(
            F.col(left_on), F.col(left_time), F.col(_SIDE),
            *[F.col(c) for c in payload_cols],
            *[F.col(c) for c in lcols if c not in (left_on, left_time)],
        )
    )
    w = (
        Window.partitionBy(left_on)
        .orderBy(F.col(left_time).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *[F.col(c) for c in both.columns if c not in payload_cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE).select(*lcols, *payload_cols)
