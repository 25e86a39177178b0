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
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join. Each left row gains ``payload_cols`` from the
    nearest right row with matching key: ``direction="backward"`` takes
    the newest right row with ``right_time <= left_time``;
    ``direction="forward"`` the oldest with ``right_time >= left_time``
    (NULLs when no such right row exists). Both directions are the same
    one-shuffle union-sort plan — forward just sorts time descending.

    Equal timestamps on the right side count as a match in either
    direction (the right row sorts first via the side tag).

    ``tolerance`` (seconds; any numeric delta for numeric time columns)
    nulls the payload when the matched right row is further than that
    from the left row — pandas ``merge_asof(tolerance=...)`` semantics,
    applied after the match so the plan is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    _MT = "_asof_mt"
    pay = list(payload_cols) + ([_MT] if tolerance is not None else [])

    def _rtype(c):
        return right.schema[right_time].dataType if c == _MT else right.schema[c].dataType

    lcols = left.columns
    r = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias(left_time),
        *[F.col(c) for c in payload_cols],
        *([F.col(right_time).alias(_MT)] if tolerance is not None else []),
    ).withColumn(_SIDE, F.lit(0))
    l = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(_rtype(c)).alias(c) for c in pay],
    ).withColumn(_SIDE, F.lit(1))
    # align column order for union
    both = r.select(
        F.col(left_on), F.col(left_time), F.col(_SIDE),
        *[F.col(c) for c in pay],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (left_on, left_time)],
    ).unionByName(
        l.select(
            F.col(left_on), F.col(left_time), F.col(_SIDE),
            *[F.col(c) for c in pay],
            *[F.col(c) for c in lcols if c not in (left_on, left_time)],
        )
    )
    time_order = F.col(left_time).asc() if direction == "backward" else F.col(left_time).desc()
    w = (
        Window.partitionBy(left_on)
        .orderBy(time_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *[F.col(c) for c in both.columns if c not in pay],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in pay],
    )
    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance is not None:
        from pyspark.sql.types import NumericType

        def _secs(col, dt):
            # numeric time axes as-is; date/timestamp/ntz -> epoch seconds
            if isinstance(dt, NumericType):
                return col.cast("double")
            return col.cast("timestamp").cast("double")

        lt = _secs(F.col(left_time), left.schema[left_time].dataType)
        mt = _secs(F.col(_MT), right.schema[right_time].dataType)
        diff = (lt - mt) if direction == "backward" else (mt - lt)
        in_tol = F.col(_MT).isNotNull() & (diff <= F.lit(float(tolerance)))
        out = out.select(
            *[F.col(c) for c in lcols],
            *[F.when(in_tol, F.col(c)).alias(c) for c in payload_cols],
        )
    return out.select(*lcols, *payload_cols)
