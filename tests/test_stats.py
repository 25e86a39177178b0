"""functions.stats.winsorize_by_group: hand-computed order-statistic
fences, tie and null handling, degenerate groups, parameter checks."""

import math

import pytest

from pyspark.sql import functions as F

from cassandrastack_spark.functions.stats import winsorize_by_group


def _rows(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) if v is not None else (group, None) for v in vals],
        "src string, score double",
    )


def test_winsorize_hand_computed_fences(spark):
    # 10 values 1..10, lower=0.2 upper=0.8 -> lo = value at rank
    # ceil(2)=2 (2.0), hi = value at rank ceil(8)=8 (8.0)
    df = _rows(spark, range(1, 11))
    out = winsorize_by_group(df, "score", "src", lower=0.2, upper=0.8)
    got = {r.score: (r.score_w, r.score_norm) for r in out.collect()}
    assert got[1.0] == (2.0, 0.0)
    assert got[10.0] == (8.0, 1.0)
    assert got[5.0] == (5.0, 0.5)
    for v, (w, n) in got.items():
        assert 2.0 <= w <= 8.0
        assert math.isclose(n, (w - 2.0) / 6.0)


def test_winsorize_tie_invariant(spark):
    # duplicated boundary values: the fence is the order statistic,
    # identical whatever order ties enumerate in
    df = _rows(spark, [1, 1, 1, 5, 9, 9, 9, 9, 9, 9])
    out = winsorize_by_group(df, "score", "src", lower=0.2, upper=0.8)
    got = sorted((r.score, r.score_w) for r in out.collect())
    # lo = rank 2 -> 1.0, hi = rank 8 -> 9.0
    assert got[0] == (1.0, 1.0)
    assert got[-1] == (9.0, 9.0)


def test_winsorize_constant_group_norm_is_half(spark):
    df = _rows(spark, [3, 3, 3])
    out = winsorize_by_group(df, "score", "src").collect()
    assert all(r.score_w == 3.0 and r.score_norm == 0.5 for r in out)


def test_winsorize_nulls_pass_through_and_do_not_shift_ranks(spark):
    df = _rows(spark, [None, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, None])
    out = winsorize_by_group(df, "score", "src", lower=0.2, upper=0.8)
    rows = out.collect()
    nulls = [r for r in rows if r.score is None]
    assert all(r.score_w is None and r.score_norm is None for r in nulls)
    got = {r.score: r.score_w for r in rows if r.score is not None}
    # fences computed over the 10 NON-NULL values: rank 2 / rank 8
    assert got[1.0] == 2.0 and got[10.0] == 8.0


def test_winsorize_groups_are_independent(spark):
    a = _rows(spark, range(1, 11), group="a")
    b = _rows(spark, range(101, 111), group="b")
    out = winsorize_by_group(a.unionByName(b), "score", "src",
                             lower=0.2, upper=0.8)
    lo = {r.src: r.score_w for r in out.collect() if r.score in (1.0, 101.0)}
    assert lo == {"a": 2.0, "b": 102.0}


def test_winsorize_rejects_bad_bounds(spark):
    df = _rows(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="lower"):
        winsorize_by_group(df, "score", "src", lower=0.9, upper=0.1)
    with pytest.raises(ValueError, match="lower"):
        winsorize_by_group(df, "score", "src", lower=0.0)
