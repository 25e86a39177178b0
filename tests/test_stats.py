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


# ---------------------------------------------------------------------------
# quantile_normalize_by_group
# ---------------------------------------------------------------------------

from cassandrastack_spark.functions.stats import quantile_normalize_by_group


def _two_groups(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "src string, score double")


def test_qnorm_equal_sizes_equalizes_distributions(spark):
    # classic quantile norm: equal-size groups end up with IDENTICAL
    # value multisets (the cross-group rank averages)
    df = _two_groups(spark, [1, 2, 3, 4], [10, 20, 30, 40])
    out = quantile_normalize_by_group(df, "score", "src", grid=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.src, []).append(r.score_qn)
    assert sorted(got["a"]) == sorted(got["b"]) == [5.5, 11.0, 16.5, 22.0]


def test_qnorm_unequal_sizes_hand_computed(spark):
    # A = [0, 10] (n=2), B = [0, 4, 8, 12] (n=4), grid=4:
    # A rank1 serves cells 1-2 (value 0), rank2 cells 3-4 (value 10);
    # ref = [0, 2, 9, 11]; A maps to cells ceil(4*rn/2) = [2, 4],
    # B to cells [1, 2, 3, 4]
    df = _two_groups(spark, [0, 10], [0, 4, 8, 12])
    out = quantile_normalize_by_group(df, "score", "src", grid=4)
    got = {(r.src, r.score): r.score_qn for r in out.collect()}
    assert got[("a", 0.0)] == 2.0 and got[("a", 10.0)] == 11.0
    assert got[("b", 0.0)] == 0.0 and got[("b", 4.0)] == 2.0
    assert got[("b", 8.0)] == 9.0 and got[("b", 12.0)] == 11.0


def test_qnorm_monotone_within_group_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 1.0), ("a", None), ("a", 3.0),
         ("b", 2.0), ("b", 4.0)],
        "src string, score double",
    )
    out = quantile_normalize_by_group(df, "score", "src", grid=10)
    rows = out.collect()
    assert all(r.score_qn is None for r in rows if r.score is None)
    a = sorted(
        (r.score, r.score_qn) for r in rows
        if r.src == "a" and r.score is not None
    )
    assert all(x[1] <= y[1] for x, y in zip(a, a[1:])), "monotone in value"


def test_qnorm_deterministic_across_partitionings_with_ties(spark):
    """The r12 VERDICT flake, pinned: with tied values and a tie_cols
    key, the per-row output must be BIT-IDENTICAL whatever the input
    partitioning — the cell reference is an exact decimal sum (order-
    free) and the tie-break decides cell membership uniquely. Values
    are chosen so double summation order WOULD differ at the ulp
    level (many decimals straddling a binary boundary) and ties span
    cell boundaries (n=8 > grid=4, two ranks per cell)."""
    rows = [
        ("a", f"d{i:02d}", v)
        for i, v in enumerate(
            [0.1, 0.1, 0.3, 0.3, 0.7514895, 0.7514895, 0.9, 0.9]
        )
    ] + [
        ("b", f"e{i:02d}", v)
        for i, v in enumerate(
            [0.2, 0.2, 0.2, 0.6, 0.6, 0.6, 0.8333333, 0.8333333]
        )
    ]
    df = spark.createDataFrame(rows, "src string, doc string, score double")
    outs = []
    for parts in (1, 3, 16):
        out = quantile_normalize_by_group(
            df.repartition(parts), "score", "src", grid=4,
            tie_cols=("doc",),
        )
        outs.append(
            sorted(
                (r.src, r.doc, r.score, r.score_qn) for r in out.collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    # the struct-equality above is bitwise on the doubles: no rounding


def test_qnorm_rejects_bad_grid(spark):
    df = _two_groups(spark, [1], [2])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid"):
        quantile_normalize_by_group(df, "score", "src", grid=0)


# ---------------------------------------------------------------------------
# histogram_fixed + psi_from_histograms
# ---------------------------------------------------------------------------

from cassandrastack_spark.functions.stats import (  # noqa: E402
    histogram_fixed,
    psi_from_histograms,
)


def test_histogram_fixed_hand_computed_bins_and_edges(spark):
    df = spark.createDataFrame(
        [
            (v,)
            for v in [
                -0.5, 0.0, 0.09, 0.1, 0.55, 0.99, 1.0, 2.3, None,
                float("nan"),
            ]
        ],
        "score double",
    )
    got = {
        r.bin: r.cnt
        for r in histogram_fixed(df, "score", 0.0, 1.0, 10).collect()
    }
    # -0.5 underflow; 0.0/0.09 -> bin 0; 0.1 -> bin 1 (left-closed);
    # 0.55 -> 5; 0.99 -> 9; 1.0 and 2.3 overflow; NULL dropped; NaN
    # dropped too (review r13: Spark orders NaN > any double, so
    # without the explicit filter it would silently land in overflow
    # and break the "bin == bins means v >= hi" alarm contract)
    assert got == {-1: 1, 0: 2, 1: 1, 5: 1, 9: 1, 10: 2}


def test_histogram_fixed_merges_by_addition(spark):
    df = spark.createDataFrame(
        [(i / 100.0,) for i in range(100)], "score double"
    )
    a = histogram_fixed(df.filter("score < 0.43"), "score", 0.0, 1.0, 7)
    b = histogram_fixed(df.filter("score >= 0.43"), "score", 0.0, 1.0, 7)
    merged = (
        a.unionByName(b)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = histogram_fixed(df, "score", 0.0, 1.0, 7)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_histogram_fixed_rejects_bad_params(spark):
    df = _rows(spark, [1.0])
    with pytest.raises(ValueError, match="bins"):
        histogram_fixed(df, "score", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_fixed(df, "score", 1.0, 1.0, 4)


def test_psi_identical_distributions_and_known_shift(spark):
    import math

    base = spark.createDataFrame(
        [((i % 10) / 10.0 + 0.05,) for i in range(1000)], "score double"
    )
    h = histogram_fixed(base, "score", 0.0, 1.0, 10)
    # identical distributions -> PSI exactly 0 (every p_i == q_i)
    same = psi_from_histograms(h, h).collect()[0]
    assert same.psi == 0.0
    assert same.n_expected == same.n_observed == 1000
    # hand-computed two-bin shift: p = (0.8, 0.2) -> q = (0.5, 0.5)
    e = spark.createDataFrame(
        [(0.25,)] * 80 + [(0.75,)] * 20, "score double"
    )
    o = spark.createDataFrame(
        [(0.25,)] * 50 + [(0.75,)] * 50, "score double"
    )
    got = psi_from_histograms(
        histogram_fixed(e, "score", 0.0, 1.0, 2),
        histogram_fixed(o, "score", 0.0, 1.0, 2),
    ).collect()[0]
    want = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(
        0.2 / 0.5
    )
    assert abs(got.psi - want) < 1e-12


def test_psi_empty_bin_smoothed_not_infinite_and_grouped(spark):
    rows_e = [("a", 0.25)] * 10 + [("a", 0.75)] * 10 + [("b", 0.25)] * 20
    rows_o = [("a", 0.25)] * 20 + [("b", 0.75)] * 20  # b fully shifted
    e = spark.createDataFrame(rows_e, "src string, score double")
    o = spark.createDataFrame(rows_o, "src string, score double")
    got = {
        r.src: r.psi
        for r in psi_from_histograms(
            histogram_fixed(e, "score", 0.0, 1.0, 2, group_cols=("src",)),
            histogram_fixed(o, "score", 0.0, 1.0, 2, group_cols=("src",)),
            group_cols=("src",),
        ).collect()
    }
    import math

    assert math.isfinite(got["a"]) and math.isfinite(got["b"])
    # b moved ALL mass across bins -> major shift, far above the 0.25 bar
    assert got["b"] > 0.25 > 0.1 > 0.0
    assert got["b"] > got["a"] > 0.0


def test_histogram_fixed_top_edge_float_rounding_stays_interior(spark):
    """Review r13 (verified numerically): for v just under hi,
    (v - lo) / (hi - lo) * bins can round UP to exactly bins in float,
    and an unclamped floor would put an IN-RANGE value in the overflow
    bin — breaking the 'bin == bins means v >= hi' contract consumers
    alarm on. The found edge triple is pinned."""
    import math

    lo, hi, bins = -2.720497995375246, 1.7286015667975967, 7
    v = math.nextafter(hi, -math.inf)
    assert v < hi
    assert math.floor((v - lo) / (hi - lo) * bins) == bins, (
        "the fixture no longer exercises the rounding edge"
    )
    df = spark.createDataFrame([(v,)], "score double")
    got = histogram_fixed(df, "score", lo, hi, bins).collect()
    assert [(r.bin, r.cnt) for r in got] == [(bins - 1, 1)]
