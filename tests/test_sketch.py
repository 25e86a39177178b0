"""Misra-Gries heavy-hitter candidates: the classic guarantee against
exact counts, the bounded-output contract, and the two registered
r11 queries (text_heavy_hitters_sketch, ann_index_extend_probe)
pinned to their exact twins on the same data. Plus the Bloom
membership filter (bloom_build / bloom_might_contain): the
no-false-negative guarantee, the design FP-rate band, empty-filter
and self-description contracts.
"""

import pytest

from pyspark.sql import functions as F

from cassandrastack_spark.operators.sketch import (
    bloom_build,
    bloom_might_contain,
    mg_candidates,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 500x "hot", 120x "warm", 200 tail keys x 3 — N = 1220
    rows = (
        [("hot",)] * 500
        + [("warm",)] * 120
        + [(f"t{i:03d}",) for i in range(200) for _ in range(3)]
    )
    return spark.createDataFrame(rows, "key string").repartition(4).cache()


def test_mg_candidates_keeps_every_heavy_hitter(spark, skewed):
    # capacity 16 -> threshold N/(cap+1) = 1220/17 ~ 71.8: "hot" and
    # "warm" exceed it globally, so each must survive in >= 1
    # partition's summary (pigeonhole over the 4 partitions)
    cand = mg_candidates(skewed, "key", capacity=16).toPandas()
    keys = set(cand["key"])
    assert "hot" in keys and "warm" in keys


def test_mg_candidates_counts_are_lower_bounds(spark, skewed):
    cand = (
        mg_candidates(skewed, "key", capacity=16)
        .groupBy("key")
        .agg(F.sum("cnt_lb").alias("cnt_lb"))
        .toPandas()
        .set_index("key")["cnt_lb"]
    )
    exact = (
        skewed.groupBy("key")
        .count()
        .toPandas()
        .set_index("key")["count"]
    )
    for k, lb in cand.items():
        assert lb <= exact[k], f"{k}: lower bound {lb} > exact {exact[k]}"


def test_mg_candidates_output_is_bounded(spark, skewed):
    cap = 16
    n_parts = skewed.rdd.getNumPartitions()
    cand = mg_candidates(skewed, "key", capacity=cap)
    assert cand.count() <= cap * n_parts
    # per-partition bound, not just the total
    per = (
        cand.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .agg(F.max("count"))
        .head()[0]
    )
    assert per <= cap


def test_mg_candidates_rejects_bad_capacity(spark, skewed):
    with pytest.raises(ValueError, match="capacity"):
        mg_candidates(skewed, "key", capacity=0)


def test_mg_candidates_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "key string"
    )
    cand = mg_candidates(df, "key", capacity=8).toPandas()
    assert None not in set(cand["key"])
    assert set(cand["key"]) == {"a", "b"}


def test_heavy_hitters_integer_keys(spark):
    # key schema is derived from the input, not hardcoded string: a
    # bigint key round-trips through the Arrow summary and the verify
    # join, matching the exact plan
    from cassandrastack_spark.operators.sketch import heavy_hitters

    e = spark.read.parquet(f"{SF}/events.parquet").select("user_id")
    got = heavy_hitters(e, "user_id", k=5, capacity=64).toPandas()
    exact = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(5)
        .toPandas()
    )
    assert got.values.tolist() == exact.values.tolist()
    assert str(got["user_id"].dtype) == str(exact["user_id"].dtype)


def test_heavy_hitters_exact_counts_under_eviction(spark, skewed):
    # capacity 16 forces eviction in every partition (200 tail keys),
    # yet the verified output must carry EXACT counts for the top keys
    from cassandrastack_spark.operators.sketch import heavy_hitters

    got = heavy_hitters(skewed, "key", k=2, capacity=16).toPandas()
    assert got.values.tolist() == [["hot", 500], ["warm", 120]]


def test_text_heavy_hitters_sketch_equals_exact_topk(spark):
    from cassandrastack_spark.queries.llm import text_heavy_hitters_sketch

    got = text_heavy_hitters_sketch(spark, SF).toPandas()
    exact = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(10)
        .toPandas()
    )
    assert got.values.tolist() == exact.values.tolist()


@pytest.fixture(scope="module")
def member_split(spark):
    # 300 members, 700 non-members — enough probes that the 12-bits /
    # 3-hash design (~1.1% FP) is exercised without being flaky
    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(300)], "g string"
    )
    outsiders = spark.createDataFrame(
        [(f"outsider-{i}",) for i in range(700)], "g string"
    )
    return members, outsiders


def test_bloom_never_false_negative(spark, member_split):
    members, _ = member_split
    bloom = bloom_build(members, "g")
    flagged = bloom_might_contain(bloom, members, "g")
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_bloom_fp_rate_within_design_band(spark, member_split):
    # (1 - e^(-k/bits_per_item))^k ~ 1.1% at the 12/3 default; allow a
    # generous deterministic ceiling (md5 positions are fixed, so this
    # is a pinned value, not a flaky sample)
    members, outsiders = member_split
    bloom = bloom_build(members, "g")
    fp = (
        bloom_might_contain(bloom, outsiders, "g")
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp <= 0.05 * 700, f"false positives {fp} over 5% of 700"


def test_bloom_self_describing_and_sized_by_items(spark, member_split):
    members, _ = member_split
    bloom = bloom_build(members, "g", bits_per_item=12, k=3).toPandas()
    assert set(bloom["m"]) == {300 * 12}
    assert set(bloom["k"]) == {3}
    # every word index within the bitmap, every word non-zero
    assert (bloom["word_idx"] >= 0).all()
    assert (bloom["word_idx"] <= (300 * 12) // 32).all()
    assert (bloom["word"] != 0).all()


def test_bloom_duplicate_items_do_not_grow_the_filter(spark):
    once = spark.createDataFrame([("x",), ("y",)], "g string")
    thrice = spark.createDataFrame([("x",)] * 3 + [("y",)] * 3, "g string")
    a = bloom_build(once, "g").orderBy("word_idx").toPandas()
    b = bloom_build(thrice, "g").orderBy("word_idx").toPandas()
    assert a.values.tolist() == b.values.tolist()


def test_bloom_empty_filter_flags_nothing(spark, member_split):
    members, _ = member_split
    empty = bloom_build(spark.createDataFrame([], "g string"), "g")
    out = bloom_might_contain(empty, members.limit(5), "g")
    assert out.filter(F.col("might_contain")).count() == 0
    assert out.count() == 5


def test_bloom_null_probes_flag_false(spark):
    bloom = bloom_build(spark.createDataFrame([("x",)], "g string"), "g")
    probes = spark.createDataFrame([("x",), (None,)], "g string")
    got = {
        r["g"]: r["might_contain"]
        for r in bloom_might_contain(bloom, probes, "g").collect()
    }
    assert got["x"] is True and got[None] is False


def test_bloom_rejects_bad_params(spark, member_split):
    members, _ = member_split
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(members, "g", k=5)
    with pytest.raises(ValueError, match="bits_per_item"):
        bloom_build(members, "g", bits_per_item=0)


def test_ann_index_extend_probe_equals_exact_topk(spark):
    """The build-on-90%/extend-with-10% index probed at full width must
    reproduce brute-force cosine ranks over the WHOLE corpus — i.e. the
    extend made every batch vector reachable and none of the base
    vectors were disturbed."""
    from cassandrastack_spark.llm.simsearch import cosine_topk
    from cassandrastack_spark.queries.llm import ann_index_extend_probe

    got = ann_index_extend_probe(spark, SF).toPandas()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = (
        cosine_topk(emb, q, k=5)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
        )
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert got.values.tolist() == exact.values.tolist()


def test_bloom_merge_equals_whole_build(spark):
    from cassandrastack_spark.operators.sketch import bloom_merge

    all_items = [(f"it-{i}",) for i in range(120)]
    whole = spark.createDataFrame(all_items, "g string")
    part_a = spark.createDataFrame(all_items[:80], "g string")
    part_b = spark.createDataFrame(all_items[80:], "g string")
    m = 120 * 12  # shared geometry, sized against the TOTAL
    built = bloom_build(whole, "g", m_bits=m).orderBy("word_idx").toPandas()
    merged = (
        bloom_merge(
            bloom_build(part_a, "g", m_bits=m),
            bloom_build(part_b, "g", m_bits=m),
        )
        .orderBy("word_idx")
        .toPandas()
    )
    assert merged.values.tolist() == built.values.tolist(), (
        "build-then-merge must be bit-identical to one whole build"
    )


def test_bloom_merge_rejects_mismatched_geometry(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from cassandrastack_spark.operators.sketch import bloom_merge

    a = bloom_build(spark.createDataFrame([("x",)], "g string"), "g",
                    m_bits=1024)
    b = bloom_build(spark.createDataFrame([("y",)], "g string"), "g",
                    m_bits=2048)
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        bloom_merge(a, b).collect()


def test_bloom_merge_empty_side_is_identity(spark):
    from cassandrastack_spark.operators.sketch import bloom_merge

    items = spark.createDataFrame([("x",), ("y",)], "g string")
    a = bloom_build(items, "g", m_bits=1024)
    empty = bloom_build(spark.createDataFrame([], "g string"), "g",
                        m_bits=1024)
    merged = bloom_merge(a, empty).orderBy("word_idx").toPandas()
    assert merged.values.tolist() == a.orderBy("word_idx").toPandas().values.tolist()


def test_bloom_persist_roundtrip_probes_identically(spark, tmp_path):
    members = spark.createDataFrame(
        [(f"m-{i}",) for i in range(50)], "g string"
    )
    probes = spark.createDataFrame(
        [(f"m-{i}",) for i in range(50)] + [(f"o-{i}",) for i in range(50)],
        "g string",
    )
    bloom = bloom_build(members, "g")
    path = str(tmp_path / "bloom_idx")
    bloom.write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)
    live = {
        r.g: r.might_contain
        for r in bloom_might_contain(bloom, probes, "g").collect()
    }
    persisted = {
        r.g: r.might_contain
        for r in bloom_might_contain(reread, probes, "g").collect()
    }
    assert live == persisted
    assert all(persisted[f"m-{i}"] for i in range(50))


# ---------------------------------------------------------------- HLL


@pytest.fixture(scope="module")
def hll_items(spark):
    return spark.range(5000).select(
        F.concat(F.lit("item-"), F.col("id")).alias("x")
    )


def test_hll_estimate_within_error_band(spark, hll_items):
    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    est = hll_estimate(hll_build(hll_items, "x", p=12)).collect()[0]
    # p=12 -> sigma ~ 1.04/sqrt(4096) ~ 1.6%; 10% is > 6 sigma
    assert abs(est["est_distinct"] - 5000) / 5000 < 0.10
    assert est["m"] == 4096
    assert 0 < est["nonempty"] <= 4096


def test_hll_duplicates_do_not_move_the_estimate(spark, hll_items):
    from cassandrastack_spark.operators.sketch import hll_build

    once = hll_build(hll_items, "x", p=12)
    thrice = hll_build(
        hll_items.unionAll(hll_items).unionAll(hll_items), "x", p=12
    )
    assert once.exceptAll(thrice).count() == 0
    assert thrice.exceptAll(once).count() == 0


def test_hll_merge_equals_whole_build(spark, hll_items):
    from cassandrastack_spark.operators.sketch import hll_build, hll_merge

    a = hll_items.filter(F.col("x").substr(-1, 1).isin("0", "1", "2"))
    b = hll_items.filter(~F.col("x").substr(-1, 1).isin("0", "1", "2"))
    merged = hll_merge(hll_build(a, "x", p=12), hll_build(b, "x", p=12))
    whole = hll_build(hll_items, "x", p=12)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_merge_rejects_mismatched_precision(spark, hll_items):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cassandrastack_spark.operators.sketch import hll_build, hll_merge

    a = hll_build(hll_items, "x", p=12)
    b = hll_build(hll_items, "x", p=16)
    with pytest.raises(SparkRuntimeException, match="incompatible precision"):
        hll_merge(a, b).collect()


def test_hll_merge_grouped_asserts_per_group_not_globally(spark, hll_items):
    """ADVICE r12: the grouped merge guard partitions its window by the
    group key — each window partition is bounded at 2^p rows whatever
    the group cardinality, and only a WITHIN-group precision mismatch
    (the only kind that can corrupt an estimate) fails."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cassandrastack_spark.operators.sketch import hll_build, hll_merge

    ga = hll_items.select(F.lit("a").alias("g"), "x")
    gb = hll_items.select(F.lit("b").alias("g"), "x")
    # same group, mismatched p -> loud failure
    with pytest.raises(SparkRuntimeException, match="incompatible precision"):
        hll_merge(
            hll_build(ga, "x", p=12, group_cols=("g",)),
            hll_build(ga, "x", p=16, group_cols=("g",)),
            group_cols=("g",),
        ).collect()
    # disjoint groups at different precisions: each group is an
    # independent sketch — the merge and its estimates go through
    from cassandrastack_spark.operators.sketch import hll_estimate

    merged = hll_merge(
        hll_build(ga, "x", p=12, group_cols=("g",)),
        hll_build(gb, "x", p=16, group_cols=("g",)),
        group_cols=("g",),
    )
    est = {r.g: r for r in hll_estimate(merged, group_cols=("g",)).collect()}
    assert est["a"].m == 1 << 12 and est["b"].m == 1 << 16
    for g in ("a", "b"):
        assert abs(est[g].est_distinct - 5000) / 5000 < 0.1


def test_hll_estimate_rejects_mixed_precision_group(spark, hll_items):
    """ADVICE r12: a register table assembled by hand-union (bypassing
    hll_merge) with two precisions in ONE group must fail loud, not
    resolve max(p) to a plausible-looking wrong estimate."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    mixed = hll_build(hll_items, "x", p=12).unionByName(
        hll_build(hll_items, "x", p=16)
    )
    with pytest.raises(SparkRuntimeException, match="mixed precisions"):
        hll_estimate(mixed).collect()


def test_hll_merge_empty_side_is_identity(spark, hll_items):
    from cassandrastack_spark.operators.sketch import hll_build, hll_merge

    a = hll_build(hll_items, "x", p=12)
    empty = hll_build(hll_items.filter(F.lit(False)), "x", p=12)
    merged = hll_merge(a, empty)
    assert merged.exceptAll(a).count() == 0
    assert a.exceptAll(merged).count() == 0


def test_hll_grouped_build_estimates_per_group(spark):
    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    df = spark.range(6000).select(
        (F.col("id") % 2).alias("grp"),
        # group 0 sees 3000 distinct, group 1 sees the same 100 repeated
        F.when(
            F.col("id") % 2 == 0, F.concat(F.lit("u"), F.col("id"))
        ).otherwise(
            F.concat(F.lit("r"), (F.col("id") % 200) / 2)
        ).alias("x"),
    )
    est = (
        hll_estimate(
            hll_build(df, "x", p=12, group_cols=["grp"]), group_cols=["grp"]
        )
        .orderBy("grp")
        .collect()
    )
    assert abs(est[0]["est_distinct"] - 3000) / 3000 < 0.10
    assert abs(est[1]["est_distinct"] - 100) / 100 < 0.10


def test_hll_ignores_nulls_and_rejects_bad_p(spark):
    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "x string"
    )
    est = hll_estimate(hll_build(df, "x", p=12)).collect()[0]
    assert est["nonempty"] <= 2
    assert abs(est["est_distinct"] - 2) < 0.5  # linear counting regime
    for bad in (0, 3, 10, 28):
        with pytest.raises(ValueError, match="multiple of 4"):
            hll_build(df, "x", p=bad)


def test_hll_persist_roundtrip_estimates_identically(spark, tmp_path, hll_items):
    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    reg = hll_build(hll_items, "x", p=12)
    path = str(tmp_path / "hll_registers")
    reg.write.parquet(path)
    live = hll_estimate(reg).collect()[0]
    back = hll_estimate(spark.read.parquet(path)).collect()[0]
    assert live == back


def test_hll_estimate_empty_registers_contract(spark):
    from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

    empty = spark.createDataFrame([], "x string")
    ungrouped = hll_estimate(hll_build(empty, "x", p=12)).collect()
    assert len(ungrouped) == 1
    assert ungrouped[0]["est_distinct"] is None
    assert ungrouped[0]["nonempty"] == 0
    grouped = hll_estimate(
        hll_build(
            empty.withColumn("g", F.lit(1)), "x", p=12, group_cols=["g"]
        ),
        group_cols=["g"],
    ).collect()
    assert grouped == []


def test_hll_estimate_range_corrections(spark):
    """The large-range collision correction engages above 2^(p+28)/30
    and inflates raw (−2^L·ln(1−x) > x·2^L); a fully saturated sketch
    (raw ≥ the hash space) resolves to a loud null, never NaN."""
    from cassandrastack_spark.operators.sketch import hll_estimate

    # every bucket at rank 24: raw = alpha·m·2^24 ≈ 4.96e10, inside
    # (2^40/30, 2^40) -> correction branch, finite and above raw
    big = spark.range(4096).select(
        F.col("id").cast("int").alias("bucket"),
        F.lit(24).alias("maxrank"),
        F.lit(12).alias("p"),
    )
    est = hll_estimate(big).collect()[0]["est_distinct"]
    alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
    raw = alpha * 4096.0 * 4096.0 / (4096.0 * 2.0 ** -24)
    assert est == est and est is not None  # finite, not NaN
    assert raw < est < 2.0 ** 40
    # every bucket pinned at the max rank 29: raw > 2^40 -> null
    sat = spark.range(4096).select(
        F.col("id").cast("int").alias("bucket"),
        F.lit(29).alias("maxrank"),
        F.lit(12).alias("p"),
    )
    assert hll_estimate(sat).collect()[0]["est_distinct"] is None


# ---------------------------------------------------------------------------
# Count-Min sketch (cm_build / cm_merge / cm_estimate)
# ---------------------------------------------------------------------------

from cassandrastack_spark.operators.sketch import (  # noqa: E402
    cm_build,
    cm_estimate,
    cm_merge,
)


def test_cm_never_undercounts_and_is_tight_when_uncrowded(spark, skewed):
    # 202 distinct keys into 4096x3 cells: collisions are possible but
    # the estimate must NEVER be below the exact count, and for the two
    # heavy keys the min-over-rows estimate is exact on this fixture
    # (md5 positions are fixed -> pinned values, not a flaky sample)
    cm = cm_build(skewed, "key")
    exact = {
        r.key: r.cnt
        for r in skewed.groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    est = {
        r.key: r.est_count
        for r in cm_estimate(
            cm, skewed.select("key").distinct(), "key"
        ).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] >= exact[k], f"{k}: CM undercounted"
    assert est["hot"] == 500 and est["warm"] == 120
    # total overestimate across all keys is bounded well under the
    # design ceiling d * N (every collision adds at most a colliding
    # key's full count to one row; min-over-rows discards most)
    assert sum(est.values()) - sum(exact.values()) <= 0.01 * sum(exact.values())


def test_cm_weighted_build_sums_weights(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "key string, wgt int"
    )
    cm = cm_build(df, "key", weight_col="wgt")
    est = {
        r.key: r.est_count
        for r in cm_estimate(
            cm, df.select("key").distinct(), "key"
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 7


def test_cm_merge_equals_whole_build(spark, skewed):
    a = skewed.filter(F.col("key").startswith("t"))
    b = skewed.filter(~F.col("key").startswith("t"))
    merged = cm_merge(cm_build(a, "key"), cm_build(b, "key"))
    whole = cm_build(skewed, "key")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cm_merge_rejects_mismatched_geometry(spark, skewed):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    a = cm_build(skewed, "key", width=1024)
    b = cm_build(skewed, "key", width=2048)
    with pytest.raises(SparkRuntimeException, match="incompatible sketch"):
        cm_merge(a, b).collect()


def test_cm_merge_empty_side_is_identity(spark, skewed):
    a = cm_build(skewed, "key")
    empty = cm_build(skewed.filter(F.lit(False)), "key")
    merged = cm_merge(a, empty)
    assert merged.exceptAll(a).count() == 0
    assert a.exceptAll(merged).count() == 0


def test_cm_persistence_round_trip(spark, skewed, tmp_path):
    cm = cm_build(skewed, "key")
    p = str(tmp_path / "cm")
    cm.write.parquet(p)
    reread = spark.read.parquet(p)
    before = {
        r.key: r.est_count
        for r in cm_estimate(cm, skewed.select("key").distinct(), "key").collect()
    }
    after = {
        r.key: r.est_count
        for r in cm_estimate(
            reread, skewed.select("key").distinct(), "key"
        ).collect()
    }
    assert before == after


def test_cm_empty_sketch_and_null_probes_estimate_zero(spark, skewed):
    empty = cm_build(skewed.filter(F.lit(False)), "key")
    probes = spark.createDataFrame([("x",), (None,)], "key string")
    got = {
        r.key: r.est_count
        for r in cm_estimate(empty, probes, "key").collect()
    }
    assert got["x"] == 0 and got[None] == 0
    # null INPUT rows are ignored by the build too
    withnull = spark.createDataFrame([("a",), (None,)], "key string")
    cm = cm_build(withnull, "key")
    est = {
        r.key: r.est_count for r in cm_estimate(cm, withnull, "key").collect()
    }
    assert est["a"] >= 1 and est[None] == 0


def test_cm_rejects_bad_params(spark, skewed):
    with pytest.raises(ValueError, match="depth"):
        cm_build(skewed, "key", depth=9)
    with pytest.raises(ValueError, match="width"):
        cm_build(skewed, "key", width=0)


def test_hll_merge_mismatch_cannot_hide_behind_shared_bucket_ids(spark):
    """Review r13: the old guard checked the post-merge per-bucket
    max(p), so a p=12/p=16 merge whose bucket IDS happen to coincide
    passed silently and mixed rank words computed at different hex
    offsets. "x1" at p=12 and "y16104" at p=16 both land in bucket
    1755 (found by search over md5); the guard must still fire."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from cassandrastack_spark.operators.sketch import hll_build, hll_merge

    a = hll_build(spark.createDataFrame([("x1",)], "x string"), "x", p=12)
    b = hll_build(spark.createDataFrame([("y16104",)], "x string"), "x", p=16)
    assert a.select("bucket").collect() == b.select("bucket").collect()
    with pytest.raises(SparkRuntimeException, match="incompatible precision"):
        hll_merge(a, b).collect()


def test_cm_estimate_rejects_mixed_geometry_union(spark, skewed):
    """Review r13: a hand-union of two sketches with different widths
    probed at max(w)'s modulus MISSES the smaller sketch's cells and
    UNDERCOUNTS — the one error CM must never make. Loud, not wrong."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    mixed = cm_build(skewed, "key", width=1024).unionByName(
        cm_build(skewed, "key", width=2048)
    )
    with pytest.raises(SparkRuntimeException, match="mixed sketch"):
        cm_estimate(mixed, skewed.select("key").distinct(), "key").collect()


# ---------------------------------------------------------------------------
# bottom-k sample (deterministic mergeable quantile summary)


@pytest.fixture(scope="module")
def bk_rows(spark):
    # two groups, distinct value shapes: g0 uniform over 0..99, g1
    # skewed quadratic — 2000 row-unique keys
    rows = [(i, "g0", float((i * 37) % 100)) for i in range(1000)] + [
        (1000 + i, "g1", float(((i * i) % 100))) for i in range(1000)
    ]
    return spark.createDataFrame(rows, "id long, g string, val double")


def test_bottomk_sample_merge_equals_whole_build(spark, bk_rows):
    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_merge,
    )

    whole = bottomk_sample_build(bk_rows, "val", "id", k=128, group_cols=["g"])
    a = bottomk_sample_build(
        bk_rows.filter("id % 3 != 0"), "val", "id", k=128, group_cols=["g"]
    )
    b = bottomk_sample_build(
        bk_rows.filter("id % 3 = 0"), "val", "id", k=128, group_cols=["g"]
    )
    merged = bottomk_sample_merge(a, b, group_cols=["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bottomk_sample_merge_is_idempotent(spark, bk_rows):
    # the replay property the streaming monitor's marker thrift rests
    # on: a batch merged twice changes nothing
    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_merge,
    )

    a = bottomk_sample_build(bk_rows, "val", "id", k=64, group_cols=["g"])
    again = bottomk_sample_merge(a, a, group_cols=["g"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, a.collect())
    )


def test_bottomk_sample_deterministic_across_partitionings(spark, bk_rows):
    from cassandrastack_spark.operators.sketch import bottomk_sample_build

    one = bottomk_sample_build(
        bk_rows.repartition(1), "val", "id", k=128, group_cols=["g"]
    )
    many = bottomk_sample_build(
        bk_rows.repartition(17, "val"), "val", "id", k=128, group_cols=["g"]
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_bottomk_sample_quantiles_within_rank_error(spark, bk_rows):
    import math

    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_quantiles,
    )

    k = 256
    s = bottomk_sample_build(bk_rows, "val", "id", k=k, group_cols=["g"])
    got = {
        (r.g, r.p): r.q
        for r in bottomk_sample_quantiles(
            s, (0.25, 0.5, 0.9), group_cols=["g"]
        ).collect()
    }
    vals = {"g0": [], "g1": []}
    for r in bk_rows.collect():
        vals[r.g].append(r.val)
    for g, vs in vals.items():
        vs.sort()
        n = len(vs)
        for p in (0.25, 0.5, 0.9):
            exact = vs[max(1, math.ceil(p * n)) - 1]
            # rank-space error ~sqrt(p(1-p)/k); 4 sigma in value space
            # via the local density of these ~uniform-ish fixtures
            sigma_rank = math.sqrt(p * (1 - p) / k)
            tol_idx = int(4 * sigma_rank * n) + 1
            lo = vs[max(0, max(1, math.ceil(p * n)) - 1 - tol_idx)]
            hi = vs[min(n - 1, max(1, math.ceil(p * n)) - 1 + tol_idx)]
            assert lo <= got[(g, p)] <= hi, (g, p, got[(g, p)], exact)


def test_bottomk_sample_small_input_is_exact(spark):
    # n <= k: the "sample" is the whole data, quantiles are exact
    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "id long, val double",
    )
    s = bottomk_sample_build(df, "val", "id", k=100)
    assert s.count() == 5
    got = {
        r.p: r.q
        for r in bottomk_sample_quantiles(s, (0.2, 0.5, 1.0)).collect()
    }
    assert got == {0.2: 1.0, 0.5: 5.0, 1.0: 9.0}


def test_bottomk_sample_drops_nulls_and_validates(spark, bk_rows):
    from cassandrastack_spark.operators.sketch import (
        bottomk_sample_build,
        bottomk_sample_merge,
        bottomk_sample_quantiles,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (None, 2.0), (3, None), (4, 4.0), (5, float("nan"))],
        "id long, val double",
    )
    s = bottomk_sample_build(df, "val", "id", k=10)
    # NULL key, NULL value, and NaN value all dropped (review r14: a
    # sampled NaN would persist forever — hash membership — and Spark
    # orders NaN above every double, permanently poisoning every high
    # quantile the monitor reports)
    assert sorted(r.v for r in s.collect()) == [1.0, 4.0]
    with pytest.raises(ValueError, match="k must be"):
        bottomk_sample_build(df, "val", "id", k=0)
    with pytest.raises(ValueError, match="probs"):
        bottomk_sample_quantiles(s, (0.0,))
    with pytest.raises(ValueError, match="probs"):
        bottomk_sample_quantiles(s, ())
    # mixed k within one merge refuses loudly, in-plan
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    a = bottomk_sample_build(bk_rows, "val", "id", k=32, group_cols=["g"])
    b = bottomk_sample_build(bk_rows, "val", "id", k=64, group_cols=["g"])
    with pytest.raises(SparkRuntimeException, match="mixed k"):
        bottomk_sample_merge(a, b, group_cols=["g"]).collect()


# ---------------------------------------------------------------------------
# weighted sample (Efraimidis-Spirakis bottom-k as a mergeable summary)


@pytest.fixture(scope="module")
def ws_rows(spark):
    # two groups; weights span 3 orders of magnitude
    rows = [
        (i, f"g{i % 2}", float(1 + (i * 7) % 100) / 10.0) for i in range(800)
    ]
    return spark.createDataFrame(rows, "id long, g string, wt double")


def test_weighted_sample_merge_equals_whole_build(spark, ws_rows):
    from cassandrastack_spark.operators.sketch import (
        weighted_sample_build,
        weighted_sample_merge,
    )

    whole = weighted_sample_build(ws_rows, "id", "wt", k=64, group_cols=["g"])
    a = weighted_sample_build(
        ws_rows.filter("id % 3 != 0"), "id", "wt", k=64, group_cols=["g"]
    )
    b = weighted_sample_build(
        ws_rows.filter("id % 3 = 0"), "id", "wt", k=64, group_cols=["g"]
    )
    merged = weighted_sample_merge(a, b, group_cols=["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # and merging a sample with itself is the identity (replay law)
    again = weighted_sample_merge(a, a, group_cols=["g"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, a.collect())
    )


def test_weighted_sample_matches_python_selection_model(spark, ws_rows):
    # the SELECTED ITEM SET must equal the pure-python A-ES model's
    # (compare selections, not float key equality — ln differs at the
    # ulp between libms, which can never flip md5-spread orderings but
    # could fail an == on the keys themselves)
    import hashlib
    import math

    from cassandrastack_spark.operators.sketch import weighted_sample_build

    k = 48
    got = {}
    for r in weighted_sample_build(
        ws_rows, "id", "wt", k=k, group_cols=["g"]
    ).collect():
        got.setdefault(r.g, set()).add(r.item)
        assert r.k == k and r.w > 0
    want = {}
    for row in ws_rows.collect():
        hx = hashlib.md5(str(row.id).encode()).hexdigest()
        u = (int(hx[:8], 16) + 1) / 4294967297.0
        e = -math.log(u) / row.wt
        want.setdefault(row.g, []).append((e, str(row.id)))
    want = {g: {it for _, it in sorted(v)[:k]} for g, v in want.items()}
    assert got == want


def test_weighted_sample_favors_heavy_weights(spark):
    from cassandrastack_spark.operators.sketch import weighted_sample_build

    rows = [(i, 1.0) for i in range(500)] + [(9999, 1e6)]
    df = spark.createDataFrame(rows, "id long, wt double")
    s = weighted_sample_build(df, "id", "wt", k=10)
    items = {r.item for r in s.collect()}
    # e_heavy = -ln(u)/1e6 is ~6 orders below any weight-1 key: the
    # heavy item always survives (the A-ES inclusion law on this
    # deterministic fixture)
    assert "9999" in items and len(items) == 10


def test_weighted_sample_unstable_weight_keeps_one_row(spark):
    """The documented unstable-weight contract (VERDICT r14 #5, ahead
    of stream_weighted_sample's r16 registration): determinism and
    merge == whole-build hold only while a key's weight is FIXED; a
    key re-ingested with a CHANGED weight keeps exactly ONE
    partition-order-arbitrary row (the retake dedups on the key) —
    never two rows, never a crash, and the stable-weight keys are
    untouched by the conflict whichever row survives."""
    from cassandrastack_spark.operators.sketch import (
        weighted_sample_build,
        weighted_sample_merge,
    )

    stable = [(i, float(1 + i)) for i in range(1, 9)]
    # key 100 arrives in batch A with weight 2.0, in batch B re-ingested
    # with weight 50.0 — the upstream mistake the contract documents
    batch_a = spark.createDataFrame(
        stable[:4] + [(100, 2.0)], "id long, wt double"
    )
    batch_b = spark.createDataFrame(
        stable[4:] + [(100, 50.0)], "id long, wt double"
    )
    a = weighted_sample_build(batch_a, "id", "wt", k=32)
    b = weighted_sample_build(batch_b, "id", "wt", k=32)
    # k=32 keeps every item, isolating the dedup behavior from the
    # cutoff (an unstable key's surviving e can legitimately shift
    # which OTHER items make a tight cutoff — that indeterminism is
    # exactly why the contract demands stable weights)
    for merged in (
        weighted_sample_merge(a, b).collect(),
        weighted_sample_merge(b, a).collect(),
    ):
        conflicted = [r for r in merged if r.item == "100"]
        assert len(conflicted) == 1  # keep-one, never both
        assert conflicted[0].w in (2.0, 50.0)  # one of the ingested rows
        # every stable key survives with its exact (e, w) — the
        # conflict never leaks into fixed-weight rows
        stable_got = sorted(
            (r.item, r.w) for r in merged if r.item != "100"
        )
        assert stable_got == sorted(
            (str(i), w) for i, w in stable
        )
    # and merge == whole-build still holds on the stable subset: the
    # union's sample minus the conflicted key equals a build over the
    # stable rows alone
    whole_stable = weighted_sample_build(
        spark.createDataFrame(stable, "id long, wt double"),
        "id", "wt", k=32,
    )
    merged_stable = sorted(
        map(tuple, weighted_sample_merge(a, b).filter(
            "item != '100'"
        ).collect())
    )
    assert merged_stable == sorted(map(tuple, whole_stable.collect()))


def test_weighted_sample_drops_bad_weights_and_validates(spark):
    from cassandrastack_spark.operators.sketch import (
        weighted_sample_build,
        weighted_sample_merge,
    )
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [
            (1, 1.0),
            (2, 0.0),            # non-positive: no A-ES key
            (3, -2.0),
            (4, None),
            (None, 5.0),
            (6, float("nan")),
            (7, 2.0),
        ],
        "id long, wt double",
    )
    s = weighted_sample_build(df, "id", "wt", k=10)
    assert sorted(r.item for r in s.collect()) == ["1", "7"]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_build(df, "id", "wt", k=0)
    a = weighted_sample_build(df, "id", "wt", k=4)
    b = weighted_sample_build(df, "id", "wt", k=8)
    with pytest.raises(SparkRuntimeException, match="mixed k"):
        weighted_sample_merge(a, b).collect()
