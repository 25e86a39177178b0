"""Misra-Gries heavy-hitter candidates: the classic guarantee against
exact counts, the bounded-output contract, and the two registered
r11 queries (text_heavy_hitters_sketch, ann_index_extend_probe)
pinned to their exact twins on the same data.
"""

import pytest

from pyspark.sql import functions as F

from cassandrastack_spark.operators.sketch import mg_candidates

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
