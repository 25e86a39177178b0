"""Guardrail tests: skew detection, partition stats, small-file report,
and the programmatic plan lints."""

from pyspark.sql import functions as F

from cassandrastack_spark.plans.guardrails import (
    Guardrails,
    partition_stats,
    plan_lints,
    skew_report,
    table_file_stats,
)
from cassandrastack_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def test_skew_detection_flags_hot_key(spark):
    # 1000 rows on key 0, ~10 on each other key -> ratio >> 5
    df = spark.range(2000).select(
        F.when(F.col("id") < 1000, 0).otherwise((F.col("id") % 100) + 1).alias("k")
    )
    guard = Guardrails()
    rep = skew_report(df, ["k"], guard)
    assert rep["skewed"] and rep["max_rows"] == 1000
    assert guard.warnings and "salt" in guard.warnings[0]


def test_skew_report_clean_on_uniform(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    rep = skew_report(df, ["k"])
    assert not rep["skewed"] and rep["n_keys"] == 100


def test_partition_stats_orders_by_size(spark):
    e = read_table(spark, SF, "events")
    top = partition_stats(e, ["user_id"], top_n=5).collect()
    assert len(top) == 5
    sizes = [r.approx_bytes for r in top]
    assert sizes == sorted(sizes, reverse=True)
    assert all(r.n_rows > 0 for r in top)


def test_table_file_stats_counts_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 12 appends of tiny frames -> 12+ small files
    for i in range(12):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(path)
    guard = Guardrails()
    rep = table_file_stats(spark, path, guard)
    assert rep["n_files"] >= 12
    assert rep["small_ratio"] == 1.0
    assert guard.warnings and "compact()" in guard.warnings[0]


def test_plan_lints_pushdown_and_broadcast(spark):
    c = read_table(spark, SF, "customer").filter(F.col("c_acctbal") > 1000)
    n = read_table(spark, SF, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_name", "n_name"
    )
    lints = plan_lints(joined, execute=True)
    assert any("GreaterThan(c_acctbal" in p for p in lints["pushed_filters"])
    assert set(lints["read_columns"]) >= {"c_name", "c_nationkey", "n_name"}
    assert "c_mktsegment" not in lints["read_columns"], "column pruning failed"
    assert lints["n_broadcasts"] == 1
    assert lints["whole_stage_codegen"]
    assert not lints["has_bnl_join"]


def test_plan_lints_flags_shuffle_join(spark):
    o = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem")
    fact_join = li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey")
    lints = plan_lints(fact_join)
    assert lints["n_shuffles"] >= 2 or lints["n_broadcasts"] >= 1
