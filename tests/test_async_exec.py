"""R5 parity: async submission + blocking join (server.py:98-101)."""

from cassandrastack_spark.operators.async_exec import execute_async
from cassandrastack_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def test_execute_async_returns_future_with_rows(spark):
    nations = read_table(spark, SF, "nation")
    expected = sorted(r.n_name for r in nations.collect())[:3]
    fut = execute_async(nations.select("n_name").orderBy("n_name").limit(3))
    rows = fut.result()  # blocks, like future.result() in the reference
    assert [r["n_name"] for r in rows] == expected


def test_execute_async_concurrent_queries_overlap(spark):
    f1 = execute_async(read_table(spark, SF, "region"), lambda d: d.count())
    f2 = execute_async(read_table(spark, SF, "nation"), lambda d: d.count())
    f3 = execute_async(read_table(spark, SF, "customer"), lambda d: d.count())
    assert f1.result() == 5
    assert f2.result() == 25
    assert f3.result() > 0
