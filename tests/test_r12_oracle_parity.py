"""Local oracle parity for the two r11-staged, r12-registered queries
(graph_triangle_count, text_bigram_logprob).

History: in round 11 this file held the queries' EXACT oracle SQL and
Spark plans, validated green against DuckDB at sf0.001 one round
BEFORE registration (the staged-query discipline). Round 12 lifted
both verbatim into @register; this test now reads the REGISTERED
QueryDefs — fn and oracle string — and replays the driver's own
comparison (columns by name, rows sorted, doubles pre-rounded in the
query contract itself), so any future drift between the registered
plan and the validated oracle goes red here before the driver sees it.
"""

import duckdb
import pytest

from cassandrastack_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _compare(spark, duck, qd):
    got = qd.fn(spark, SF).toPandas()
    want = duck.execute(qd.oracle).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_triangle_count_matches_registered_oracle(spark, duck, registry):
    qd = registry["graph_triangle_count"]
    got = qd.fn(spark, SF).toPandas()
    assert got["triangles"].sum() > 0, "fixture graph has no triangles"
    _compare(spark, duck, qd)


def test_bigram_logprob_matches_registered_oracle(spark, duck, registry):
    _compare(spark, duck, registry["text_bigram_logprob"])
