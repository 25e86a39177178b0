"""Oracle parity for the r13-staged, r14-registered queries
(distinct_tokens_hll, corpus_source_kl, corpus_source_overlap) and the
r14-built stream_monitor_distinct_count.

History: in round 13 this file held the three staged queries' EXACT
oracle SQL and Spark plans, validated green against DuckDB at sf0.001
AND sf0.01 one round BEFORE registration (the staged-query
discipline). Round 14 lifted all three verbatim into @register
(queries/llm.py) and added the HLL-monitor stream row
(queries/streaming.py) under the same register-rebuild oracle
arithmetic; this test now reads the REGISTERED QueryDefs — fn and
oracle string — and replays the driver's own comparison (columns by
name, rows sorted, doubles pre-rounded in the query contract itself),
so any future drift between the registered plan and the validated
oracle goes red here before the driver sees it. The staged accuracy
properties (sketch error bounds, KL non-triviality, overlap error vs
union sigma) carried over as assertions on the registered rows.
"""

import duckdb
import pytest

from cassandrastack_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events"):
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
    return got


def test_distinct_tokens_hll_matches_registered_oracle(spark, duck, registry):
    got = _compare(spark, duck, registry["distinct_tokens_hll"])
    # the sketch must actually be accurate on the fixture, not merely
    # reproducible: every per-source estimate within 10% of exact
    # (p=12 sigma is ~1.6%; 10% is > 6 sigma)
    rel = (got["est_distinct"] - got["exact_distinct"]).abs() / got[
        "exact_distinct"
    ]
    assert (rel < 0.10).all(), rel.max()


def test_corpus_source_kl_matches_registered_oracle(spark, duck, registry):
    got = _compare(spark, duck, registry["corpus_source_kl"])
    # KL is non-negative, and the fixture's sources genuinely diverge
    # from the mixture (an all-zeros column would validate nothing)
    assert (got["kl_nats"] >= 0).all()
    assert (got["kl_nats"] > 0).any()


def test_corpus_source_overlap_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["corpus_source_overlap"])
    assert len(got) == 190
    # accuracy property: intersection error scales with the UNION
    # (inclusion-exclusion of three ~1.6%-sigma estimates) — 5% of the
    # union is > 3 combined sigma; and the matrix must be non-trivial
    err = (got["est_overlap"] - got["exact_overlap"]).abs()
    assert (err / got["est_union"] < 0.05).all()
    assert (got["exact_overlap"] > 0).any()


def test_stream_monitor_distinct_count_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["stream_monitor_distinct_count"])
    assert len(got) == 1
    # linear-counting regime at fixture cardinality: the estimate must
    # be essentially exact, not merely reproducible
    rel = (
        abs(got["est_distinct"].iloc[0] - got["exact_distinct"].iloc[0])
        / got["exact_distinct"].iloc[0]
    )
    assert rel < 0.10, rel
