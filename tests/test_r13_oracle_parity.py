"""Oracle parity for the r12-staged, r13-registered queries
(corpus_score_winsorize, corpus_score_quantile_norm,
ann_matryoshka_recall, decontam_bloom_indexed).

History: in round 12 this file held the queries' EXACT oracle SQL and
Spark plans, validated green against DuckDB at sf0.001 one round
BEFORE registration (the staged-query discipline). The r12 VERDICT
then caught the quantile-norm gate FLAKY in its sharded suite run —
order-dependent double AVG of the grid-cell reference plus a missing
rank tie-break — and it was stabilized (exact DECIMAL sum + doc_id
tie-break on BOTH engines, functions/stats.py) and re-validated 10/10
before registration. Round 13 lifted all four verbatim into @register;
this test now reads the REGISTERED QueryDefs — fn and oracle string —
and replays the driver's own comparison (columns by name, rows sorted,
doubles pre-rounded in the query contract itself), so any future drift
between the registered plan and the validated oracle goes red here
before the driver sees it.

`stream_bloom_dedup`, the fifth r12-staged operator, registered under
the stream_* rows-only check — its multi-batch semantics are pinned in
tests/test_streaming.py and need no SQL oracle here.
"""

import duckdb
import pytest

from cassandrastack_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
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


def test_corpus_score_winsorize_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["corpus_score_winsorize"])
    # fences must actually clamp something on the fixture (a no-op
    # winsorize would validate nothing)
    assert (got["score_w"] != got["score"]).any()


def test_corpus_score_quantile_norm_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["corpus_score_quantile_norm"])
    # normalization must actually move scores on the fixture
    assert (got["score_qn"] != got["score"]).any()


def test_ann_matryoshka_recall_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["ann_matryoshka_recall"])
    assert len(got) == 10


def test_decontam_bloom_indexed_matches_shared_registered_oracle(
    spark, duck, registry
):
    qd = registry["decontam_bloom_indexed"]
    probe = registry["decontam_bloom_probe"]
    assert qd.oracle == probe.oracle, "the twins must share ONE oracle"
    got = _compare(spark, duck, qd)
    # and the persisted+merged path must equal the raw twin exactly
    raw = probe.fn(spark, SF).toPandas()
    for col in got.columns:
        assert got[col].tolist() == raw[col].tolist(), col
