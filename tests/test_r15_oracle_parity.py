"""Oracle parity for the r13-staged, r15-registered queries
(token_freq_cm, stream_hot_keys, corpus_score_drift_psi).

History: from round 13 this file held the three staged queries' EXACT
oracle SQL and Spark plans, validated green against DuckDB at sf0.001
AND sf0.01 one round BEFORE registration (the staged-query
discipline; r14's slots were spoken for by its own staged trio + the
r10 debt cohort, so these waited for r15). Round 15 lifted all three
verbatim into @register (token_freq_cm + corpus_score_drift_psi in
queries/llm.py, stream_hot_keys in queries/streaming.py — with the
staged `assert q.awaitTermination(...)` replaced by an explicit
raise, per ADVICE r14: an assert-wrapped side effect disappears under
python -O); this test now reads the REGISTERED QueryDefs — fn and
oracle string — and replays the driver's own comparison (columns by
name, rows ordered by the query contract itself), so any future drift
between the registered plan and the validated oracle goes red here
before the driver sees it. The staged accuracy properties (CM
never-undercount + both regimes exercised, PSI non-negativity and
two-sided coverage) carried over as assertions on the registered rows.
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


def test_token_freq_cm_matches_registered_oracle(spark, duck, registry):
    got = _compare(spark, duck, registry["token_freq_cm"])
    # BOTH CM regimes must be exercised on the fixture, not just
    # replicated: never an estimate below exact; some probes land in
    # uncrowded cells (est == exact) and some carry the collision
    # overhang (est > exact) — width=32 against the fixture's 31-token
    # vocabulary pins 24 exact / 7 overhang deterministically (md5
    # positions are fixed; an exact-only result would validate nothing
    # a plain count wouldn't, an overhang-only result would mean the
    # sketch is undersized for its key set)
    assert (got["est_count"] >= got["exact_count"]).all()
    assert (got["est_count"] > got["exact_count"]).any()
    assert (got["est_count"] == got["exact_count"]).any()


def test_stream_hot_keys_matches_registered_oracle(spark, duck, registry):
    got = _compare(spark, duck, registry["stream_hot_keys"])
    # never undercount; width=64 against 100 distinct props guarantees
    # collisions, so the overhang regime is exercised too
    assert (got["est_count"] >= got["exact_count"]).all()
    assert (got["est_count"] > got["exact_count"]).any()


def test_corpus_score_drift_psi_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["corpus_score_drift_psi"])
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0 — so the value is
    # non-negative always, and on this fixture strictly positive
    # (sampling noise moves bins). Magnitudes here are LARGE (0.3-4)
    # and correctly so: 25 docs per side per source across 10 bins
    # means empty bins hit the eps floor, which dominates at tiny n —
    # the production reading bands (0.1/0.25) apply to snapshot-sized
    # samples, and the gate's value is the bit-exact parity above,
    # which pins the arithmetic either way. Both counts must cover
    # every source (the md5 split is decorrelated from source —
    # doc_id parity was NOT, and produced one-sided groups).
    assert (got["psi"] >= 0.0).all()
    assert (got["psi"] > 0.0).any()
    assert (got["n_expected"] > 0).all() and (got["n_observed"] > 0).all()
