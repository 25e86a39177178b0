"""Oracle parity for the r14-staged, r16-registered queries
(quantiles_sample_sketch, stream_quantile_sample, stream_psi_alarm,
stream_weighted_sample).

History: from round 14 this file held the four staged queries' EXACT
oracle SQL and Spark plans, validated green against DuckDB at sf0.001
AND sf0.01 one round BEFORE registration (the staged-query
discipline; r15's slots were spoken for by its own staged trio + the
r11 debt cohort, so these waited for r16). Round 16 lifted all four
verbatim into @register (quantiles_sample_sketch in queries/llm.py,
the three stream rows in queries/streaming.py — with the staged
`assert q.awaitTermination(...)` replaced by an explicit raise, per
ADVICE r14: an assert-wrapped side effect disappears under
python -O); this test now reads the REGISTERED QueryDefs — fn and
oracle string — and replays the driver's own comparison (columns by
name, rows ordered by the query contract itself), so any future
drift between the registered plan and the validated oracle goes red
here before the driver sees it. The staged accuracy properties
(quantile rank-error bounds, PSI non-negativity + two-sided
coverage, A-ES weight-bias inclusion) carried over as assertions on
the registered rows.
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


def test_quantiles_sample_sketch_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["quantiles_sample_sketch"])
    # the sample must actually estimate, not merely reproduce: every
    # estimate within 15% of the exact quantile in rank-error terms —
    # the fixture's length spread makes value-relative checks fair
    rel = (got["q"] - got["exact_q"]).abs() / got["exact_q"].abs().clip(
        lower=1.0
    )
    assert (rel < 0.15).all(), rel.max()


def test_stream_quantile_sample_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["stream_quantile_sample"])
    rel = (got["q"] - got["exact_q"]).abs() / got["exact_q"].abs().clip(
        lower=1.0
    )
    assert (rel < 0.25).all(), rel.max()


def test_stream_psi_alarm_matches_registered_oracle(spark, duck, registry):
    got = _compare(spark, duck, registry["stream_psi_alarm"])
    # the halves are iid samples of the same distribution, so PSI is
    # small-but-positive (sampling noise); an all-zero column would
    # validate nothing, a huge one would mean the halves are broken
    assert (got["psi"] >= 0).all()
    assert (got["psi"] > 0).any()
    assert (got["n_expected"] > 0).all() and (got["n_observed"] > 0).all()


def test_stream_weighted_sample_matches_registered_oracle(
    spark, duck, registry
):
    got = _compare(spark, duck, registry["stream_weighted_sample"])
    # the sample is genuinely weight-biased on this fixture: the mean
    # weight of selected rows must exceed the population mean (A-ES
    # inclusion is exponential in w) per event_type
    events = duck.execute(
        "SELECT event_type, AVG(value) AS mw FROM events GROUP BY 1"
    ).df().set_index("event_type")["mw"]
    sel = got.groupby("event_type")["w"].mean()
    assert (sel > events.loc[sel.index]).all()
