"""Pre-validated oracle parity for the r13-staged, r15-registering
query (the staged-query discipline test_r12/r13/r14_oracle_parity
document; r14's registration slots are already spoken for by its own
staged trio + the r11 debt cohort, so this one waits for r15):
`token_freq_cm` — per-token frequency estimates from a Count-Min
sketch (operators/sketch.py cm_build / cm_estimate), the fixed-state
answer to "about how often does THIS key occur" when the key space
(tokens, n-grams, URLs) is too large to count exactly.

The EXACT oracle SQL and the EXACT Spark plan live here, validated
green against DuckDB at sf0.001 and sf0.01 ahead of registration; the
registering round lifts both verbatim into @register and flips this
file to reading the registered QueryDef.

The oracle rebuilds the sketch BIT-FOR-BIT: cell positions are the
Bloom layout's md5-hex slices (portable string ops), cell counts are
integer sums, and the estimate is an integer min — no floats anywhere,
so the hash gate pins the whole artifact, not just the answers. The
exact count rides along, gating BOTH guarantees: est_count >=
exact_count always (never undercounts), and the overcount is the
design-bounded collision overhang, reproduced exactly.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

TOKEN_FREQ_CM_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    rows_off AS (SELECT * FROM (VALUES (0, 1), (1, 8), (2, 15)) t(r, off)),
    cells AS (
        SELECT r.r AS row,
               CAST(list_sum(list_transform(generate_series(1, 7),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(tok), off + i - 1, 1)) - 1)
                        * 16 ** (7 - i))) AS BIGINT) % 32 AS col,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks, rows_off r
        GROUP BY 1, 2),
    probes AS (
        SELECT DISTINCT tok FROM toks WHERE doc_id % 20 = 0),
    ppos AS (
        SELECT tok, r.r AS row,
               CAST(list_sum(list_transform(generate_series(1, 7),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(tok), off + i - 1, 1)) - 1)
                        * 16 ** (7 - i))) AS BIGINT) % 32 AS col
        FROM probes, rows_off r),
    est AS (
        SELECT tok, MIN(COALESCE(c.cnt, 0)) AS est_count
        FROM ppos LEFT JOIN cells c USING (row, col)
        GROUP BY tok),
    exact AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM toks GROUP BY tok)
    SELECT e.tok, e.est_count, x.exact_count
    FROM est e JOIN exact x USING (tok)
    ORDER BY e.tok
"""


def token_freq_cm_spark(spark, sf_dir):
    """The exact plan that registers in r15 (lift verbatim)."""
    from cassandrastack_spark.operators.sketch import cm_build, cm_estimate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cm = cm_build(toks, "tok", width=32, depth=3)
    probes = (
        toks.filter(F.col("doc_id") % 20 == 0).select("tok").distinct()
    )
    exact = toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("exact_count")
    )
    return (
        cm_estimate(cm, probes, "tok")
        .join(exact, "tok")
        .select("tok", "est_count", "exact_count")
        .orderBy("tok")
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    yield con
    con.close()


def test_token_freq_cm_matches_staged_oracle(spark, duck):
    got = token_freq_cm_spark(spark, SF).toPandas()
    want = duck.execute(TOKEN_FREQ_CM_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
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


# The second staged r15 query: `stream_hot_keys` — the monitor_hot_keys
# Count-Min state resolved to per-key frequency estimates. Uniquely
# among stream_* candidates this one is FULLY oracle-capable (the
# distinct_tokens_hll precedent): each ingested row sums into the cell
# table exactly once whatever the micro-batch boundaries (checkpoint
# exactly-once within a run; addition is associative), so the merged
# state is bit-identical to one batch cm_build and the estimate math
# is the same portable-SQL min-of-cells token_freq_cm's oracle uses.
STREAM_HOT_KEYS_ORACLE = """
    WITH rows_off AS (SELECT * FROM (VALUES (0, 1), (1, 8), (2, 15)) t(r, off)),
    cells AS (
        SELECT r.r AS row,
               CAST(list_sum(list_transform(generate_series(1, 7),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(props), off + i - 1, 1)) - 1)
                        * 16 ** (7 - i))) AS BIGINT) % 64 AS col,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events, rows_off r
        WHERE props IS NOT NULL
        GROUP BY 1, 2),
    probes AS (SELECT DISTINCT props FROM events WHERE props IS NOT NULL),
    ppos AS (
        SELECT props, r.r AS row,
               CAST(list_sum(list_transform(generate_series(1, 7),
                   i -> (strpos('0123456789abcdef',
                                substr(md5(props), off + i - 1, 1)) - 1)
                        * 16 ** (7 - i))) AS BIGINT) % 64 AS col
        FROM probes, rows_off r),
    est AS (
        SELECT props, MIN(COALESCE(c.cnt, 0)) AS est_count
        FROM ppos LEFT JOIN cells c USING (row, col)
        GROUP BY props),
    exact AS (
        SELECT props, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM events WHERE props IS NOT NULL GROUP BY props)
    SELECT e.props, e.est_count, x.exact_count
    FROM est e JOIN exact x USING (props)
    ORDER BY e.props
"""

_HOT_KEYS_STATE_CACHE: dict = {}


def stream_hot_keys_spark(spark, sf_dir):
    """The exact plan that registers in r15 (lift verbatim, cache dict
    alongside — monitor state is a persisted artifact, amortized like
    _MOMENTS_CACHE's)."""
    import os
    import tempfile

    from cassandrastack_spark.streaming.ops import (
        hot_keys_state,
        monitor_hot_keys,
    )

    key = sf_dir
    if key not in _HOT_KEYS_STATE_CACHE:
        root = tempfile.mkdtemp(prefix="cs_q_cm_state_")
        schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = monitor_hot_keys(
            src,
            os.path.join(root, "state"),
            "props",
            width=64,
            depth=3,
            checkpoint=os.path.join(root, "ckpt"),
        )
        assert q.awaitTermination(600), "hot-keys ingest did not finish"
        _HOT_KEYS_STATE_CACHE[key] = os.path.join(root, "state")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = (
        events.filter(F.col("props").isNotNull())
        .select("props")
        .distinct()
    )
    exact = (
        events.filter(F.col("props").isNotNull())
        .groupBy("props")
        .agg(F.count("*").cast("bigint").alias("exact_count"))
    )
    from cassandrastack_spark.streaming.ops import hot_keys_state as _hks

    return (
        _hks(spark, _HOT_KEYS_STATE_CACHE[key], probes, "props")
        .join(exact, "props")
        .select("props", "est_count", "exact_count")
        .orderBy("props")
    )


@pytest.fixture(scope="module")
def duck_events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    yield con
    con.close()


def test_stream_hot_keys_matches_staged_oracle(spark, duck_events):
    got = stream_hot_keys_spark(spark, SF).toPandas()
    want = duck_events.execute(STREAM_HOT_KEYS_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # never undercount; width=64 against 100 distinct props guarantees
    # collisions, so the overhang regime is exercised too
    assert (got["est_count"] >= got["exact_count"]).all()
    assert (got["est_count"] > got["exact_count"]).any()


# The third staged r15 query: `corpus_score_drift_psi` — per-source
# Population Stability Index between two corpus snapshots' quality-
# score distributions (functions/stats.py histogram_fixed +
# psi_from_histograms): the drift alarm that catches "a scraper change
# shifted the score distribution the filter threshold was tuned on"
# before the threshold silently starts keeping garbage. Snapshots are
# the deterministic md5(doc_id) halves (first hex digit < '8' —
# decorrelated from source, unlike doc_id parity, which the fixture
# assigns per source block); 10 fixed bins on [0, 1)
# (design constants, so the histograms are mergeable and the oracle
# reproduces every edge decision — the bin expression is the same
# IEEE op sequence on both engines); eps=1e-4 smoothing keeps empty
# bins finite; the PSI term sum is DECIMAL-exact (order-free) with
# one final 6-decimal round on both sides.
CORPUS_SCORE_DRIFT_PSI_ORACLE = """
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             (LENGTH(text) - (len(string_split(text, ' ')) - 1))
                 / len(string_split(text, ' ')) AS awl,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the', 'a', 'of', 'and')))
                 / len(string_split(text, ' ')) AS sr
      FROM documents),
    s AS (
      SELECT doc_id,
             ROUND(1.0 / (1.0 + EXP(-(-2.0 + 0.8 * LN(1.0 + n_tokens)
                                      - 0.15 * awl + 6.0 * sr))),
                   6) AS score
      FROM m),
    sc AS (
      SELECT d.doc_id, d.source, s.score
      FROM s JOIN documents d USING (doc_id)),
    binned AS (
      SELECT source, doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS half,
             CASE WHEN score < 0.0 THEN -1
                  WHEN score >= 1.0 THEN 10
                  ELSE CAST(LEAST(FLOOR((score - 0.0) / 1.0 * 10), 9)
                            AS INT)
             END AS bin
      FROM sc),
    e AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS ce
      FROM binned WHERE half GROUP BY source, bin),
    o AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS co
      FROM binned WHERE NOT half GROUP BY source, bin),
    tot AS (
      SELECT source,
             SUM(CASE WHEN half THEN 1 ELSE 0 END) AS ne,
             SUM(CASE WHEN NOT half THEN 1 ELSE 0 END) AS no
      FROM binned GROUP BY source),
    terms AS (
      SELECT t.source,
             (GREATEST(COALESCE(e.ce, 0) / t.ne, 0.0001)
              - GREATEST(COALESCE(o.co, 0) / t.no, 0.0001))
             * LN(GREATEST(COALESCE(e.ce, 0) / t.ne, 0.0001)
                  / GREATEST(COALESCE(o.co, 0) / t.no, 0.0001)) AS term,
             t.ne, t.no
      FROM (SELECT source, bin FROM e UNION SELECT source, bin FROM o) b
      LEFT JOIN e USING (source, bin)
      LEFT JOIN o USING (source, bin)
      JOIN tot t USING (source))
    SELECT source,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,18))) AS DOUBLE), 6)
               AS psi,
           CAST(MAX(ne) AS BIGINT) AS n_expected,
           CAST(MAX(no) AS BIGINT) AS n_observed
    FROM terms GROUP BY source ORDER BY source
"""


def corpus_score_drift_psi_spark(spark, sf_dir):
    """The exact plan that registers in r15 (lift verbatim)."""
    from cassandrastack_spark.functions.stats import (
        histogram_fixed,
        psi_from_histograms,
    )
    from cassandrastack_spark.functions.text import quality_score_linear

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select(
        "doc_id",
        "source",
        F.round(quality_score_linear("text"), 6).alias("score"),
    )
    half = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    e = histogram_fixed(
        scored.filter(half), "score", 0.0, 1.0, 10,
        group_cols=("source",),
    )
    o = histogram_fixed(
        scored.filter(~half), "score", 0.0, 1.0, 10,
        group_cols=("source",),
    )
    return (
        psi_from_histograms(e, o, group_cols=("source",))
        .select(
            "source",
            F.round("psi", 6).alias("psi"),
            "n_expected",
            "n_observed",
        )
        .orderBy("source")
    )


def test_corpus_score_drift_psi_matches_staged_oracle(spark, duck):
    got = corpus_score_drift_psi_spark(spark, SF).toPandas()
    want = duck.execute(CORPUS_SCORE_DRIFT_PSI_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
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
