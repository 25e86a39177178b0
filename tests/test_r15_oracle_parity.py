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
