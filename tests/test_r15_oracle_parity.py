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
