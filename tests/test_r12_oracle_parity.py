"""Pre-validated r12 oracle SQL: the two library operators queued for
round-12 registration (graph_triangle_count, text_bigram_logprob) run
here against the EXACT DuckDB SQL their registrations will carry, at
sf0.001, compared the way the driver compares (columns sorted by
name, rows sorted by all columns, 6-decimal rounding on doubles).
Round 12 lifts these strings into @register verbatim.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

TRIANGLE_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events),
    raw AS (SELECT prev_type AS src, event_type AS dst
            FROM seq WHERE prev_type IS NOT NULL),
    und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM raw WHERE src <> dst),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM und
                UNION ALL SELECT v AS node FROM und) t
            GROUP BY node),
    orient AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS d,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dd
        FROM und e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v),
    tris AS (
        SELECT x.s AS a, x.d AS b, y.d AS c
        FROM orient x
        JOIN orient y ON y.s = x.s AND (x.dd, x.d) < (y.dd, y.d)
        JOIN orient z ON z.s = x.d AND z.d = y.d),
    per AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
                SELECT a AS node FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris) t
            GROUP BY node)
    SELECT deg.node AS event_type,
           COALESCE(per.triangles, 0) AS triangles
    FROM deg LEFT JOIN per USING (node)
    ORDER BY event_type
"""

BIGRAM_LM_ORACLE = """
    WITH tr AS (
        SELECT string_split(text, ' ') AS toks
        FROM documents WHERE doc_id % 2 = 0),
    tb AS (
        SELECT bg.w1, bg.w2, CAST(COUNT(*) AS BIGINT) AS cb FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])
                   )) AS bg
            FROM tr WHERE len(toks) >= 2) t
        GROUP BY bg.w1, bg.w2),
    tu AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM (
            SELECT unnest(toks) AS w FROM tr) t
        GROUP BY w),
    scal AS (
        SELECT CAST(SUM(cu) AS DOUBLE) AS n_tok,
               CAST(COUNT(*) AS DOUBLE) AS v_size
        FROM tu),
    sb AS (
        SELECT doc_id, bg.w1, bg.w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> struct_pack(
                           w1 := string_split(text, ' ')[i],
                           w2 := string_split(text, ' ')[i + 1])
                   )) AS bg
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2) t),
    scored AS (
        SELECT sb.doc_id,
               CASE WHEN tb.cb IS NOT NULL THEN tb.cb * 1.0 / u1.cu
                    ELSE 0.4 * (COALESCE(u2.cu, 0) + 1.0)
                         / (scal.n_tok + scal.v_size)
               END AS s
        FROM sb
        LEFT JOIN tb ON tb.w1 = sb.w1 AND tb.w2 = sb.w2
        LEFT JOIN tu u1 ON u1.w = sb.w1
        LEFT JOIN tu u2 ON u2.w = sb.w2
        CROSS JOIN scal)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN(s)), 6) AS avg_logprob,
           ROUND(EXP(-AVG(LN(s))), 4) AS ppl_proxy
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _spark_triangles(spark):
    from cassandrastack_spark.operators.graph import triangle_count
    from cassandrastack_spark.queries.analytics_ext import (
        event_transition_edges,
    )

    edges = event_transition_edges(spark, SF)
    return (
        triangle_count(edges, "src", "dst")
        .select(F.col("node").alias("event_type"), "triangles")
        .orderBy("event_type")
    )


def _spark_bigram_lm(spark):
    from cassandrastack_spark.llm.lm import bigram_logprob

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    return (
        bigram_logprob(docs.filter("doc_id % 2 = 0"), docs)
        .select(
            "doc_id",
            "n_bigrams",
            F.round("avg_logprob", 6).alias("avg_logprob"),
            F.round("ppl_proxy", 4).alias("ppl_proxy"),
        )
        .orderBy("doc_id")
    )


def test_triangle_count_matches_r12_oracle(spark, duck):
    got = _spark_triangles(spark).toPandas()
    want = duck.execute(TRIANGLE_ORACLE).df()
    assert got["triangles"].sum() > 0, "fixture graph has no triangles"
    assert got.values.tolist() == want.values.tolist()


def test_bigram_logprob_matches_r12_oracle(spark, duck):
    got = _spark_bigram_lm(spark).toPandas()
    want = duck.execute(BIGRAM_LM_ORACLE).df()
    assert len(got) > 0
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_bigrams"].tolist() == want["n_bigrams"].tolist()
    for col in ("avg_logprob", "ppl_proxy"):
        diffs = (got[col] - want[col]).abs()
        assert diffs.max() == 0, (
            f"{col}: max diff {diffs.max()} at doc "
            f"{got['doc_id'][diffs.idxmax()]}"
        )
