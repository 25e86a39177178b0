"""Pre-validated oracle parity for the r12-staged, r13-registering
query (the staged-query discipline test_r12_oracle_parity.py
documents): `corpus_score_winsorize` — per-source rank-based
winsorization + min-max normalization of the quality-model score
(functions/stats.py winsorize_by_group over functions/text.py
quality_score_linear). The EXACT oracle SQL and the EXACT Spark plan
live here, validated green against DuckDB at sf0.001 one round before
registration; round 13 lifts both verbatim into @register, and this
file then flips to reading the registered QueryDef (as the r12 twin
did).

`stream_bloom_dedup` (streaming/ops.py stateful_bloom_dedup), the
other r12-staged operator, registers r13 under the stream_* rows-only
check — its multi-batch semantics are pinned in tests/test_streaming.py
and need no SQL oracle here.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

# Extends the GREEN corpus_quality_model_score oracle's m/s CTEs (the
# registered query since r9) with the per-source rank windows: fences
# are ORDER STATISTICS (value at rank ceil(q*n)) — no interpolation,
# so both engines cut identically; arithmetic runs on the 6dp-rounded
# score on both sides.
CORPUS_SCORE_WINSORIZE_ORACLE = """
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
    r AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source ORDER BY score) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM sc),
    b AS (
      SELECT *,
             CAST(CEIL(0.05 * n) AS BIGINT) AS lo_r,
             CAST(CEIL(0.95 * n) AS BIGINT) AS hi_r
      FROM r),
    v AS (
      SELECT *,
             MAX(CASE WHEN rn = lo_r THEN score END)
                 OVER (PARTITION BY source) AS lo_v,
             MAX(CASE WHEN rn = hi_r THEN score END)
                 OVER (PARTITION BY source) AS hi_v
      FROM b)
    SELECT doc_id, source, score,
           ROUND(LEAST(GREATEST(score, lo_v), hi_v), 6) AS score_w,
           ROUND(CASE WHEN hi_v > lo_v
                      THEN (LEAST(GREATEST(score, lo_v), hi_v) - lo_v)
                           / (hi_v - lo_v)
                      ELSE 0.5 END, 6) AS score_norm
    FROM v ORDER BY doc_id
"""


def corpus_score_winsorize_spark(spark, sf_dir):
    """The exact plan that registers in r13 (lift verbatim)."""
    from cassandrastack_spark.functions.stats import winsorize_by_group
    from cassandrastack_spark.functions.text import quality_score_linear

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select(
        "doc_id",
        "source",
        F.round(quality_score_linear("text"), 6).alias("score"),
    )
    out = winsorize_by_group(scored, "score", "source",
                             lower=0.05, upper=0.95)
    return out.select(
        "doc_id",
        "source",
        "score",
        F.round("score_w", 6).alias("score_w"),
        F.round("score_norm", 6).alias("score_norm"),
    ).orderBy("doc_id")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    yield con
    con.close()


def test_corpus_score_winsorize_matches_staged_oracle(spark, duck):
    got = corpus_score_winsorize_spark(spark, SF).toPandas()
    want = duck.execute(CORPUS_SCORE_WINSORIZE_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    # fences must actually clamp something on the fixture (a no-op
    # winsorize would validate nothing)
    assert (got["score_w"] != got["score"]).any()
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
