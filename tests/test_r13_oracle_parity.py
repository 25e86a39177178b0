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


# The second staged query: `ann_matryoshka_recall` — the
# dimension-truncation audit (Kusupati et al. 2022, "Matryoshka
# Representation Learning"): exact top-k under the first-16-of-64
# dims vs exact top-k under the full vector, per-query overlap =
# recall@k. The production question it answers: can this embedding
# column be stored/searched at a fraction of its width? For
# MRL-trained embeddings recall stays high; for these synthetic
# random embeddings it collapses toward k/N — the audit catching
# exactly what it is built to catch (information spread uniformly
# across dims). Both legs reuse the GREEN _EXACT_TOPK_ORACLE shape
# (ranks via (similarity DESC, vec_id); overlap counts are
# set-membership, even more tie-robust than ranks).
ANN_MATRYOSHKA_RECALL_ORACLE = """
    WITH fullk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                           c.vec_id
                   ) AS rank
            FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 10)
        WHERE rank <= 5),
    halfk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           (q.embedding[1:16])::DOUBLE[],
                           (c.embedding[1:16])::DOUBLE[]) DESC,
                           c.vec_id
                   ) AS rank
            FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 10)
        WHERE rank <= 5)
    SELECT f.query_id,
           CAST(5 AS INT) AS k,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_overlap,
           COUNT(h.neighbor_id) / 5.0 AS recall_at_k
    FROM fullk f
    LEFT JOIN halfk h USING (query_id, neighbor_id)
    GROUP BY f.query_id ORDER BY f.query_id
"""


def ann_matryoshka_recall_spark(spark, sf_dir):
    """The exact plan that registers in r13 (lift verbatim)."""
    from cassandrastack_spark.llm.simsearch import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trunc = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    fullk = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).select(
        "query_id", "neighbor_id"
    )
    halfk = cosine_topk(
        trunc, trunc.filter(F.col("vec_id") < 10), k=5
    ).select("query_id", F.col("neighbor_id").alias("h_neighbor"))
    return (
        fullk.join(
            halfk,
            (fullk["query_id"] == halfk["query_id"])
            & (fullk["neighbor_id"] == halfk["h_neighbor"]),
            "left",
        )
        .drop(halfk["query_id"])
        .groupBy("query_id")
        .agg(
            F.lit(5).cast("int").alias("k"),
            F.count("h_neighbor").cast("bigint").alias("n_overlap"),
            (F.count("h_neighbor") / 5.0).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# The third staged oracle query: `corpus_score_quantile_norm` —
# quantile normalization across sources (Bolstad et al. 2003): every
# doc's quality score maps onto the cross-source AVERAGE distribution
# at the same relative rank, so "score >= x" means the same thing for
# every source. All rank/cell arithmetic is INTEGER ((x+d-1) div d
# ceilings, // floors), so engines cannot diverge at cell boundaries;
# the reference table is grid-sized (100 rows), broadcastable at any
# corpus scale. Shares the green corpus_quality_model_score m/s CTEs.
#
# STABILIZED per the r12 VERDICT (the gate failed sharded / passed
# standalone — reproduced, root-caused, fixed):
# (a) the cell reference is an exact DECIMAL(28,12) sum divided once
#     by the count on BOTH engines — AVG over doubles is summation-
#     order-dependent at the ulp level, and ROUND(refv, 6) flipped the
#     6th decimal whenever a cell mean sat on a 5e-7 boundary
#     (observed: 0.751489 vs 0.75149 at cell mean ~0.7514895);
# (b) the rank window tie-breaks on doc_id on BOTH engines — ties on
#     the 6dp-rounded score leave cell averages unchanged but decide
#     which doc lands in which cell, so without a unique tie-break the
#     per-doc mapping is engine-dependent (the registry's own rule:
#     order-sensitive ranks need a unique tie-break).
CORPUS_SCORE_QUANTILE_NORM_ORACLE = """
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
             row_number() OVER (PARTITION BY source
                                ORDER BY score, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM sc),
    cells AS (
      SELECT t.j, r.score
      FROM r, unnest(generate_series(
                 ((rn - 1) * 100) // n + 1, (rn * 100) // n)) AS t(j)),
    ref AS (
      SELECT j,
             CAST(SUM(CAST(score AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) AS refv
      FROM cells GROUP BY j),
    mapped AS (
      SELECT doc_id, source, score, (100 * rn + n - 1) // n AS j
      FROM r)
    SELECT doc_id, source, score, ROUND(refv, 6) AS score_qn
    FROM mapped JOIN ref USING (j)
    ORDER BY doc_id
"""


def corpus_score_quantile_norm_spark(spark, sf_dir):
    """The exact plan that registers in r13 (lift verbatim)."""
    from cassandrastack_spark.functions.stats import (
        quantile_normalize_by_group,
    )
    from cassandrastack_spark.functions.text import quality_score_linear

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select(
        "doc_id",
        "source",
        F.round(quality_score_linear("text"), 6).alias("score"),
    )
    out = quantile_normalize_by_group(
        scored, "score", "source", grid=100, tie_cols=("doc_id",)
    )
    return out.select(
        "doc_id",
        "source",
        "score",
        F.round("score_qn", 6).alias("score_qn"),
    ).orderBy("doc_id")


# The fourth staged query: `decontam_bloom_indexed` — the
# decontam_bloom_probe output served from a PERSISTED, INCREMENTALLY
# EXTENDED filter (the persisted-index production-twin discipline of
# dedup_semantic_indexed / corpus_dsir_weights_indexed): the eval gram
# set splits ~15/16 base + ~1/16 arriving batch on an md5 nibble, each
# part builds its own filter against ONE pinned geometry (m = 12 x
# total items — the sizing pass production runs up front),
# bloom_merge folds them (bit_or is associative, so the merged bitmap
# is bit-identical to the whole build), the artifact round-trips
# through parquet, and the probe runs off the REREAD filter. Gated
# under the SHARED registered decontam_bloom_probe oracle — a lost
# batch item, geometry drift, or lossy persistence hash-mismatches.
_BLOOM_IDX_CACHE: dict[str, str] = {}


def decontam_bloom_indexed_spark(spark, sf_dir):
    """The exact plan that registers in r13 (lift verbatim, cache dict
    alongside — an index is a persisted artifact, amortized like
    _INDEX_CACHE's)."""
    from cassandrastack_spark.functions.text import word_ngrams
    from cassandrastack_spark.operators.sketch import (
        bloom_build,
        bloom_merge,
        bloom_might_contain,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = d.select("doc_id", F.explode(word_ngrams("text", 5)).alias("g"))
    eval_g = grams.filter(F.col("doc_id") % 10 == 0).select("g").distinct()
    if sf_dir not in _BLOOM_IDX_CACHE:
        import tempfile

        # the up-front sizing pass: one bounded scalar to the driver,
        # pinning the geometry every contributing build must share
        m = max(12 * eval_g.count(), 1)
        is_batch = F.substring(F.md5("g"), 1, 1) == "f"
        base = bloom_build(eval_g.filter(~is_batch), "g", m_bits=m)
        batch = bloom_build(eval_g.filter(is_batch), "g", m_bits=m)
        path = tempfile.mkdtemp(prefix="cs_q_bloom_idx_")
        bloom_merge(base, batch).write.mode("overwrite").parquet(path)
        _BLOOM_IDX_CACHE[sf_dir] = path
    bloom = spark.read.parquet(_BLOOM_IDX_CACHE[sf_dir])
    probe = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .select("doc_id", "g")
        .distinct()
    )
    return (
        bloom_might_contain(bloom, probe, "g", out_col="_hit")
        .join(eval_g.withColumn("_ex", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.col("_hit").cast("int")).cast("bigint").alias("n_flagged"),
            F.sum(F.when(F.col("_ex").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .orderBy("doc_id")
    )


def test_decontam_bloom_indexed_matches_shared_registered_oracle(spark, duck):
    from cassandrastack_spark.queries import load_all

    qd = load_all()["decontam_bloom_probe"]
    got = decontam_bloom_indexed_spark(spark, SF).toPandas()
    want = duck.execute(qd.oracle).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # and the persisted+merged path must equal the raw twin exactly
    raw = qd.fn(spark, SF).toPandas()
    for col in got.columns:
        assert got[col].tolist() == raw[col].tolist(), col


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def test_corpus_score_quantile_norm_matches_staged_oracle(spark, duck):
    got = corpus_score_quantile_norm_spark(spark, SF).toPandas()
    want = duck.execute(CORPUS_SCORE_QUANTILE_NORM_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    # normalization must actually move scores on the fixture
    assert (got["score_qn"] != got["score"]).any()
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_ann_matryoshka_recall_matches_staged_oracle(spark, duck):
    got = ann_matryoshka_recall_spark(spark, SF).toPandas()
    want = duck.execute(ANN_MATRYOSHKA_RECALL_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 10
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col


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
