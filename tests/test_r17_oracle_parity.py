"""Pre-validated oracle parity for r14-staged, r17-registering queries
(the staged-query discipline; r17 because the r15 and r16 windows are
already fully committed — staging depth is never capped, only
registration is).

Staged here:

- ``decontam_semantic`` — benchmark decontamination in EMBEDDING
  space: for every train vector, its nearest eval-split vector
  (``llm/simsearch.py max_cosine_vs_refs``), the max similarity, and
  the ``contaminated`` flag at the 0.35 threshold. This is the
  semantic sibling the n-gram decontam family (decontam_ngram_overlap
  / decontam_bloom_probe / decontam_bloom_indexed) structurally
  lacks: paraphrases and format shifts share no word 5-grams but sit
  close in embedding space. The scale shape is the family's: the eval
  side is bounded by construction (a benchmark suite) and broadcasts;
  the corpus is scanned once, scored map-side, and reduced by a
  map-side-combinable max(struct) groupBy — the one shuffle carries
  exactly one row per train vector, never the corpus x refs pair
  stream. The gate is bit-exact: DuckDB's list_cosine_similarity and
  the engine's aggregate(zip_with) fold land on the same double (the
  dedup_embedding_cosine / ann_cosine_topk precedent, green since
  r10), argmax ties break toward the smallest eval id on both
  engines, and the flag thresholds the raw (pre-round) cosine
  identically.

Registration notes for the lifting round: plans as the documented
bounded-BNL pattern (add a DOCUMENTED_BNL entry: "bounded eval-split
broadcast x corpus scan — the cosine_topk exact-audit shape, guarded
by max_ref_rows"; add a scalar_broadcast_ok entry in test_plans.py is
NOT needed — the name starts with decontam_ and that family asserts
its joins in test_llm_ops.py). sf0.1 price (local[32], min-of-2,
measured at staging time): 1.94 s — the fixture's embeddings table is
2000 rows at sf0.1 (1800 train x 200 eval pairs scored map-side; the
reduce ships 1800 rows).
"""

import duckdb
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    yield con
    con.close()


def decontam_semantic_spark(spark, sf_dir):
    """The exact plan that registers in r17 (lift verbatim)."""
    from cassandrastack_spark.llm.simsearch import max_cosine_vs_refs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train = e.filter(F.col("vec_id") % 10 != 0)
    ev = e.filter(F.col("vec_id") % 10 == 0)
    best = max_cosine_vs_refs(train, ev)
    return (
        best.select(
            "vec_id",
            F.col("ref_id").alias("top_eval_id"),
            F.round("cosine", 6).alias("max_sim"),
            (F.col("cosine") >= 0.35).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


DECONTAM_SEMANTIC_ORACLE = """
    WITH t AS (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id % 10 <> 0),
    e AS (
        SELECT vec_id AS ref_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id % 10 = 0),
    s AS (
        SELECT t.vec_id, e.ref_id,
               list_cosine_similarity(t.v, e.v) AS c
        FROM t, e),
    r AS (
        SELECT vec_id, ref_id, c,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY c DESC, ref_id) AS rn
        FROM s)
    SELECT vec_id, ref_id AS top_eval_id, ROUND(c, 6) AS max_sim,
           c >= 0.35 AS contaminated
    FROM r WHERE rn = 1
    ORDER BY vec_id
"""


def test_decontam_semantic_matches_staged_oracle(spark, duck):
    got = decontam_semantic_spark(spark, SF).toPandas()
    want = duck.execute(DECONTAM_SEMANTIC_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # the flag must be non-trivial on the fixture: some train vectors
    # sit near eval content, most don't (an all-False or all-True
    # column would validate nothing)
    assert got["contaminated"].any()
    assert not got["contaminated"].all()
    # every train vector gets exactly one verdict
    n_train = duck.execute(
        "SELECT COUNT(*) FROM embeddings WHERE vec_id % 10 <> 0"
    ).fetchone()[0]
    assert len(got) == n_train
