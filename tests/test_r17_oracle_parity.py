"""Oracle parity for the r14-staged, r17-registered query
(decontam_semantic).

History: from round 14 this file held the staged query's EXACT oracle
SQL and Spark plan, validated green against DuckDB at sf0.001 AND
sf0.01 ahead of registration (the staged-query discipline; r15's and
r16's slots were spoken for by their own staged registrants + debt
cohorts, so it waited for r17). Round 17 lifted it verbatim into
@register (queries/llm.py); this test now reads the REGISTERED
QueryDef — fn and oracle string — and replays the driver's own
comparison, so any future drift between the registered plan and the
validated oracle goes red here before the driver sees it.

``decontam_semantic`` — benchmark decontamination in EMBEDDING space:
for every train vector, its nearest eval-split vector
(``llm/simsearch.py max_cosine_vs_refs``), the max similarity, and the
``contaminated`` flag at the 0.35 threshold. This is the semantic
sibling the n-gram decontam family (decontam_ngram_overlap /
decontam_bloom_probe / decontam_bloom_indexed) structurally lacks:
paraphrases and format shifts share no word 5-grams but sit close in
embedding space. The staged non-triviality properties (flag neither
all-True nor all-False on the fixture; exactly one verdict row per
train vector) carried over as assertions on the registered row.
"""

import duckdb
import pytest

from cassandrastack_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_decontam_semantic_matches_registered_oracle(spark, duck, registry):
    qd = registry["decontam_semantic"]
    got = qd.fn(spark, SF).toPandas()
    want = duck.execute(qd.oracle).df()
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
