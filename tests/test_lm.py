"""Stupid-Backoff bigram LM scoring: hand-computed closed forms,
backoff/OOV arithmetic, short-doc omission, and a brute-force
cross-check on the real documents fixture.
"""

import math

import pytest

from cassandrastack_spark.llm.lm import bigram_logprob

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toy(spark):
    train = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(1, "a b x"), (2, "a"), (3, "b c")],
        "doc_id long, text string",
    )
    return train, score


def test_bigram_logprob_hand_computed(spark, toy):
    # train counts: bigrams (a,b)=2 (b,a)=1 (b,c)=1; unigrams a=2 b=2
    # c=1, N=5, V=3. Doc 1 "a b x": S(b|a)=2/2=1; (b,x) unseen, x OOV
    # -> 0.4*(0+1)/(5+3)=0.05. Doc 3 "b c": S(c|b)=1/2.
    train, score = toy
    got = {
        r.doc_id: r for r in bigram_logprob(train, score).collect()
    }
    assert set(got) == {1, 3}  # doc 2 has < 2 tokens -> omitted
    d1 = got[1]
    want1 = (math.log(1.0) + math.log(0.05)) / 2
    assert d1.n_bigrams == 2
    assert abs(d1.avg_logprob - want1) < 1e-12
    assert abs(d1.ppl_proxy - math.exp(-want1)) < 1e-9
    assert abs(got[3].avg_logprob - math.log(0.5)) < 1e-12


def test_bigram_logprob_seen_vs_garbage_ordering(spark, toy):
    # a doc made of training prose must outscore a shuffled-token doc
    train, _ = toy
    score = spark.createDataFrame(
        [(10, "a b a b c"), (11, "c a x b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logprob for r in bigram_logprob(train, score).collect()}
    assert got[10] > got[11]


def test_bigram_logprob_empty_training_corpus_fails_loud(spark, toy):
    # an empty reference corpus must raise in-plan, not propagate null
    # scores into a downstream quality filter
    _, score = toy
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(Exception, match="empty training corpus"):
        bigram_logprob(empty, score).collect()


def test_bigram_logprob_matches_bruteforce_on_fixture(spark):
    # train on even doc_ids, score 30 docs; reference computed in plain
    # python from the same split
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    train = docs.filter("doc_id % 2 = 0")
    score = docs.filter("doc_id < 30")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_logprob(train, score).collect()
    }

    rows = {r.doc_id: r.text for r in docs.collect()}
    cb: dict = {}
    cu: dict = {}
    for did, text in rows.items():
        if did % 2 != 0:
            continue
        toks = text.split(" ")
        for w in toks:
            cu[w] = cu.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    n_tok = float(sum(cu.values()))
    v = float(len(cu))
    for did, text in rows.items():
        if did >= 30:
            continue
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert did not in got
            continue
        logs = []
        for a, b in bgs:
            if (a, b) in cb:
                logs.append(math.log(cb[(a, b)] / cu[a]))
            else:
                logs.append(
                    math.log(0.4 * (cu.get(b, 0) + 1.0) / (n_tok + v))
                )
        want = sum(logs) / len(logs)
        n, avg = got[did]
        assert n == len(bgs)
        assert abs(avg - want) < 1e-9, f"doc {did}: {avg} vs {want}"
