"""Hashed-gram linear classifier (llm/classifier.py): featurization,
NB log-odds training, and scoring must each match a pure-python model
exactly (the hashing, smoothing, and decimal-dot arithmetic are all
deterministic); degenerate inputs (empty text, one-class seed, mixed
models) behave as documented."""

import hashlib
import math

import pytest

from cassandrastack_spark.llm.classifier import (
    hashed_gram_features,
    linear_text_score,
    nb_logodds_weights,
)

DOCS = [
    (0, "the quick brown fox", True),
    (1, "the quick quick dog", True),
    (2, "lorem ipsum dolor sit amet", False),
    (3, "buy cheap pills now now now", False),
    (4, "the brown dog sits", True),
    (5, "cheap cheap pills", False),
    (6, "an unlabeled document about foxes", None),
    (7, "", None),
    # whitespace-irregular: bigrams must pair adjacent SURVIVING
    # tokens ("spaced out"), never raw split positions (review r15)
    (8, " spaced  out ", None),
]
DIM = 64


def _grams(text, bigrams=True):
    toks = [w for w in text.split(" ") if w]
    out = list(toks)
    if bigrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


def _bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:7], 16) % DIM


def _py_features(text):
    counts = {}
    for g in _grams(text):
        counts[_bucket(g)] = counts.get(_bucket(g), 0) + 1
    return counts


def _py_model():
    pos = {}
    neg = {}
    pt = nt = n_pos = n_neg = 0
    for _id, text, lab in DOCS:
        if lab is None:
            continue
        side = pos if lab else neg
        for b, c in _py_features(text).items():
            side[b] = side.get(b, 0) + c
        if lab:
            pt += sum(_py_features(text).values())
            n_pos += 1
        else:
            nt += sum(_py_features(text).values())
            n_neg += 1
    w = {
        b: math.log((pos.get(b, 0) + 1) / (pt + DIM))
        - math.log((neg.get(b, 0) + 1) / (nt + DIM))
        for b in range(DIM)
    }
    return w, math.log(n_pos / n_neg)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, l) for i, t, l in DOCS if l is not None],
        "doc_id long, is_pos boolean",
    )
    return docs, labels


def test_hashed_gram_features_match_python_model(spark, frames):
    docs, _ = frames
    got = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_gram_features(docs, "doc_id", "text", DIM).collect()
    }
    want = {
        (i, b): c
        for i, t, _ in DOCS
        for b, c in _py_features(t).items()
    }
    assert got == want
    # single-token doc: no bigram, no spurious self-gram
    one = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    rows = hashed_gram_features(one, "doc_id", "text", DIM).collect()
    assert len(rows) == 1 and rows[0].cnt == 1
    assert rows[0].bucket == _bucket("solo")


def test_nb_logodds_weights_match_python_model(spark, frames):
    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    w = nb_logodds_weights(feats, labels, "doc_id", "is_pos", DIM)
    rows = {r.bucket: r for r in w.collect()}
    want_w, want_bias = _py_model()
    assert set(rows) == set(range(DIM))  # dense spine
    for b in range(DIM):
        assert rows[b].weight == pytest.approx(want_w[b], abs=1e-12)
        assert rows[b].bias == pytest.approx(want_bias, abs=1e-12)
        assert rows[b].dim == DIM


def test_linear_text_score_matches_python_model(spark, frames):
    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    w = nb_logodds_weights(feats, labels, "doc_id", "is_pos", DIM)
    got = {r.doc_id: r for r in
           linear_text_score(docs, w, "doc_id", "text").collect()}
    want_w, want_bias = _py_model()
    assert set(got) == {i for i, _, _ in DOCS}
    for i, t, lab in DOCS:
        logit = want_bias + sum(
            c * want_w[b] for b, c in _py_features(t).items()
        )
        assert got[i].logit == pytest.approx(logit, abs=1e-9), t
        assert got[i].score == pytest.approx(
            1.0 / (1.0 + math.exp(-logit)), abs=1e-9
        )
    # the model must actually separate the seed classes on this fixture
    assert min(got[i].score for i, _, l in DOCS if l is True) > max(
        got[i].score for i, _, l in DOCS if l is False
    )
    # empty doc scores at bias alone
    assert got[7].logit == pytest.approx(want_bias, abs=1e-12)


def test_classifier_refuses_degenerate_inputs(spark, frames):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    with pytest.raises(ValueError, match="dim"):
        hashed_gram_features(docs, "doc_id", "text", dim=1)
    # one-class seed fails loud in-plan
    one_class = labels.filter("is_pos")
    with pytest.raises(SparkRuntimeException, match="both classes"):
        nb_logodds_weights(
            feats, one_class, "doc_id", "is_pos", DIM
        ).collect()
    # hand-unioned models with different dims fail loud in-plan
    w1 = nb_logodds_weights(feats, labels, "doc_id", "is_pos", DIM)
    f2 = hashed_gram_features(docs, "doc_id", "text", 32)
    w2 = nb_logodds_weights(f2, labels, "doc_id", "is_pos", 32)
    with pytest.raises(Exception, match="mixed dim"):
        linear_text_score(
            docs, w1.unionByName(w2), "doc_id", "text"
        ).collect()
    # training on features hashed at a DIFFERENT dim fails loud
    # in-plan instead of silently dropping out-of-range buckets while
    # their counts inflate the smoothing totals (review r15)
    big_feats = hashed_gram_features(docs, "doc_id", "text", 4096)
    with pytest.raises(SparkRuntimeException, match=r"\[0, dim\)"):
        nb_logodds_weights(
            big_feats, labels, "doc_id", "is_pos", DIM
        ).collect()
    # an empty weight table raises the contract error, not int(None)
    with pytest.raises(ValueError, match="empty weight table"):
        linear_text_score(docs, w1.filter("false"), "doc_id", "text")


def test_weight_table_persists_and_scores_identically(spark, frames, tmp_path):
    """The weight table IS the model artifact: a parquet round-trip
    (save after training, load at serving) must score every document
    identically — bit-for-bit, since weights/bias/dim are plain
    columns. Also covers the unigram-only featurizer path end-to-end."""
    docs, labels = frames
    for bigrams in (True, False):
        feats = hashed_gram_features(docs, "doc_id", "text", DIM, bigrams)
        w = nb_logodds_weights(feats, labels, "doc_id", "is_pos", DIM)
        path = str(tmp_path / f"model_{bigrams}")
        w.write.parquet(path)
        w2 = spark.read.parquet(path)
        a = sorted(
            map(tuple, linear_text_score(
                docs, w, "doc_id", "text", bigrams
            ).collect())
        )
        b = sorted(
            map(tuple, linear_text_score(
                docs, w2, "doc_id", "text", bigrams
            ).collect())
        )
        assert a == b and len(a) == len(DOCS)


def test_label_rows_dedupe_and_contradiction_guard(spark, frames):
    """ADVICE r15: (a) a seed row repeated verbatim counts its document
    once — weights and bias identical to the clean seed; (b) a doc id
    carrying BOTH labels fails loud in-plan instead of silently
    double-counting its grams into both classes."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    clean = {
        r.bucket: (r.weight, r.bias)
        for r in nb_logodds_weights(
            feats, labels, "doc_id", "is_pos", DIM
        ).collect()
    }
    doubled = labels.unionByName(labels)
    got = {
        r.bucket: (r.weight, r.bias)
        for r in nb_logodds_weights(
            feats, doubled, "doc_id", "is_pos", DIM
        ).collect()
    }
    assert got == clean
    contradictory = labels.unionByName(
        spark.createDataFrame([(0, False)], "doc_id long, is_pos boolean")
    )
    with pytest.raises(SparkRuntimeException, match="both labels"):
        nb_logodds_weights(
            feats, contradictory, "doc_id", "is_pos", DIM
        ).collect()


def test_self_unioned_weight_table_fails_loud(spark, frames):
    """ADVICE r15: duplicated bucket rows of the SAME model (identical
    dim and bias, so the mixed-model guard passes) would silently
    double every weight in the dot product — the scalar aggregate now
    asserts one row per bucket."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    w = nb_logodds_weights(feats, labels, "doc_id", "is_pos", DIM)
    with pytest.raises(SparkRuntimeException, match="duplicated bucket"):
        linear_text_score(
            docs, w.unionByName(w), "doc_id", "text"
        ).collect()


def test_null_id_label_rows_are_ignored(spark, frames):
    """Review r16: a label row with a NULL doc id carries no trainable
    evidence and must neither trip the contradiction guard (count(*)
    sees it, count_distinct(id) does not) nor change the weights."""
    docs, labels = frames
    feats = hashed_gram_features(docs, "doc_id", "text", DIM)
    clean = {
        r.bucket: (r.weight, r.bias)
        for r in nb_logodds_weights(
            feats, labels, "doc_id", "is_pos", DIM
        ).collect()
    }
    with_null = labels.unionByName(
        spark.createDataFrame(
            [(None, True)], "doc_id long, is_pos boolean"
        )
    )
    got = {
        r.bucket: (r.weight, r.bias)
        for r in nb_logodds_weights(
            feats, with_null, "doc_id", "is_pos", DIM
        ).collect()
    }
    assert got == clean


def test_pr_curve_matches_python_model(spark):
    """pr_curve / threshold_for_precision against a hand-rolled python
    sweep: per-distinct-threshold tp/fp/fn and the exact integer-ratio
    precision/recall/f1; ties share a row; NULL scores/labels drop;
    the operating point is the lowest threshold meeting the target,
    and an unreachable target returns zero rows."""
    from cassandrastack_spark.llm.classifier import (
        pr_curve,
        threshold_for_precision,
    )

    # the TOP score is a false positive, so precision never reaches
    # 1.0 and the unreachable-target branch is genuinely unreachable
    rows = [
        (0.95, False),
        (0.9, True), (0.8, True), (0.8, False), (0.7, True),
        (0.6, False), (0.5, True), (0.5, False), (0.4, False),
        (0.3, True), (None, True), (0.2, None),
    ]
    df = spark.createDataFrame(rows, "score double, is_pos boolean")
    got = {
        r.threshold: (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1)
        for r in pr_curve(df, "score", "is_pos").collect()
    }

    lab = [(s, p) for s, p in rows if s is not None and p is not None]
    tp_all = sum(1 for _, p in lab if p)
    want = {}
    for t in sorted({s for s, _ in lab}, reverse=True):
        tp = sum(1 for s, p in lab if s >= t and p)
        fp = sum(1 for s, p in lab if s >= t and not p)
        fn = tp_all - tp
        want[t] = (
            tp, fp, fn, tp / (tp + fp), tp / tp_all,
            2 * tp / (2 * tp + fp + fn),
        )
    assert got == want

    # operating point: lowest threshold with precision >= 0.6
    op = threshold_for_precision(df, "score", "is_pos", 0.6).collect()
    want_t = min(t for t, v in want.items() if v[3] >= 0.6)
    assert len(op) == 1 and op[0].threshold == want_t
    # unreachable target: zero rows, not an invented operating point
    assert threshold_for_precision(
        df, "score", "is_pos", 0.999
    ).count() == 0
    with pytest.raises(ValueError, match="target_precision"):
        threshold_for_precision(df, "score", "is_pos", 0.0)


def test_pr_curve_no_positives_yields_null_recall_not_crash(spark):
    """Review r16 (reproduced): ANSI mode turns recall's 0/0 into a
    DIVIDE_BY_ZERO crash on an all-negative labeled frame; recall is
    now NULL there, precision is 0 everywhere, and
    threshold_for_precision returns zero rows as documented."""
    from cassandrastack_spark.llm.classifier import (
        pr_curve,
        threshold_for_precision,
    )

    df = spark.createDataFrame(
        [(0.9, False), (0.5, False)], "score double, is_pos boolean"
    )
    rows = pr_curve(df, "score", "is_pos").collect()
    assert [r.threshold for r in rows] == [0.9, 0.5]
    assert all(r.tp == 0 and r.recall is None for r in rows)
    assert all(r.precision == 0.0 for r in rows)
    assert threshold_for_precision(df, "score", "is_pos", 0.5).count() == 0
