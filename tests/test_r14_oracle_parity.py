"""Pre-validated oracle parity for r13-staged, r14-registering queries
(the staged-query discipline of test_r12/r13_oracle_parity.py): the
EXACT Spark plans and EXACT oracle SQL live here, validated green
against DuckDB one round ahead; the registering round lifts both
verbatim into ``@register``, and this file then flips to reading the
registered QueryDef.

Staged here:

- ``distinct_tokens_hll`` — per-source distinct-token cardinality from
  the HyperLogLog register table (operators/sketch.py hll_build /
  hll_estimate), gated bit-exactly: the DuckDB side rebuilds the SAME
  registers from the same md5 slices with portable string ops and
  resolves them through the SAME estimator arithmetic, AND the exact
  ``count_distinct`` rides along as a column so the gate pins both the
  sketch reproducibility and its accuracy on the fixture. This
  completes the mergeable-sketch trio as registered surface: MG heavy
  hitters (r11), Bloom membership (r12), HLL cardinality (r14).
- ``corpus_source_kl`` — per-source KL divergence (nats) of the
  source's unigram token distribution from the corpus-wide mixture:
  the domain-shift / mixture-weight diagnostic a training-data
  pipeline runs before choosing sampling weights (the signal behind
  DoReMi-style reweighting). Pure decomposable aggregation: the only
  shuffles are (source, token)- and token-keyed counts (vocabulary-
  bounded, Zipf-distributed — no document-sized rows move), the
  corpus total is a 1-row broadcast, and every double sum sits under
  the registry's round-6 discipline.

- ``corpus_source_overlap`` — the pairwise source-contamination
  matrix: estimated distinct word-trigram overlap for every source
  pair via HLL inclusion-exclusion (|A∩B| = |A| + |B| − |A∪B|, the
  union registers a bucket-wise max-merge of the two sides' register
  tables), with the exact intersection riding along as the gate. The
  scale story is the pair loop: the corpus is scanned ONCE to build
  per-source registers; all 190 pair unions live in sources² × m
  rows — the sketch path never re-scans the corpus per pair, where
  the exact pairwise shingle join re-shuffles the gram space every
  time. Known caveat, asserted as the accuracy property: intersection
  error scales with the UNION size (σ ≈ 1.04/√m of |A∪B|), so tiny
  overlaps are relatively noisy — the sketch finds heavy
  cross-source duplication; positives worth acting on get the exact
  confirm (candidates-then-verify, as everywhere).

Registration notes for the lifting round: ``corpus_source_kl`` needs a
``scalar_broadcast_ok`` entry in tests/test_plans.py (the 1-row corpus
token total is the canonical scalar-subquery BroadcastNestedLoopJoin);
``corpus_source_overlap`` needs one too (the 20-row source list joins
itself under a ``<`` condition — literal-bounded, the
``embedding_pca_projection_pairdist`` shape); ``distinct_tokens_hll``
plans clean — pruned 2-column scan, ``partial_max`` map-side combine
ahead of the one m-bounded exchange, no BNL (``hll_estimate`` is a
single aggregation pass). sf0.1 prices (local[32], min-of-2, measured
at staging time): distinct_tokens_hll 2.0 s, corpus_source_kl 1.2 s,
corpus_source_overlap 5.9 s — the overlap's cost is ~all the EXACT
gate leg (the pairwise gram self-join the oracle needs); the sketch
path itself is sub-second, which is the point.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from cassandrastack_spark.operators.sketch import hll_build, hll_estimate

SF = "/root/testdata/sf0.001"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def distinct_tokens_hll_spark(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    reg = hll_build(toks, "tok", p=12, group_cols=["source"])
    est = hll_estimate(reg, group_cols=["source"])
    exact = toks.groupBy("source").agg(
        F.count_distinct("tok").cast("bigint").alias("exact_distinct")
    )
    return (
        est.join(exact, "source")
        .select("source", "est_distinct", "m", "nonempty", "exact_distinct")
        .orderBy("source")
    )


# The DuckDB side rebuilds the identical register table: bucket = the
# first 3 md5-hex digits (p=12), rank = 29 - bit_length of the next 7
# digits (28-bit word), register update = MAX — then resolves it with
# the same estimator expression tree (alpha*m*m/harm; linear counting
# below 2.5m with empty buckets; the large-range collision correction
# above 2^40/30 — dead at fixture scale but mirrored so the oracle IS
# the registered computation). The harmonic sum is a sum of
# exactly-representable powers of two bounded by m, so it is IEEE-exact
# in any summation order — both engines land on the identical double
# before the shared 4-decimal round.
DISTINCT_TOKENS_HLL_ORACLE = """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT source, tok, md5(tok) AS hx FROM toks),
    rv AS (
        SELECT source,
            CAST(list_sum(list_transform(generate_series(1, 3),
                i -> (strpos('0123456789abcdef', substr(hx, i, 1)) - 1)
                     * 16 ** (3 - i))) AS INT) AS bucket,
            CAST(list_sum(list_transform(generate_series(1, 7),
                i -> (strpos('0123456789abcdef', substr(hx, 3 + i, 1)) - 1)
                     * 16 ** (7 - i))) AS BIGINT) AS v
        FROM h),
    reg AS (
        SELECT source, bucket,
               MAX(CASE WHEN v = 0 THEN 29
                        ELSE 29 - length(bin(v)) END) AS maxrank
        FROM rv GROUP BY source, bucket),
    est AS (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE) AS ne,
               SUM(2.0 ** (-maxrank)) AS hs
        FROM reg GROUP BY source),
    ex AS (
        SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
        FROM toks GROUP BY source)
    SELECT e.source,
           ROUND(CASE WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                           / ((4096.0 - ne) + hs) <= 2.5 * 4096.0
                      AND 4096.0 - ne > 0
                 THEN 4096.0 * LN(4096.0 / (4096.0 - ne))
                 WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                      / ((4096.0 - ne) + hs) >= 1099511627776.0
                 THEN NULL
                 WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                      / ((4096.0 - ne) + hs) > 1099511627776.0 / 30.0
                 THEN -1099511627776.0
                      * LN(1.0 - 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0
                           * 4096.0 / ((4096.0 - ne) + hs)
                           / 1099511627776.0)
                 ELSE 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                      / ((4096.0 - ne) + hs) END, 4) AS est_distinct,
           CAST(4096 AS BIGINT) AS m,
           CAST(ne AS BIGINT) AS nonempty,
           x.exact_distinct
    FROM est e JOIN ex x USING (source)
    ORDER BY e.source
"""


def corpus_source_kl_spark(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    s = st.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count("*").cast("bigint").alias("n_distinct"),
    )
    tk = st.groupBy("tok").agg(F.sum("c").alias("ct"))
    tot = st.agg(F.sum("c").alias("n_total"))
    j = st.join(tk, "tok").join(s, "source").crossJoin(F.broadcast(tot))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    q = F.col("ct").cast("double") / F.col("n_total").cast("double")
    return (
        j.groupBy("source")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"),
            F.max(F.col("n")).cast("bigint").alias("n_tokens"),
            F.max("n_distinct").alias("n_distinct"),
        )
        .orderBy("source")
    )


# Every (source, token) count is > 0 and the corpus count dominates the
# source count, so both p and q are strictly positive — KL is total on
# this data. The double sum is order-dependent at the ulp level only;
# the shared 6-decimal round absorbs it (the registry-header rule).
CORPUS_SOURCE_KL_ORACLE = """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
    st AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok),
    s AS (SELECT source, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS n_distinct
          FROM st GROUP BY source),
    t AS (SELECT tok, SUM(c) AS ct FROM st GROUP BY tok),
    tot AS (SELECT SUM(c) AS n_total FROM st)
    SELECT st.source,
           ROUND(SUM((CAST(st.c AS DOUBLE) / CAST(s.n AS DOUBLE))
                     * LN((CAST(st.c AS DOUBLE) / CAST(s.n AS DOUBLE))
                          / (CAST(t.ct AS DOUBLE)
                             / CAST(tot.n_total AS DOUBLE)))),
                 6) AS kl_nats,
           CAST(MAX(s.n) AS BIGINT) AS n_tokens,
           MAX(s.n_distinct) AS n_distinct
    FROM st JOIN t USING (tok) JOIN s ON st.source = s.source, tot
    GROUP BY st.source
    ORDER BY st.source
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    yield con
    con.close()


def test_distinct_tokens_hll_matches_staged_oracle(spark, duck):
    got = distinct_tokens_hll_spark(spark, SF).toPandas()
    want = duck.execute(DISTINCT_TOKENS_HLL_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # the sketch must actually be accurate on the fixture, not merely
    # reproducible: every per-source estimate within 10% of exact
    # (p=12 sigma is ~1.6%; 10% is > 6 sigma)
    rel = (got["est_distinct"] - got["exact_distinct"]).abs() / got[
        "exact_distinct"
    ]
    assert (rel < 0.10).all(), rel.max()


def test_corpus_source_kl_matches_staged_oracle(spark, duck):
    got = corpus_source_kl_spark(spark, SF).toPandas()
    want = duck.execute(CORPUS_SOURCE_KL_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # KL is non-negative, and the fixture's sources genuinely diverge
    # from the mixture (an all-zeros column would validate nothing)
    assert (got["kl_nats"] >= 0).all()
    assert (got["kl_nats"] > 0).any()


def corpus_source_overlap_spark(spark, sf_dir):
    from cassandrastack_spark.functions.text import word_ngrams

    # the pairwise union below is hll_merge's grouped form, inlined
    # because each pair carries (source_a, source_b) group keys
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = (
        d.select("source", F.explode(word_ngrams("text", 3)).alias("g"))
        .distinct()
    )
    reg = hll_build(grams, "g", p=12, group_cols=["source"])
    est = hll_estimate(reg, group_cols=["source"]).select(
        "source", "est_distinct"
    )
    srcs = reg.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("source_b"))),
            F.col("source_a") < F.col("source_b"),
        )
    )
    u = (
        pairs.join(
            reg.withColumnRenamed("source", "source_a"), "source_a"
        ).select("source_a", "source_b", "bucket", "maxrank", "p")
        .unionByName(
            pairs.join(
                reg.withColumnRenamed("source", "source_b"), "source_b"
            ).select("source_a", "source_b", "bucket", "maxrank", "p")
        )
    )
    union_reg = u.groupBy("source_a", "source_b", "bucket").agg(
        F.max("maxrank").alias("maxrank"), F.max("p").alias("p")
    )
    union_est = hll_estimate(
        union_reg, group_cols=["source_a", "source_b"]
    ).select("source_a", "source_b", F.col("est_distinct").alias("est_union"))
    exact = (
        grams.withColumnRenamed("source", "source_a")
        .join(
            grams.select(
                F.col("source").alias("source_b"), F.col("g").alias("g2")
            ),
            F.col("g") == F.col("g2"),
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("exact_overlap"))
    )
    ea = est.select(F.col("source").alias("source_a"), F.col("est_distinct").alias("est_a"))
    eb = est.select(F.col("source").alias("source_b"), F.col("est_distinct").alias("est_b"))
    return (
        union_est.join(ea, "source_a")
        .join(eb, "source_b")
        .join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a", "source_b", "est_a", "est_b", "est_union",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4).alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0).cast("bigint")).alias("exact_overlap"),
        )
        .orderBy("source_a", "source_b")
    )


CORPUS_SOURCE_OVERLAP_ORACLE = """
    WITH g AS (
        SELECT DISTINCT source, array_to_string(l[i:i+2], ' ') AS g
        FROM (SELECT source, string_split(text, ' ') AS l FROM documents),
             unnest(generate_series(1, greatest(0, len(l) - 2))) AS t(i)),
    rv AS (
        SELECT source,
            CAST(list_sum(list_transform(generate_series(1, 3),
                i -> (strpos('0123456789abcdef', substr(md5(g), i, 1)) - 1)
                     * 16 ** (3 - i))) AS INT) AS bucket,
            CAST(list_sum(list_transform(generate_series(1, 7),
                i -> (strpos('0123456789abcdef', substr(md5(g), 3 + i, 1)) - 1)
                     * 16 ** (7 - i))) AS BIGINT) AS v
        FROM g),
    reg AS (
        SELECT source, bucket,
               MAX(CASE WHEN v = 0 THEN 29
                        ELSE 29 - length(bin(v)) END) AS maxrank
        FROM rv GROUP BY source, bucket),
    est AS (
        SELECT source,
               ROUND(CASE WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0
                               * 4096.0 / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                               + SUM(2.0 ** (-maxrank)))
                               <= 2.5 * 4096.0
                          AND 4096.0 - CAST(COUNT(*) AS DOUBLE) > 0
                     THEN 4096.0 * LN(4096.0
                                      / (4096.0 - CAST(COUNT(*) AS DOUBLE)))
                     WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank)))
                          >= 1099511627776.0
                     THEN NULL
                     WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank)))
                          > 1099511627776.0 / 30.0
                     THEN -1099511627776.0
                          * LN(1.0 - 0.7213 / (1.0 + 1.079 / 4096.0)
                               * 4096.0 * 4096.0
                               / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                                  + SUM(2.0 ** (-maxrank)))
                               / 1099511627776.0)
                     ELSE 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank))) END, 4) AS est_distinct
        FROM reg GROUP BY source),
    prs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM (SELECT DISTINCT source FROM g) a
        JOIN (SELECT DISTINCT source FROM g) b ON a.source < b.source),
    u AS (
        SELECT sa, sb, bucket, MAX(maxrank) AS maxrank
        FROM prs JOIN reg r ON r.source = sa OR r.source = sb
        GROUP BY sa, sb, bucket),
    uest AS (
        SELECT sa, sb,
               ROUND(CASE WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0
                               * 4096.0 / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                               + SUM(2.0 ** (-maxrank)))
                               <= 2.5 * 4096.0
                          AND 4096.0 - CAST(COUNT(*) AS DOUBLE) > 0
                     THEN 4096.0 * LN(4096.0
                                      / (4096.0 - CAST(COUNT(*) AS DOUBLE)))
                     WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank)))
                          >= 1099511627776.0
                     THEN NULL
                     WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank)))
                          > 1099511627776.0 / 30.0
                     THEN -1099511627776.0
                          * LN(1.0 - 0.7213 / (1.0 + 1.079 / 4096.0)
                               * 4096.0 * 4096.0
                               / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                                  + SUM(2.0 ** (-maxrank)))
                               / 1099511627776.0)
                     ELSE 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                          / ((4096.0 - CAST(COUNT(*) AS DOUBLE))
                             + SUM(2.0 ** (-maxrank))) END, 4) AS est_union
        FROM u GROUP BY sa, sb),
    ex AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(COUNT(*) AS BIGINT) AS exact_overlap
        FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        GROUP BY sa, sb)
    SELECT u.sa AS source_a, u.sb AS source_b,
           ea.est_distinct AS est_a, eb.est_distinct AS est_b,
           u.est_union,
           ROUND(ea.est_distinct + eb.est_distinct - u.est_union, 4)
               AS est_overlap,
           COALESCE(ex.exact_overlap, 0) AS exact_overlap
    FROM uest u
    JOIN est ea ON ea.source = u.sa
    JOIN est eb ON eb.source = u.sb
    LEFT JOIN ex ON ex.sa = u.sa AND ex.sb = u.sb
    ORDER BY u.sa, u.sb
"""


def test_corpus_source_overlap_matches_staged_oracle(spark, duck):
    got = corpus_source_overlap_spark(spark, SF).toPandas()
    want = duck.execute(CORPUS_SOURCE_OVERLAP_ORACLE).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 190
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col
    # accuracy property: intersection error scales with the UNION
    # (inclusion-exclusion of three ~1.6%-sigma estimates) — 5% of the
    # union is > 3 combined sigma; and the matrix must be non-trivial
    err = (got["est_overlap"] - got["exact_overlap"]).abs()
    assert (err / got["est_union"] < 0.05).all()
    assert (got["exact_overlap"] > 0).any()
