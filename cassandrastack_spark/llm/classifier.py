"""Trained linear text classifier over hashed n-gram features — the
fastText-classifier shape (Joulin et al., "Bag of Tricks for Efficient
Text Classification", 2016 — public paper) as pure JVM DataFrame ops.

This is the standard learned quality filter a training-data pipeline
runs corpus-wide (the CCNet / GPT-3 / LLaMA "quality classifier"
stage): features are word n-grams hashed into a FIXED-dimension bucket
space (the hashing trick — vocabulary never materializes), the model is
one weight per bucket plus a bias, scoring is a sparse dot product.
Unlike ``functions.text.quality_score_linear`` (three hand-tuned
surface features), this model is TRAINED from labeled seed documents —
here by Naive-Bayes log-odds with add-one smoothing, which has a
closed decomposable form both Spark and a SQL oracle compute exactly:

    w_b  = ln((pos_b + 1) / (pos_tot + dim))
         - ln((neg_b + 1) / (neg_tot + dim))
    bias = ln(n_pos_docs / n_neg_docs)

(the NB-feature half of the NBSVM recipe — Wang & Manning 2012). The
weight table IS the model artifact: ``dim + 1`` rows, persistable,
broadcastable, swappable for externally-trained weights of the same
shape.

Scale shape at 100 TB:

- featurize: one narrow explode per document (tokens + adjacent
  bigrams), bucket = md5-slice mod dim (the repo's portable hash — a
  SQL engine rebuilds the identical buckets); the only shuffle is the
  (doc, bucket) count, bounded by the gram count, never wider than a
  tokenize.
- train: one groupBy bucket over the SEED subset — output is dim rows
  whatever the seed size; totals are a 1-row broadcast scalar (the
  canonical scalar-subquery plan, corpus_source_kl's shape).
- score: features equi-join the broadcast dim-row weight table, one
  map-side-combinable decimal sum per document — corpus scanned once,
  shuffle carries one row per document. No UDF anywhere.

Determinism: per-(doc, bucket) counts are integers; each dot-product
term ``cnt * w_b`` is one IEEE multiply; terms are summed as
DECIMAL(28,18) so the reduction is ORDER-FREE (the PSI-oracle rule),
then one final round on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# md5-hex slice → bucket, the repo's portable-hash discipline (CM /
# Bloom / HLL oracles): 7 hex digits = 28 bits, unsigned, mod dim
_HASH_BITS_HEX = 7


def _bucket(col: Column, dim: int) -> Column:
    return (
        F.conv(F.substring(F.md5(col), 1, _HASH_BITS_HEX), 16, 10)
        .cast("bigint")
        % dim
    )


def hashed_gram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """Hashed bag-of-n-grams: ``(id_col, bucket int, cnt bigint)`` —
    whitespace unigrams plus (optionally) adjacent bigrams joined with
    a single space, each hashed into ``dim`` buckets. Collisions are
    the hashing trick's accepted trade (fastText §2): the classifier
    learns/scores in bucket space, so train and score see the SAME
    collisions and stay consistent. NULL/empty text yields no rows
    (no evidence — downstream scoring coalesces to bias-only).
    """
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    toks = F.split(F.col(text_col), " ")
    grams = F.filter(toks, lambda w: w != F.lit(""))
    if bigrams:
        # zip each token with its successor; the LAST token zips with
        # null, which concat_ws renders as a bare unigram repeat - the
        # contains-space keep-filter drops it
        big = F.zip_with(
            grams,
            F.slice(grams, 2, F.greatest(F.size(grams) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        grams = F.concat(grams, F.filter(big, lambda g: g.contains(" ")))
    out = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .select(
            id_col, _bucket(F.col("gram"), dim).cast("int").alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return out


def nb_logodds_weights(
    features: DataFrame,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    dim: int = 4096,
) -> DataFrame:
    """Train the NB log-odds model: per-bucket
    ``weight = ln((pos_b+1)/(pos_tot+dim)) - ln((neg_b+1)/(neg_tot+dim))``
    over the labeled seed (``label_col`` boolean: True = positive
    class), plus ``bias = ln(n_pos_docs / n_neg_docs)`` carried on
    every row (the weight table stays one self-contained artifact).
    Returns ``(bucket int, weight double, bias double, dim int)`` with
    a row for EVERY bucket 0..dim-1 (unseen buckets get the pure
    smoothing weight), so scoring is a plain equi-join with no
    null-handling asymmetry. Raises if either class is absent — a
    one-class "model" scores everything identically and is never what
    the caller meant. Label rows are deduplicated — a seed row
    repeated verbatim counts its document once — and a doc id
    carrying BOTH labels fails loud in-plan (ADVICE r15: it would
    silently double-count that doc's grams into both classes and
    inflate the doc counts; there is no right answer to train on a
    contradictory seed).
    """
    lab = (
        labels.select(
            F.col(id_col), F.col(label_col).cast("boolean").alias("_pos")
        )
        # NULL ids carry no trainable evidence (the features equi-join
        # would drop them anyway) and must not trip the contradiction
        # guard below: count(*) sees them, count_distinct(id) does not
        # (review r16)
        .filter(F.col("_pos").isNotNull() & F.col(id_col).isNotNull())
        .distinct()
    )
    fl = features.join(lab, id_col)
    per_bucket = fl.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), F.col("cnt")).otherwise(0)).alias("pb"),
        F.sum(F.when(~F.col("_pos"), F.col("cnt")).otherwise(0)).alias("nb"),
    )
    tot = lab.agg(
        F.count_distinct(F.when(F.col("_pos"), F.col(id_col))).alias("n_pos"),
        F.count_distinct(F.when(~F.col("_pos"), F.col(id_col))).alias("n_neg"),
        # post-distinct: rows > distinct ids <=> some id has both labels
        F.count("*").alias("_nlab"),
        F.count_distinct(F.col(id_col)).alias("_nids"),
    )
    gram_tot = fl.agg(
        F.sum(F.when(F.col("_pos"), F.col("cnt")).otherwise(0)).alias("pt"),
        F.sum(F.when(~F.col("_pos"), F.col("cnt")).otherwise(0)).alias("nt"),
        F.max("bucket").alias("_maxb"),
        F.min("bucket").alias("_minb"),
    )
    scal = tot.crossJoin(gram_tot)  # 1 row x 1 row
    guard = (
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
        & (F.col("_nlab") == F.col("_nids"))
        # buckets outside [0, dim) mean the features were hashed at a
        # DIFFERENT dim: the spine left-join would silently drop them
        # while their counts still inflate the smoothing totals
        # (review r15)
        & (
            F.col("_maxb").isNull()
            | (
                (F.col("_maxb") < F.lit(int(dim)))
                & (F.col("_minb") >= 0)
            )
        )
    )
    return _assemble_nb_weights(
        per_bucket, scal, dim, guard,
        "nb_logodds_weights: degenerate seed — both classes must be "
        "present, no doc id may carry both labels, and every feature "
        "bucket must lie in [0, dim) (features hashed at a different "
        "dim than the model's?)",
    )


def _assemble_nb_weights(
    per_bucket: DataFrame,
    scal: DataFrame,
    dim: int,
    guard: Column,
    guard_msg: str,
) -> DataFrame:
    """The shared weight-table assembly for the batch trainer and the
    streaming count-state resolution (one copy of the smoothing
    arithmetic, so the two can never drift): dense bucket spine (unseen
    buckets still get the pure smoothing weight), 1-row scalar
    broadcast of the totals, in-plan guard wrapped around the bias.
    ``per_bucket`` is ``(bucket, pb, nb)``; ``scal`` is one row
    carrying at least ``n_pos, n_neg, pt, nt`` plus whatever columns
    ``guard`` references."""
    spine = (
        per_bucket.sparkSession.range(dim)
        .select(F.col("id").cast("int").alias("bucket"))
    )
    return (
        spine.join(per_bucket, "bucket", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("pb"), F.lit(0)) + 1.0)
                    / (F.col("pt") + F.lit(float(dim)))
                )
                - F.log(
                    (F.coalesce(F.col("nb"), F.lit(0)) + 1.0)
                    / (F.col("nt") + F.lit(float(dim)))
                )
            ).alias("weight"),
            F.when(
                F.assert_true(guard, guard_msg).isNull(),
                F.log(
                    F.col("n_pos").cast("double")
                    / F.col("n_neg").cast("double")
                ),
            ).alias("bias"),
            F.lit(int(dim)).alias("dim"),
        )
    )


def linear_text_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: bool = True,
    out_col: str = "score",
) -> DataFrame:
    """Score every document with the hashed-gram linear model:
    ``(id_col, logit double, out_col double)`` where
    ``logit = bias + sum_b cnt_b * weight_b`` and ``out_col`` is its
    sigmoid. ``weights`` is a ``nb_logodds_weights``-shaped frame
    (bucket, weight, bias, dim — dim read from the model so featurize
    and train can never disagree on the bucket space; mixed dims in
    one table fail loud in-plan). If the artifact carries a
    ``bigrams`` column (``nb_weights_state`` artifacts do), the gram
    space is ALSO read from the model and overrides the ``bigrams``
    argument — a unigram-trained model can never be silently scored
    in bigram space (review r16); mixed values fail loud like mixed
    dims. A document with no grams (empty text) scores at bias alone. The weight table broadcasts; the dot
    product is one decimal-summed aggregation per document.
    """
    has_geometry = "bigrams" in weights.columns
    scal = weights.agg(
        F.when(
            F.assert_true(
                (F.count_distinct("dim") <= 1)
                & (F.count_distinct("bias") <= 1)
                & (
                    (F.count_distinct("bigrams") <= 1)
                    if has_geometry
                    else F.lit(True)
                )
                # duplicated bucket rows of the SAME model (e.g. a
                # self-unioned weight table) pass the dim/bias check
                # but silently double every weight in the dot product
                # (ADVICE r15): a well-formed artifact has exactly one
                # row per bucket
                & (F.count("*") == F.count_distinct("bucket")),
                "linear_text_score: malformed weight table — mixed "
                "dim/bias/bigrams (hand-unioned models?) or duplicated "
                "bucket rows (self-unioned artifact?); retrain or "
                "split",
            ).isNull(),
            F.max("dim"),
        ).alias("dim"),
        F.max("bias").alias("bias"),
        (
            F.max("bigrams") if has_geometry else F.lit(None)
        ).alias("bigrams"),
    )
    dim, bias, model_bigrams = scal.first()
    if dim is None:
        raise ValueError(
            "linear_text_score: empty weight table — the model "
            "artifact has no rows (mis-pathed read? filtered away?)"
        )
    if model_bigrams is not None:
        bigrams = bool(model_bigrams)
    feats = hashed_gram_features(df, id_col, text_col, int(dim), bigrams)
    dot = (
        feats.join(F.broadcast(weights.select("bucket", "weight")), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(
                (F.col("cnt") * F.col("weight")).cast("decimal(28,18)")
            ).alias("_dot")
        )
    )
    logit = (F.coalesce(F.col("_dot").cast("double"), F.lit(0.0))
             + F.lit(float(bias)))
    return (
        df.select(id_col)
        .distinct()
        .join(dot, id_col, "left")
        .select(
            id_col,
            logit.alias("logit"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias(out_col),
        )
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Precision-recall table over a labeled, scored frame — the
    threshold-selection step between training a quality filter and
    running it corpus-wide ("keep documents scoring >= t; which t
    hits the precision the downstream mix needs?"). One row per
    DISTINCT score value: ``(threshold double, tp bigint, fp bigint,
    fn bigint, precision double, recall double, f1 double)`` where
    tp/fp count labeled rows scoring >= threshold and fn the
    positives below it. NULL scores and NULL labels are dropped
    (unlabeled rows carry no curve evidence); ties share one row by
    construction; a frame with no positive rows yields recall = NULL
    (0/0 — undefined, not a crash) with precision 0 everywhere, so
    ``threshold_for_precision`` correctly returns zero rows on it.

    Scale shape: one groupBy collapses the labeled frame to its
    distinct scores (bounded by the score space, not the corpus) and
    one cumulative window over that collapsed frame walks the curve —
    the window runs over distinct-score rows only, never the corpus.
    The cumulative walk is a single-partition window BY DESIGN (a
    cumulative curve is a global order); with near-unique continuous
    scores, round or bucket the score column first so the distinct
    score space stays window-sized — the labeled seed a threshold is
    tuned on is sample-sized anyway, never the corpus.
    Determinism: tp/fp/fn are integers; precision/recall/f1 are
    single IEEE divisions of integers (exact, no rounding needed) —
    the integer-ratio oracle rule.
    """
    from pyspark.sql import Window

    base = (
        scored.select(
            F.col(score_col).cast("double").alias("_s"),
            F.col(label_col).cast("boolean").alias("_pos"),
        )
        .filter(
            F.col("_s").isNotNull()
            & ~F.isnan("_s")
            & F.col("_pos").isNotNull()
        )
    )
    per_score = base.groupBy("_s").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("_p"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("_n"),
    )
    w = Window.orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # frame-wide positive total rides the SAME single-partition window
    # (review r16 — a second aggregation branch + broadcast cross join
    # re-evaluated the per-score subplan for a value the window frame
    # already holds)
    w_all = Window.orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_score.withColumn("tp", F.sum("_p").over(w).cast("bigint"))
        .withColumn("fp", F.sum("_n").over(w).cast("bigint"))
        .withColumn("_tp_all", F.sum("_p").over(w_all).cast("bigint"))
        .select(
            F.col("_s").alias("threshold"),
            "tp",
            "fp",
            (F.col("_tp_all") - F.col("tp")).cast("bigint").alias("fn"),
            (
                F.col("tp") / (F.col("tp") + F.col("fp"))
            ).alias("precision"),
            # try_divide: a labeled frame with NO positive rows has
            # recall undefined (0/0) — NULL, not an ANSI-mode
            # DIVIDE_BY_ZERO crash (review r16, reproduced); precision
            # and f1 denominators are provably >= 1 per row
            F.try_divide(F.col("tp"), F.col("_tp_all")).alias("recall"),
            (
                2.0 * F.col("tp")
                / (2.0 * F.col("tp") + F.col("fp")
                   + (F.col("_tp_all") - F.col("tp")))
            ).alias("f1"),
        )
        .orderBy(F.desc("threshold"))
    )


def threshold_for_precision(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    target_precision: float,
) -> DataFrame:
    """The operating point: the LOWEST threshold (maximum recall)
    whose precision on the labeled frame is still >= the target — one
    row of ``pr_curve``'s schema, or zero rows if no threshold
    reaches the target (the caller decides between relabeling and
    lowering the bar; inventing a row would hide the miss). Built on
    ``pr_curve``, so the two can never disagree on the arithmetic.
    """
    if not (0.0 < float(target_precision) <= 1.0):
        raise ValueError(
            f"target_precision must be in (0, 1], got {target_precision}"
        )
    curve = pr_curve(scored, score_col, label_col)
    return (
        curve.filter(F.col("precision") >= float(target_precision))
        .orderBy("threshold")
        .limit(1)
    )
