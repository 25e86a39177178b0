"""Corpus n-gram language-model document scoring.

The production quality-filter shape (CCNet, Gopher, RefinedWeb): train
a cheap LM on a REFERENCE corpus (Wikipedia-grade text), score every
crawl document by its per-token log-probability, and filter/bucket on
the score. ``text_unigram_logprob`` (queries/llm.py) is the
train-on-itself unigram proxy; this module adds the bigram model with
Stupid Backoff (Brants et al. 2007, "Large Language Models in Machine
Translation") and the train/score split that makes backoff meaningful:
a bigram unseen in the reference corpus backs off to the (smoothed)
unigram, so reference-like prose scores high and boilerplate/keyword
spam scores low — a sharper signal than unigram frequency alone.

Stupid Backoff (score, not a normalized probability — the whole point
of the method is skipping the discount bookkeeping at corpus scale):

    S(w2 | w1) = c(w1 w2) / c(w1)            if c(w1 w2) > 0
               = alpha * (c(w2) + 1) / (N + V)   otherwise

with ``alpha`` = 0.4 (the paper's constant), N = training token count,
V = training vocabulary size. The +1/(N+V) add-one smoothing on the
backoff keeps fully-OOV words finite (the paper scores within-corpus
where OOV can't happen; a crawl scorer must handle it).

Spark shape — everything is counts keyed by words, never text:

- bigrams come from one ``transform(sequence(...))`` over the token
  array (a narrow map — NO positional self-join);
- training tables are two partial-agg'd groupBys (bigram and unigram
  counts) plus two 1-row scalars (N, V) broadcast into the scorer;
- scoring is two equi-joins on Zipf-shaped word keys (the unigram
  story: df-capped/broadcastable head at 100 TB, AQE skew-split on
  stopword keys) followed by one groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STUPID_BACKOFF_ALPHA = 0.4


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    )


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for each adjacent token pair — a narrow map over
    the token array, no join. Docs with < 2 tokens yield no rows (the
    size filter also guards Spark's sequence(), which DESCENDS for
    sequence(0, -1) and would index toks[-1] on a 1-token doc)."""
    return (
        _tokens(df, id_col, text_col)
        .filter(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_logprob(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = STUPID_BACKOFF_ALPHA,
) -> DataFrame:
    """Score every document in ``score`` under a Stupid-Backoff bigram
    LM trained on ``train``. Returns ``(id_col, n_bigrams bigint,
    avg_logprob double, ppl_proxy double)`` — mean log-score over the
    document's bigrams and exp(-mean) as the perplexity proxy, both
    unrounded (callers round for engine-stable comparison). Documents
    with fewer than 2 tokens have no bigrams and are omitted (score
    them with the unigram model if they matter).
    """
    tb = _bigrams(train, id_col, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("cb")
    )
    # the unigram table feeds THREE consumers (the (N, V) scalar and
    # both scoring joins) — shared lineage is not shared execution, so
    # materialize the training aggregation once (the dedup_semantic_*
    # discipline); localCheckpoint self-releases on GC
    tu = (
        _tokens(train, id_col, text_col)
        .select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=True)
    )
    # fail loud in-plan on an empty training corpus (sum over zero rows
    # is NULL and would otherwise propagate null scores silently)
    scal = tu.agg(
        F.sum("cu").cast("double").alias("n_tok"),
        F.count("*").cast("double").alias("v_size"),
    ).select(
        F.when(
            F.assert_true(
                F.col("n_tok").isNotNull(),
                "bigram_logprob: empty training corpus (no tokens)",
            ).isNull(),
            F.col("n_tok"),
        ).alias("n_tok"),
        "v_size",
    )
    sb = _bigrams(score, id_col, text_col)
    scored = (
        sb.join(tb, ["w1", "w2"], "left")
        .join(tu.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1", "left")
        .join(tu.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            id_col,
            F.when(
                F.col("cb").isNotNull(), F.col("cb") / F.col("cu1")
            )
            .otherwise(
                F.lit(alpha)
                * (F.coalesce(F.col("cu2"), F.lit(0)) + F.lit(1.0))
                / (F.col("n_tok") + F.col("v_size"))
            )
            .alias("s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.avg(F.log("s")).alias("avg_logprob"),
            F.exp(-F.avg(F.log("s"))).alias("ppl_proxy"),
        )
    )
