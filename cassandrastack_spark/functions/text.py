"""Text-analysis column functions: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything here is a pure Spark column expression (whole-stage codegen,
no Python in the hot path), and every ratio is integer-derived IEEE
division so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible — this is a heuristic
# scorer, not a model.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "de", "que"],
}


def words(text: Column | str) -> Column:
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is
    provided separately in quality metrics)."""
    return F.size(words(text))


def _quality_features(text_col: str) -> dict[str, Column]:
    """The shared raw quality signals — ONE definition consumed by both
    the reported metrics (``quality_metrics``) and the model scorer
    (``quality_score_linear``), so the features a model is trained on
    can never silently diverge from the metrics the pipeline reports."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    n_chars = F.length(F.col(text_col))
    stop = F.size(
        F.expr(
            f"filter(split({text_col}, ' '), w -> w IN ('the', 'a', 'of', 'and'))"
        )
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "avg_word_len": (n_chars - (n_tokens - 1)) / n_tokens,
        "stopword_ratio": stop / n_tokens,
    }


def quality_metrics(text_col: str) -> list[Column]:
    """Length / token / word-length / stopword-ratio quality signals.

    Returns aliased columns: n_chars_calc, n_tokens, avg_word_len,
    stopword_ratio, est_bpe_tokens.
    """
    f = _quality_features(text_col)
    return [
        f["n_chars"].cast("int").alias("n_chars_calc"),
        f["n_tokens"].cast("int").alias("n_tokens"),
        f["avg_word_len"].alias("avg_word_len"),
        f["stopword_ratio"].alias("stopword_ratio"),
        F.ceil(f["n_chars"] / F.lit(4)).cast("int").alias("est_bpe_tokens"),
    ]


# Stand-in linear-model weights for `quality_score_linear` — the
# fasttext-style quality classifier every production corpus pipeline
# runs, reduced to its SERVING shape: the features and the scoring
# expression are real (whole-stage codegen, SQL-replicable); the
# weights are placeholders a deployer swaps for their trained model's
# (training the classifier is out of scope — no model runtime in the
# reference or this engine).
QUALITY_MODEL_WEIGHTS = {
    "log1p_tokens": 0.8,       # longer docs score higher, saturating
    "avg_word_len": -0.15,     # penalize letter-soup / no-space blobs
    "stopword_ratio": 6.0,     # natural-language evidence
}
QUALITY_MODEL_BIAS = -2.0


def quality_score_linear(
    text_col: str,
    weights: dict | None = None,
    bias: float | None = None,
) -> Column:
    """Linear quality-model score: ``sigmoid(bias + w · features)``
    over the engine's SQL-replicable quality features (ln(1+tokens),
    avg word length, stopword ratio). One expression per document —
    no UDF, no shuffle; at 100 TB this is a free rider on whatever
    scan already touches the text column. Swap ``weights``/``bias``
    for a trained model's parameters; the serving plan is identical.
    """
    w = QUALITY_MODEL_WEIGHTS if weights is None else weights
    b = QUALITY_MODEL_BIAS if bias is None else bias
    raw = _quality_features(text_col)
    feats = {
        "log1p_tokens": F.log(F.lit(1.0) + raw["n_tokens"]),
        "avg_word_len": raw["avg_word_len"],
        "stopword_ratio": raw["stopword_ratio"],
    }
    unknown = sorted(set(w) - set(feats))
    if unknown:
        raise ValueError(
            f"quality_score_linear: unknown feature(s) {unknown} in "
            f"weights — supported features are {sorted(feats)}"
        )
    z = F.lit(float(b))
    for name, weight in w.items():
        z = z + F.lit(float(weight)) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def langid_scores(text_col: str) -> Column:
    """Predicted language = argmax over per-language stopword hit counts
    (ties broken by language code order); 'und' when no stopword hits."""
    scores = []
    for lang, sw in sorted(LANG_STOPWORDS.items()):
        arr = ", ".join(f"'{w}'" for w in sw)
        scores.append(
            F.struct(
                F.size(
                    F.expr(f"filter(split({text_col}, ' '), w -> w IN ({arr}))")
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


# GPT-2-style pretokenizer pattern, restricted to constructs that Java
# regex (Spark) and RE2 (DuckDB oracle) interpret identically: no
# lookarounds, ASCII classes (non-ASCII falls into the punctuation-run
# branch consistently in both engines). Branches: common English
# contractions, space+letter-run, space+digit-run, space+symbol-run.
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
)


def bpe_tokens(text: Column | str) -> Column:
    """BPE-ish pretokenization: the regex split every byte-pair encoder
    (GPT-2/tiktoken family) applies before merges. Token COUNT from this
    stage upper-bounds the true BPE count and tracks it closely — the
    standard cheap estimator for corpus token budgeting."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def fingerprint(text_col: str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text (portable across engines)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return F.md5(norm)


# PII patterns restricted to constructs Java regex (Spark) and RE2
# (DuckDB oracle) interpret identically: character classes, bounded
# repetition, alternation — no lookarounds, no backreferences.
# Redaction order matters and is encoded in the list: URLs first (they
# embed digits/dots that would otherwise part-match IP/phone), then
# emails (digits in the local part), then IPs (dotted digits), then
# bare phone-like digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace URL / email / IPv4 / phone-shaped spans with typed tags.

    Pure chained ``regexp_replace`` — whole-stage codegen, no Python in
    the hot path; at 100 TB this is a narrow map stage with zero
    shuffle. Counts of each PII type (for filtering decisions) come
    from ``pii_counts`` over the ORIGINAL column, since redaction
    destroys the evidence.
    """
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, tag in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, tag)
    return col


def pii_counts(text: Column | str) -> list[Column]:
    """Per-type PII match counts (n_url, n_email, n_ip, n_phone).

    Counted in redaction order on the progressively-redacted text, so
    each span is attributed to exactly one type (an email's digits are
    never double-counted as a phone) — the same accounting the redactor
    applies.
    """
    col = F.col(text) if isinstance(text, str) else text
    out: list[Column] = []
    for name, pattern, tag in PII_PATTERNS:
        out.append(F.regexp_count(col, F.lit(pattern)).cast("int").alias(f"n_{name}"))
        col = F.regexp_replace(col, pattern, tag)
    return out


def word_ngrams(text: Column | str, n: int) -> Column:
    """Word-level n-grams as an array column — the unit of benchmark
    decontamination (a train doc sharing any n-gram with an eval doc is
    suspect). Pure array expressions: split once, then slide a window
    via ``transform(sequence(...))`` — narrow, codegen'd, no explode
    until the caller chooses to."""
    toks = words(text)
    upper = F.size(toks) - F.lit(n - 1)
    return F.when(
        upper >= 1,
        F.transform(
            F.sequence(F.lit(1), upper),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
