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


def quality_metrics(text_col: str) -> list[Column]:
    """Length / token / word-length / stopword-ratio quality signals.

    Returns aliased columns: n_chars_calc, n_tokens, avg_word_len,
    stopword_ratio, est_bpe_tokens.
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    n_chars = F.length(F.col(text_col))
    stop = F.size(
        F.expr(
            f"filter(split({text_col}, ' '), w -> w IN ('the', 'a', 'of', 'and'))"
        )
    )
    return [
        n_chars.cast("int").alias("n_chars_calc"),
        n_tokens.cast("int").alias("n_tokens"),
        ((n_chars - (n_tokens - 1)) / n_tokens).alias("avg_word_len"),
        (stop / n_tokens).alias("stopword_ratio"),
        F.ceil(n_chars / F.lit(4)).cast("int").alias("est_bpe_tokens"),
    ]


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
