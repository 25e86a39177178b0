"""Bounded-state heavy-hitter candidates (Misra-Gries summaries).

The scale problem: an exact ``groupBy(key).count()`` over an
unbounded-cardinality key (tokens, n-grams, URLs) shuffles the FULL
distinct-key space — at 100 TB that is billions of grouping keys even
after map-side combine, and the hash-aggregate state on each task is
proportional to its distinct keys, not to the answer. Heavy-hitter
queries (top-k most frequent) don't need that: a Misra-Gries summary
per input partition bounds BOTH the per-task state and the shuffle to
``capacity`` rows per partition, and its classic guarantee (Misra &
Gries 1982; merge rule per Agarwal et al. 2012, "Mergeable
Summaries") says every key whose true partition count exceeds
``N_partition / (capacity + 1)`` survives — so, by pigeonhole, every
GLOBAL heavy hitter above ``N / (capacity + 1)`` survives in at least
one partition's summary.

The intended production shape is two passes (see
``text_heavy_hitters_sketch`` in queries/llm.py):

1. candidates = union of per-partition summaries (this module) —
   a mapInPandas pass whose output is ≤ partitions × capacity rows;
2. exact counts for the candidates alone — a semi-join on the
   candidate set (AQE broadcasts it when it fits; no forced hint, so
   extreme partition counts degrade to a still-bounded shuffled join)
   followed by ``groupBy(key).count()``, whose shuffle is bounded by
   the candidate set instead of the key space.

Pass 2 re-reads the input, but rides the same scan/projection; the
trade is one extra scan for a shuffle bounded by ``partitions ×
capacity`` instead of the full key cardinality — the same
candidates-then-verify discipline as the PPJoin/LSH dedup operators.

Summaries are built per Arrow batch with a vectorized
``value_counts`` merged into a bounded pandas Series (no per-row
Python loop); the decrement step subtracts the (capacity+1)-th
largest counter from all and drops non-positives, which is exactly
the mergeable-summaries rule, so the batch-granularity merge keeps
the Misra-Gries bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(
    df: DataFrame, key_col: str, capacity: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries.

    Returns a DataFrame ``(key_col <input type>, cnt_lb long)`` with at most
    ``capacity`` rows PER INPUT PARTITION: the summary keys and their
    conservative (lower-bound) counts. Guarantee: every key whose true
    count within a partition exceeds ``N_partition / (capacity + 1)``
    appears in that partition's summary with
    ``cnt_lb >= true_count - N_partition / (capacity + 1)``.

    The same key may appear once per partition — callers aggregate or
    ``distinct()`` downstream (that shuffle is the bounded one). Nulls
    are ignored (they can't be a candidate key). The key column keeps
    its input type (string, integer, ...).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    cap = int(capacity)
    key_type = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        summ = None  # pd.Series: key -> counter
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            if vc.empty:
                continue
            summ = vc if summ is None else summ.add(vc, fill_value=0)
            if len(summ) > cap:
                summ = summ.sort_values(ascending=False)
                dec = summ.iloc[cap]  # (cap+1)-th largest counter
                summ = summ - dec
                summ = summ[summ > 0]  # <= cap keys are strictly > dec
        if summ is not None and len(summ):
            out = summ.reset_index()
            out.columns = [key_col, "cnt_lb"]
            out["cnt_lb"] = out["cnt_lb"].astype("int64")
            yield out

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {key_type}, cnt_lb long"
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 10, capacity: int = 256
) -> DataFrame:
    """Exact top-``k`` most frequent keys, computed with bounded state:
    the two-pass candidates-then-verify composition described in the
    module docstring. Returns ``(key_col, cnt bigint)`` ordered by
    count desc, key asc (deterministic tie-break).

    Correct whenever the true top-k all exceed ``N / (capacity + 1)``
    of some partition — for skewed frequency distributions (tokens,
    n-grams, URLs) any generous ``capacity`` ≫ k satisfies this; size
    capacity against k and the expected skew, not against the key
    cardinality. The output counts are EXACT (pass 2 recounts the
    candidates), so a too-small capacity under-recalls candidates
    rather than mis-counting survivors.
    """
    cand = (
        mg_candidates(df, key_col, capacity=capacity)
        .select(key_col)
        .distinct()
    )
    # no broadcast hint: the candidate union is bounded by partitions x
    # capacity, which AQE broadcasts when it fits but which a forced
    # hint would OOM at extreme partition counts (10^6 partitions x
    # 256 keys); the shuffled hash join keeps the same bounded volume
    return (
        df.select(key_col)
        .join(cand, key_col)
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), key_col)
        .limit(k)
    )
