"""Distributed graph centrality: weighted PageRank.

The crawl-prioritization signal: production training-data pipelines
rank domains/hosts by link centrality to decide what to fetch and how
to weight it (the CommonCrawl-derived corpora all carry some variant
of this). The graph companion to ``llm/dedup.py dedup_components``:
components answers "which docs are the same", centrality answers
"which sources matter".

Spark-first shape: one edge normalization pass, then a fixed number
of (join → aggregate) rounds. Each round shuffles (node, mass) pairs
only — never edge payloads — and the rank frame is
``localCheckpoint``-ed each round so the plan stays ONE join deep
(lineage otherwise grows linearly with iterations, the optimizer
re-plans the whole history each round, and the twice-read ranks frame
re-executes exponentially — the same discipline as the
label-propagation loop in ``dedup_components``). Dangling mass (nodes
with no out-edges) is redistributed uniformly each round, so total
rank stays 1 and the result is a proper distribution.

At 100 TB the node set is domains (millions) and edges are links
(billions): both sides stay distributed, the per-round shuffle is
keyed by node id, and AQE's skew handling covers hub domains. A fixed
``iters`` (15 is the classic "power iteration is converged enough for
ranking" depth) keeps the round count deterministic — convergence
detection would add a per-round driver aggregate like the components
loop's signature; callers who need it can compare successive ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 15,
    damping: float = 0.85,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    ``rank(v) = (1 - d) / n + d * (sum_{u->v} rank(u) * w(u,v) /
    out(u) + dangling / n)`` iterated ``iters`` times from the uniform
    start; ``w/out(u)`` are edge-weight fractions (uniform when
    ``weight_col`` is None). Returns (node, rank) — ranks sum to 1.

    Deterministic: same edges, same parameters, same ranks (the only
    float-order variance is partial-sum ordering inside a round,
    sub-ulp at ranking granularity).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        w.alias("w"),
        # zero/negative/null weights carry no mass — kept, they would
        # make out_w = 0 for an all-zero source, its fractions null,
        # and that node neither transfers NOR counts as dangling: its
        # rank silently leaks every round and the result stops being a
        # distribution. Dropping them up front means such a source is
        # honestly dangling (mass redistributes) and sum(rank) stays 1.
    ).filter(F.col("w") > 0)
    # out-weight normalization: each edge carries the FRACTION of its
    # source's mass it transfers — computed once, reused every round
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out, "src")
        .withColumn("frac", F.col("w") / F.col("out_w"))
        .select("src", "dst", "frac")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    has_out = frac.select(F.col("src").alias("node")).distinct()
    for it in range(iters):
        # mass arriving over edges this round
        contrib = (
            frac.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("in_mass"))
        )
        # dangling nodes' mass redistributes uniformly (keeps sum = 1)
        dangling_row = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling_row))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dangling") / n
                    )
                ).alias("rank"),
            )
        )
        # per-round checkpointing is the scale-correct default: ranks
        # is read TWICE per round (contributions + dangling), so an
        # un-checkpointed tail re-executes 2^depth times — at real
        # graph sizes that is re-running big shuffles, far costlier
        # than one cheap checkpoint per round (measured: relaxing to
        # every-3 saved nothing even on a 5-node graph). The knob
        # exists for graphs small enough that job-submission overhead
        # dominates AND the caller has measured the trade. The LAST
        # round always checkpoints so callers get a materialized
        # result.
        if it % checkpoint_every == checkpoint_every - 1 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
