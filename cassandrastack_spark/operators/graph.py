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
ranking" depth) keeps the round count deterministic; ``tol=`` adds
the components-loop-style convergence signature (one 1-row L1-delta
aggregate per round crosses to the driver) so converged graphs exit
early with ``iters`` as the hard cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def _normalize(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
) -> tuple[DataFrame, DataFrame]:
    """(frac, nodes): edge fractions + the node universe.

    The node set derives from the UNFILTERED edge list — a node whose
    every edge has zero/negative/null weight still gets a rank row (it
    is simply dangling: it transfers no mass, its own mass
    redistributes). Weight filtering applies only to the fraction
    computation, where a non-positive weight would otherwise make an
    all-zero source's fractions null and leak its rank every round.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        w.alias("w"),
    )
    e = raw.filter(F.col("w") > 0)
    # out-weight normalization: each edge carries the FRACTION of its
    # source's mass it transfers — computed once, reused every round
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out, "src")
        .withColumn("frac", F.col("w") / F.col("out_w"))
        .select("src", "dst", "frac")
    )
    nodes = (
        raw.select(F.col("src").alias("node"))
        .unionByName(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    return frac, nodes


def _prepare(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
) -> tuple[DataFrame, DataFrame, int]:
    """Shared iteration setup for ``pagerank`` AND
    ``pagerank_round_plan`` (one definition, so the audited round can
    never drift from what the real loop executes): checkpoint the
    round-invariant ``frac``/``nodes`` frames and count the node
    universe. ``nodes`` carries a ``has_out`` flag (does the node have
    positive-weight out-edges), resolved ONCE here — the flag rides the
    rank frame through every round, so the per-round dangling aggregate
    is a filter over the frame it already reads instead of an anti-join
    against the has-out set (round-invariant work hoisted out of the
    loop: one join per round removed)."""
    frac, nodes = _normalize(edges, src_col, dst_col, weight_col)
    frac = frac.localCheckpoint(eager=True)
    has_out = frac.select(F.col("src").alias("node")).distinct()
    # the node count rides the checkpoint action as an observed metric
    # (the dedup_components convergence pattern) — no separate count
    # job after the materialization
    obs = Observation()
    nodes = (
        nodes.join(has_out.withColumn("_ho", F.lit(True)), "node", "left")
        .select(
            "node", F.coalesce(F.col("_ho"), F.lit(False)).alias("has_out")
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = obs.get["n"]
    return frac, nodes, n


def _round(
    nodes: DataFrame,
    frac: DataFrame,
    ranks: DataFrame,
    n: int,
    damping: float,
) -> DataFrame:
    """One power-iteration update: ranks -> next ranks.

    Shuffles only (node, mass) pairs; the 1-row dangling aggregate is
    a bounded scalar broadcast (the documented BNL pattern). The
    dangling sum filters on the ``has_out`` flag the rank frame
    carries (resolved once in ``_prepare``) — no per-round anti-join."""
    # mass arriving over edges this round
    contrib = (
        frac.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("rank") * F.col("frac")).alias("in_mass"))
    )
    # dangling nodes' mass redistributes uniformly (keeps sum = 1)
    dangling_row = ranks.filter(~F.col("has_out")).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
    )
    return (
        nodes.join(contrib, "node", "left")
        .crossJoin(F.broadcast(dangling_row))
        .select(
            "node",
            "has_out",
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


def _round_personalized(
    nodes_r: DataFrame,
    frac: DataFrame,
    ranks: DataFrame,
    damping: float,
) -> DataFrame:
    """One personalized power-iteration update: the teleport AND the
    dangling redistribution both follow the reset distribution ``r``
    (a column on ``nodes_r``, summing to 1) instead of 1/n — the
    topic-sensitive/seeded variant (Haveliwala 2002): mass
    concentrates around the seed set. Kept separate from ``_round``
    so the uniform path's float sequence (and its unrolled DuckDB
    oracle) stays bit-for-bit unchanged."""
    contrib = (
        frac.join(
            ranks.select(F.col("node").alias("src"), "rank"), "src"
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("rank") * F.col("frac")).alias("in_mass"))
    )
    dangling_row = ranks.filter(~F.col("has_out")).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
    )
    return (
        nodes_r.join(contrib, "node", "left")
        .crossJoin(F.broadcast(dangling_row))
        .select(
            "node",
            "has_out",
            (
                F.lit(1.0 - damping) * F.col("r")
                + damping
                * (
                    F.coalesce(F.col("in_mass"), F.lit(0.0))
                    + F.col("dangling") * F.col("r")
                )
            ).alias("rank"),
        )
    )


def pagerank_round_plan(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
) -> DataFrame:
    """The UN-checkpointed single-round update plan, for inspection.

    ``pagerank`` checkpoints each round, so the frame it returns plans
    as a scan of materialized rows — correct, but it hides the
    per-round physical shape from ``.explain``. This helper builds
    exactly one round on top of the uniform start without any
    checkpoint: what you see (one frac-to-ranks equi-join feeding a
    (node, mass) aggregate, one left join onto the node universe, one
    1-row dangling broadcast) is what every round executes. ``frac``
    and ``nodes`` ARE checkpointed, exactly as in ``pagerank`` — they
    are round-invariant inputs, and leaving them lazy would make the
    explain show the edge-construction pipeline once per consumer
    instead of the round itself. Used by ``tools/plan_audit.py`` and
    the plan tests; not a compute API.
    """
    frac, nodes, n = _prepare(edges, src_col, dst_col, weight_col)
    if n == 0:
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    return _round(nodes, frac, ranks, n, damping)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 15,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    tol: float | None = None,
    reset: DataFrame | None = None,
    reset_node_col: str = "node",
    reset_weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    ``rank(v) = (1 - d) / n + d * (sum_{u->v} rank(u) * w(u,v) /
    out(u) + dangling / n)`` iterated up to ``iters`` times from the
    uniform start; ``w/out(u)`` are edge-weight fractions (uniform when
    ``weight_col`` is None). Returns (node, rank) — ranks sum to 1.

    Every node appearing in the edge list gets a rank row, including
    nodes whose only edges carry zero/negative/null weight — such
    nodes transfer no mass (they are dangling; their mass
    redistributes uniformly), but they are never silently dropped
    from the result or from ``n``.

    ``tol``: optional early exit — after each round a 1-row aggregate
    computes the L1 delta ``sum(|rank - prev_rank|)`` (the same
    driver-side convergence-signature pattern as the
    ``dedup_components`` loop: one scalar per round crosses to the
    driver, never the ranks). Iteration stops when the delta drops
    below ``tol``, so production callers don't pay fixed rounds on an
    already-converged graph; ``iters`` remains the hard cap. With
    ``tol`` set, every round checkpoints (the delta reads both the
    old and new frame — un-checkpointed that doubles the tail).

    ``reset``: optional PERSONALIZATION — a (node, weight) frame
    (Haveliwala 2002, topic-sensitive PageRank; the crawl-seeding
    variant: rank relative to a trusted seed set). Teleport mass and
    dangling mass both land on nodes proportionally to their reset
    weight (nodes absent from ``reset`` get 0 — reachable only
    through links); weights must be non-negative with a positive
    total over the node universe, and are normalized to sum 1
    (duplicate node rows in ``reset`` ADD — multiset semantics). The
    iteration starts FROM the reset distribution. ``reset=None`` is
    classic uniform PageRank, on an unchanged float sequence.

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
    if tol is not None and tol <= 0.0:
        raise ValueError(f"tol must be positive when set, got {tol}")
    frac, nodes, n = _prepare(edges, src_col, dst_col, weight_col)
    if n == 0:
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    if reset is not None:
        w_reset = reset.select(
            F.col(reset_node_col).alias("node"),
            F.col(reset_weight_col).cast("double").alias("w_r"),
        )
        # duplicate node rows in the caller's reset frame would fan
        # out through the node-universe join and silently inflate
        # both the result row count and sum(rank); weights for the
        # same node ADD (the natural multiset semantics), validated
        # below on the raw rows so a negative component still fails
        # even if duplicates would cancel it
        # BOTH validation scalars ride the nodes_r checkpoint action as
        # observed metrics (the dedup_components pattern): `bad` on the
        # RAW reset rows (so a negative component still fails even if
        # duplicates would cancel it — the metric fires where w_reset's
        # subtree executes inside this one action), `total` on the
        # joined node universe. The previous separate validation head
        # (aggregate + scalar broadcast + take) paid 2-3 extra jobs
        # before the checkpoint; now the checkpoint materializes the
        # UN-normalized weights and normalization is a narrow
        # projection of the checkpointed rows — same w_r/total double
        # division, bit-identical ranks.
        obs_bad, obs_total = Observation(), Observation()
        w_checked = w_reset.observe(
            obs_bad,
            F.count(
                F.when(F.col("w_r").isNull() | (F.col("w_r") < 0), 1)
            ).alias("bad"),
        )
        w_agg = w_checked.groupBy("node").agg(F.sum("w_r").alias("w_r"))
        nodes_r = (
            nodes.join(w_agg, "node", "left")
            .select(
                "node",
                "has_out",
                F.coalesce(F.col("w_r"), F.lit(0.0)).alias("w_r"),
            )
            .observe(obs_total, F.sum("w_r").alias("total"))
            .localCheckpoint(eager=True)
        )
        bad = obs_bad.get["bad"]
        total = obs_total.get["total"] or 0.0
        if bad:
            raise ValueError(
                f"reset weights must be non-negative, {bad} rows are not"
            )
        if total <= 0.0:
            raise ValueError(
                "reset must put positive weight on at least one node "
                "of the graph"
            )
        nodes_r = nodes_r.select(
            "node", "has_out", (F.col("w_r") / F.lit(total)).alias("r")
        )
        ranks = nodes_r.select("node", "has_out", F.col("r").alias("rank"))
    else:
        nodes_r = None
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        prev = ranks
        if nodes_r is not None:
            ranks = _round_personalized(nodes_r, frac, ranks, damping)
        else:
            ranks = _round(nodes, frac, ranks, n, damping)
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
        if (
            tol is not None
            or it % checkpoint_every == checkpoint_every - 1
            or it == iters - 1
        ):
            ranks = ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                ranks.join(
                    prev.select(
                        "node", F.col("rank").alias("prev_rank")
                    ),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev_rank"))))
                .head()[0]
            )
            if delta is not None and delta < tol:
                break
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph
    induced by ``edges`` — the local-clustering signal (spam/link-farm
    detection in crawl curation: organic neighborhoods close triangles,
    synthetic link graphs don't).

    Degree-ordered edge-iterator shape (the standard distributed
    formulation, e.g. Suri & Vassilvitskii 2011): direct every
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, build wedges only at each edge's LOWER endpoint, and close
    them with a join back against the oriented edge set. Every
    triangle is materialized exactly once (its lowest-rank vertex owns
    it), and the wedge count is bounded by sum(d_out^2) where the
    orientation caps d_out at O(sqrt(m)) — hub nodes generate NO
    wedges because their edges all point INTO them; without the
    orientation a single celebrity node would emit degree^2 wedge
    rows. At 100 TB all three stages are equi-join shuffles keyed by
    node/edge ids (never payloads), and the skew ceiling is the
    orientation's sqrt(m) bound, not the raw degree distribution.

    Input edges may be directed, weighted, duplicated, or contain
    self-loops; the graph is first canonicalized (undirected,
    distinct, loops dropped). Returns ``(node, triangles bigint)`` for
    every node incident to >= 1 canonical edge (nodes in no triangle
    report 0).
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # deg feeds THREE consumers (both orientation joins + the final
    # zero-fill), and its lineage contains the edge-canonicalization
    # distinct — the most expensive shuffle in the job; materialize it
    # once (shared lineage is not shared execution)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # orient u->v by rank = (deg, id); carry both endpoints' ranks so
    # the wedge stage can rank-order its two spokes without re-joining
    ranked = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
    )
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
    ).localCheckpoint(eager=True)  # read 3x below: wedges twice + close
    x, y = oriented.alias("x"), oriented.alias("y")
    rank_lt = (F.col("x.dd") < F.col("y.dd")) | (
        (F.col("x.dd") == F.col("y.dd")) & (F.col("x.d") < F.col("y.d"))
    )
    wedges = (
        x.join(y, F.col("x.s") == F.col("y.s"))
        .filter(rank_lt)
        .select(
            F.col("x.s").alias("apex"),
            F.col("x.d").alias("w_s"),
            F.col("y.d").alias("w_d"),
        )
    )
    tris = wedges.join(
        oriented.select(
            F.col("s").alias("w_s"), F.col("d").alias("w_d")
        ),
        ["w_s", "w_d"],
    )
    per_node = (
        tris.select(F.col("apex").alias("node"))
        .unionAll(tris.select(F.col("w_s").alias("node")))
        .unionAll(tris.select(F.col("w_d").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0).cast("bigint")).alias(
                "triangles"
            ),
        )
    )
