"""Declared query inventory — the driver-checked operator surface.

Each submodule contributes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB ANSI SQL twin). This package
merges them into the single registry exported through ``__spark_entry__.py``.

Oracle-parity rules (learned the hard way; apply to every new query):
* alias every computed column identically in Spark and SQL;
* ``CAST(SUM(...) AS BIGINT)`` in DuckDB — its integer SUM is HUGEINT which
  pandas renders as float, breaking the hash;
* round double aggregates on BOTH sides (sum order is engine-dependent);
* dates → ``date_format(d, 'yyyy-MM-dd')`` / ``strftime(d, '%Y-%m-%d')``
  strings; raw DATE columns render differently across engines;
* DuckDB ``dayofweek`` is 0=Sunday, Spark is 1=Sunday;
* Spark ``log`` is natural log = DuckDB ``ln``;
* no ``current_timestamp``/``rand``/approx in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_data_pipeline_spark.queries import (
    analytics,
    asof,
    core,
    curation,
    graphq,
    llm,
    mlfeat,
    relational,
    scalars,
    subqueries,
    textdup,
    timeseries,
    tpch,
    vectors,
    windows,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
# Implemented queries deliberately NOT declared to the external driver (it
# records at most 50 rows); still smoke-run by tests/test_queries_oracle.py.
SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
# Oracle twins for shelved queries — excluded from the driver-facing
# ORACLE_SQL (its keys must be a subset of queries()), but still
# hash-checked locally by tests/test_queries_oracle.py.
SHELVED_ORACLE_SQL: dict[str, str] = {}

for _mod in (
    core,
    relational,
    llm,
    curation,
    analytics,
    windows,
    asof,
    scalars,
    subqueries,
    tpch,
    mlfeat,
    timeseries,
    vectors,
    textdup,
    graphq,
):
    _MERGED.update(_mod.QUERIES)
    ORACLE_SQL.update(_mod.ORACLE_SQL)
    SHELVED_QUERIES.update(getattr(_mod, "SHELVED_QUERIES", {}))
    SHELVED_ORACLE_SQL.update(getattr(_mod, "SHELVED_ORACLE_SQL", {}))

# The external driver checks queries in registry insertion order and caps at
# 50 rows (round-2 lesson: the tail got no CORRECTNESS verdict). Order
# oracle-backed queries first so every exact-checkable operator is guaranteed
# a driver row; rows-only queries (no SQL twin by nature) take the remaining
# slots. The declared total is kept at <= 50 — overflow would silently lose
# driver coverage, so tests/test_entry.py asserts the budget.
DRIVER_ROW_BUDGET = 50

# ROUND-6 ROTATION — widen cumulative driver-grade proof. 46 implemented
# queries sat shelved under the 50-row cap with only locally-authored
# pytest oracle checks; this round swaps 18 of them (all oracle-backed:
# the 8-way TPC-H analogs, timeseries gap-fill/rolling stats, funnel/
# retention, pivot, BM25, packing, int8 quantization, right-outer,
# intersect) into the declared set in place of incumbents that have 5
# consecutive green CORRECTNESS rounds. The two rows-only LSH queries
# also rotate out (their recall gates live in tests/test_neardup.py and
# tests/test_similarity.py), so all 50 declared rows are hash-checkable
# this round. Rotated-out queries keep full pytest oracle coverage via
# SHELVED_*; nothing loses a check — the DRIVER gets fresh targets.
_ROTATE_IN = [
    "local_supplier_volume_q5",
    "market_share_q8",
    "disjunctive_revenue_q19",
    "order_priority_check_q4",
    "returned_item_losses_q10",
    "customer_order_distribution_q13",
    "promo_revenue_ratio_q14",
    "events_hourly_ffill",
    "events_rolling_1h_stats",
    # NOT orders_price_anomalies_zscore: the fixture's uniform order
    # price caps |z| at √3, so that query is structurally empty here —
    # a 0-row driver row proves nothing; the customer-spend variant has
    # real tail mass at every SF (2 / 20 / 203 rows)
    "customer_spend_anomalies_zscore",
    "docs_pack_chunks",
    "embeddings_quantize_int8",
    "nation_order_counts_right",
    "buyer_and_building_custkeys",
    "events_funnel_counts",
    "events_retention_cohorts",
    "orders_pivot_status_by_year",
    "docs_bm25_search",
    # built new this round — declared immediately so they get driver-grade
    # CORRECTNESS rows in the round that shipped them
    "docs_shuffle_shards",
    "docs_boilerplate_profile",
    "docs_length_batches",
]
_ROTATE_OUT = [
    "customer_order_stats",
    "region_nation_grid",
    "top_orders_by_price",
    "nation_supplier_union",
    "daily_orders_vs_shipments",
    "high_value_open_custkeys",
    "customer_order_window",
    "customer_balance_window",
    "events_distinct_user_type",
    "docs_hash_split",
    "doc_lang_profile",
    "docs_repetition_profile",
    "events_user_cardinality",
    "orders_marginals_grouping_sets",
    "events_sliding_10m_5m",
    "clicks_with_next_purchase",
    "embeddings_neardup_lsh",
    "docs_neardup_minhash",
    "parts_with_lineitems",
    "orders_price_band",
    "clicks_with_last_purchase",
]

# ROUND-7 ROTATION — the queue OPERATORS.md staged last round: every
# oracle-backed query that has never had a driver-grade CORRECTNESS row.
# The 20 queue entries (remaining TPC-H analogs q7/q12/q15/q17/q18/q21/
# q22, VARIANT, unpivot, TF-IDF, surprisal, RAG chunks, both mixture
# samplers, pack manifest, top paths, hot-user share, balance
# distribution, recency-weighted value, per-order z-score) plus
# docs_strip_boilerplate (built this round — declared in the round that
# shipped it) replace the 21 round-6 entrants, all of which now carry a
# green driver round and keep their pytest oracle hash checks shelved.
# Cumulative driver-grade proof after this round: ~92 of 102 queries.
_ROTATE_IN_R7 = [
    "volume_shipping_q7",
    "late_shipment_priority_q12",
    "top_supplier_q15",
    "small_quantity_revenue_q17",
    "large_order_customers_q18",
    "waiting_suppliers_q21",
    "idle_rich_customers_q22",
    "events_props_variant",
    "lineitem_unpivot_measures",
    "docs_tfidf_top_terms",
    "docs_unigram_surprisal",
    "docs_rag_chunks",
    "docs_mixture_sample",
    "docs_mixture_sample_exact",
    "docs_pack_manifest",
    "events_top_paths",
    "events_hot_user_share",
    "customer_balance_distribution",
    "events_recency_weighted_value",
    # structurally sparse on the uniform-price fixture (|z| <= sqrt(3)
    # for same-priced orders; rows come from mixed-price customers) but
    # never driver-proven — the queue's one remaining z-score variant
    "orders_price_anomalies_zscore",
    # built new this round
    "docs_strip_boilerplate",
]
_ROTATE_OUT_R7 = list(_ROTATE_IN)  # all 21 round-6 entrants, now proven

# ROUND-8 ROTATION — the OPERATORS.md round-8 queue: the three operators
# built late in round 7 (shelved-oracle, hash-equal locally at 3 SFs)
# get driver-grade CORRECTNESS rows. Three long-green incumbents rotate
# out in their place (each carries 7 consecutive green driver rounds and
# keeps its pytest oracle hash check shelved). After this round the only
# oracle-backed queries without a driver row are none — cumulative
# driver-grade proof ≈95 of ~104 implemented queries; the remainder is
# rows-only by nature (LSH/ANN recall-gated, codecs, sampling).
_ROTATE_IN_R8 = [
    "embeddings_semantic_dedup",  # SemDeDup orthant-bucketed dominance
    "docs_domain_cap",            # per-source anti-domination cap
    "docs_bigram_surprisal",      # conditional bigram-LM surprisal
]
_ROTATE_OUT_R8 = [
    "forecast_revenue_q6",        # green r1-r7
    "scalar_functions_showcase",  # green r1-r7
    "events_tumbling_5min",       # green r1-r7
]

# ROUND-9 ROTATION — the OPERATORS.md round-9 queue: the banded
# interval-join pair built late in round 8 (the large-large range-join
# shape: order windows banded into fixed-width buckets so the join is an
# equi-join on (band, key) with a residual range predicate — never a
# broadcast theta product) and the bloom-prefiltered contamination twin
# (identical output to the long-proven exact check, so its driver row
# proves the bloom pre-filter operator end-to-end). Three incumbents
# with 7+ consecutive green driver rounds rotate out, keeping their
# pytest oracle hash checks shelved.
_ROTATE_IN_R9 = [
    "shipments_in_order_windows",      # banded interval×point join
    "overlapping_order_windows",       # banded interval×interval join
    "docs_contamination_check_bloom",  # bloom-prefiltered anti-join
]
_ROTATE_OUT_R9 = [
    "dq_violation_counts",         # green r2-r8
    "embedding_dims_norms",        # green r2-r8
    "orders_status_priority_cube", # green r2-r8
]

# ROUND-10 ROTATION — the OPERATORS.md round-10 queue, all built round 9
# (shelved-oracle, hash-equal locally at 3 SFs): the curriculum ordering
# stage ((stage, shard)-windowed, no global sort), the centroid-
# classifier confusion matrix (one (label, dim) shuffle + broadcast
# assignment), and the Q16 supplier-breadth analog (count-distinct with
# a NOT-IN exclusion subquery re-based onto available fixtures). Three
# incumbents with 8 consecutive green driver rounds rotate out, keeping
# their pytest oracle hash checks shelved; family coverage in the
# declared 50 is preserved (J1 keeps q3/q7/q18, J3 keeps q21/q22 + the
# contamination anti-joins, A6 keeps orders_price_histogram).
_ROTATE_IN_R10 = [
    "docs_curriculum_order",                # curriculum stage ordering
    "embeddings_label_centroid_confusion",  # centroid-classifier eval
    "parts_supplier_breadth_q16",           # Q16 analog count-distinct
]
_ROTATE_OUT_R10 = [
    "revenue_per_nation",           # green r2-r9
    "customers_without_big_orders", # green r2-r9
    "quantity_quantiles_by_flag",   # green r2-r9
]

# ROUND-11 ROTATION — the OPERATORS.md round-11 queue, all built round 10
# (shelved-oracle, hash-equal locally at 3 SFs): fuzzy entity matching
# (symmetric-delete blocked Levenshtein pairs), market-basket
# co-occurrence (within-order pair self-join, top-20), and RFM lifecycle
# segmentation (broadcast exact-quartile boundaries, no global ranking
# window). Three incumbents with 8-9 consecutive green driver rounds
# rotate out, keeping their pytest oracle hash checks shelved; family
# coverage in the declared 50 is preserved (X4 keeps 16 other declared
# text/curation queries, W4 keeps events_sessions_30m, A5 keeps
# lineitem_unpivot_measures; rollup/cube/pivot all have prior green
# driver rounds).
_ROTATE_IN_R11 = [
    "suppliers_fuzzy_name_pairs",  # fuzzy entity matching (X2)
    "parts_copurchase_pairs",      # market-basket co-occurrence
    "customer_rfm_segments",       # RFM lifecycle scoring
]
_ROTATE_OUT_R11 = [
    "doc_quality_profile",     # green r2-r10
    "events_sessionized",      # green r3-r10
    "lineitem_rollup_matrix",  # green r2-r10
]

# ROUND-12 ROTATION — per the round-11 verdict: the degree-oriented
# triangle listing (built round 10) plus the two round-11 operators whose
# driver proof hardens that round's work — fuzzy pairs closed into
# canonical entities via pointer-jump connected components (vs a
# recursive-CTE transitive-closure oracle) and the Pareto skyline via
# banded prefix-max decomposition (vs the textbook NOT-EXISTS dominance
# oracle). All shelved-oracle, hash-equal locally at 3 SFs. Three
# incumbents with ~10 consecutive green driver rounds rotate out, keeping
# their pytest oracle hash checks shelved; family coverage in the
# declared 50 is preserved (X4 keeps docs_strip_boilerplate + 14 other
# text/curation queries; the contamination family keeps the declared
# bloom twin whose output is identical to the exact check; X1/§2.5 keep
# docs_dedup_by_content, events_sessions_30m, top_orders_per_segment).
_ROTATE_IN_R12 = [
    "copurchase_triangles",       # degree-oriented triangle listing (G1)
    "suppliers_fuzzy_entities",   # fuzzy pairs → canonical entities (X2+)
    "parts_pareto_frontier",      # banded skyline decomposition
]
_ROTATE_OUT_R12 = [
    "docs_pii_redaction",          # green r2-r11
    "docs_contamination_check",    # green r2-r11 (bloom twin stays declared)
    "events_keep_latest_per_user", # green r2-r11
]

# ROUND-13 ROTATION — per the round-12 verdict (items #1 and #7): the
# one-pass mergeable-moments family gets its first driver-grade rows —
# embeddings_covariance (exact d×d covariance vs a COVAR_SAMP self-join
# oracle), lineitem_measure_covariance (the same aggregate over the FACT
# table's four numeric measures, fixed-shift centering vs catastrophic
# cancellation at price magnitudes), and embeddings_label_variances
# (GROUPED covariance diagonal vs VAR_SAMP) — plus two round-12
# operator classes staged shelved-oracle: events_heavy_types_exact
# (count-min-pruned EXACT heavy hitters, the Misra-Gries face) and
# docs_decontaminated_train (eval-overlapping spans REMOVED from train,
# cleaned-md5 oracle). All hash-equal locally at 3 SFs before
# declaration. Five incumbents with 6 consecutive green driver rounds
# (r7-r12) rotate out, keeping their pytest oracle hash checks shelved;
# family coverage in the declared 50 is preserved: A2 keeps
# dq_pricing_summary; J1 keeps q3/q7/q18; X4 keeps
# docs_bigram_surprisal + 15 other text/curation queries;
# docs_mixture_sample_exact stays for the sampling family; §2.5 keeps
# events_sessions_30m / events_hot_user_share / top_orders_per_segment /
# customer_balance_distribution / docs_curriculum_order.
_ROTATE_IN_R13 = [
    "embeddings_covariance",        # one-pass d×d moments vs COVAR_SAMP
    "lineitem_measure_covariance",  # moments over fact-table measures
    "embeddings_label_variances",   # grouped covariance diagonal
    "events_heavy_types_exact",     # sketch-pruned exact heavy hitters
    "docs_decontaminated_train",    # span-level decontamination output
]
_ROTATE_OUT_R13 = [
    "late_shipment_priority_q12",  # green r7-r12
    "small_quantity_revenue_q17",  # green r7-r12
    "docs_unigram_surprisal",      # green r7-r12 (bigram twin declared)
    "docs_mixture_sample",         # green r7-r12 (exact twin declared)
    "events_top_paths",            # green r7-r12
]

# ROUND-14 ROTATION — per the round-13 verdict (item #2): the r13
# regression/drift tier gets its driver-grade rows —
# lineitem_quantity_price_ols (grouped one-pass OLS vs DuckDB's
# Welford-stable REGR_SLOPE/INTERCEPT/R2), embeddings_dim_drift_psi
# (per-dimension PSI vs a histogram-algebra oracle),
# embeddings_dim_drift_ttest (per-dimension Welch t vs AVG/VAR_SAMP),
# and docs_source_signature_terms (per-source smoothed log-odds
# distinctive vocabulary). All shelved-oracle, hash-equal locally at 3
# SFs before declaration. Four incumbents with 6 consecutive green
# driver rounds (r8-r13) rotate out, keeping their pytest oracle hash
# checks shelved; family coverage in the declared 50 is preserved:
# docs_source_signature_terms REPLACES docs_tfidf_top_terms within the
# distinctive-terms family; drift_ttest carries the statistical-gate
# shape orders_price_anomalies_zscore covered (A6 keeps
# orders_price_histogram + customer_balance_distribution); X4 keeps 14
# other text/curation queries after docs_bigram_surprisal leaves; L2
# keeps shipping_priority_q3's TakeOrderedAndProject after
# top_supplier_q15 leaves.
_ROTATE_IN_R14 = [
    "lineitem_quantity_price_ols",   # grouped one-pass OLS vs REGR_*
    "embeddings_dim_drift_psi",      # per-dim PSI drift gate
    "embeddings_dim_drift_ttest",    # per-dim Welch t drift gate
    "docs_source_signature_terms",   # per-source log-odds vocabulary
]
_ROTATE_OUT_R14 = [
    "docs_tfidf_top_terms",           # green r8-r13
    "orders_price_anomalies_zscore",  # green r8-r13
    "docs_bigram_surprisal",          # green r8-r13 (unigram twin shelved)
    "top_supplier_q15",               # green r8-r13
]

# ROUND-15 ROTATION — per the round-14 verdict (item #1): the full r14
# feature/regression tier gets its driver-grade rows —
# lineitem_ridge_price_curve (ridge λ=0 fit + grid scoring ≡ OLS, the
# whole fit/solve/predict path under the REGR_* oracle),
# lineitem_price_residual_outliers (conditional anomalies from the
# same six sums vs REGR_SXX/SXY/SYY), lineitem_price_prediction_bands
# (exact residual-quantile bands around the fit),
# docs_token_lang_chi2 (sklearn-chi2-shaped token–label feature
# selection; its eager count() folded into the plan first, verdict
# nit #1), and the label-signal pair embeddings_label_anova_f /
# embeddings_label_mi (per-dim one-way ANOVA F and binned MI). All
# shelved-oracle, hash-equal locally at 3 SFs before declaration. Six
# incumbents with ≥6 consecutive green driver rounds (r9-r14) rotate
# out, keeping their pytest oracle hash checks shelved; family
# coverage in the declared 50 is preserved: X4 text/curation keeps 9
# faces (curated_trainset, domain_cap, pack_manifest, curriculum,
# signature_terms, decontaminated_train, mixture_sample_exact, + the
# incoming chi2) after strip_boilerplate / rag_chunks / the bloom
# contamination twin leave (decontaminated_train carries the
# contamination family); J4 keeps shipments_in_order_windows after
# overlapping_order_windows leaves; X3 keeps embeddings_cosine_pairs +
# embeddings_label_centroid_confusion + embeddings_semantic_dedup
# after embedding_knn_bruteforce leaves; S9 keeps events_props_stats
# after the VARIANT twin leaves.
_ROTATE_IN_R15 = [
    "lineitem_ridge_price_curve",        # ridge λ=0 fit+predict vs REGR_*
    "lineitem_price_residual_outliers",  # regression-residual anomalies
    "lineitem_price_prediction_bands",   # residual-quantile bands
    "docs_token_lang_chi2",              # χ² token–label selection
    "embeddings_label_anova_f",          # per-dim one-way ANOVA F
    "embeddings_label_mi",               # per-dim binned MI
]
_ROTATE_OUT_R15 = [
    "docs_strip_boilerplate",         # green r9-r14
    "docs_rag_chunks",                # green r9-r14
    "overlapping_order_windows",      # green r9-r14 (J4 twin declared)
    "embedding_knn_bruteforce",       # green r9-r14
    "events_props_variant",           # green r9-r14 (stats twin declared)
    "docs_contamination_check_bloom", # green r9-r14
]

# ROUND-16 ROTATION — DEFERRED: round 16 turned out to be the first
# OPTIMIZATION round, whose contract pins the declared set to round
# 15's ("a query that disappeared makes the round a REGRESSION"), so
# the rotation below is staged but NOT applied — the tuple is absent
# from the merge loop. The eleven entrants stay shelved-oracle
# (hash-equal at 3 SFs, pytest-gated) and the eleven incumbents keep
# their driver rows; the next BUILD round applies this block by adding
# (_ROTATE_IN_R16, _ROTATE_OUT_R16) back to the loop.
# Original rationale (round-15 verdict items #1 and #2): the
# full r15 staged tier gets its driver-grade rows — lineitem_price_ols2
# (closed-form two-regressor OLS from Welford aggregates),
# lineitem_partial_corr (confounder-audit partial correlation),
# lineitem_price_conformal_bands (held-out md5-split conformal bands),
# customer_revenue_gini (per-nation revenue concentration),
# events_type_hour_cramers_v (contingency association strength),
# docs_source_lang_entropy (per-source Shannon entropy + evenness), and
# embeddings_dim_drift_ks (distribution-free two-sample KS drift gate)
# — PLUS the first four of the r11 shelved-oracle backlog (verdict #2:
# drain 8-10/round, the queue grows faster than 3-6 slots retire it):
# customer_spend_anomalies_mad (median/MAD modified z-score),
# docs_pps_sample (Poisson PPS + Horvitz-Thompson weights),
# orders_price_histogram_equidepth (exact-decile equi-depth histogram),
# and orders_price_winsorized (global p01/p99 capping). All hash-equal
# locally at 3 SFs before declaration. Eleven incumbents with >=6
# consecutive green driver rounds (r2-r15) rotate out, keeping their
# pytest oracle hash checks shelved; family coverage in the declared 50
# is preserved: A6 quantiles/histograms hands orders_price_histogram /
# customer_balance_distribution to the incoming equidepth + winsorized
# pair; the sampling family hands docs_mixture_sample_exact to the
# incoming docs_pps_sample; J1 keeps shipping_priority_q3 +
# large_order_customers_q18 after volume_shipping_q7 leaves; J3 keeps
# idle_rich_customers_q22 after waiting_suppliers_q21 and the q16
# NOT-IN analog leave; X4 text/curation keeps docs_curated_trainset,
# docs_decontaminated_train, docs_source_signature_terms,
# docs_token_lang_chi2 (+ incoming docs_source_lang_entropy) after
# domain_cap / pack_manifest / curriculum_order leave; SS2.5
# analytic-window keeps top_orders_per_segment + events_sessions_30m
# after events_hot_user_share / events_recency_weighted_value leave.
_ROTATE_IN_R16 = [
    "lineitem_price_ols2",              # two-regressor closed-form OLS
    "lineitem_partial_corr",            # partial correlation audit
    "lineitem_price_conformal_bands",   # held-out conformal bands
    "customer_revenue_gini",            # per-nation Gini concentration
    "events_type_hour_cramers_v",       # Cramér's V association
    "docs_source_lang_entropy",         # per-source Shannon entropy
    "embeddings_dim_drift_ks",          # two-sample KS drift gate
    "customer_spend_anomalies_mad",     # median/MAD robust outliers
    "docs_pps_sample",                  # PPS + Horvitz-Thompson
    "orders_price_histogram_equidepth", # exact-decile equi-depth hist
    "orders_price_winsorized",          # p01/p99 winsorization
]
_ROTATE_OUT_R16 = [
    "orders_price_histogram",         # green r3-r15
    "customer_balance_distribution",  # green r7-r15
    "docs_mixture_sample_exact",      # green r7-r15 (pps twin incoming)
    "docs_pack_manifest",             # green r7-r15
    "docs_domain_cap",                # green r8-r15
    "volume_shipping_q7",             # green r7-r15
    "waiting_suppliers_q21",          # green r7-r15
    "events_hot_user_share",          # green r7-r15
    "events_recency_weighted_value",  # green r7-r15
    "parts_supplier_breadth_q16",     # green r10-r15
    "docs_curriculum_order",          # green r10-r15
]

for _in, _out in (
    (_ROTATE_IN, _ROTATE_OUT),
    (_ROTATE_IN_R7, _ROTATE_OUT_R7),
    (_ROTATE_IN_R8, _ROTATE_OUT_R8),
    (_ROTATE_IN_R9, _ROTATE_OUT_R9),
    (_ROTATE_IN_R10, _ROTATE_OUT_R10),
    (_ROTATE_IN_R11, _ROTATE_OUT_R11),
    (_ROTATE_IN_R12, _ROTATE_OUT_R12),
    (_ROTATE_IN_R13, _ROTATE_OUT_R13),
    (_ROTATE_IN_R14, _ROTATE_OUT_R14),
    (_ROTATE_IN_R15, _ROTATE_OUT_R15),
    # (_ROTATE_IN_R16, _ROTATE_OUT_R16) deferred — see the block above.
):
    for _name in _in:
        _MERGED[_name] = SHELVED_QUERIES.pop(_name)
        ORACLE_SQL[_name] = SHELVED_ORACLE_SQL.pop(_name)
    for _name in _out:
        SHELVED_QUERIES[_name] = _MERGED.pop(_name)
        if _name in ORACLE_SQL:
            SHELVED_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **{k: v for k, v in _MERGED.items() if k in ORACLE_SQL},
    **{k: v for k, v in _MERGED.items() if k not in ORACLE_SQL},
}

__all__ = [
    "DRIVER_ROW_BUDGET",
    "ORACLE_SQL",
    "QUERIES",
    "SHELVED_ORACLE_SQL",
    "SHELVED_QUERIES",
]
