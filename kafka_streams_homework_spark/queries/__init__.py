"""Query/oracle registry package — the driver contract surface.

The former 15.8k-line queries.py, split per family (r5 verdict task
5). Importing this package imports every family module; each
@register decoration inserts into the single shared REGISTRY in
_shared, and _reorder_registry() below pins the driver-window order,
so the registry dict is bit-identical to the monolith's.
Every public AND underscore name of the old module is re-exported so
existing imports (tests, tools, bench) keep working unchanged.
"""
# ruff: noqa: F403
from kafka_streams_homework_spark.queries._shared import *  # noqa
from kafka_streams_homework_spark.queries import _shared as _mod_shared
from kafka_streams_homework_spark.queries import core as _mod_core
from kafka_streams_homework_spark.queries import streaming as _mod_streaming
from kafka_streams_homework_spark.queries import tpch as _mod_tpch
from kafka_streams_homework_spark.queries import similarity as _mod_similarity
from kafka_streams_homework_spark.queries import text as _mod_text
from kafka_streams_homework_spark.queries import dedup as _mod_dedup
from kafka_streams_homework_spark.queries import pipeline as _mod_pipeline
from kafka_streams_homework_spark.queries import stats as _mod_stats
from kafka_streams_homework_spark.queries import timeseries as _mod_timeseries
from kafka_streams_homework_spark.queries import graph as _mod_graph
from kafka_streams_homework_spark.queries import business as _mod_business
from kafka_streams_homework_spark.queries import multimodal as _mod_multimodal
from kafka_streams_homework_spark.queries import sketches as _mod_sketches
from kafka_streams_homework_spark.queries import geo as _mod_geo

# streaming_funnel_steps shares funnel_steps' oracle verbatim (the
# ann_recall_at_k zero-drift composition pattern), but business.py
# registers AFTER streaming.py — so the bind happens here, once every
# family module is imported. QuerySpec is frozen; replace the entry
# in place (dict assignment keeps registry order).
import dataclasses as _dc  # noqa: E402

REGISTRY["streaming_funnel_steps"] = _dc.replace(
    REGISTRY["streaming_funnel_steps"],
    oracle=REGISTRY["funnel_steps"].oracle,
)

# Re-export every module-level name (q_* functions, constants,
# underscore helpers like _t/_partsupp/_kcore_peel) exactly as the
# monolith exposed them.
for _m in (_mod_shared, _mod_core, _mod_streaming, _mod_tpch, _mod_similarity, _mod_text, _mod_dedup, _mod_pipeline, _mod_stats, _mod_timeseries, _mod_graph, _mod_business, _mod_multimodal, _mod_sketches, _mod_geo):
    for _k, _v in vars(_m).items():
        if _k.startswith('__'):
            continue
        if _k in globals():
            # Identical objects (the _shared star-import every family
            # module re-exposes) are fine; a NON-identical duplicate
            # top-level name across family modules would silently bind
            # whichever module imports first — fail loudly instead.
            # Explicit raise, not assert: the guard must survive
            # python -O/-OO (ADVICE r7).
            if globals()[_k] is not _v:
                raise ImportError(
                    f"duplicate top-level name {_k!r} bound to different "
                    f"objects across queries family modules ({_m.__name__})"
                )
        else:
            globals()[_k] = _v
del _m, _k, _v




# ---------------------------------------------------------------------------
# Driver contract accessors
# ---------------------------------------------------------------------------

# The driver's correctness gate samples the FIRST 50 registry entries,
# so registration order is coverage policy. _WINDOW names those 50
# explicitly. Round-4 rotation (VERDICT r3 task 4): by round 3 every
# window slot had been driver-green at least once while 67 queries were
# judge-verified only, so ~20 never-driver-checked entries (the TPC-H
# battery tail, SCD2/CDC, UDAF, histogram/rollup, text-retrieval ops)
# rotate IN and 20 driver-green entries whose operator family stays
# represented rotate OUT (e.g. tumbling_window out / windowed_sum in
# window; q3/q5 out / nine other TPC-H shapes in; rows-only sketch
# twins out / their oracle-checked exact anchors stay). Rotated-out
# entries still run in pytest and tools/check_oracle.py full sweeps.
_WINDOW = [
    # ROUND-11 ROTATION (post-ledger policy, README "Driver-window
    # policy"): (a) the 20 r11 birth-round oracle-bearing entries —
    # nineteen new ops plus pca_projection, newly UPGRADED from
    # rows-only to oracle-hash, so its first hash evidence lands here;
    # (b) 3 r11-CHANGED names whose behavior was touched this round
    # (streaming_rate_gate tie-exact rewrite + its batch twin sharing
    # the oracle; kendall_tau_b textbook tie counting) — a changed op
    # re-earns driver evidence in its change round, same spirit as
    # birth-round entry; (c) the remaining 27 slots go to the
    # OLDEST-EVIDENCE oracle-bearing names, recomputed from
    # CORRECTNESS_r01..r10 (2 names last sampled in r3, then the r4
    # alphabetical head; 39 fill shrank to 25 as the fourteen late r11
    # ops landed). The whole r10 window rotated out 50/50
    # hash-green (CORRECTNESS_r10.json).
    # -- (a) r11 new / upgraded (20) --
    "audio_vad",
    "silhouette_simplified",
    "wilcoxon_signed_rank",
    "runs_test",
    "gif_pipeline",
    "katz_centrality",
    "seq_pattern_support",
    "bartlett_test",
    "tukey_outlier_fences",
    "count_min_sketch",
    "rouge_n_pairs",
    "streaming_count_min",
    "streaming_ann_ingest",
    "streaming_media_resize",
    "label_propagation",
    "streaming_funnel_steps",
    "textrank_keywords",
    "flesch_reading_ease",
    "pr_curve",
    "pca_projection",
    # -- (b) r11 changed (3) --
    "rate_gate",
    "streaming_rate_gate",
    "kendall_tau_b",
    # -- (c) oldest evidence: last driver-sampled r3 (2) --
    "tumbling_window",
    "windowed_distinct",
    # -- (c) oldest evidence: last driver-sampled r4 (25) --
    "anomaly_zscore",
    "bm25_rank",
    "cdc_chunks",
    "classifier_score",
    "copurchase_topk",
    "dedup_clusters",
    "dedup_containment",
    "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "doc_chunks",
    "domain_mix",
    "embedding_outliers",
    "geomean_udaf",
    "hierarchical_rollup",
    "importance_sample",
    "inverted_index",
    "knn_bruteforce",
    "knn_ivf_indexed",
    "latest_by_key",
    "merge_apply_cdc",
    "multimodal_meta",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
]
# (tfidf_top_terms / timeseries_resample, scd2_history / scd2_lookup /
# sessionize / split_leakage_free, quantile_rollup_hist /
# repetition_score, q4_order_priority / q9_product_profit /
# quality_buckets, then q22_idle_customers / q2_min_cost_supplier /
# q20_part_promotion, displaced from the r4 fill to make room for
# the fourteen late r11 ops — next-oldest for r12.)
# Rotated OUT this round: the whole r10 window (50/50 driver-green in
# CORRECTNESS_r10). Every rotated-out entry still runs in pytest and
# the tools/check_oracle.py full sweep each round. Historical swap
# notes (r9 and earlier) are in git history.


WINDOW = 50  # the driver gate's sample size
if len(_WINDOW) != WINDOW:  # survives python -O (ADVICE r7)
    raise ImportError(f"_WINDOW has {len(_WINDOW)} entries, need {WINDOW}")


def _reorder_registry() -> None:
    missing = [n for n in _WINDOW if n not in REGISTRY]
    if missing:
        raise ImportError(f"_WINDOW names unregistered queries: {missing}")
    order = _WINDOW + [n for n in REGISTRY if n not in _WINDOW]
    specs = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(specs)


_reorder_registry()


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
