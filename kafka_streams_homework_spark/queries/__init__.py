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
    # round-10 rotation — the POST-LEDGER POLICY (VERDICT r9 task 6,
    # formalized in README "Driver-window policy"): the r9 ledger goal
    # is reached (every oracle-bearing name has driver evidence), so
    # from now on (a) every NEW op enters its birth-round window, and
    # (b) all remaining slots go to the OLDEST-EVIDENCE names — the
    # names whose last driver-window appearance is furthest back
    # (recomputed from CORRECTNESS_r01..r09: 18 names last sampled in
    # r1, 26 in r3, the rest r4+) — so ledger freshness has a bounded
    # age. New r10 ops swap in as they land, displacing from the END
    # of the oldest-evidence block (the youngest of the old). Rows-only
    # names stay EXCLUDED by policy (a no-oracle name burns a slot as
    # err:no_oracle); their evidence channel is the full sweep +
    # pytest bounds + oracle-hash exact twins.
    # -- last driver-sampled in r1 (18) --
    "above_avg",
    "anti_join",
    "filter_threshold",
    "json_extract",
    "media_resize",
    "pivot_counts",
    "project_alert",
    "q6_forecast_revenue",
    "running_total",
    "salted_join",
    "semi_join",
    "set_except",
    "set_intersect",
    "sliding_window",
    "train_test_split",
    "value_histogram",
    "value_percentiles",
    "windowed_sum_salted",
    # -- last driver-sampled in r3 (24 here; 2 of the 26 were
    #    displaced to make room for r10 birth-round ops) --
    "agg_stats",
    "decontaminate",
    "dedup_embedding",
    "dedup_exact",
    "doc_fingerprint",
    "frame_sample",
    "interval_join",
    "join_left",
    "knn_filtered",
    "lang_id",
    "lm_score",
    "pii_scrub",
    "price_alerts_priced",
    "q3_shipping_priority",
    "q5_local_supplier",
    "quality_score",
    "range_join",
    "rollup_agg",
    "sequence_pack",
    "sink_write",
    "stratified_sample",
    "text_stats",
    "token_count",
    "topk_per_group",
    # -- round-10 NEW ops (birth-round window per the README policy;
    #    windowed_distinct + tumbling_window displaced from the r3 block;
    #    displaced the whole r4 fill: anomaly_zscore/bm25_rank/
    #    cdc_chunks/classifier_score/copurchase_topk/dedup_clusters) --
    "kendall_tau_b",
    "hill_tail_index",
    "negbin_fit",
    "knn_sq8",
    "rate_gate",
    "streaming_rate_gate",
    "weibull_fit",
    "gumbel_fit",
]
# Rotated OUT this round: the whole r09 window (50/50 driver-green in
# CORRECTNESS_r09). Every rotated-out entry still runs in pytest and
# the tools/check_oracle.py full sweep each round. Historical swap
# notes (r8 and earlier) are in git history.


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
