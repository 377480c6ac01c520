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
        if not _k.startswith('__') and _k not in globals():
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
    # round-6 rotation (VERDICT r5 task 2): >=80% of slots go to
    # never-driver-sampled names, priority exactly as the judge
    # prescribed. 44/50 have never appeared in CORRECTNESS_r01-r05;
    # the final 6 are family anchors that keep the reference's core
    # surface (source scan, flagship, streaming stateful, wire serde,
    # TPC-H, LLM-capstone) represented every round.
    # -- stats battery (never driver-checked) --
    "welch_ttest",
    "mann_whitney_u",
    "ks_test",
    "bootstrap_ci",
    "chi_square_independence",
    "anova_f_test",
    "bh_fdr_control",
    "cmh_test",
    "stratified_ate",
    "cuped_adjustment",
    # -- survival / forecast --
    "survival_km",
    "holt_forecast",
    "forecast_backtest",
    "ipf_raking",
    # -- graph metrics --
    "kcore_members",
    "graph_modularity",
    "link_prediction",
    "graph_hops",
    "degree_assortativity",
    # -- real-codec ops --
    "png_pipeline",
    "image_ahash_dedup",
    # -- retrieval / eval --
    "ndcg_eval",
    "rake_keywords",
    "isotonic_calibration",
    "dedup_recall_eval",
    # -- governance --
    "dp_release",
    "k_anonymity_ladder",
    "rtbf_purge",
    "bitemporal_lookup",
    "snapshot_diff",
    # -- the five r6 plan rewrites (driver evidence for the new
    #    two-phase-rank / TakeOrdered / two-phase-cumsum plans;
    #    stratified_ate is already in the stats battery above) --
    "uplift_deciles",
    "rfm_segmentation",
    "decayed_leaderboard",
    "vocab_growth",
    # -- never-checked exact twins / eval scalars --
    "lang_id_auc",
    "score_calibration",
    "dedup_minhash_exact",
    "dedup_embedding_lsh_exact",
    "knn_lsh",
    "ann_recall_at_k",
    "wasserstein_1d",
    "zipf_fit",
    "mahalanobis_outliers",
    "ab_srm_check",
    # -- family anchors (driver-green in earlier rounds; keep the
    #    reference's core surface in every window) --
    "source_scan",
    "price_alerts",
    "streaming_stateful_alerts",
    "kafka_wire_roundtrip",
    "q1_pricing_summary",
    "training_data_prep_v2",
]
# Rotated OUT this round (all driver-green r01-r05 and in the
# committed full-registry sweep CORRECTNESS_FULL_r05 284/284):
# the r05 window's streaming family, Avro/Kafka wire set (minus
# the kept kafka_wire_roundtrip anchor), the nine TPC-H shapes,
# fuzzy_join, entity_resolution, wav_pipeline and the r5-late
# additions - their operator families stay represented by the six
# anchors above, and every rotated-out entry still runs in pytest
# and the tools/check_oracle.py full sweep each round.
# Historical swap notes (r4 and earlier) are in git history.


WINDOW = 50  # the driver gate's sample size
assert len(_WINDOW) == WINDOW, f"_WINDOW has {len(_WINDOW)} entries"


def _reorder_registry() -> None:
    missing = [n for n in _WINDOW if n not in REGISTRY]
    assert not missing, f"_WINDOW names unregistered queries: {missing}"
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
