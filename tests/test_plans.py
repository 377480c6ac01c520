"""Plan-shape tests — the 100 TB design stance, made assertable.

These check the *physical plan*, not results: dimension joins must be
broadcast (stream side unshuffled), scans must prune columns and push
filters, window top-k must not global-sort.
"""

from __future__ import annotations

from kafka_streams_homework_spark import queries as Q
from kafka_streams_homework_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    physical_plan,
)


def test_flagship_uses_broadcast_join(spark, sf_dir):
    df = Q.q_price_alerts(spark, sf_dir)
    assert has_broadcast_join(df), physical_plan(df)
    # one shuffle only: the (key, window) aggregation exchange
    assert count_exchanges(df) <= 1, physical_plan(df)


def test_source_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = Q.q_source_scan(spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" in plan, plan
    # props (the widest column) must not be read
    assert "props" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q1_is_two_phase_agg_single_exchange(spark, sf_dir):
    df = Q.q_q1(spark, sf_dir)
    plan = physical_plan(df)
    assert "HashAggregate" in plan
    assert count_exchanges(df) == 1, plan  # partial→final agg, one shuffle
    # shipdate filter reaches the parquet scan
    assert "PushedFilters" in formatted_plan(df)


def test_star_join_broadcasts_all_dims_at_small_sf(spark, sf_dir):
    """At test sf every table measures under autoBroadcastJoinThreshold,
    so the size-guarded plan still broadcasts everything — without any
    forced hint on the sf-proportional tables."""
    df = Q.q_q5(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan


def _with_broadcast_disabled(spark, fn):
    """Run fn with autoBroadcastJoinThreshold=-1 — simulates the 100 TB
    case where orders/customer/supplier measure far above the threshold.
    Only explicit F.broadcast hints survive this setting."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return fn()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q3_joins_are_size_guarded(spark, sf_dir):
    """Scale contract (VERDICT r1 #1): q3 must not force-broadcast
    orders/customer. With the threshold off (as if the tables were
    100 TB-scale), every join must degrade to a shuffle join — a
    surviving BroadcastExchange would mean a forced hint on an
    sf-proportional table, which OOMs at scale."""
    plan = _with_broadcast_disabled(
        spark, lambda: physical_plan(Q.q_q3(spark, sf_dir))
    )
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_q5_broadcasts_only_bounded_dims(spark, sf_dir):
    """With the threshold off, q5 keeps exactly its two hinted
    broadcasts (nation=25 rows, region=5 rows at every sf); the
    sf-proportional joins (orders/customer/supplier) degrade to
    shuffle joins."""
    plan = _with_broadcast_disabled(
        spark, lambda: physical_plan(Q.q_q5(spark, sf_dir))
    )
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_hierarchical_rollup_cascades_from_cached_minute(spark, sf_dir):
    """VERDICT r1 #3: minute/hour/day must all fold the persisted
    minute-grain pre-aggregate — events is scanned and aggregated once,
    the coarser grains read ~60×/~1440×-reduced cached rows."""
    from kafka_streams_homework_spark.caching import release_caches

    try:
        df = Q.q_hierarchical_rollup(spark, sf_dir)
        plan = physical_plan(df)
        assert plan.count("InMemoryTableScan") == 3, plan
    finally:
        release_caches()


def test_topk_uses_window_group_limit(spark, sf_dir):
    df = Q.q_topk(spark, sf_dir)
    plan = physical_plan(df)
    # Spark rewrites rank<=k into a partial per-partition top-k before
    # the shuffle (WindowGroupLimit) — no global sort of the fact table
    assert "WindowGroupLimit" in plan, plan


def test_latest_by_key_uses_window_group_limit(spark, sf_dir):
    df = Q.q_latest_by_key(spark, sf_dir)
    plan = physical_plan(df)
    # rn==1 is rewritten to a per-partition partial top-1 before the
    # shuffle — the exchange carries ~1 row per key per map partition
    assert "WindowGroupLimit" in plan, plan


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    """A full ORDER BY must sample + range-partition (each partition a
    disjoint key range, merged by concatenation) — never a single-task
    global sort."""
    from kafka_streams_homework_spark.sources.batch import load_table

    df = load_table(spark, sf_dir, "events").orderBy("ts", "event_id")
    plan = physical_plan(df)
    assert "rangepartitioning" in plan.lower(), plan


def test_knn_broadcasts_queries_not_corpus(spark, sf_dir):
    df = Q.q_knn_bruteforce(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """Skew contract: with AQE skew-join on, a sort-merge join whose
    shuffle has one dominant key gets its skewed partition split at
    runtime (the final adaptive plan marks the SMJ with skew=true) —
    the built-in first line of defense before manual salting."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hot key 0 carries 100k fact rows; 200 other keys carry 100 each
        fact = spark.range(120_000).select(
            F.when(F.col("id") < 100_000, 0)
            .otherwise((F.col("id") % 200) + 1)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        dim = spark.range(201).select(
            F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("dv")
        )
        joined = fact.join(dim, fact["k"] == dim["dk"])
        # collect() executes THIS DataFrame's AdaptiveSparkPlan (count()
        # would build a separate query execution, leaving this one unfinalized)
        assert len(joined.collect()) == 120_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    df = Q.q_partitioned_sink_scan(spark, sf_dir)
    plan = formatted_plan(df)
    # the date filter must prune at the directory level, not post-scan
    assert "PartitionFilters: [" in plan, plan
    assert "event_date" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_ivf_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """VERDICT r1 #7: the materialized IVF layout must make a probe a
    directory-pruned scan — PartitionFilters on `cell` in the plan, and
    fewer corpus rows read than a full scan would."""
    from kafka_streams_homework_spark.operators import similarity as S
    from kafka_streams_homework_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_index")
    S.ivf_write_index(emb, idx, ncells=4, iters=2)
    queries = emb.filter("vec_id < 3").select("vec_id", "embedding")
    probe = S.ivf_probe_index(spark, idx, queries, k=5, nprobe=2)
    plan = formatted_plan(probe)
    frag = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "cell" in frag, plan
    assert probe.count() == 15  # 3 queries × k rows, from the pruned scan


def test_runtime_bloom_filter_injected_for_selective_join(spark, sf_dir):
    """Scale contract: when a fact-fact join's build side is selectively
    filtered and too big to broadcast, Spark injects a runtime bloom
    filter on the probe side — probe rows that cannot match are dropped
    BEFORE the shuffle. At 100 TB this is the difference between
    shuffling all of lineitem and shuffling the ~fraction that joins."""
    from pyspark.sql import functions as F

    from kafka_streams_homework_spark.sources.batch import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:3000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Slice-4 scale contract: two fact tables bucketed on the join key
    co-locate — the join needs NO exchange on either side. At 100 TB
    this is how repeated fact-fact joins (orders ⋈ lineitem) avoid
    reshuffling terabytes per query: pay one bucketed write, join free
    forever after."""
    from kafka_streams_homework_spark.sources.batch import load_table

    orders = load_table(spark, sf_dir, "orders").limit(500)
    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    try:
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_lineitem")
        # disable broadcast so the join strategy must rely on bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"]
            == spark.table("b_orders")["o_orderkey"],
        )
        assert count_exchanges(joined) == 0, physical_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_agg_has_no_exchange(spark, sf_dir):
    """Layout contract: aggregating a bucketed table BY its bucket key
    must reuse the stored hash-partitioning — zero Exchange anywhere
    in the plan. This is what write_bucketed buys: the shuffle happens
    once at write time, never again per query."""
    df = Q.q_bucketed_agg_scan(spark, sf_dir)
    assert count_exchanges(df) == 0, physical_plan(df)
    assert "Bucketed: true" in formatted_plan(df), formatted_plan(df)


def test_clustered_layout_files_are_disjoint(spark, sf_dir, tmp_path):
    """Zone-map contract: after write_clustered on (user_id, ts), the
    parquet files' user_id [min, max] ranges must be pairwise
    non-overlapping (modulo boundary keys that straddle two files) —
    the property that lets footer stats prune whole files for a
    user_id band predicate."""
    import glob

    import pyarrow.parquet as pq

    from kafka_streams_homework_spark.sources.batch import load_table
    from kafka_streams_homework_spark.sources.layout import write_clustered

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_clustered")
    write_clustered(events, path, ["user_id", "ts"], n_files=8)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4  # range partitioner actually split
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        # disjoint up to a single shared boundary key
        assert hi1 <= lo2, ranges
    # and the layout changes nothing about the data
    assert spark.read.parquet(path).count() == events.count()


def test_zorder_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    """2-D zone-map contract: after write_zordered on (user_id, value),
    a box predicate on EITHER dimension must be able to skip a
    meaningful share of files from footer min/max stats — the property
    lexicographic clustering only gives the leading column. Checked
    directly against the parquet footers (the same stats Spark's
    scan-level row-group skipping consumes)."""
    import glob

    import pyarrow.parquet as pq

    from kafka_streams_homework_spark.sources.batch import load_table
    from kafka_streams_homework_spark.sources.layout import write_zordered

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_zordered")
    write_zordered(events, path, "user_id", "value", bits=10, n_files=16)

    bounds = {"user_id": [], "value": []}
    files = glob.glob(f"{path}/part-*.parquet")
    for f in files:
        md = pq.read_metadata(f)
        for col in bounds:
            idx = md.schema.names.index(col)
            stats = [
                md.row_group(rg).column(idx).statistics
                for rg in range(md.num_row_groups)
            ]
            bounds[col].append(
                (min(s.min for s in stats), max(s.max for s in stats))
            )
    assert len(files) >= 8  # range partitioner actually split

    def overlapping(col, lo, hi):
        return sum(1 for fl, fh in bounds[col] if fh >= lo and fl <= hi)

    # a band on each dimension (~1/5 of its domain) must skip files;
    # on a random layout every file would overlap both bands
    assert overlapping("user_id", 40, 60) < len(files), bounds["user_id"]
    assert overlapping("value", 100, 200) < len(files), bounds["value"]
    # and the layout changes nothing about the data
    assert spark.read.parquet(path).count() == events.count()


def test_substring_dedup_has_no_pair_join(spark, sf_dir):
    """Span detection must stay island-shaped: two window shuffles plus
    the final span groupBy — never a doc×doc join (no SortMergeJoin /
    cartesian anywhere in the plan)."""
    df = Q.q_substring_dedup(spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert count_exchanges(df) <= 4, plan


def test_pq_encode_and_assign_cells_are_shuffle_free(spark, sf_dir):
    """The round-5 zero-shuffle claim, pinned: encoding the corpus to
    PQ codes and assigning IVF cells are pure map stages — the
    codebook/centroids arrive via a single-row broadcast, so the only
    join is a BroadcastNestedLoopJoin and NO Exchange appears."""
    from kafka_streams_homework_spark.operators import similarity as S
    from kafka_streams_homework_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = S.pq_fit(emb, m=8, ksub=8, iters=1)
    enc = S.pq_encode(emb, cb, m=8)
    assert count_exchanges(enc) == 0, physical_plan(enc)
    # r11: the encode is one vectorized Arrow map stage (codebook rides
    # the closure) — no join at all, still a pure map plan
    assert "MapInPandas" in physical_plan(enc), physical_plan(enc)

    cents = S.kmeans_cells(emb, ncells=4, iters=1)
    asn = S.assign_cells(emb, cents)
    assert count_exchanges(asn) == 0, physical_plan(asn)


def test_copurchase_topk_uses_take_ordered(spark, sf_dir):
    """Global top-100 must be TakeOrderedAndProject (per-partition
    partial top-k, k rows per partition to the driver) — never a full
    global sort of the pair aggregate."""
    df = Q.queries()["copurchase_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_classifier_score_is_map_only(spark, sf_dir):
    """The quality filter must stay a single scan-project pass: no join,
    no aggregation exchange — only spread()'s compute-redistribution
    repartition is allowed."""
    df = Q.REGISTRY["classifier_score"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert count_exchanges(df) <= 1, plan  # spread() only


def test_timeseries_resample_has_no_grid_join(spark, sf_dir):
    """Segment formulation: gap minutes come from exploding lead()
    segments, not from joining a dense grid back to observations
    (the join formulation degenerated to O(n^2)-per-key windows)."""
    df = Q.REGISTRY["timeseries_resample"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan


def test_embedding_outliers_broadcasts_centroids(spark, sf_dir):
    """Corpus scan must not shuffle: centroids (|labels| rows) join in
    as a broadcast."""
    df = Q.REGISTRY["embedding_outliers"].fn(spark, sf_dir)
    assert has_broadcast_join(df), physical_plan(df)


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Wedge generation and closing must be equi-joins (degree-oriented
    keys), never a cross product."""
    df = Q.REGISTRY["triangle_count"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_skyline_is_sort_based_no_dominance_join(spark, sf_dir):
    """The skyline must be the sort-based plan — window running-max
    passes over the deduped points, never the oracle's O(n^2)
    dominance join (no join operator of any kind in the plan)."""
    df = Q.q_skyline_pareto(spark, sf_dir)
    plan = physical_plan(df)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin", "ShuffledHashJoin"):
        assert node not in plan, plan
    # distinct + local-pass exchange + global single-partition pass
    assert count_exchanges(df) <= 3, plan


def test_collocations_corpus_single_scan_broadcast_marginals(spark, sf_dir):
    """PMI joins are vocabulary-sized broadcasts; the corpus-side scan
    must not enter a shuffle join (no SortMergeJoin anywhere)."""
    df = Q.q_collocations_pmi(spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_band_join_is_equi_bucketed_not_cartesian(spark, sf_dir):
    """band_join_prices must execute as an EQUI-join on the bucket id
    (the whole point of the interval-bucketing rewrite) — the naive
    |a-b|<=eps theta-join would appear as a cartesian/nested-loop."""
    df = Q.q_band_join_prices(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_partsupp_materialized_bucketed_agg_is_shuffle_free(spark, sf_dir):
    """The PARTSUPP_CTE docstring's 100 TB claim, pinned: materialize
    the derived partsupp ONCE bucketed by ps_partkey, and the Q11-style
    per-part stock aggregate reuses the stored hash partitioning —
    zero Exchange, bucketed scan confirmed. The derivation shuffle is
    paid at write time, never again per query."""
    from pyspark.sql import functions as F

    from kafka_streams_homework_spark.queries import _partsupp

    ps = _partsupp(spark, sf_dir)
    try:
        ps.write.bucketBy(8, "ps_partkey").sortBy("ps_partkey").mode(
            "overwrite"
        ).saveAsTable("b_partsupp")
        agg = (
            spark.table("b_partsupp")
            .groupBy("ps_partkey")
            .agg(
                F.round(
                    F.sum(F.col("ps_supplycost") * F.col("ps_availqty")), 2
                ).alias("value")
            )
        )
        assert count_exchanges(agg) == 0, physical_plan(agg)
        assert "Bucketed: true" in formatted_plan(agg), formatted_plan(agg)
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_partsupp")


def test_bloom_prune_filter_runs_in_scan_stage_before_join(spark, sf_dir):
    """The runtime-filter contract: the bloom bit tests (xxhash64 +
    bit_get on the bitmap literal) must sit in a Filter BELOW the
    exact left-semi verify join — rows die inside the scan stage, not
    in the join — and the verify join must be a broadcast (never a
    shuffled SortMergeJoin on the full fact table)."""
    df = Q.q_bloom_prune_join(spark, sf_dir)
    plan = physical_plan(df)
    assert "bit_get" in plan and "xxhash64" in plan, plan
    join_at = plan.index("BroadcastHashJoin")
    filter_at = plan.index("bit_get")
    assert filter_at > join_at, "bloom filter must be under the join"
    assert "SortMergeJoin" not in plan, plan


def test_geo_radius_join_is_equi_join_not_cartesian(spark, sf_dir):
    """Candidates come from a hash-equi join on the (cx, cy) cell key
    — never a CartesianProduct or nested-loop product. The exact
    distance filter sits above the equi join."""
    df = Q.queries()["geo_radius_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_bitemporal_lookup_broadcasts_probe_grid(spark, sf_dir):
    """The theta join (tx<=T, valid<=V) must broadcast the 4-row probe
    dimension, never shuffle or product the fact side row-wise."""
    df = Q.queries()["bitemporal_lookup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_image_ahash_dedup_band_join_no_product(spark, sf_dir):
    """Perceptual-hash candidates come from the banded equi self-join;
    no quadratic product node anywhere in the plan."""
    df = Q.queries()["image_ahash_dedup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def _entity_windows_bucket_partitioned(plan: str, entity_col: str) -> None:
    """Every Window whose ordering touches the entity column must be
    partitioned by the two-phase bucket key — the only permissible
    unpartitioned windows are the bounded-histogram / post-agg ones,
    which never order by the entity column."""
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Window ") and entity_col in s:
            assert "_bkt" in s, line


def test_uplift_deciles_ntile_is_two_phase(spark, sf_dir):
    df = Q.queries()["uplift_deciles"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "user_id")


def test_stratified_ate_quartiles_are_two_phase(spark, sf_dir):
    df = Q.queries()["stratified_ate"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "user_id")


def test_rfm_ntiles_are_two_phase(spark, sf_dir):
    df = Q.queries()["rfm_segmentation"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "o_custkey")


def test_vocab_growth_cumsum_is_two_phase(spark, sf_dir):
    df = Q.queries()["vocab_growth"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "doc_id")


def test_decayed_leaderboard_uses_take_ordered(spark, sf_dir):
    """Top-20 must be TakeOrderedAndProject (per-partition partial
    top-k); the only window runs over the ≤20-row result."""
    df = Q.queries()["decayed_leaderboard"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_geo_nearest_cells_is_equi_join_argmin_no_window(spark, sf_dir):
    """The cell twin must resolve via a broadcast EQUI join + a
    partial-aggregable min(struct) — no window sort, and the only
    cross product is the (normally empty) brute-force fallback leg."""
    df = Q.queries()["geo_nearest_supplier_cells"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "min(c" in plan or "partial_min" in plan.lower() or "HashAggregate" in plan, plan


def test_abc_classification_cumsum_is_two_phase(spark, sf_dir):
    """r6 verdict fix #1: the descending-revenue cumsum must not sort
    the customer rollup through one task — every window ordering on
    the customer key rides the two-phase bucket."""
    df = Q.queries()["abc_classification"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "o_custkey")


def test_gini_revenue_rank_is_two_phase(spark, sf_dir):
    """r6 verdict fix #2: the per-segment customer rank must ride the
    segment-folded two-phase bucket, not |segments| single-task
    sorts of N/|segments| rows each."""
    df = Q.queries()["gini_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "c_custkey")


def test_conformal_qhat_rank_is_two_phase(spark, sf_dir):
    """r6 verdict fix #3: the calibration order statistic must not
    globally sort the user-cardinality residuals in one task."""
    df = Q.queries()["conformal_interval"](spark, sf_dir)
    plan = physical_plan(df)
    _entity_windows_bucket_partitioned(plan, "user_id")


def test_streaming_naive_bayes_model_is_broadcast_table_not_literals(spark, sf_dir):
    """VERDICT r8 task 2: the NB model must reach the stream as a
    stream-static BROADCAST join on a one-row model frame — NOT as
    vocabulary-sized plan literals, and with zero driver collects."""
    import inspect

    from kafka_streams_homework_spark.queries import streaming as S

    # 1. no .collect( anywhere in the training/scoring path (docstrings
    #    stripped — the prose legitimately mentions the banned call)
    import ast
    import textwrap

    # ALL driver-side actions are banned, not just collect (ADVICE
    # r9: .first() slipped through the attribute-name check and ran
    # the corpus pass at plan-construction time)
    banned = {"collect", "first", "take", "head", "toPandas", "toLocalIterator"}
    for fn in (S._nb_model, S._nb_scored_stream):
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute):
                assert node.attr not in banned, ast.dump(node)
    # 2. the streaming logical plan joins the static model (broadcast
    #    hint present) and contains no vocabulary-sized literal: a
    #    token guaranteed in the corpus must NOT appear in the plan.
    out = S._nb_scored_stream(spark, sf_dir)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Join" in plan, plan
    # The probe vocabulary is DERIVED from the fixture at test time
    # (ADVICE r9: hard-coded 'vector'/'merge' would pass vacuously if
    # the corpus drifted). The fixture corpus is deliberately made of
    # Spark vocabulary ('column', 'window', 'stream'...), so single
    # tokens can collide with legitimate operator names in the plan
    # string. The non-vacuous invariant: a literal-baked model MUST
    # carry EVERY vocabulary token, while a relational plan contains
    # only the accidental operator-name collisions — so a majority of
    # the derived vocabulary must be absent from the plan.
    from pyspark.sql import functions as F

    from kafka_streams_homework_spark.functions import tokens as _tokens

    vocab = [
        r["tok"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(_tokens("text")).alias("tok"))
        .distinct()
        .collect()
    ]
    assert len(vocab) >= 10, vocab
    present = [t for t in vocab if t in plan]
    assert len(present) < len(vocab) / 2, (
        f"{len(present)}/{len(vocab)} vocabulary tokens appear in the "
        f"plan — looks literal-baked: {present}"
    )
    # second line of defense: a vocabulary-sized literal map would
    # inflate the plan string by orders of magnitude
    assert len(plan) < 100_000, len(plan)
    assert "broadcast" in plan.lower(), plan[:2000]
    # 3. model frame is one row with the map + class arrays
    model = S._nb_model(spark, sf_dir)
    cols = set(model.columns)
    assert {"nb_model", "classes", "priors", "dflts", "one"} <= cols
    assert model.count() == 1


def test_pca_projection_scoring_pass_is_map_only(spark, sf_dir):
    """r11 pca upgrade: the final projection (returned frame) must be
    a map-only pass over the embeddings scan — the component and S
    ride as literals, so the plan may contain NO Exchange at all (the
    Gram aggregation happened in separate bounded collect jobs at
    plan-construction time)."""
    df = Q.queries()["pca_projection"](spark, sf_dir)
    assert count_exchanges(df) == 0, physical_plan(df)


def test_streaming_ann_ingest_assignment_is_broadcast_map(spark, sf_dir):
    """The at-ingest cell assignment must reach the stream as a
    BROADCAST of the one-row nested centroid frame (stateless argmax
    map) — no shuffle of the vector stream, no streaming aggregation
    state."""
    from kafka_streams_homework_spark.queries._shared import _emb_stream
    from kafka_streams_homework_spark.queries.streaming import (
        q_streaming_ann_ingest,  # noqa: F401 — the op under test
    )
    import kafka_streams_homework_spark.queries.streaming as S
    from pyspark.sql import functions as F

    # rebuild the streaming frame the op runs (pre-sink); assert on
    # its plan: broadcast join present, zero exchanges on the stream
    emb = Q._t(spark, sf_dir, "embeddings")
    anchors = (
        emb.select(
            "vec_id", "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        ).orderBy("h", "vec_id").limit(S.ANN_INGEST_CELLS).collect()
    )
    nested = [[float(v) for v in r.embedding] for r in anchors]
    cdf = spark.createDataFrame([(nested,)], "cents array<array<double>>")
    from kafka_streams_homework_spark.operators.similarity import (
        cosine_similarity,
    )
    sims = F.transform(
        F.col("cents"),
        lambda cent: cosine_similarity(
            F.col("embedding").cast("array<double>"), cent
        ),
    )
    out = (
        _emb_stream(spark, sf_dir)
        .crossJoin(F.broadcast(cdf))
        .select(
            "vec_id",
            (F.array_position(sims, F.array_max(sims)) - 1).cast("int").alias("cell"),
        )
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Join" in plan
    # stateless map: no aggregate (= no streaming state store) in the
    # analyzed plan (a streaming frame refuses optimizedPlan()
    # inspection outside writeStream, so assert on analyzed)
    assert "Aggregate" not in plan, plan


def test_textrank_iterations_run_on_bounded_edge_list(spark, sf_dir):
    """TextRank's pagerank iterations must consume the PERSISTED
    vocab-bounded edge list (InMemoryTableScan in the plan), never
    re-tokenize the corpus per iteration — the corpus scan appears
    once in the cache build, not once per step."""
    df = Q.queries()["textrank_keywords"](spark, sf_dir)
    plan = physical_plan(df)
    assert "InMemoryTableScan" in plan, plan


def test_audio_vad_payload_never_shuffles(spark, sf_dir):
    """The WAV payload bytes must stay inside the decode stage: every
    Exchange in the plan carries only the small (doc, frame, energy)
    rows — `payload` may not appear in any shuffle, and the shuffles
    themselves are bounded by frame count (3: the doc_id window, the
    island agg, the segment re-rank), not audio bytes."""
    df = Q.queries()["audio_vad"](spark, sf_dir)
    plan = physical_plan(df)
    for chunk in plan.split("Exchange")[1:]:
        head = chunk.splitlines()[0]
        assert "payload" not in head, plan
    assert count_exchanges(df) <= 3, plan


def test_silhouette_scoring_is_broadcast_single_agg(spark, sf_dir):
    """Per-vector scoring rides a broadcast of the one-row nested
    centroid frame (corpus never shuffles for the score); the only
    exchange is the <=8-row per-cell aggregation."""
    df = Q.queries()["silhouette_simplified"](spark, sf_dir)
    assert has_broadcast_join(df), physical_plan(df)
    assert count_exchanges(df) <= 1, physical_plan(df)


def test_wilcoxon_rank_table_is_distinct_first(spark, sf_dir):
    """The ordered midrank pass must run on the per-distinct-|d|
    table, not per user: after the user-level agg the plan collapses
    to the |d| groupBy before any window — assert the single-
    partition window input is an Aggregate, and exchanges stay
    bounded (user agg + distinct-|d| agg + the window's singleton)."""
    df = Q.queries()["wilcoxon_signed_rank"](spark, sf_dir)
    assert count_exchanges(df) <= 4, physical_plan(df)
