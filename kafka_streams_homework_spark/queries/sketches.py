"""Mergeable sketches: KMV, HLL, histograms, Bloom pruning.

Split from the original monolithic queries.py (r5 verdict task 5);
registration side effects populate the shared REGISTRY, and the
package __init__ fixes the driver-window order, so module
membership is organization only — zero semantic change.
"""
# ruff: noqa: F403, F405
from __future__ import annotations
from kafka_streams_homework_spark.queries._shared import *  # noqa



@register(
    "distinct_rollup_hll",
    # No oracle: HLL++ estimates are implementation-defined (Apache
    # DataSketches registers); pytest pins them within 5% of exact.
    description="Mergeable-sketch cascade: hourly hll_sketch_agg → "
    "daily hll_union_agg → estimate. One scan of events ever; day/"
    "week/all-time distincts are sketch merges over the hourly table, "
    "never re-scans — the only distinct-count design that holds at "
    "100 TB (exact distinct state grows with cardinality; sketches "
    "stay ~16 KB)",
)
def q_distinct_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return SK.distinct_rollup_hll(events)


@register(
    "quantile_rollup_hist",
    oracle="""
        WITH h AS (
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(floor(value) AS BIGINT) AS bin, count(*) AS c
            FROM events GROUP BY 1, 2
        ), d AS (
            SELECT CAST(date_trunc('day', hour) AS TIMESTAMP) AS day,
                   bin, sum(c) AS c
            FROM h GROUP BY 1, 2
        ), cum AS (
            SELECT day, bin,
                   sum(c) OVER (PARTITION BY day ORDER BY bin) AS cum,
                   sum(c) OVER (PARTITION BY day) AS total
            FROM d
        )
        SELECT day,
               CAST(min(CASE WHEN cum >= 0.50 * total THEN bin END)
                    AS DOUBLE) AS p50_est,
               CAST(min(CASE WHEN cum >= 0.95 * total THEN bin END)
                    AS DOUBLE) AS p95_est,
               CAST(min(CASE WHEN cum >= 0.99 * total THEN bin END)
                    AS DOUBLE) AS p99_est
        FROM cum GROUP BY day
    """,
    description="§2.4 extension — mergeable QUANTILE sketch cascade, "
    "the percentile sibling of distinct_rollup_hll: the hourly state "
    "is a unit-width histogram (bin, count) — bounded (~500 bins) and "
    "mergeable by ADDITION, unlike exact quantiles which don't "
    "compose — so daily p50/p95/p99 fold the hourly sketches without "
    "re-touching events. The estimate is EXACTLY the unit bin "
    "containing the type-1 (lower) quantile — pinned in pytest; vs "
    "interpolated percentiles the error is bounded by the sample gap "
    "in the tail, not the bin width. Deterministic, so it carries a "
    "full value oracle (same cascade in SQL)",
)
def q_quantile_rollup_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.floor("value").cast("bigint").alias("bin"),
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"), F.col("bin")
        ).agg(F.sum("c").alias("c"))
    )
    wc = Window.partitionBy("day").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("day")
    cum = daily.select(
        "day",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wt).alias("total"),
    )

    def est(q: float, name: str):
        return F.min(
            F.when(F.col("cum") >= q * F.col("total"), F.col("bin"))
        ).cast("double").alias(name)

    return cum.groupBy("day").agg(
        est(0.50, "p50_est"), est(0.95, "p95_est"), est(0.99, "p99_est")
    )


@register(
    "kmv_distinct",
    oracle="""
        WITH u AS (
            SELECT DISTINCT event_type,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
            FROM events
        ), r AS (
            SELECT event_type, u,
                   row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
            FROM u
        )
        SELECT event_type,
               CAST(least(count(*), 64) AS BIGINT) AS n_sketch,
               round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                     ELSE 63.0 / max(u) FILTER (rn <= 64) END, 2)
                   AS est_distinct
        FROM r GROUP BY event_type
    """,
    description="KMV distinct-count sketch (k=64 minimum md5-fraction "
    "values): bounded-state mapInPandas partials + tiny candidate "
    "merge, no full-cardinality shuffle — and, unlike HLL, built from "
    "engine-portable hashes so the ESTIMATE itself is deterministic "
    "and oracle-checked, not just error-bounded",
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return SK.kmv_distinct(events)


@register(
    "heavy_hitter_tokens",
    oracle="""
        WITH t AS (
            SELECT unnest(str_split(lower(text), ' ')) AS token FROM documents
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_total FROM t
        )
        SELECT token, CAST(count(*) AS BIGINT) AS cnt, n_total
        FROM t, tot
        GROUP BY token, n_total
        HAVING count(*) > n_total / 257.0
    """,
    description="Exact heavy-hitter tokens via bounded-state "
    "Misra-Gries + exact recount (operators/sketches.heavy_hitters): "
    "per-partition 256-counter summaries (mapInPandas, Arrow batches) "
    "give a guaranteed candidate superset for every token above "
    "n/257 of the Zipfian token mass; a broadcast-semi-join recount "
    "makes the result exact and order/partitioning-independent — the "
    "full-vocabulary shuffle a naive top-k pays never happens",
)
def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_homework_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    return SK.heavy_hitters(toks, "token", k_counters=256)


@register(
    "kmv_overlap",
    oracle="""
        WITH u AS (
            SELECT DISTINCT event_type,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT / 4294967296.0 AS u
            FROM events
        ), r AS (
            SELECT event_type, u,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY u) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_set
            FROM u
        ), sk AS (
            SELECT * FROM r WHERE rn <= 64
        ), th AS (
            SELECT event_type,
                   CASE WHEN max(n_set) >= 64 THEN max(u)
                        ELSE 1.0 END AS theta,
                   CASE WHEN max(n_set) >= 64 THEN 63.0 / max(u)
                        ELSE max(n_set)::DOUBLE END AS est
            FROM sk GROUP BY event_type
        ), pr AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   least(a.theta, b.theta) AS theta,
                   a.est AS est_a, b.est AS est_b
            FROM th a JOIN th b ON a.event_type < b.event_type
        ), com AS (
            SELECT pr.type_a, pr.type_b, count(*) AS n_common
            FROM pr
            JOIN sk x ON x.event_type = pr.type_a AND x.u < pr.theta
            JOIN sk y ON y.event_type = pr.type_b AND y.u = x.u
            GROUP BY 1, 2
        ), ex AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS exact_intersection
            FROM u a JOIN u b
              ON a.u = b.u AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT pr.type_a, pr.type_b,
               CAST(coalesce(com.n_common, 0) AS BIGINT) AS n_common,
               round(pr.theta, 6) AS theta,
               round(pr.est_a, 2) AS est_a,
               round(pr.est_b, 2) AS est_b,
               round(coalesce(com.n_common, 0) / pr.theta, 2)
                   AS est_intersection,
               round(coalesce(com.n_common, 0) / pr.theta
                     / (pr.est_a + pr.est_b
                        - coalesce(com.n_common, 0) / pr.theta)
                     + 1e-9, 6) AS est_jaccard,
               CAST(coalesce(ex.exact_intersection, 0) AS BIGINT)
                   AS exact_intersection
        FROM pr
        LEFT JOIN com USING (type_a, type_b)
        LEFT JOIN ex USING (type_a, type_b)
    """,
    description="Theta-sketch audience overlap between every pair of "
    "event-type user sets: each set keeps its k=64 minimum "
    "md5-fraction hashes (bounded state per set, mergeable — the "
    "sketch shape that lets 100 TB of per-segment audiences intersect "
    "without co-shuffling raw ids), pair estimates use theta = "
    "min(theta_a, theta_b) and |{common hashes < theta}|/theta, "
    "Jaccard by inclusion-exclusion; the exact intersection rides "
    "along so the estimate's error is itself driver-visible. Like "
    "kmv_distinct the hashes are engine-portable, so the ESTIMATES "
    "are deterministic and oracle-hash-checked — the sketch family's "
    "second exact-twin member",
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    u = events.select(
        "event_type",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        ).alias("u"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("u")
    wn = Window.partitionBy("event_type")
    r = u.select(
        "event_type",
        "u",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_set"),
    )
    sk = r.filter(F.col("rn") <= 64)
    th = sk.groupBy("event_type").agg(
        F.when(F.max("n_set") >= 64, F.max("u"))
        .otherwise(F.lit(1.0))
        .alias("theta"),
        F.when(F.max("n_set") >= 64, F.lit(63.0) / F.max("u"))
        .otherwise(F.max("n_set").cast("double"))
        .alias("est"),
    )
    a = th.select(
        F.col("event_type").alias("type_a"),
        F.col("theta").alias("ta"),
        F.col("est").alias("est_a"),
    )
    b = th.select(
        F.col("event_type").alias("type_b"),
        F.col("theta").alias("tb"),
        F.col("est").alias("est_b"),
    )
    pr = a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        F.least("ta", "tb").alias("theta"),
        "est_a",
        "est_b",
    )
    x = sk.select(F.col("event_type").alias("type_a"), F.col("u").alias("ux"))
    y = sk.select(F.col("event_type").alias("yt"), F.col("u").alias("uy"))
    com = (
        pr.join(x, ["type_a"])
        .filter(F.col("ux") < F.col("theta"))
        .join(
            y,
            (F.col("type_b") == F.col("yt")) & (F.col("uy") == F.col("ux")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ua = u.select(F.col("event_type").alias("type_a"), F.col("u").alias("ux"))
    ub = u.select(F.col("event_type").alias("type_b"), F.col("u").alias("uy"))
    ex = (
        ua.join(
            ub,
            (F.col("ux") == F.col("uy"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    est_i = nc / F.col("theta")
    return (
        pr.join(com, ["type_a", "type_b"], "left")
        .join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            nc.cast("bigint").alias("n_common"),
            F.round(F.col("theta"), 6).alias("theta"),
            F.round(F.col("est_a"), 2).alias("est_a"),
            F.round(F.col("est_b"), 2).alias("est_b"),
            F.round(est_i, 2).alias("est_intersection"),
            F.round(
                est_i / (F.col("est_a") + F.col("est_b") - est_i)
                + F.lit(1e-9),
                6,
            ).alias("est_jaccard"),
            F.coalesce(F.col("exact_intersection"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersection"),
        )
    )


@register(
    "bloom_prune_join",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
    """,
    description="Runtime-filter semi join: a 64 Ki-bit / 4-lane Bloom "
    "filter built distributively over the urgent-order keys (bit_or "
    "partial-aggregates map-side; driver state bounded at 1024 longs "
    "= 8 KB regardless of dim size) rides into the lineitem scan as "
    "an array literal, so ~80% of fact rows die on pure-JVM "
    "xxhash64/bit_get tests inside WholeStageCodegen before any join "
    "runs; the ~0.6%-fp survivor set then takes an exact broadcast "
    "left-semi verify, making the result IDENTICAL to the plain semi "
    "join the oracle runs — Spark's dynamic-pruning pattern as an "
    "explicit, mergeable operator",
)
def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    kept = SK.bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


CMS_W = 512
CMS_D = 4
CMS_TOPK = 20


@register(
    "count_min_sketch",
    oracle=f"""
        WITH truec AS (
            SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ), cells AS (
            SELECT j.j AS j,
                   ('0x' || substr(md5(j.j::VARCHAR || ':'
                                       || t.k::VARCHAR), 1, 8))::BIGINT
                       % {CMS_W} AS col,
                   CAST(sum(t.c) AS BIGINT) AS cnt
            FROM truec t, range(0, {CMS_D}) AS j(j)
            GROUP BY 1, 2
        ), cand AS (
            SELECT k, c FROM truec
            ORDER BY c DESC, k ASC LIMIT {CMS_TOPK}
        ), est AS (
            SELECT cand.k, cand.c, min(cells.cnt) AS est
            FROM cand, range(0, {CMS_D}) AS j(j)
            JOIN cells ON cells.j = j.j
             AND cells.col = ('0x' || substr(md5(j.j::VARCHAR || ':'
                                  || cand.k::VARCHAR), 1, 8))::BIGINT
                                  % {CMS_W}
            GROUP BY cand.k, cand.c
        )
        SELECT k AS l_partkey, c AS true_cnt,
               CAST(est AS BIGINT) AS cms_est,
               CAST(est - c AS BIGINT) AS overest
        FROM est
    """,
    description="Count-Min sketch with estimate-error audit — the "
    f"point-query frequency sketch next to misra_gries (heavy "
    f"hitters), kmv (distinct) and the HLL/bloom members: a "
    f"{CMS_D}x{CMS_W} counter matrix over md5 row-hashes (the "
    "engine-portable _h32 idiom, so the sketch contents are "
    "BIT-IDENTICAL across engines and the row is oracle-HASH, unlike "
    "native-hash sketches which stay rows-only), queried for the "
    "top-20 true-count part keys; reported alongside the exact "
    "counts the sketch would replace, with the one-sided "
    "overestimate per key. Build is ONE map-side-combinable pass: "
    "per-key counts first (key-cardinality rows), then the x4 "
    "row fan-out on the COLLAPSED keys, never on raw lineitem — at "
    "100 TB the sketch state is 2048 cells regardless of volume and "
    "merges by cell-wise addition across partitions/streams",
)
def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    truec = tracked_persist(
        li.groupBy(F.col("l_partkey").alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    js = spark.range(CMS_D).select(F.col("id").cast("int").alias("j"))

    def col_expr(key):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("j").cast("string"),
                            F.lit(":"),
                            key.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_W
        )

    cells = (
        truec.crossJoin(F.broadcast(js))
        .groupBy("j", col_expr(F.col("k")).alias("col"))
        .agg(F.sum("c").cast("bigint").alias("cnt"))
    )
    wtop = Window.orderBy(F.col("c").desc(), F.col("k").asc())
    cand = (
        truec.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= CMS_TOPK)
        .drop("rk")
    )
    est = (
        cand.crossJoin(F.broadcast(js))
        .withColumn("col", col_expr(F.col("k")))
        .join(F.broadcast(cells), ["j", "col"])
        .groupBy("k", "c")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    return est.select(
        F.col("k").alias("l_partkey"),
        F.col("c").alias("true_cnt"),
        F.col("est").alias("cms_est"),
        (F.col("est") - F.col("c")).cast("bigint").alias("overest"),
    )
