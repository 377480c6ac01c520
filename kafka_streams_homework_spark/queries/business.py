"""Product/funnel/cohort business analytics.

Split from the original monolithic queries.py (r5 verdict task 5);
registration side effects populate the shared REGISTRY, and the
package __init__ fixes the driver-window order, so module
membership is organization only — zero semantic change.
"""
# ruff: noqa: F403, F405
from __future__ import annotations
from kafka_streams_homework_spark.queries._shared import *  # noqa



@register(
    "funnel_steps",
    oracle="""
        WITH s1 AS (
            SELECT user_id AS u, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT u, t1, min(e.ts) AS t2
            FROM s1 LEFT JOIN events e
              ON e.user_id = u AND e.event_type = 'click'
             AND e.ts >= t1 AND e.ts <= t1 + INTERVAL 24 HOUR
            GROUP BY u, t1
        ),
        s3 AS (
            SELECT u, t1, t2, min(e.ts) AS t3
            FROM s2 LEFT JOIN events e
              ON e.user_id = u AND e.event_type = 'purchase'
             AND e.ts >= t2 AND e.ts <= t2 + INTERVAL 24 HOUR
            GROUP BY u, t1, t2
        ),
        agg AS (
            SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3
        )
        SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
               CAST(n1 AS BIGINT) AS n_users FROM agg
        UNION ALL
        SELECT 2, 'click', n2 FROM agg
        UNION ALL
        SELECT 3, 'purchase', n3 FROM agg
    """,
    description="Greedy ordered funnel (view -> click -> purchase, "
    "24 h max step gap): chained co-partitioned left join + min-agg "
    "per step on the user key, funnel table unpivoted from one "
    "aggregate row - the product-analytics shape over the event "
    "stream; greedy-earliest semantics documented and oracle-matched",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return R.funnel_steps(events, ["view", "click", "purchase"], gap="24 hours")


@register(
    "retention_cohorts",
    oracle="""
        WITH s AS (
            SELECT user_id AS u, date_trunc('week', min(ts)) AS cohort
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        a AS (
            SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS p
            FROM events
        )
        SELECT CAST(cohort AS TIMESTAMP) AS cohort,
               CAST((epoch(p) - epoch(cohort)) / 604800 AS BIGINT)
                   AS period_offset,
               CAST(count(DISTINCT u) AS BIGINT) AS n_active
        FROM s JOIN a USING (u) WHERE p >= cohort GROUP BY 1, 2
    """,
    description="Cohort retention triangle: users bucketed by signup "
    "week, counted active in each later week they produced any event. "
    "One min-agg + one distinct + one co-partitioned user join + one "
    "count - linear in events, shuffles keyed on user / (cohort, "
    "offset) only",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return R.retention_cohorts(events)


# ---------------------------------------------------------------------------
# Round-5 analytics/curation additions
# ---------------------------------------------------------------------------


@register(
    "skyline_pareto",
    oracle="""
        WITH p AS (
            SELECT DISTINCT l_extendedprice AS price, l_quantity AS quantity
            FROM lineitem
        )
        SELECT price, quantity FROM p
        WHERE NOT EXISTS (
            SELECT 1 FROM p q
            WHERE q.price >= p.price AND q.quantity >= p.quantity
              AND (q.price > p.price OR q.quantity > p.quantity)
        )
    """,
    description="2-D skyline / Pareto frontier (maximize price AND "
    "quantity) over ~25k distinct lineitem points: sort-based "
    "running-max filter — partition-local skyline then a global pass "
    "over the tiny survivor set — vs the oracle's O(n^2) NOT-EXISTS "
    "dominance join; the frontier being a handful of rows is the "
    "operator's semantics, the input is the full fact table",
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return R.skyline_2d(li, "l_extendedprice", "l_quantity").select(
        F.col("x").alias("price"), F.col("y").alias("quantity")
    )


@register(
    "cohort_ltv",
    oracle="""
        WITH s AS (
            SELECT user_id AS u,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ), size_ AS (
            SELECT cohort, count(*) AS n_users FROM s GROUP BY 1
        ), rev AS (
            SELECT s.cohort,
                   CAST((epoch(date_trunc('week', e.ts)) - epoch(s.cohort))
                        / 604800 AS BIGINT) AS week_offset,
                   round(sum(e.value) + 1e-9, 2) AS rev_week
            FROM events e JOIN s ON e.user_id = s.u
            WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
              AND date_trunc('week', e.ts) >= s.cohort
            GROUP BY 1, 2
        ), c AS (
            SELECT cohort, week_offset, rev_week,
                   CAST(sum(CAST(rev_week AS DECIMAL(18,2))) OVER (
                       PARTITION BY cohort ORDER BY week_offset
                   ) AS DOUBLE) AS cum_rev
            FROM rev
        )
        SELECT c.cohort, c.week_offset,
               CAST(z.n_users AS BIGINT) AS n_users,
               c.rev_week, c.cum_rev,
               round(c.cum_rev / z.n_users + 1e-9, 6) AS ltv_per_user
        FROM c JOIN size_ z USING (cohort)
    """,
    description="Cohort lifetime-value curve: purchase revenue per "
    "signup-week cohort by week offset, accumulated into the running "
    "LTV-per-user a growth team tracks (the revenue twin of "
    "retention_cohorts). Weekly sums are rounded to money precision "
    "BEFORE the ordered cumulative and the cumulative runs in "
    "DECIMAL(18,2) (exact, order-free — the round-before-cumsum "
    "discipline); cohort sizing is the same min-agg + user-keyed "
    "join as retention_cohorts, so the whole curve costs one user "
    "join + one (cohort, week) agg + a calendar-bounded window",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    size_ = s.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (
        events.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(F.broadcast(s), F.col("user_id") == F.col("u"))
        .filter(F.date_trunc("week", "ts") >= F.col("cohort"))
        .groupBy(
            "cohort",
            (
                (
                    F.unix_timestamp(F.date_trunc("week", "ts"))
                    - F.unix_timestamp("cohort")
                )
                / 604800
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.round(F.sum("value") + F.lit(1e-9), 2).alias("rev_week"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = rev.select(
        "cohort",
        "week_offset",
        "rev_week",
        F.sum(F.col("rev_week").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("cum_rev"),
    )
    return c.join(F.broadcast(size_), "cohort").select(
        "cohort",
        "week_offset",
        F.col("n_users").cast("bigint").alias("n_users"),
        "rev_week",
        "cum_rev",
        F.round(F.col("cum_rev") / F.col("n_users") + F.lit(1e-9), 6).alias(
            "ltv_per_user"
        ),
    )


@register(
    "path_to_purchase",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_type,
                   lag(event_type, 1) OVER w AS prev1,
                   lag(event_type, 2) OVER w AS prev2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT coalesce(prev2, 'START') || '>' || coalesce(prev1, 'START')
                   AS path,
               CAST(count(*) AS BIGINT) AS n_purchases
        FROM seq WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    description="Path-to-purchase mining: the two-event journey "
    "preceding each purchase (lag window over the per-user event "
    "sequence, START-padded), counted per path — the attribution/"
    "journey-analytics primitive beyond single-step "
    "markov_transitions. One key-partitioned window pass + a "
    "path-vocabulary-sized aggregate",
)
def q_path_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.coalesce(F.lag("event_type", 1).over(w), F.lit("START")).alias(
            "prev1"
        ),
        F.coalesce(F.lag("event_type", 2).over(w), F.lit("START")).alias(
            "prev2"
        ),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            F.concat(F.col("prev2"), F.lit(">"), F.col("prev1")).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    )


@register(
    "rfm_segmentation",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey,
                   date_diff('day', max(o_orderdate),
                             (SELECT max(o_orderdate) FROM orders))
                       AS recency_days,
                   count(*) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ), scored AS (
            SELECT o_custkey, recency_days, CAST(frequency AS BIGINT)
                       AS frequency, monetary,
                   ntile(5) OVER (ORDER BY recency_days ASC, o_custkey)
                       AS r_score,
                   ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                       AS f_score,
                   ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                       AS m_score
            FROM rfm
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(monetary), 2) AS segment_revenue
        FROM scored GROUP BY r_score, f_score, m_score
    """,
    description="RFM (recency / frequency / monetary) customer "
    "segmentation — the classic marketing-analytics rollup: per-"
    "customer RFM from one orders aggregate (recency anchored to the "
    "corpus max date — deterministic, no now()), quintile scores via "
    "NTILE with pinned custkey tiebreaks (ties would otherwise "
    "straddle quintile boundaries nondeterministically), segment "
    "cells aggregated. Quintiles come from two-phase ranks (bounded "
    "value-range bucket histograms + partitioned windows + the exact "
    "NTILE identity) — no customer-cardinality global sort; "
    "2dp-rounded monetary pins the sort order cross-engine",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("__anchor"))
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("__anchor"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    # Three NTILE(5) cuts without customer-cardinality global sorts
    # (VERDICT r5): each metric's value range is bounded regardless of
    # customer count, so the value itself (negated for desc orders,
    # coarsened for monetary) is a monotone bucket key — histogram +
    # broadcast offsets + partitioned within-bucket windows, then the
    # exact NTILE identity. Bit-identical to the window form.
    cuts = [
        ("r_score", F.col("recency_days"),
         [F.col("recency_days").asc(), F.col("o_custkey")]),
        ("f_score", -F.col("frequency"),
         [F.col("frequency").desc(), F.col("o_custkey")]),
        ("m_score", -F.floor(F.col("monetary") / 100),
         [F.col("monetary").desc(), F.col("o_custkey")]),
    ]
    scored = rfm
    for name, bucket, order in cuts:
        scored = R.two_phase_rank(
            scored, order, bucket, rank_name="_rnk", total_name="_n"
        )
        scored = scored.withColumn(
            name, R.ntile_from_rank(F.col("_rnk"), F.col("_n"), 5)
        ).drop("_rnk", "_n")
    scored = scored.select("monetary", "r_score", "f_score", "m_score")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_revenue"),
    )


CHURN_WINDOW_DAYS = 7


@register(
    "churn_flag",
    oracle=f"""
        WITH anchor AS (SELECT max(ts) AS mx FROM events),
        last_seen AS (
            SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id
        )
        SELECT (date_diff('day', last_ts, mx) >= {CHURN_WINDOW_DAYS})
                   AS churned,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(date_diff('day', last_ts, mx)) AS BIGINT)
                   AS min_idle_days,
               CAST(max(date_diff('day', last_ts, mx)) AS BIGINT)
                   AS max_idle_days
        FROM last_seen, anchor
        GROUP BY churned
    """,
    description="Churn cohort flag: users idle ≥7 days at the corpus "
    "high-water mark (deterministic anchor — no now()), rolled up to "
    "cohort counts with idle-day bounds. One per-user max + a "
    "broadcast anchor; the retention counterpart to "
    "first_session_metrics / retention_cohorts",
)
def q_churn_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("mx"))
    last_seen = events.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    idle = F.datediff(F.col("mx"), F.col("last_ts"))
    return (
        last_seen.crossJoin(F.broadcast(anchor))
        .select(idle.alias("idle_days"))
        .groupBy((F.col("idle_days") >= CHURN_WINDOW_DAYS).alias("churned"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("idle_days").cast("bigint").alias("min_idle_days"),
            F.max("idle_days").cast("bigint").alias("max_idle_days"),
        )
    )


@register(
    "first_session_metrics",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_type, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, event_type, value,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM flagged
        ), first_sess AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS total_value,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM sess WHERE sess_id = 1 GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               round(avg(n_events) + 1e-9, 4) AS avg_first_session_events,
               round(avg(total_value) + 1e-9, 4) AS avg_first_session_value,
               round(sum(converted) * 1.0 / count(*) + 1e-9, 6)
                   AS first_session_conversion
        FROM first_sess
    """,
    description="First-session (new-user onboarding) cohort metrics: "
    "per user's FIRST gaps-and-islands session — event count, value, "
    "converted flag — aggregated to the onboarding KPI row. Same "
    "session substrate and exact integer-microsecond gap test as "
    "sessionized_conversion; the first-session filter is sess_id = 1 "
    "on the running island id, no extra pass",
)
def q_first_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            >= 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = events.select(
        "user_id",
        "event_type",
        "value",
        F.sum(new_sess).over(cum).alias("sess_id"),
    )
    first = (
        sess.filter(F.col("sess_id") == 1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return first.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("n_events") + F.lit(1e-9), 4).alias(
            "avg_first_session_events"
        ),
        F.round(F.avg("total_value") + F.lit(1e-9), 4).alias(
            "avg_first_session_value"
        ),
        F.round(
            F.sum("converted") * 1.0 / F.count(F.lit(1)) + F.lit(1e-9), 6
        ).alias("first_session_conversion"),
    )


@register(
    "hhi_concentration",
    oracle="""
        WITH rev AS (
            SELECT p_type, l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS r
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type, l_suppkey
        ), tot AS (
            SELECT p_type, sum(r) AS t, count(*) AS n_suppliers
            FROM rev GROUP BY p_type
        )
        SELECT rev.p_type,
               CAST(max(n_suppliers) AS BIGINT) AS n_suppliers,
               round(sum((r / t) * (r / t)) + 1e-9, 6) AS hhi
        FROM rev JOIN tot USING (p_type)
        GROUP BY rev.p_type
    """,
    description="Herfindahl–Hirschman supplier-concentration index per "
    "part type: Σ share² of supplier revenue — the market-structure "
    "metric (1/n = perfectly split, 1.0 = monopoly). Per-supplier "
    "revenue rounds to 2dp before share formation (identical doubles "
    "both engines), totals broadcast back; group state is "
    "supplier-cardinality per type",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("r")
        )
    )
    rev = tracked_persist(rev)
    tot = rev.groupBy(F.col("p_type").alias("t_type")).agg(
        F.sum("r").alias("t"), F.count(F.lit(1)).alias("n_suppliers")
    )
    share = F.col("r") / F.col("t")
    return (
        rev.join(F.broadcast(tot), F.col("p_type") == F.col("t_type"))
        .groupBy("p_type")
        .agg(
            F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share * share) + F.lit(1e-9), 6).alias("hhi"),
        )
    )


@register(
    "sessionized_conversion",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_type,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM flagged
        ), per_sess AS (
            SELECT user_id, sess_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM sess GROUP BY user_id, sess_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               round(sum(converted) * 1.0 / count(*) + 1e-9, 6)
                   AS conversion_rate
        FROM per_sess
    """,
    description="Session conversion rate — the product-analytics KPI "
    "composed from the sessionize substrate: the same gaps-and-islands "
    "session assignment as the three sessionize twins, a per-session "
    "converted flag (one purchase anywhere in the session), one tiny "
    "final aggregate. Cost ≡ sessionize (one key-partitioned window "
    "pass + session-cardinality aggregate)",
)
def q_sessionized_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer-microsecond gap test ≡ the oracle's interval
    # compare (truncating casts would disagree on sub-second ts)
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            >= 30 * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = events.select(
        "user_id",
        "event_type",
        F.sum(new_sess).over(cum).alias("sess_id"),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted") * 1.0 / F.count(F.lit(1)) + F.lit(1e-9), 6
        ).alias("conversion_rate"),
    )


@register(
    "fulfillment_latency",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               round(avg(CAST(date_diff('day', o_orderdate, l_shipdate)
                              AS DOUBLE)) + 1e-9, 4) AS avg_days,
               round(quantile_cont(CAST(date_diff('day', o_orderdate,
                                        l_shipdate) AS DOUBLE), 0.95), 0)
                   AS p95_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    description="Order-to-ship fulfillment latency per order priority "
    "— the operational SLA rollup: one orders⋈lineitem equi-join "
    "(co-partitioned on orderkey at scale), day-difference in exact "
    "integer days, avg + exact p95 per bounded priority group",
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("double")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_orderpriority", days.alias("days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.round(F.avg("days") + F.lit(1e-9), 4).alias("avg_days"),
            F.round(F.expr("percentile(days, 0.95)"), 0).alias("p95_days"),
        )
    )


@register(
    "abc_classification",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(round(round(sum(o_totalprice), 2) * 100) AS BIGINT)
                       AS cents
            FROM orders GROUP BY o_custkey
        ), r2 AS (
            SELECT o_custkey, cents,
                   sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(cents) OVER () AS tot
            FROM rev
        ), cls AS (
            SELECT cents,
                   CASE WHEN round(CAST(cum AS DOUBLE) / tot + 1e-9, 6)
                             <= 0.8 THEN 'A'
                        WHEN round(CAST(cum AS DOUBLE) / tot + 1e-9, 6)
                             <= 0.95 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM r2
        )
        SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(cents) / 100.0, 2) AS revenue
        FROM cls GROUP BY abc_class
    """,
    description="ABC / Pareto contribution analysis: customers ranked "
    "by revenue, classified by cumulative share (A ≤ 80%, B ≤ 95%, "
    "C rest). Revenue rounds to 2dp then converts to INTEGER CENTS, "
    "so the ordered cumulative sum is exact integer arithmetic on "
    "both engines (no float-accumulation order sensitivity) and the "
    "class test applies to the rounded share of exact totals. The "
    "cumsum itself is TWO-PHASE (per-(cents div 1e5) partial totals "
    "— a value-range-bounded histogram, ~20k buckets regardless of "
    "customer count — broadcast prefix offsets, partitioned "
    "within-bucket windows): no single-task sort of the "
    "customer-cardinality rollup, which grows linearly with data. "
    "The fact table contributes one partial-agg shuffle",
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    cents = rev.select(
        "o_custkey", F.round(F.col("rev") * 100).cast("long").alias("cents")
    )
    tot = cents.agg(F.sum("cents").alias("tot_cents"))
    # Descending-revenue cumsum without a global single-partition
    # window: bucket key -(cents div 1e5) is monotone non-decreasing
    # in (cents DESC), and its cardinality is bounded by the REVENUE
    # VALUE RANGE (orders-per-customer is scale-invariant in TPC-H),
    # not by customer count. Struct order = (cents desc, custkey asc).
    cum = R.two_phase_cumsum(
        cents,
        F.struct(
            (-F.col("cents")).alias("o1"), F.col("o_custkey").alias("o2")
        ),
        -F.expr("cents div 100000"),
        {"cum_cents": "cents"},
    )
    share = F.round(
        F.col("cum_cents") / F.col("tot_cents") + F.lit(1e-9), 6
    )
    cls = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
    )


@register(
    "gini_revenue",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(round(round(sum(o_totalprice), 2) * 100) AS BIGINT)
                       AS cents
            FROM orders GROUP BY o_custkey
        ), seg AS (
            SELECT c_mktsegment AS segment, cents, c_custkey
            FROM rev JOIN customer ON o_custkey = c_custkey
        ), ranked AS (
            SELECT segment, cents,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY cents, c_custkey) AS i,
                   count(*) OVER (PARTITION BY segment) AS n,
                   sum(cents) OVER (PARTITION BY segment) AS tot
            FROM seg
        )
        SELECT segment, CAST(max(n) AS BIGINT) AS n_customers,
               round(2.0 * CAST(sum(CAST(i AS HUGEINT) * cents) AS DOUBLE)
                     / (CAST(max(n) AS DOUBLE) * CAST(max(tot) AS DOUBLE))
                     - (max(n) + 1.0) / max(n) + 1e-9, 6) AS gini
        FROM ranked GROUP BY segment
    """,
    description="Gini coefficient of customer revenue per market "
    "segment — revenue-concentration analytics (the Lorenz-curve "
    "scalar). Rank-weighted formulation G = 2Σ(i·xᵢ)/(nΣx) − (n+1)/n "
    "over customers sorted ASC within segment (deterministic custkey "
    "tiebreak). Revenue converts to integer cents (cents cancel in "
    "the ratio) so every accumulator is exact integer arithmetic — "
    "rank order AND the weighted sum are engine-identical with no "
    "float-order sensitivity. The rank is TWO-PHASE with the segment "
    "folded into the bucket key (seg_code·1e6 + cents div 1e5): the "
    "histogram is (segments × revenue-value-range)-bounded, prefix "
    "offsets broadcast, within-bucket windows partitioned — no "
    "N/|segments|-row single-task sorts at any customer cardinality. "
    "Per-segment i is recovered from the global rank by subtracting "
    "the segment's broadcast min-rank",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    # no broadcast hint: both sides are customer-cardinality (rev is
    # already aggregated) — AQE picks broadcast at small SF, sort-merge
    # on co-partitioned custkey at scale
    seg = rev.join(
        customer,
        rev["o_custkey"] == customer["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("rev") * 100).cast("long").alias("cents"),
        "c_custkey",
    )
    # Segment codes: bounded distinct (|segments| rows) — the one
    # place an unpartitioned window is fine.
    codes = seg.select("segment").distinct().withColumn(
        "seg_code", F.row_number().over(Window.orderBy("segment"))
    )
    # seg_code leads the order columns so the bucket key
    # (seg_code*1e6 + cents div 1e5) is monotone non-decreasing in the
    # requested order — two_phase_rank's documented precondition holds
    # outright (ADVICE r7: previously the order was [cents, c_custkey]
    # and correctness leaned on the helper's bucket-major internals).
    # seg_code is constant within every bucket, so within-bucket order
    # and the per-segment min-rank recovery are unchanged.
    ranked = R.two_phase_rank(
        seg.join(F.broadcast(codes), "segment"),
        [F.col("seg_code").asc(), F.col("cents").asc(), F.col("c_custkey").asc()],
        F.col("seg_code") * 1000000 + F.expr("cents div 100000"),
        rank_name="gr",
    )
    ranked = tracked_persist(ranked)
    stats = ranked.groupBy("segment").agg(
        F.min("gr").alias("gstart"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").alias("totc"),
    )
    g = ranked.join(F.broadcast(stats), "segment").select(
        "segment",
        "cents",
        "n",
        "totc",
        (F.col("gr") - F.col("gstart") + 1).alias("i"),
    )
    return g.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(
            2.0
            * F.sum(
                (F.col("i") * F.col("cents")).cast("decimal(38,0)")
            ).cast("double")
            / (F.max("n").cast("double") * F.max("totc").cast("double"))
            - (F.max("n") + 1.0) / F.max("n")
            + F.lit(1e-9),
            6,
        ).alias("gini"),
    )


@register(
    "linear_attribution",
    oracle="""
        WITH o AS (
            SELECT user_id, event_id, ts, value, event_type,
                   sum(CASE WHEN event_type IN ('view', 'click')
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS n_before
            FROM events
        ), p AS (
            SELECT user_id, ts AS pts, event_id AS pid, value, n_before
            FROM o WHERE event_type = 'purchase' AND n_before > 0
        ), t AS (
            SELECT user_id, event_type AS touch_type,
                   ts AS tts, event_id AS tid
            FROM events WHERE event_type IN ('view', 'click')
        )
        SELECT touch_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               round(CAST(sum(CAST(value / n_before AS DECIMAL(18,6)))
                          AS DOUBLE), 2) AS credited
        FROM t JOIN p ON t.user_id = p.user_id
                     AND (t.tts < p.pts
                          OR (t.tts = p.pts AND t.tid < p.pid))
        GROUP BY touch_type
    """,
    description="Linear multi-touch attribution: each purchase's value "
    "is split equally across every view/click touchpoint that "
    "preceded it in the user's timeline. NO touch-to-purchase pair "
    "join ever runs (the naive pairing the oracle uses blows up as "
    "touches x purchases per user — measured 159x at the 100x probe): "
    "because the touch-type set is a bounded enum, ONE user-"
    "partitioned window pass carries a running count per type, and "
    "each purchase row already knows how many credits of each type it "
    "owes — the per-pair sum collapses to value x n_type / n_total "
    "per purchase, grouped over |types| rows. Per-pair parity is kept "
    "exactly: the grouped credit multiplies the DECIMAL(18,6)-rounded "
    "per-credit amount by the integer count, which equals the pair "
    "join's sum of identical rounded terms — bit-for-bit the oracle's "
    "band-join result",
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.select(
        "value",
        "event_type",
        F.sum((F.col("event_type") == "view").cast("int"))
        .over(w)
        .alias("nv"),
        F.sum((F.col("event_type") == "click").cast("int"))
        .over(w)
        .alias("nc"),
    )
    purch = flagged.filter(
        (F.col("event_type") == "purchase")
        & ((F.col("nv") + F.col("nc")) > 0)
    ).select("value", "nv", "nc", (F.col("nv") + F.col("nc")).alias("n_before"))
    per_type = purch.select(
        "value",
        "n_before",
        F.explode(
            F.create_map(
                F.lit("view"), F.col("nv"), F.lit("click"), F.col("nc")
            )
        ).alias("touch_type", "k"),
    ).filter(F.col("k") > 0)
    # k x round6(value/n) == the pair join's sum of k identical
    # DECIMAL(18,6) terms — exact, order-independent
    credit = (F.col("value") / F.col("n_before")).cast("decimal(18,6)")
    return per_type.groupBy("touch_type").agg(
        F.sum("k").cast("bigint").alias("n_credits"),
        F.round(F.sum(credit * F.col("k")).cast("double"), 2).alias("credited"),
    )


@register(
    "shapley_attribution",
    oracle="""
        WITH RECURSIVE ch AS (
            SELECT event_type AS channel,
                   1 << (CAST(row_number() OVER (ORDER BY event_type)
                              AS INTEGER) - 1) AS bit
            FROM (SELECT DISTINCT event_type FROM events
                  WHERE event_type != 'purchase')
        ), kk AS (
            SELECT CAST(count(*) AS INTEGER) AS k FROM ch
        ), user_bits AS (
            SELECT e.user_id, ch.bit
            FROM (SELECT DISTINCT user_id, event_type FROM events
                  WHERE event_type != 'purchase') e
            JOIN ch ON ch.channel = e.event_type
        ), users AS (
            SELECT u.user_id,
                   COALESCE(b.mask, 0) AS mask,
                   CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                       AS conv
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN (SELECT user_id, sum(bit) AS mask
                       FROM user_bits GROUP BY user_id) b
              ON b.user_id = u.user_id
            LEFT JOIN (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase') p
              ON p.user_id = u.user_id
        ), observed AS (
            SELECT mask, count(*) AS n, sum(conv) AS c
            FROM users GROUP BY mask
        ), all_masks(m) AS (
            SELECT 0
            UNION ALL
            SELECT m + 1 FROM all_masks, kk WHERE m + 1 < (1 << k)
        ), masks AS (
            SELECT m.m AS mask,
                   CASE WHEN o.n IS NULL OR o.n = 0 THEN 0.0
                        ELSE CAST(o.c AS DOUBLE) / o.n END AS v
            FROM all_masks m
            LEFT JOIN observed o ON o.mask = m.m
        ), contribs AS (
            -- exact Shapley weights |S|!(k-1-|S|)!/k! DERIVED from the
            -- counted channel set (ADVICE r8: no hard-coded k=4 table)
            SELECT ch.channel,
                   (CAST(factorial(bit_count(CAST(s.mask AS BIGINT)))
                         AS DOUBLE)
                    * CAST(factorial(kk.k - 1
                           - bit_count(CAST(s.mask AS BIGINT)))
                           AS DOUBLE)
                    / CAST(factorial(kk.k) AS DOUBLE))
                   * (t.v - s.v) AS phi_term
            FROM ch
            CROSS JOIN kk
            JOIN masks s ON (s.mask & ch.bit) = 0
            JOIN masks t ON t.mask = s.mask + ch.bit
        )
        SELECT c.channel,
               round(sum(c.phi_term) + 1e-9, 6) AS shapley,
               CAST((SELECT sum(n) FROM observed o
                     WHERE (o.mask & ch.bit) != 0) AS BIGINT)
                   AS n_users_touched
        FROM contribs c JOIN ch ON ch.channel = c.channel
        GROUP BY c.channel, ch.bit
    """,
    description="Data-driven Shapley-value channel attribution (Zhao "
    "et al. / Shapley 1953): each user's touched non-purchase channel "
    "set is a coalition, v(S) = observed conversion rate of users "
    "with EXACTLY set S (0 for unobserved coalitions), and each "
    "channel's credit is the exact Shapley sum over all 2^(k-1) "
    "marginal contributions with weights |S|!(k-1-|S|)!/k!. The "
    "corpus contributes ONE distinct-(user,channel) rollup; "
    "everything after is bounded by 2^k masks (k=4 here), so the "
    "coalition join never touches row volume — the principled "
    "alternative endpoint to linear_attribution's uniform split",
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ch = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("channel"),
            (F.row_number().over(Window.orderBy("event_type")) - 1).alias(
                "rn0"
            ),
        )
        .select("channel", F.expr("shiftleft(1, rn0)").alias("bit"))
    )
    user_ch = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "event_type")
        .distinct()
        .join(F.broadcast(ch), F.col("event_type") == F.col("channel"))
        .groupBy("user_id")
        .agg(F.sum("bit").alias("mask"))
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"))
        .distinct()
    )
    users = (
        ev.select("user_id")
        .distinct()
        .join(user_ch, "user_id", "left")
        .join(buyers, F.col("user_id") == F.col("pu"), "left")
        .select(
            F.coalesce(F.col("mask"), F.lit(0)).alias("mask"),
            F.when(F.col("pu").isNull(), 0).otherwise(1).alias("conv"),
        )
    )
    observed = users.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    # coalition space and Shapley weights DERIVED from the counted
    # channel set (ADVICE r8: no hard-coded k=4 mask/weight table on
    # either engine) — one bounded agg row, exploded to 2^k masks,
    # with a runtime guard against an exponential blowup
    kdf = ch.agg(F.count(F.lit(1)).cast("int").alias("k")).select(
        F.when(F.col("k") <= 16, F.col("k"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "shapley_attribution: 2^k coalition space needs "
                    "k <= 16 non-purchase channels"
                )
            ).cast("int")
        )
        .alias("k")
    )
    all_masks = kdf.select(
        "k",
        F.explode(
            F.sequence(F.lit(0), F.expr("shiftleft(1, k) - 1"))
        ).alias("m"),
    )
    masks = all_masks.join(
        F.broadcast(observed), F.col("m") == F.col("mask"), "left"
    ).select(
        "k",
        "m",
        F.when(
            F.col("n").isNull() | (F.col("n") == 0), F.lit(0.0)
        ).otherwise(F.col("c").cast("double") / F.col("n")).alias("v"),
    )
    s = masks.select("k", F.col("m").alias("sm"), F.col("v").alias("sv"))
    t = masks.select(F.col("m").alias("tm"), F.col("v").alias("tv"))
    bc = F.bit_count(F.col("sm").cast("bigint"))
    weight = (
        F.factorial(bc).cast("double")
        * F.factorial(F.col("k") - 1 - bc).cast("double")
        / F.factorial(F.col("k")).cast("double")
    )
    contribs = (
        F.broadcast(ch)
        .crossJoin(s)
        .filter(F.expr("(sm & bit) = 0"))
        .join(t, F.col("tm") == F.col("sm") + F.col("bit"))
        .select(
            "channel",
            "bit",
            (weight * (F.col("tv") - F.col("sv"))).alias("phi_term"),
        )
    )
    touched = (
        F.broadcast(ch.select(F.col("channel").alias("c2"), F.col("bit").alias("b2")))
        .crossJoin(observed)
        .filter(F.expr("(mask & b2) != 0"))
        .groupBy("c2")
        .agg(F.sum("n").alias("n_users_touched"))
    )
    return (
        contribs.groupBy("channel")
        .agg(F.round(F.sum("phi_term") + F.lit(1e-9), 6).alias("shapley"))
        .join(touched, F.col("channel") == F.col("c2"))
        .select(
            "channel",
            "shapley",
            F.col("n_users_touched").cast("bigint").alias("n_users_touched"),
        )
    )


@register(
    "seq_pattern_support",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_type AS t, ts FROM events
        ), a1 AS (
            SELECT user_id, t AS a, min(ts) AS ta
            FROM ev GROUP BY user_id, t
        ), a2 AS (
            SELECT e.user_id, a1.a, e.t AS b, min(e.ts) AS tb
            FROM ev e JOIN a1 ON a1.user_id = e.user_id
            WHERE e.ts > a1.ta
            GROUP BY e.user_id, a1.a, e.t
        ), a3 AS (
            SELECT e.user_id, a2.a, a2.b, e.t AS c
            FROM ev e JOIN a2 ON a2.user_id = e.user_id
            WHERE e.ts > a2.tb
            GROUP BY e.user_id, a2.a, a2.b, e.t
        ), n AS (
            SELECT count(DISTINCT user_id) AS nu FROM ev
        )
        SELECT a, b, c,
               CAST(count(*) AS BIGINT) AS support,
               round(count(*) / CAST(n.nu AS DOUBLE) + 1e-9, 6)
                   AS support_ratio
        FROM a3, n
        GROUP BY a, b, c, n.nu
    """,
    description="Sequential-pattern mining (the PrefixSpan/SPADE "
    "support-counting core, the ORDERED complement to "
    "association_rules' itemsets and the all-patterns generalization "
    "of funnel_steps' single fixed funnel): for every event-type "
    "trigram (a,b,c), the number of users whose history contains it "
    "as a strictly-time-ordered subsequence. Existence is decided by "
    "the GREEDY EARLIEST chain (min ts of a, then min b after it, "
    "then any c after that — the standard subsequence lemma), so the "
    "engine never enumerates event triples: two co-partitioned "
    "equi-joins on user_id with a bounded fan-out (<= |types| = 5 "
    "rows, then <= 25, per user) and per-level min aggregations. At "
    "100 TB the blowup is the TYPE-count multiplier, not events^3, "
    "and every join is user-co-partitioned. Strict ts comparison; "
    "the fixtures have no per-user timestamp ties (verified r10)",
)
def q_seq_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("t"), "ts"
    )
    a1 = ev.groupBy("user_id", F.col("t").alias("a")).agg(
        F.min("ts").alias("ta")
    )
    a2 = (
        ev.join(a1, "user_id")
        .filter(F.col("ts") > F.col("ta"))
        .groupBy("user_id", "a", F.col("t").alias("b"))
        .agg(F.min("ts").alias("tb"))
    )
    a3 = (
        ev.join(a2, "user_id")
        .filter(F.col("ts") > F.col("tb"))
        .groupBy("user_id", "a", "b", F.col("t").alias("c"))
        .agg(F.lit(1).alias("one"))
    )
    nu = ev.select(F.countDistinct("user_id").alias("nu"))
    return (
        a3.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(nu))
        .select(
            "a",
            "b",
            "c",
            "support",
            F.round(
                F.col("support") / F.col("nu").cast("double") + F.lit(1e-9), 6
            ).alias("support_ratio"),
        )
    )
