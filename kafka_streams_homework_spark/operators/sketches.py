"""Mergeable-sketch operators — the cardinality path that survives
100 TB.

``COUNT(DISTINCT x)`` is the classic scale cliff: exact distinct
needs a shuffle keyed on x (or an expand + two-phase agg), and its
state grows with the true cardinality. Sketches fix both properties:

- **fixed-size state** (an HLL++ register array, ~KB at 1% rsd) no
  matter how many distinct values flow in, and
- **mergeability** — sketch(A ∪ B) = merge(sketch(A), sketch(B)), so
  partial aggregation works map-side and pre-aggregates FOLD: hourly
  sketches roll up to daily/weekly estimates without ever re-scanning
  the base table. That is exactly the hierarchical-rollup contract
  (queries.hierarchical_rollup) extended to distinct counts, which no
  exact pre-aggregate can provide (distinct is not summable).

Spark exposes Apache DataSketches HLL via ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` (SPARK-16484, public API
since 3.5); the binary sketch column is portable to the DataSketches
Java/C++ libs. The exact twin (`windowed_distinct`) stays the DuckDB
oracle anchor; pytest pins the sketch estimates to the exact counts
within rsd bounds.

Reference surface: the reference keeps only SUM state per window
(dsl/PriceAlertsApp.java:96-99); distinct-per-window is part of the
§7 engine-extension surface (SURVEY.md §2.6/§7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_distinct(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    id_col: str = "user_id",
) -> DataFrame:
    """Exact distinct-count per (key, tumbling window).

    Catalyst plans countDistinct as a two-phase aggregate (partial
    de-dup on (key, window, id), then final count) — one shuffle on
    the group keys, no row explosion. State is proportional to the
    number of distinct ids per group: fine while ids-per-window fit a
    partition, the sketch path below otherwise.
    """
    return (
        events.groupBy(
            F.col(key_col),
            F.window(ts_col, window)["start"].alias("window_start"),
        )
        .agg(F.countDistinct(id_col).alias("n_distinct"))
    )


def distinct_rollup_hll(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = 14,
) -> DataFrame:
    """Cascaded distinct estimate: hourly HLL sketches fold into a
    daily estimate — the base table is scanned ONCE.

    lg_k=14 (2^14 registers ≈ 16 KB per sketch) gives ~0.8% relative
    standard error; tests pin estimates to within 5% of exact. At
    100 TB the hourly sketch table is what you persist: day / week /
    month / all-time distincts are sketch merges over it (seconds),
    never re-scans of the raw events (hours).

    Output: one row per (key, day) with the day's estimated distinct
    count and the number of hourly sketches merged.
    """
    hourly = events.groupBy(
        F.col(key_col),
        F.window(ts_col, "1 hour")["start"].alias("hour_start"),
    ).agg(F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sk"))
    return (
        hourly.groupBy(
            F.col(key_col),
            F.date_trunc("day", F.col("hour_start")).alias("day_start"),
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


def heavy_hitters(df: DataFrame, col: str, k_counters: int = 256) -> DataFrame:
    """Exact heavy hitters in 1.5 scans with BOUNDED state — the
    Misra-Gries ("Frequent") summary + exact recount, vs the full
    groupBy whose state grows with true key cardinality.

    Pass 1 (mapInPandas, Arrow batches): each partition keeps at most
    k_counters counters; when a batch merge overflows, the (k+1)-th
    largest count t is subtracted from every counter and non-positive
    ones drop — the standard compression, whose removed mass is
    ≥ (k+1)·t, so the per-item undercount over a partition of n_p rows
    is ≤ n_p/(k+1). Any key with GLOBAL count > n/(k+1) therefore
    survives at least one partition summary; the union of summaries
    (≤ k_counters × n_partitions keys, corpus-size-independent) is a
    guaranteed candidate superset.

    Pass 2: exact recount of ONLY the candidates (broadcast semi-join,
    partial-agg groupBy over ≤ |candidates| keys) and the
    > n/(k_counters+1) threshold — making the output EXACT and fully
    deterministic regardless of partitioning or arrival order (the
    summaries vary with order; the thresholded recount does not).

    At 100 TB: the only full-cardinality shuffle a naive top-k pays is
    gone — state is k counters per task, candidates broadcast back,
    and the recount aggregates a pre-filtered stream. This is the
    batch shape of the streaming space-saving sketch.
    """
    import pandas as pd

    schema = df.select(F.col(col)).schema

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k_counters:
                cs = sorted(counters.values(), reverse=True)
                t = cs[k_counters]  # (k+1)-th largest
                counters = {x: n - t for x, n in counters.items() if n > t}
        yield pd.DataFrame({col: list(counters.keys())})

    cand = df.select(F.col(col)).mapInPandas(mg, schema=schema).distinct()
    total = df.select(F.count(F.lit(1)).alias("n_total"))
    counts = (
        df.select(F.col(col))
        .join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_total") / float(k_counters + 1))
        .select(
            col,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("n_total").cast("bigint").alias("n_total"),
        )
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch — the third
    bounded-state sketch family next to HLL (distinct_rollup_hll) and
    Misra-Gries (heavy_hitters), with one property neither has here:
    the sketch is built from ENGINE-PORTABLE hashes (md5-derived
    uniform fractions), so the whole estimate — not just an error
    bound — is deterministic and DuckDB-oracle-checkable. HLL's
    estimate depends on Spark's DataSketches build; this one is a pure
    function of the data.

    Theory (Bar-Yossef et al.): hash every id to u ~ U[0,1); the k-th
    smallest distinct hash u_k estimates cardinality as (k-1)/u_k,
    rsd ≈ 1/sqrt(k-2). KMV sketches are mergeable: the k smallest of
    a union are among the union of each side's k smallest.

    Plan: the uniform fraction is computed JVM-side; one Arrow-batched
    mapInPandas pass keeps the k smallest DISTINCT fractions per group
    per partition (state: k doubles x |groups|, corpus-independent);
    the final groupBy merges <= k x n_partitions candidate fractions
    per group (array flatten/distinct/sort/slice — tiny). No
    full-cardinality shuffle ever happens: the exchange carries only
    sketch candidates. Groups with fewer than k distinct hashes report
    exactly (the sketch IS the distinct set there).
    """
    import numpy as np
    import pandas as pd

    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    hashed = df.select(F.col(group_col).alias("g"), u.alias("u"))

    def mink(batches):
        state: dict = {}
        for pdf in batches:
            # dropna=False: a NULL group key is a group like any other
            # (pandas silently discards it by default; the SQL GROUP BY
            # twin keeps it)
            for g, grp in pdf.groupby("g", dropna=False):
                vs = grp["u"].to_numpy()
                prev = state.get(g)
                allv = np.concatenate([prev, vs]) if prev is not None else vs
                state[g] = np.unique(allv)[:k]  # unique() sorts ascending
        yield pd.DataFrame(
            {"g": list(state.keys()), "us": [v.tolist() for v in state.values()]}
        )

    partials = hashed.mapInPandas(mink, schema="g string, us array<double>")
    sk = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("us")))), 1, k
    )
    merged = partials.groupBy("g").agg(sk.alias("sk"))
    n_sk = F.size("sk")
    est = F.when(n_sk < k, n_sk.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at("sk", k)
    )
    return merged.select(
        F.col("g").alias(group_col),
        n_sk.cast("bigint").alias("n_sketch"),
        F.round(est, 2).alias("est_distinct"),
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter-pruned semi join — Spark's runtime-filter /
    "dynamic data pruning" pattern made explicit as an operator.

    A plain semi join against a large dim shuffles (or at best
    broadcast-hash-probes) EVERY fact row. At 100 TB the win is to
    discard the non-matching ~99% of fact rows inside the scan
    stage with a few bit tests, before any join machinery runs:

    1. BUILD: hash each dim key with ``n_hashes`` seeded xxhash64
       lanes into an ``n_bits`` bitmap. The bitmap is aggregated
       distributively (bit_or partial-aggregates map-side), and the
       collected driver state is bounded at n_bits/64 longs (8 KB
       for the default 64 Ki bits) — independent of dim row count.
    2. PROBE: the bitmap rides into the fact scan as an 8 KB array
       literal; each fact row tests its n_hashes bit positions with
       pure JVM expressions (xxhash64 / pmod / bit_get) inside
       WholeStageCodegen — no shuffle, no Python, no join yet.
    3. VERIFY: Bloom filters have false positives (~0.6% at 16
       bits/key, k=4), so survivors take an exact broadcast
       left-semi join against the (distinct) dim keys. The result
       is therefore EXACTLY the semi join — the bloom stage only
       sheds rows early.

    The same bitmap is mergeable across partitions/batches (bit_or),
    so an incremental pipeline can maintain it as dim churns.
    Reference analogue: the reference has no runtime filters; its
    lookup join probes every record (dsl/PriceAlertsApp.java:87-90).
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64

    def positions(col):  # k seeded hash lanes -> bit positions
        # xxhash64 is TYPE-sensitive: hashing an int and a bigint with
        # the same value yields different bits. Build and probe must
        # therefore hash through one common type, or true matches
        # would silently fail the bit test and be dropped.
        return [
            F.pmod(F.xxhash64(col.cast("string"), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]

    keys = dim.select(F.col(dim_key)).distinct()
    pos = keys.select(
        F.explode(F.array(*positions(F.col(dim_key)))).alias("pos")
    ).distinct()
    words = (
        pos.groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias(
                "bits"
            )
        )
        .collect()  # bounded: <= n_bits/64 rows (1024 longs = 8 KB)
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["word"]] = r["bits"]
    bm = F.lit(bitmap)

    might = F.lit(True)
    for p in positions(F.col(fact_key)):
        word = F.element_at(bm, (p / 64).cast("int") + F.lit(1))
        might = might & (F.bit_get(word, F.pmod(p, F.lit(64))) == 1)
    pruned = fact.filter(might)
    return pruned.join(
        F.broadcast(keys),
        pruned[fact_key] == keys[dim_key],
        "left_semi",
    )
