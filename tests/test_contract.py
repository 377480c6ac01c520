"""Driver-contract guards — fast checks on __spark_entry__'s surface.

The driver consumes entry()/queries()/oracle_sql() programmatically; a
typo in one oracle string or a renamed column would fail its gate, not
ours. These tests bind every oracle in DuckDB (parse + resolve against
the real views — no execution) and pin the flagship schema.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from kafka_streams_homework_spark.sources.batch import TABLES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return c


def test_every_oracle_binds_in_duckdb(con):
    oracles = E.oracle_sql()
    assert oracles, "oracle registry must not be empty"
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover - the assert carries the name
            raise AssertionError(f"oracle for {name!r} fails to bind: {ex}") from ex


def test_oracle_keys_subset_of_queries():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
    # rows-only ops are the documented hash/sketch-dependent ones
    assert sorted(q - o) == [
        "approx_stats",
        "compression_ratio",
        "cosine_pairs_cells",
        "dedup_embedding_lsh",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "distinct_rollup_hll",
        "knn_ivf",
        "knn_ivf_kmeans",
        "knn_ivfpq",
        "knn_pq",
        "semantic_dedup",
        "streaming_windowed_hll",
    ]


def test_distinct_rollup_hll_matches_exact(spark, sf_dir):
    """The daily estimate folded from hourly sketches must sit within
    HLL error bounds of the exact daily distinct (lg_k=14 → ~0.8%
    rse; assert 5%). Merging hourly sketches loses nothing vs
    sketching the day directly — union merge is lossless — so the
    cascade inherits the single-sketch bound."""
    from pyspark.sql import functions as F

    from kafka_streams_homework_spark.operators.sketches import (
        distinct_rollup_hll,
    )
    from kafka_streams_homework_spark.sources.batch import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        (r.event_type, r.day_start): r.n
        for r in events.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day_start")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = distinct_rollup_hll(events).collect()
    assert len(est) == len(exact)
    for r in est:
        e = exact[(r.event_type, r.day_start)]
        assert abs(r.approx_distinct - e) <= max(2, 0.05 * e), (
            r.event_type,
            r.day_start,
            r.approx_distinct,
            e,
        )
        assert r.n_hours >= 1


def test_approx_stats_within_tolerance(spark, sf_dir):
    """Sketches trade exactness for constant memory; bound the error
    against the exact twins on the same data."""
    reg = E.queries()
    exact = {
        r.event_type: r for r in reg["agg_stats"](spark, sf_dir).collect()
    }
    exact_p = {
        r.event_type: r for r in reg["value_percentiles"](spark, sf_dir).collect()
    }
    for r in reg["approx_stats"](spark, sf_dir).collect():
        e = exact[r.event_type]
        assert abs(r.approx_users - e.n_users) <= max(3, 0.05 * e.n_users)
        p = exact_p[r.event_type]
        assert abs(r.ap50 - p.p50) <= 0.05 * max(abs(p.p50), 1.0)
        # tail percentile on a tiny sample: the sketch returns an actual
        # element while the exact twin interpolates — bound by position
        # (above p90, at most the group max) rather than by distance
        assert p.p90 <= r.ap99 <= e.max_value


def test_entry_schema_is_stable(spark):
    df = E.entry(spark)  # lazy — no execution needed for the schema
    assert df.columns == [
        "alert_key",
        "customer_name",
        "window_start",
        "total_sum_per_minute",
    ]
    kinds = dict(df.dtypes)
    assert kinds["alert_key"] == "string"
    assert kinds["window_start"] == "timestamp"
    assert kinds["total_sum_per_minute"] == "double"
