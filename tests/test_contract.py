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
        "dedup_embedding_lsh",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "knn_ivf",
        "knn_ivf_kmeans",
    ]


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
