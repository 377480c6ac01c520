"""Overflow-scale replay: the 128-bit integer-exact statistics stay
engine/oracle-equal on data whose intermediate products exceed int64.

VERDICT r9 / ADVICE r9: ``permutation_test`` and ``levene_test`` form
per-term products of cent-sums; raw long*long would silently wrap in
Spark's non-ANSI mode exactly when the data is large. Both queries now
cast each OPERAND to decimal(38,0) (Spark) / HUGEINT (DuckDB) before
multiplying. The fixture tables are far too small to exercise that, so
these tests synthesize a tiny events table whose VALUES are huge:
cents ~ 9e15 (still exact in a double), so z^2 ~ 1e31 and
cross-products ~ 1e21 — both far beyond int64, both well inside
128-bit. A regression to long products flips the compared stats."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

# cents must survive round(value*100) through a double exactly:
# 2^53 ~ 9.007e15, so keep cents <= ~9.0e15
_HUGE = 9.0e13  # value in "dollars" -> cents = 9.0e15


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, event_type, value)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, TIMESTAMP '2024-01-01 00:00:00' + "
        "INTERVAL (?) SECOND, ?, ?, ?, NULL)",
        [(eid, eid, uid, et, v) for (eid, uid, et, v) in rows],
    )
    dest = os.path.join(str(tmp_path), "events.parquet")
    con.execute(f"COPY ev TO '{dest}' (FORMAT PARQUET)")
    con.close()
    return str(tmp_path)


def _oracle_rows(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    out = con.execute(sql)
    cols = [d[0] for d in out.description]
    rows = out.fetchall()
    con.close()
    return cols, rows


def _spark_rows(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def _assert_equal(spark_cols, spark_rows, o_cols, o_rows):
    assert sorted(spark_cols) == sorted(o_cols)
    key = lambda cols: sorted(range(len(cols)), key=lambda i: cols[i])  # noqa: E731
    sk, ok = key(spark_cols), key(o_cols)
    norm = lambda rows, order: sorted(  # noqa: E731
        tuple(
            round(float(r[i]), 6) if isinstance(r[i], float) else r[i]
            for i in order
        )
        for r in rows
    )
    assert norm(spark_rows, sk) == norm(o_rows, ok)


@pytest.fixture()
def huge_events(tmp_path):
    # two event types, huge spread: per-group median sits mid-pack, so
    # z ~ 4.5e15 cents and z^2 ~ 2e31 >> int64; permutation cent-sums
    # ~ 2e17 with cross-products ~ (2e17 * 40)^2-ish terms ~ 1e21.
    rows = []
    eid = 0
    for g, base in (("purchase", _HUGE), ("click", _HUGE / 2)):
        for i in range(40):
            # spread: half the group near 0, half near base
            v = base if i % 2 else base * (i + 1) / 80.0
            rows.append((eid, eid % 7, g, v))
            eid += 1
    return _write_events(tmp_path, rows)


def test_levene_overflow_scale(spark, huge_events):
    sql = entry.oracle_sql()["levene_test"]
    _assert_equal(
        *_spark_rows(spark, huge_events, "levene_test"),
        *_oracle_rows(huge_events, sql),
    )


def test_permutation_overflow_scale(spark, huge_events):
    sql = entry.oracle_sql()["permutation_test"]
    _assert_equal(
        *_spark_rows(spark, huge_events, "permutation_test"),
        *_oracle_rows(huge_events, sql),
    )
