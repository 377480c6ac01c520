"""Semantic tests for the round-10 operators.

Each new registry entry gets an exact python-replay check beyond the
DuckDB oracle gate (which covers cross-engine value parity — these pin
the SEMANTICS against an independent reimplementation).
"""

from __future__ import annotations

import math
from collections import defaultdict

from kafka_streams_homework_spark import queries as Q


def _events(spark, sf_dir):
    return Q._t(spark, sf_dir, "events")


def test_kendall_tau_b_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("ts", "event_type", "value")
        .collect()
    )
    acc = defaultdict(lambda: {"purchase": [], "click": []})
    for r in rows:
        if r.event_type in ("purchase", "click"):
            acc[r.ts.date()][r.event_type].append(r.value)
    series = []
    for day in sorted(acc):
        p, c = acc[day]["purchase"], acc[day]["click"]
        if p and c:
            series.append(
                (
                    round(sum(p) / len(p) + 1e-9, 6),
                    round(sum(c) / len(c) + 1e-9, 6),
                )
            )
    con = dis = tx = ty = n0 = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            dx = series[j][0] - series[i][0]
            dy = series[j][1] - series[i][1]
            n0 += 1
            if dx * dy > 0:
                con += 1
            elif dx * dy < 0:
                dis += 1
            elif dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
    tau = (con - dis) / math.sqrt((n0 - tx) * (n0 - ty))
    row = Q.queries()["kendall_tau_b"](spark, sf_dir).collect()[0]
    assert row.n_days == len(series)
    assert (row.concordant, row.discordant) == (con, dis)
    assert abs(row.tau_b - tau) < 1e-5
    assert -1.0 <= row.tau_b <= 1.0


def test_hill_tail_index_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("event_type = 'purchase' and value is not null and value > 0")
        .select("value")
        .collect()
    )
    cents = sorted((round(r.value * 100) for r in rows), reverse=True)
    k = 100
    assert len(cents) >= k + 1, "fixture too small for the Hill k"
    ls = [round(math.log(c) * 1e6) for c in cents[: k + 1]]
    inv_alpha = (sum(ls[:k]) - k * ls[k]) / k / 1e6
    row = Q.queries()["hill_tail_index"](spark, sf_dir).collect()[0]
    assert row.k == k
    assert row.n_values == len(cents)
    assert abs(row.inv_alpha - inv_alpha) < 1e-5
    assert abs(row.alpha - 1.0 / inv_alpha) < 1e-3
    assert row.alpha > 0


def test_negbin_fit_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("event_type = 'purchase'")
        .select("user_id")
        .collect()
    )
    counts = defaultdict(int)
    for r in rows:
        counts[r.user_id] += 1
    cs = list(counts.values())
    n = len(cs)
    mean = sum(cs) / n
    var = (sum(c * c for c in cs) - sum(cs) ** 2 / n) / n
    row = Q.queries()["negbin_fit"](spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert abs(row.mean_count - mean) < 1e-5
    assert abs(row.var_count - var) < 1e-5
    assert row.overdispersed == (var > mean)
    if var > mean:
        assert abs(row.nb_r - mean * mean / (var - mean)) < 1e-4
    else:
        assert row.nb_r is None


def test_knn_sq8_recall_vs_exact(spark, sf_dir):
    """int8 scalar quantization must preserve the neighborhood: high
    top-5 recall vs the exact float cosine ranking, and per-pair sim
    distortion bounded by the quantization step."""
    exact = Q.queries()["knn_bruteforce"](spark, sf_dir).collect()
    sq8 = Q.queries()["knn_sq8"](spark, sf_dir).collect()
    ex = defaultdict(set)
    for r in exact:
        ex[r.query_id].add(r.neighbor_id)
    got = defaultdict(set)
    sims = {}
    for r in sq8:
        got[r.query_id].add(r.neighbor_id)
        sims[(r.query_id, r.neighbor_id)] = r.sim_sq8
    assert set(got) == set(ex)
    hits = sum(len(ex[q] & got[q]) for q in ex)
    total = sum(len(ex[q]) for q in ex)
    assert hits / total >= 0.8, f"sq8 recall {hits}/{total}"
    # distortion: where both rankings agree, sims differ by < 0.02
    exact_sims = {(r.query_id, r.neighbor_id): r.sim for r in exact}
    common = set(sims) & set(exact_sims)
    assert common
    assert max(abs(sims[k] - exact_sims[k]) for k in common) < 0.02


def test_rate_gate_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .select("event_id", "user_id", "ts")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        eps = int(r.ts.timestamp() * 1_000_000)
        per_user[r.user_id].append((eps, r.event_id))
    W, K = 86_400_000_000, 3
    expect = {}
    for uid, evs in per_user.items():
        evs.sort()
        for i, (t, eid) in enumerate(evs):
            n_prev = sum(
                1 for (e, _) in evs[:i] if t - W <= e <= t - 1
            )
            expect[eid] = (n_prev, n_prev < K)
    out = Q.queries()["rate_gate"](spark, sf_dir).collect()
    assert len(out) == len(expect)
    denied = 0
    for r in out:
        n_prev, adm = expect[r.event_id]
        assert (r.n_prev_24h, r.admitted) == (n_prev, adm), r
        denied += 0 if adm else 1
    assert 0 < denied < len(out), "fixture must exercise both branches"


def test_streaming_rate_gate_matches_batch(spark, sf_dir):
    batch = {
        r.event_id: r.admitted
        for r in Q.queries()["rate_gate"](spark, sf_dir).collect()
    }
    stream = {
        r.event_id: r.admitted
        for r in Q.queries()["streaming_rate_gate"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_weibull_fit_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("event_type = 'purchase'")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(
            (int(r.ts.timestamp() * 1_000_000), r.event_id)
        )
    gaps = []
    for evs in per_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            d = b[0] - a[0]
            if d > 0:
                gaps.append(d)
    gaps.sort()
    n = len(gaps)
    pts = []
    for i, d in enumerate(gaps, start=1):
        fh = (i - 0.3) / (n + 0.4)
        pts.append(
            (round(math.log(d) * 1e6), round(math.log(-math.log(1 - fh)) * 1e6))
        )
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    scale_s = math.exp((sx / n - (sy / n) / k) / 1e6) / 1e6
    row = Q.queries()["weibull_fit"](spark, sf_dir).collect()[0]
    assert row.n_gaps == n
    assert abs(row.shape_k - k) < 1e-4
    assert abs(row.scale_s - scale_s) / scale_s < 1e-3
    assert row.shape_k > 0 and row.scale_s > 0


def test_gumbel_fit_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("ts", "value")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        c = round(r.value * 100)
        d = r.ts.date()
        daily[d] = max(daily[d], c)
    mx = sorted(daily.values())
    n = len(mx)
    pts = []
    for i, x in enumerate(mx, start=1):
        fh = (i - 0.3) / (n + 0.4)
        pts.append((x, round(-math.log(-math.log(fh)) * 1e6)))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    beta_c = (n * sxy - sx * sy) / (n * syy - sy * sy) * 1e6
    mu_c = sx / n - beta_c * (sy / n) / 1e6
    row = Q.queries()["gumbel_fit"](spark, sf_dir).collect()[0]
    assert row.n_blocks == n
    assert abs(row.location_mu - mu_c / 100) < 1e-3
    assert abs(row.scale_beta - beta_c / 100) < 1e-3
    # return level must sit above the fitted location and be finite
    assert row.return_level_p99 > row.location_mu
