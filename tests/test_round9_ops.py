"""Semantic tests for the round-9 operators.

Each new registry entry gets an exact python-replay check beyond the
DuckDB oracle gate (which covers cross-engine value parity — these pin
the SEMANTICS against an independent reimplementation).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from kafka_streams_homework_spark import queries as Q


def _events(spark, sf_dir):
    return Q._t(spark, sf_dir, "events")


def test_jarque_bera_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_type", "value")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append(round(r.value * 100))
    out = {r.event_type: r for r in Q.queries()["jarque_bera"](spark, sf_dir).collect()}
    assert set(out) == set(groups)
    for g, cs in groups.items():
        n = len(cs)
        mu = sum(cs) / n
        r2 = sum(c * c for c in cs) / n
        r3 = sum(c**3 for c in cs) / n
        r4 = sum(c**4 for c in cs) / n
        m2 = r2 - mu * mu
        m3 = r3 - 3 * mu * r2 + 2 * mu**3
        m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu**4
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2)
        jb = n / 6.0 * (skew**2 + (kurt - 3) ** 2 / 4.0)
        o = out[g]
        assert o.n == n
        assert abs(o.skewness - skew) < 1e-5
        assert abs(o.kurtosis - kurt) < 1e-5
        assert abs(o.jb_stat - jb) < 1e-4
        assert o.normal_rejected == (jb > 5.991)


def test_levene_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_type", "value")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append(round(r.value * 100))
    # per-group weighted median = the 2*cw >= n crossing over sorted
    # distinct values
    zs = {}
    for g, vs in groups.items():
        vs_sorted = sorted(vs)
        n = len(vs_sorted)
        med = vs_sorted[(n - 1) // 2]  # first v where 2*rank >= n
        # match the crossing rule exactly
        cum = 0
        from collections import Counter

        for v, c in sorted(Counter(vs).items()):
            cum += c
            if 2 * cum >= n:
                med = v
                break
        zs[g] = [abs(v - med) for v in vs]
    N = sum(len(z) for z in zs.values())
    k = len(zs)
    zbar = sum(sum(z) for z in zs.values()) / N
    num = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs.values())
    den = sum(
        sum(zi * zi for zi in z) - sum(z) ** 2 / len(z) for z in zs.values()
    )
    w = (N - k) / (k - 1) * num / den
    o = Q.queries()["levene_test"](spark, sf_dir).collect()[0]
    assert o.n_groups == k and o.n_total == N
    assert o.df1 == k - 1 and o.df2 == N - k
    assert abs(o.w_stat - w) < 1e-5


def test_granger_lag1_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(list))
    for r in rows:
        daily[r.event_type][r.ts.date()].append(r.value)
    y = {d: round(sum(v) / len(v) + 1e-9, 6) for d, v in daily["purchase"].items()}
    x = {d: round(sum(v) / len(v) + 1e-9, 6) for d, v in daily["click"].items()}
    days = sorted(set(y) & set(x))
    pairs = [
        (y[days[i]], y[days[i - 1]], x[days[i - 1]])
        for i in range(1, len(days))
    ]
    n = len(pairs)
    sy = sum(p[0] for p in pairs)
    sa = sum(p[1] for p in pairs)
    sb = sum(p[2] for p in pairs)
    caa = sum(p[1] ** 2 for p in pairs) - sa * sa / n
    cbb = sum(p[2] ** 2 for p in pairs) - sb * sb / n
    cab = sum(p[1] * p[2] for p in pairs) - sa * sb / n
    cay = sum(p[1] * p[0] for p in pairs) - sa * sy / n
    cby = sum(p[2] * p[0] for p in pairs) - sb * sy / n
    cyy = sum(p[0] ** 2 for p in pairs) - sy * sy / n
    det = caa * cbb - cab * cab
    b1 = (cbb * cay - cab * cby) / det
    b2 = (caa * cby - cab * cay) / det
    rss_r = cyy - cay * cay / caa
    rss_f = cyy - b1 * cay - b2 * cby
    f = (rss_r - rss_f) / (rss_f / (n - 3))
    o = Q.queries()["granger_lag1"](spark, sf_dir).collect()[0]
    assert o.n_pairs == n
    assert abs(o.beta_ylag - b1) < 1e-5
    assert abs(o.beta_xlag - b2) < 1e-5
    assert abs(o.f_stat - f) < 1e-4
    # the restricted model can never beat the full one
    assert o.rss_full <= o.rss_restricted + 1e-9


def test_chi2_token_ranking_python_replay(spark, sf_dir):
    docs = Q._t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    N = len(docs)
    n_c = defaultdict(int)
    df_t = defaultdict(int)
    a = defaultdict(int)
    for d in docs:
        n_c[d.lang] += 1
        toks = set(d.text.lower().split(" "))
        for t in toks:
            df_t[t] += 1
            a[(t, d.lang)] += 1
    expected = defaultdict(list)
    for cl in n_c:
        for t, dft in df_t.items():
            if dft >= N:
                continue
            A = a.get((t, cl), 0)
            d = float(A) * N - float(n_c[cl]) * dft
            chi2 = round(
                float(N) * d * d / (float(n_c[cl]) * (N - n_c[cl]) * dft * (N - dft))
                + 1e-9,
                6,
            )
            expected[cl].append((chi2, t, A))
    out = Q.queries()["chi2_token_ranking"](spark, sf_dir).collect()
    got = defaultdict(dict)
    for r in out:
        got[r.cl][r.rank] = (r.tok, r.chi2, r.df_in_class)
    for cl, feats in expected.items():
        top = sorted(feats, key=lambda f: (-f[0], f[1]))[:10]
        assert len(got[cl]) == min(10, len(top))
        for i, (chi2, t, A) in enumerate(top, start=1):
            gt, gchi, ga = got[cl][i]
            assert gt == t, (cl, i, gt, t)
            assert abs(gchi - chi2) < 1e-6
            assert ga == A


def test_doubly_robust_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_id", "user_id", "value")
        .collect()
    )
    recs = []
    for r in rows:
        h = int(hashlib.md5(f"act:{r.event_id}".encode()).hexdigest()[:8], 16)
        bucket = r.user_id % 2
        if bucket == 0:
            act = 0 if h < 2147483648 else (1 if h < 3579139413 else 2)
            w = {0: 2, 1: 3, 2: 6}[act]
        else:
            act = 0 if h < 715827882 else (1 if h < 2147483648 else 2)
            w = {0: 6, 1: 3, 2: 2}[act]
        recs.append((round(r.value, 2), bucket, act, r.user_id % 3, w))
    cells = defaultdict(lambda: [0.0, 0])
    for rr, b, act, tgt, w in recs:
        cells[(b, act)][0] += rr
        cells[(b, act)][1] += 1
    q = {k: s / c for k, (s, c) in cells.items()}
    n = len(recs)
    dm = sum(q[(b, tgt)] for _, b, _, tgt, _ in recs) / n
    dr = (
        sum(
            q[(b, tgt)] + (w * (rr - q[(b, act)]) if act == tgt else 0.0)
            for rr, b, act, tgt, w in recs
        )
        / n
    )
    o = Q.queries()["doubly_robust_eval"](spark, sf_dir).collect()[0]
    assert o.n_events == n
    assert o.n_matched == sum(1 for _, _, act, tgt, _ in recs if act == tgt)
    assert abs(o.dm - dm) < 1e-4
    assert abs(o.dr - dr) < 1e-4


def test_page_hinkley_python_replay(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(list))
    for r in rows:
        daily[r.event_type][r.ts.date()].append(r.value)
    out = {
        r.event_type: r
        for r in Q.queries()["page_hinkley_drift"](spark, sf_dir).collect()
    }
    for g, dd in daily.items():
        xs = [
            round(sum(v) / len(v) + 1e-9, 6)
            for _, v in sorted(dd.items())
        ]
        n = len(xs)
        mu = sum(xs) / n
        sd = math.sqrt(
            (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        )
        lam = round(2 * sd + 1e-9, 6)
        cum, mn, phs = 0.0, float("inf"), []
        for x in xs:
            cum += x - mu - 0.01
            mn = min(mn, cum)
            phs.append(cum - mn)
        o = out[g]
        assert o.n_days == n
        assert abs(o.max_ph - max(phs)) < 1e-5
        assert abs(o["lambda"] - lam) < 1e-6
        drifted = any(round(p + 1e-9, 6) > lam for p in phs)
        assert o.drifted == drifted


def test_streaming_page_hinkley_python_replay(spark, sf_dir):
    """Sequential replay of the ONLINE (running-mean) PH detector —
    identical left-to-right association as the handler."""
    rows = (
        _events(spark, sf_dir)
        .filter("value is not null")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r.event_type].append((r.ts, r.event_id, r.value))
    out = {
        r.event_type: r
        for r in Q.queries()["streaming_page_hinkley"](spark, sf_dir).collect()
    }
    assert set(out) == set(series)
    for g, evs in series.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        n, s, cum, mn, maxph, alarm = 0, 0.0, 0.0, float("inf"), 0.0, None
        for ts_v, _, x in evs:
            n += 1
            s += x
            cum += x - s / n - 0.01
            mn = min(mn, cum)
            ph = cum - mn
            maxph = max(maxph, ph)
            if alarm is None and round(ph + 1e-9, 6) > 1000.0:
                alarm = ts_v
        o = out[g]
        assert o.n == n
        assert abs(o.max_ph - maxph) < 1e-5
        assert o.alarm_ts == alarm
        assert o.drifted == (alarm is not None)


def test_vocab_oov_rate_python_replay(spark, sf_dir):
    docs = Q._t(spark, sf_dir, "documents").select("lang", "text").collect()
    from collections import Counter

    tot = Counter()
    per_lang = defaultdict(list)
    for d in docs:
        toks = d.text.lower().split(" ")
        tot.update(toks)
        per_lang[d.lang].extend(toks)
    kept = {
        t
        for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[
            : Q.OOV_TOP_V
        ]
    }
    out = {
        r.lang: r for r in Q.queries()["vocab_oov_rate"](spark, sf_dir).collect()
    }
    assert set(out) == set(per_lang)
    for lang, toks in per_lang.items():
        n_oov = sum(1 for t in toks if t not in kept)
        o = out[lang]
        assert o.n_tokens == len(toks)
        assert o.n_oov == n_oov
        assert abs(o.oov_rate - n_oov / len(toks)) < 1e-6


def test_nb_class_metrics_consistency(spark, sf_dir):
    """Metrics must agree with the registered NB predictions."""
    preds = {
        r.doc_id: r.pred_lang
        for r in Q.queries()["naive_bayes_lang"](spark, sf_dir).collect()
    }
    truth = {
        r.doc_id: r.lang
        for r in Q._t(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    out = {r.cl: r for r in Q.queries()["nb_class_metrics"](spark, sf_dir).collect()}
    assert set(out) == set(truth.values())
    for cl, o in out.items():
        n_true = sum(1 for t in truth.values() if t == cl)
        n_pred = sum(1 for p in preds.values() if p == cl)
        tp = sum(1 for d, p in preds.items() if p == cl and truth[d] == cl)
        assert (o.n_true, o.n_pred, o.tp) == (n_true, n_pred, tp)
        if n_pred:
            assert abs(o.precision - tp / n_pred) < 1e-6
        if n_true:
            assert abs(o.recall - tp / n_true) < 1e-6
        if n_pred and n_true and tp:
            p, r = tp / n_pred, tp / n_true
            assert abs(o.f1 - 2 * p * r / (p + r)) < 1e-6


def test_streaming_oov_gate_python_replay(spark, sf_dir):
    docs = Q._t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    from collections import Counter

    tot = Counter()
    for d in docs:
        tot.update(d.text.lower().split(" "))
    kept = {
        t for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
    }
    out = {
        r.doc_id: r
        for r in Q.queries()["streaming_oov_gate"](spark, sf_dir).collect()
    }
    assert set(out) == {d.doc_id for d in docs}
    for d in docs:
        toks = d.text.lower().split(" ")
        n_oov = sum(1 for t in toks if t not in kept)
        o = out[d.doc_id]
        assert o.n_tokens == len(toks)
        assert o.n_oov == n_oov
        assert o.keep == (2 * n_oov <= len(toks))


def test_mrr_eval_python_replay(spark, sf_dir):
    exact = defaultdict(set)
    for r in Q.queries()["knn_bruteforce"](spark, sf_dir).collect():
        exact[r.query_id].add(r.neighbor_id)
    approx = defaultdict(list)
    for r in Q.queries()["knn_lsh"](spark, sf_dir).collect():
        approx[r.query_id].append((r.rank, r.neighbor_id))
    out = {r.query_id: r for r in Q.queries()["mrr_eval"](spark, sf_dir).collect()}
    assert set(out) == set(approx)
    for q, ranked in approx.items():
        first = min(
            (rk for rk, nb in ranked if nb in exact[q]), default=None
        )
        o = out[q]
        assert o.first_rel_rank == first
        rr = 1.0 / first if first else 0.0
        assert abs(o.reciprocal_rank - rr) < 1e-6
