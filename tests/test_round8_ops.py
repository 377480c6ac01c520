"""Semantic tests for the round-8 continuation operators.

Each new registry entry gets a property or exact python-replay check
beyond the DuckDB oracle gate (which covers cross-engine value parity
— these pin the SEMANTICS against an independent reimplementation).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kafka_streams_homework_spark import queries as Q


def _events(spark, sf_dir):
    return Q._t(spark, sf_dir, "events")


def test_kruskal_wallis_python_replay(spark, sf_dir):
    """Exact midrank replay of the tie-corrected H statistic."""
    rows = _events(spark, sf_dir).select("event_type", "value").collect()
    vals = sorted({r.value for r in rows})
    per_v = Counter(r.value for r in rows)
    below, midrank = 0, {}
    for v in vals:
        midrank[v] = below + (per_v[v] + 1) / 2.0
        below += per_v[v]
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append(midrank[r.value])
    n = len(rows)
    rr = sum(sum(g) ** 2 / len(g) for g in groups.values())
    tie = sum(c**3 - c for c in per_v.values())
    h = (12.0 / (n * (n + 1)) * rr - 3 * (n + 1)) / (1 - tie / (n**3 - n))
    out = Q.queries()["kruskal_wallis"](spark, sf_dir).collect()[0]
    assert out.n_groups == len(groups)
    assert out.n_total == n
    assert out.df == len(groups) - 1
    assert abs(out.h_stat - h) < 1e-5


def test_permutation_test_exact_replay(spark, sf_dir):
    """Full exact replay: md5 coins, integer-cents means, the
    cross-multiplied extreme-count decision, and the p-value."""
    rows = (
        _events(spark, sf_dir)
        .filter(Q.F.col("event_type").isin("purchase", "click"))
        .select("event_id", "event_type", "value")
        .collect()
    )
    base = [
        (r.event_id, round(r.value * 100), 1 if r.event_type == "purchase" else 0)
        for r in rows
    ]
    s1 = sum(c for _, c, p in base if p)
    n1 = sum(1 for *_, p in base if p)
    s0 = sum(c for _, c, p in base if not p)
    n0 = len(base) - n1
    obs_num = abs(s1 * n0 - s0 * n1)
    obs_den = n1 * n0
    n_extreme = 0
    for b in range(1, Q._PERM_B + 1):
        ps1 = pn1 = ps0 = pn0 = 0
        for eid, c, _ in base:
            coin = (
                int(hashlib.md5(f"perm:{b}:{eid}".encode()).hexdigest()[:8], 16)
                % 2
            )
            if coin:
                ps1 += c
                pn1 += 1
            else:
                ps0 += c
                pn0 += 1
        if pn1 and pn0:
            if abs(ps1 * pn0 - ps0 * pn1) * obs_den >= obs_num * (pn1 * pn0):
                n_extreme += 1
    out = Q.queries()["permutation_test"](spark, sf_dir).collect()[0]
    assert out.n_events == len(base)
    assert out.n_perms == Q._PERM_B
    assert out.n_extreme == n_extreme
    assert abs(out.p_value - (1 + n_extreme) / (Q._PERM_B + 1)) < 1e-6
    assert abs(out.obs_diff - (s1 / n1 - s0 / n0) / 100.0) < 1e-5


def test_decision_stump_exact_replay(spark, sf_dir):
    """Brute-force every candidate threshold and confirm the argmax."""
    rows = _events(spark, sf_dir).select("event_type", "value").collect()
    data = sorted((r.value, 1 if r.event_type == "purchase" else 0) for r in rows)
    per_v = defaultdict(lambda: [0, 0])
    for v, y in data:
        per_v[v][0] += 1
        per_v[v][1] += y
    n = len(data)
    p = sum(y for _, y in data)
    best = None
    nl = pl = 0
    for v in sorted(per_v):
        nl += per_v[v][0]
        pl += per_v[v][1]
        if nl == n:
            break
        nr, pr = n - nl, p - pl
        h = (pl * pl + (nl - pl) ** 2) / nl + (pr * pr + (nr - pr) ** 2) / nr
        if best is None or h > best[0]:
            best = (h, v, nl, nr, pl, pr)
    out = Q.queries()["decision_stump"](spark, sf_dir).collect()[0]
    assert abs(out.split_value - best[1]) < 1e-6
    assert (out.n_left, out.n_right) == (best[2], best[3])
    assert (out.pos_left, out.pos_right) == (best[4], best[5])
    assert abs(out.weighted_gini - (n - best[0]) / n) < 1e-5


def test_woe_iv_binning_conservation_and_sign(spark, sf_dir):
    out = Q.queries()["woe_iv_binning"](spark, sf_dir).collect()
    assert len(out) == 10
    ev = _events(spark, sf_dir)
    n_total = ev.count()
    n_purchase = ev.filter(Q.F.col("event_type") == "purchase").count()
    assert sum(r.n for r in out) == n_total
    assert sum(r.n_good for r in out) == n_purchase
    for r in out:
        assert r.n == r.n_good + r.n_bad
        assert math.isfinite(r.woe)
        # IV contribution is (dg-db)*ln(dg/db) >= 0 always
        assert r.iv >= -1e-9
        assert r.v_lo <= r.v_hi


def test_target_encoding_loo_formula(spark, sf_dir):
    """Replay the smoothed LOO formula for every order."""
    orders = Q._t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    cents = {r.o_orderkey: round(r.o_totalprice * 100) for r in orders}
    cat = defaultdict(list)
    for r in orders:
        cat[r.o_orderpriority].append(r.o_orderkey)
    gs = sum(cents.values())
    gn = len(orders)
    gmean = gs / gn
    out = Q.queries()["target_encoding"](spark, sf_dir).collect()
    assert len(out) == gn
    got = {r.o_orderkey: r.priority_enc for r in out}
    for pri, keys in cat.items():
        cs = sum(cents[k] for k in keys)
        cn = len(keys)
        for k in keys[:50]:
            expect = ((cs - cents[k]) + 10.0 * gmean) / (cn - 1 + 10.0) / 100.0
            assert abs(got[k] - expect) < 1e-3


def test_dq_referential_fixture_is_clean(spark, sf_dir):
    out = Q.queries()["dq_referential"](spark, sf_dir).collect()
    rels = {r.relationship: r for r in out}
    assert len(rels) == 5
    for r in rels.values():
        assert r.orphan_rows == 0
        assert r.child_rows > 0


def test_hits_scores_l1_normalized_nonnegative(spark, sf_dir):
    out = Q.queries()["hits_scores"](spark, sf_dir).collect()
    assert out, "graph must be non-empty"
    hub_sum = sum(r.hub for r in out)
    auth_sum = sum(r.auth for r in out)
    # L1-normalized per iteration; rounding at 1e-6 per row
    assert abs(hub_sum - 1.0) < 1e-3
    assert abs(auth_sum - 1.0) < 1e-3
    assert all(r.hub >= 0 and r.auth >= 0 for r in out)


def test_clustering_coefficient_bounds(spark, sf_dir):
    out = Q.queries()["clustering_coefficient"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.degree >= 2
        assert 0.0 <= r.clustering_coef <= 1.0 + 1e-9
        # triangles bounded by wedge count
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


def test_naive_bayes_lang_exact_python_replay(spark, sf_dir):
    """Exact replay of train + score + argmax for every doc.

    NOTE the fixture's lang labels are independent of the text (all
    31 vocabulary words appear in all 5 languages), so a CORRECT
    multinomial NB must collapse toward the prior argmax — the replay
    pins that the engine computes exactly the right (mostly-prior)
    posterior, not that the fixture is separable.
    """
    docs = Q._t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    tc = defaultdict(Counter)
    nd = Counter()
    vocab = set()
    doc_toks = {}
    for r in docs:
        toks = r.text.lower().split(" ")
        doc_toks[r.doc_id] = (toks, r.lang)
        nd[r.lang] += 1
        vocab.update(toks)
        tc[r.lang].update(toks)
    v = len(vocab)
    n = len(docs)
    tl = {c: sum(tc[c].values()) for c in nd}
    langs = sorted(nd)
    preds = {}
    for doc_id, (toks, _) in doc_toks.items():
        best = None
        for c in langs:
            s = math.log(nd[c] / n) + sum(
                math.log((tc[c].get(t, 0) + 1) / (tl[c] + v)) for t in toks
            )
            key = (round(s + 1e-9, 6), [-ord(x) for x in c])
            if best is None or key > best[0]:
                best = (key, c, s)
        preds[doc_id] = (best[1], best[2])
    out = Q.queries()["naive_bayes_lang"](spark, sf_dir).collect()
    assert len(out) == n
    mismatch = [
        (r.doc_id, r.pred_lang, preds[r.doc_id][0])
        for r in out
        if r.pred_lang != preds[r.doc_id][0]
    ]
    assert not mismatch, f"prediction mismatches: {mismatch[:5]}"
    for r in out:
        assert abs(r.log_posterior - preds[r.doc_id][1]) < 1e-4
        assert r.is_correct == (r.pred_lang == doc_toks[r.doc_id][1])


def test_hurst_exponent_plausible_range(spark, sf_dir):
    out = Q.queries()["hurst_exponent"](spark, sf_dir).collect()[0]
    assert out.n_scales >= 2
    assert 0.0 < out.hurst < 1.5
    assert out.n_hours > 64


def test_shapley_efficiency_identity(spark, sf_dir):
    """Shapley efficiency: sum_i phi_i = v(grand coalition) - v(empty),
    an identity of the weights for ANY coalition value function."""
    ev = _events(spark, sf_dir).select("user_id", "event_type").collect()
    channels = sorted({r.event_type for r in ev if r.event_type != "purchase"})
    bit = {c: 1 << i for i, c in enumerate(channels)}
    masks = defaultdict(int)
    buyers = set()
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            buyers.add(r.user_id)
        else:
            masks[r.user_id] |= bit[r.event_type]
    per_mask = defaultdict(lambda: [0, 0])
    for u in users:
        m = masks.get(u, 0)
        per_mask[m][0] += 1
        per_mask[m][1] += 1 if u in buyers else 0
    def v(m):
        n, c = per_mask.get(m, (0, 0))
        return c / n if n else 0.0
    grand = (1 << len(channels)) - 1
    out = Q.queries()["shapley_attribution"](spark, sf_dir).collect()
    assert {r.channel for r in out} == set(channels)
    total = sum(r.shapley for r in out)
    assert abs(total - (v(grand) - v(0))) < 1e-4
    for r in out:
        touched = sum(
            n for m, (n, _) in per_mask.items() if m & bit[r.channel]
        )
        assert r.n_users_touched == touched


def test_knn_radius_threshold_and_topk_consistency(spark, sf_dir):
    radius = Q.queries()["knn_radius"](spark, sf_dir).collect()
    assert all(r.sim >= Q.RADIUS_SIM_THRESHOLD for r in radius)
    in_radius = {(r.query_id, r.neighbor_id) for r in radius}
    topk = Q.queries()["knn_bruteforce"](spark, sf_dir).collect()
    for r in topk:
        if r.sim >= Q.RADIUS_SIM_THRESHOLD:
            assert (r.query_id, r.neighbor_id) in in_radius


def test_image_phash_identical_bitmaps_hamming_zero(spark, sf_dir):
    """doc_id and doc_id+256 render IDENTICAL bitmaps (w,h repeat mod
    16/8, pixels mod 256) — every such pair must surface at Hamming 0."""
    docs = {
        r.doc_id
        for r in Q._t(spark, sf_dir, "documents").select("doc_id").collect()
    }
    expected = {(d, d + 256) for d in docs if d + 256 in docs}
    assert expected, "fixture should contain identical-bitmap pairs"
    out = Q.queries()["image_phash_dedup"](spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in out}
    for pair in expected:
        assert got.get(pair) == 0, f"missing exact-dup pair {pair}"
    assert all(h <= Q.PHASH_MAX_HAMMING for h in got.values())


def test_friedman_python_replay(spark, sf_dir):
    """Exact replay of the tie-corrected Friedman chi2 on integer
    cents daily totals."""
    rows = _events(spark, sf_dir).select("ts", "event_type", "value").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r.ts.date(), r.event_type)] += round(r.value * 100)
    days = sorted({d for d, _ in daily})
    types = sorted({g for _, g in daily})
    n, k = len(days), len(types)
    r_g = defaultdict(float)
    tsum = 0.0
    for d in days:
        vals = [(daily.get((d, g), 0), g) for g in types if (d, g) in daily]
        assert len(vals) == k  # every type appears every day
        ordered = sorted(v for v, _ in vals)
        from collections import Counter as C
        cnt = C(ordered)
        for v, g in vals:
            below = sum(c for u, c in cnt.items() if u < v)
            r_g[g] += below + (cnt[v] + 1) / 2.0
        tsum += sum(c**3 - c for c in cnt.values())
    rr2 = sum(x * x for x in r_g.values())
    chi2 = (12.0 / (n * k * (k + 1)) * rr2 - 3.0 * n * (k + 1)) / (
        1.0 - tsum / (n * k * (k * k - 1))
    )
    out = Q.queries()["friedman_test"](spark, sf_dir).collect()[0]
    assert (out.n_blocks, out.k_treatments, out.df) == (n, k, k - 1)
    assert abs(out.chi2 - chi2) < 1e-5


def test_l_diversity_audit_consistency(spark, sf_dir):
    out = Q.queries()["l_diversity_audit"](spark, sf_dir).collect()
    for r in out:
        assert 1 <= r.n_distinct_sens <= r.n
        assert r.diverse == (r.n_distinct_sens >= Q.L_DIVERSITY)
    cust = Q._t(spark, sf_dir, "customer").count()
    assert sum(r.n for r in out) == cust


def test_class_balance_sample_exact_balance(spark, sf_dir):
    ev = _events(spark, sf_dir)
    counts = {
        r.event_type: r.c
        for r in ev.groupBy("event_type").agg(
            Q.F.count(Q.F.lit(1)).alias("c")
        ).collect()
    }
    mc = min(counts.values())
    out = Q.queries()["class_balance_sample"](spark, sf_dir).collect()
    got = Counter(r.event_type for r in out)
    assert set(got) == set(counts)
    assert all(c == mc for c in got.values()), got
    # deterministic md5-rank selection (exact membership replay)
    keep = set()
    per_class = defaultdict(list)
    for r in ev.select("event_id", "event_type").collect():
        h = hashlib.md5(f"bal:{r.event_id}".encode()).hexdigest()
        per_class[r.event_type].append((h, r.event_id))
    for g, lst in per_class.items():
        for _, eid in sorted(lst)[:mc]:
            keep.add(eid)
    assert {r.event_id for r in out} == keep


def test_streaming_naive_bayes_matches_batch(spark, sf_dir):
    """Streaming/batch parity: same trained model, same predictions
    for every doc (the argmax tie rule included)."""
    batch = {
        r.doc_id: (r.pred_lang, r.log_posterior, r.is_correct)
        for r in Q.queries()["naive_bayes_lang"](spark, sf_dir).collect()
    }
    stream = {
        r.doc_id: (r.pred_lang, r.log_posterior, r.is_correct)
        for r in Q.queries()["streaming_naive_bayes"](spark, sf_dir).collect()
    }
    assert set(batch) == set(stream)
    for d, (pl, lp, ic) in batch.items():
        spl, slp, sic = stream[d]
        assert spl == pl, (d, spl, pl)
        assert abs(slp - lp) < 1e-5
        assert sic == ic


def test_croston_python_replay(spark, sf_dir):
    """Replay the closed-form Croston smoothers for a sample of parts."""
    li = Q._t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    demand = defaultdict(lambda: defaultdict(int))
    for r in li:
        demand[r.l_partkey][r.l_shipdate] += int(round(r.l_quantity))
    a = Q._CROSTON_ALPHA
    out = {r.part: r for r in Q.queries()["croston_forecast"](spark, sf_dir).collect()}
    checked = 0
    for part, days in demand.items():
        if len(days) < 3:
            assert part not in out
            continue
        seq = sorted(days.items())
        z = seq[0][1]
        for _, zj in seq[1:]:
            z = z + a * (zj - z)
        gaps = [
            (d2 - d1).days for (d1, _), (d2, _) in zip(seq, seq[1:])
        ]
        p = gaps[0]
        for g in gaps[1:]:
            p = p + a * (g - p)
        r = out[part]
        assert r.n_demands == len(seq)
        assert abs(r.forecast_size - z) < 1e-3
        assert abs(r.forecast_interval - p) < 1e-3
        assert abs(r.demand_rate - z / p) < 1e-4
        checked += 1
        if checked >= 100:
            break
    assert checked > 10


def test_adaboost_stumps_python_replay(spark, sf_dir):
    """Exact replay of the 3-round boosted-stump training loop."""
    rows = _events(spark, sf_dir).select("event_type", "value").collect()
    cells = defaultdict(float)  # (v, y) -> cnt
    for r in rows:
        y = 1 if r.event_type == "purchase" else -1
        cells[(r.value, y)] += 1.0
    w = {k: 1.0 for k in cells}
    vals = sorted({v for v, _ in cells})
    picked = []
    for _t in range(Q._ADA_ROUNDS):
        wpl = wnl = 0.0
        cum = {}
        for v in vals:
            wpl += w.get((v, 1), 0.0) * cells.get((v, 1), 0.0)
            wnl += w.get((v, -1), 0.0) * cells.get((v, -1), 0.0)
            cum[v] = (wpl, wnl)
        wpt, wnt = wpl, wnl
        best = None
        for v in vals:
            pl, nl = cum[v]
            for pol, err in ((1, nl + (wpt - pl)), (-1, pl + (wnt - nl))):
                key = (err, v, -pol)
                if best is None or key < best[0]:
                    best = (key, v, pol, err)
        eps = min(max(best[3] / (wpt + wnt), 1e-12), 1 - 1e-12)
        u = math.sqrt((1 - eps) / eps)
        th, pol = best[1], best[2]
        picked.append((th, pol, eps, u))
        for (v, y) in list(w):
            pred = pol if v <= th else -pol
            w[(v, y)] = w[(v, y)] * u if pred != y else w[(v, y)] / u
    out = sorted(
        Q.queries()["adaboost_stumps"](spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    n = sum(cells.values())
    for t, r in enumerate(out, 1):
        th, pol, eps, u = picked[t - 1]
        assert abs(r.threshold - th) < 1e-6
        assert r.polarity == pol
        assert abs(r.eps - eps) < 1e-6
        assert abs(r.alpha - 0.5 * math.log((1 - eps) / eps)) < 1e-5
        # ensemble error via the product-form sign test
        terr = 0.0
        for (v, y), cnt in cells.items():
            prod = 1.0
            for th_s, pol_s, _e, u_s in picked[:t]:
                pred_s = pol_s if v <= th_s else -pol_s
                prod *= u_s if pred_s == 1 else 1.0 / u_s
            pred = 1 if prod > 1 else -1
            if pred != y:
                terr += cnt
        assert abs(r.train_err - terr / n) < 1e-5
    # boosting must not increase training error over the single stump
    assert out[-1].train_err <= out[0].train_err + 1e-9


def test_diff_in_diff_python_replay(spark, sf_dir):
    """Exact replay of the 2x2 DiD estimator on integer cents."""
    rows = _events(spark, sf_dir).select("user_id", "ts", "value").collect()
    import datetime as dt
    cut = dt.datetime(2024, 1, 16)
    cells = defaultdict(lambda: [0, 0, 0])  # (grp, post) -> [n, s, s2]
    for r in rows:
        g = int(hashlib.md5(f"rm:{r.user_id}".encode()).hexdigest()[:8], 16) % 2
        p = 1 if r.ts >= cut else 0
        c = round(r.value * 100)
        cell = cells[(g, p)]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c
    mean = {k: v[1] / v[0] for k, v in cells.items()}
    mvar = {
        k: (v[2] - v[1] * v[1] / v[0]) / (v[0] - 1) / v[0]
        for k, v in cells.items()
    }
    did = (mean[(1, 1)] - mean[(1, 0)] - mean[(0, 1)] + mean[(0, 0)]) / 100.0
    se = math.sqrt(sum(mvar.values())) / 100.0
    out = Q.queries()["diff_in_diff"](spark, sf_dir).collect()[0]
    assert out.n_events == len(rows)
    assert abs(out.did - did) < 1e-5
    assert abs(out.se - se) < 1e-5
    assert abs(out.t_stat - did / se) < 1e-4


def test_cox_regression_python_replay(spark, sf_dir):
    """Exact replay of the 3-step Newton solve for the binary-covariate
    Breslow partial likelihood."""
    rows = _events(spark, sf_dir).select(
        "user_id", "ts", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append((r.ts, r.event_type))
    data = []
    for u, evs in per_user.items():
        first = min(t for t, _ in evs)
        purch = [t for t, e in evs if e == "purchase"]
        if purch:
            t, d = (min(purch) - first).total_seconds(), 1
        else:
            t, d = (max(t0 for t0, _ in evs) - first).total_seconds(), 0
        x = int(hashlib.md5(f"rm:{u}".encode()).hexdigest()[:8], 16) % 2
        data.append((t, x, d))
    per_t = defaultdict(lambda: [0, 0, 0, 0])  # t -> c0, c1, dt, d1
    for t, x, d in data:
        cell = per_t[t]
        cell[0] += 1 - x
        cell[1] += x
        cell[2] += d
        cell[3] += d * x
    n0 = n1 = 0
    risk = []
    for t in sorted(per_t, reverse=True):
        c0, c1, dt_, d1 = per_t[t]
        n0 += c0
        n1 += c1
        if dt_ > 0:
            risk.append((n0, n1, dt_, d1))
    beta = 0.0
    for _ in range(Q._COX_STEPS):
        u_s = i_s = 0.0
        eb = math.exp(beta)
        for n0_, n1_, dt_, d1 in risk:
            p = n1_ * eb / (n0_ + n1_ * eb)
            u_s += d1 - dt_ * p
            i_s += dt_ * p * (1 - p)
        beta += u_s / i_s
    eb = math.exp(beta)
    i_s = sum(
        dt_ * (n1_ * eb / (n0_ + n1_ * eb)) * (1 - n1_ * eb / (n0_ + n1_ * eb))
        for n0_, n1_, dt_, d1 in risk
    )
    out = Q.queries()["cox_regression"](spark, sf_dir).collect()[0]
    assert out.n_users == len(per_user)
    assert out.n_events == sum(d for *_, d in data)
    assert abs(out.beta - beta) < 1e-5
    assert abs(out.hazard_ratio - math.exp(beta)) < 1e-3
    assert abs(out.se - 1 / math.sqrt(i_s)) < 1e-5


def test_map_at_k_python_replay(spark, sf_dir):
    """Replay AP@k from the two member pipelines' own outputs."""
    exact = defaultdict(set)
    for r in Q.queries()["knn_bruteforce"](spark, sf_dir).collect():
        exact[r.query_id].add(r.neighbor_id)
    ranking = defaultdict(list)
    for r in Q.queries()["knn_lsh"](spark, sf_dir).collect():
        ranking[r.query_id].append((r.rank, r.neighbor_id))
    out = {r.query_id: r for r in Q.queries()["map_at_k"](spark, sf_dir).collect()}
    assert set(out) == set(ranking)
    for q, ranked in ranking.items():
        hits = 0
        ap = 0.0
        for rank, nb in sorted(ranked):
            rel = 1 if nb in exact[q] else 0
            hits += rel
            ap += rel * hits / rank
        ap /= len(exact[q])
        assert out[q].n_rel == len(exact[q])
        assert abs(out[q].ap - ap) < 1e-5
        assert 0.0 <= out[q].ap <= 1.0 + 1e-9


def test_streaming_anomaly_zscore_matches_batch(spark, sf_dir):
    batch = {
        r.event_id: r.z
        for r in Q.queries()["anomaly_zscore"](spark, sf_dir).collect()
    }
    stream = {
        r.event_id: r.z
        for r in Q.queries()["streaming_anomaly_zscore"](spark, sf_dir).collect()
    }
    assert set(batch) == set(stream)
    for eid, z in batch.items():
        assert abs(stream[eid] - z) < 1e-9


def test_robust_scale_quartile_replay(spark, sf_dir):
    """Replay the integer-exact quartile crossings and the scaling."""
    rows = _events(spark, sf_dir).select(
        "event_id", "event_type", "value"
    ).collect()
    per_type = defaultdict(list)
    for r in rows:
        per_type[r.event_type].append(r.value)
    qs = {}
    for t, vals in per_type.items():
        sv = sorted(vals)
        n = len(sv)
        def crossing(num, den):
            # smallest v with den*cum >= num*n over distinct values
            cum = 0
            seen = sorted(set(sv))
            cnt = Counter(sv)
            for v in seen:
                cum += cnt[v]
                if den * cum >= num * n:
                    return v
        qs[t] = (crossing(1, 4), crossing(1, 2), crossing(3, 4))
    out = {r.event_id: r for r in Q.queries()["robust_scale"](spark, sf_dir).collect()}
    assert len(out) == len(rows)
    for r in rows[:500]:
        q25, q50, q75 = qs[r.event_type]
        expect = (r.value - q50) / (q75 - q25)
        assert abs(out[r.event_id].scaled - expect) < 1e-5


def test_platt_scaling_python_replay(spark, sf_dir):
    """Exact replay of the 3-step 2x2 Newton logistic fit."""
    rows = _events(spark, sf_dir).select("event_type", "value").collect()
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        c = cells[r.value]
        c[0] += 1
        c[1] += 1 if r.event_type == "purchase" else 0
    a = b = 0.0
    for _ in range(Q._PLATT_STEPS):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for v, (n, pos) in cells.items():
            p = 1 / (1 + math.exp(-(a + b * v)))
            g0 += pos - n * p
            g1 += v * (pos - n * p)
            h00 += n * p * (1 - p)
            h01 += n * v * p * (1 - p)
            h11 += n * v * v * p * (1 - p)
        det = h00 * h11 - h01 * h01
        a += (g0 * h11 - g1 * h01) / det
        b += (g1 * h00 - g0 * h01) / det
    ll = 0.0
    ntot = 0
    for v, (n, pos) in cells.items():
        p = 1 / (1 + math.exp(-(a + b * v)))
        ll -= pos * math.log(p) + (n - pos) * math.log(1 - p)
        ntot += n
    out = Q.queries()["platt_scaling"](spark, sf_dir).collect()[0]
    assert out.n_events == ntot
    assert abs(out.intercept - a) < 1e-4
    assert abs(out.slope - b) < 1e-4
    assert abs(out.log_loss - ll / ntot) < 1e-4
    # calibrated log-loss must not exceed the prior-only entropy
    prior = sum(pos for _, pos in cells.values()) / ntot
    h0 = -(prior * math.log(prior) + (1 - prior) * math.log(1 - prior))
    assert out.log_loss <= h0 + 1e-6


def test_jackknife_ratio_python_replay(spark, sf_dir):
    """Exact replay of the closed-form LOO replicates and the SE."""
    rows = Q._t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    ).collect()
    data = [(round(r.l_extendedprice * 100), int(r.l_quantity)) for r in rows]
    sa = sum(a for a, _ in data)
    sb = sum(b for _, b in data)
    n = len(data)
    r_full = sa / sb
    devs = [(sa - a) / (sb - b) - r_full for a, b in data]
    sd = sum(devs)
    sd2 = sum(d * d for d in devs)
    se = math.sqrt((n - 1) / n * (sd2 - sd * sd / n))
    out = Q.queries()["jackknife_ratio"](spark, sf_dir).collect()[0]
    assert out.n_rows == n
    assert abs(out.ratio - r_full / 100.0) < 1e-6
    assert abs(out.jackknife_se - se / 100.0) < 1e-6
    assert out.jackknife_se > 0
