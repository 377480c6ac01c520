"""Round-11 second wave: audio_vad, silhouette_simplified,
wilcoxon_signed_rank, runs_test.

Each op's oracle runs in the driver sweep; these tests add python
replays (independent arithmetic, not a SQL twin) and structural
invariants the hash check can't express.
"""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_streams_homework_spark import queries as Q


def _vad_expected(doc_id: int):
    """Closed-form segment list for one doc (pure python)."""
    n_fr = 1 + doc_id % 50
    amp = 1000 + (doc_id % 20) * 1000
    per, duty = 3 + doc_id % 3, 1 + doc_id % 2
    segs = []
    cur = None
    for j in range(n_fr):
        a = amp if (j % per) < duty else amp // 16
        r = math.floor(a * 0.7071067811865476 + 0.5)
        energy = 4 * r * r + 2 * a * a
        voiced = energy >= 2 * amp * amp
        if voiced:
            if cur is None:
                cur = [j, 0, 0]
            cur[1] += 1
            cur[2] += energy
        elif cur is not None:
            segs.append(tuple(cur))
            cur = None
    if cur is not None:
        segs.append(tuple(cur))
    return [
        (i + 1, s, n, e) for i, (s, n, e) in enumerate(segs)
    ]


def test_audio_vad_python_replay(spark, sf_dir):
    """Every segment (start, length, energy) replayed closed-form."""
    rows = Q.queries()["audio_vad"](spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.seg_idx, r.start_frame, r.n_frames, r.seg_energy)
        )
    doc_ids = [
        r.doc_id for r in Q._t(spark, sf_dir, "documents")
        .select("doc_id").collect()
    ]
    assert set(got) == set(doc_ids)
    for did in doc_ids:
        exp = _vad_expected(int(did))
        assert sorted(got[did]) == exp, (did, sorted(got[did])[:3], exp[:3])


def test_audio_vad_codec_frame_energy_exact(spark, sf_dir):
    """The DECODED per-frame energies (real wave reader) equal the
    closed form 4r^2 + 2a^2, and the clip peak equals the loud amp —
    the arithmetic the oracle relies on, checked against real bytes."""
    from kafka_streams_homework_spark.operators import multimodal as M

    docs = Q._t(spark, sf_dir, "documents").select("doc_id").limit(200)
    frames = M.wav_frame_energy(M.synth_wav_bursty(docs)).collect()
    assert frames
    for r in frames:
        d = int(r.doc_id)
        amp = 1000 + (d % 20) * 1000
        per, duty = 3 + d % 3, 1 + d % 2
        a = amp if (r.frame_idx % per) < duty else amp // 16
        rr = math.floor(a * 0.7071067811865476 + 0.5)
        assert r.energy == 4 * rr * rr + 2 * a * a, (d, r.frame_idx)
        assert r.peak == amp


def test_silhouette_simplified_invariants(spark, sf_dir):
    """Cells cover the corpus exactly once; simplified silhouette is
    in [0, 1] by construction (a <= b since assignment is argmax) and
    per-cell mean intra-distance <= mean nearest-other distance."""
    out = Q.queries()["silhouette_simplified"](spark, sf_dir).collect()
    n_corpus = Q._t(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in out) == n_corpus
    assert all(0 <= r.cell < 8 for r in out)
    for r in out:
        assert 0.0 <= r.mean_sil <= 1.0
        assert r.mean_a <= r.mean_b + 1e-9


def test_wilcoxon_signed_rank_python_replay(spark, sf_dir):
    """n, W+ and z replayed with an independent rank computation
    (sorted-list midranks over raw diffs, not the distinct-first
    relational form)."""
    ev = (
        Q._t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.avg(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                )
                + F.lit(1e-9),
                2,
            ).alias("mp"),
            F.round(
                F.avg(
                    F.when(F.col("event_type") == "click", F.col("value"))
                )
                + F.lit(1e-9),
                2,
            ).alias("mc"),
        )
        .collect()
    )
    diffs = [
        round(round(r.mp, 2) - round(r.mc, 2), 2)
        for r in ev
        if r.mp is not None and r.mc is not None
    ]
    diffs = [d for d in diffs if d != 0]
    n = len(diffs)
    order = sorted(range(n), key=lambda i: abs(diffs[i]))
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while (
            j + 1 < n
            and abs(diffs[order[j + 1]]) == abs(diffs[order[i]])
        ):
            j += 1
        mid = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    w_plus = sum(rk for d, rk in zip(diffs, ranks) if d > 0)
    ties: dict[float, int] = {}
    for d in diffs:
        ties[abs(d)] = ties.get(abs(d), 0) + 1
    tie_term = sum(t**3 - t for t in ties.values())
    sigma = math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie_term / 48.0
    )
    z = round((w_plus - n * (n + 1) / 4.0) / sigma + 1e-9, 6)
    row = Q.queries()["wilcoxon_signed_rank"](spark, sf_dir).collect()[0]
    assert row.n == n
    assert abs(float(row.w_plus) - w_plus) < 0.01
    assert abs(row.z_stat - z) < 1e-6


def test_runs_test_python_replay(spark, sf_dir):
    """Runs count and z replayed with an independent pass over the
    ordered daily series."""
    daily = sorted(
        (r.d, r.rev)
        for r in Q._t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice") + F.lit(1e-9), 2).alias("rev"))
        .collect()
    )
    revs = sorted(v for _, v in daily)
    m = len(revs)
    mid = (m - 1) / 2.0
    lo, hi = revs[int(math.floor(mid))], revs[int(math.ceil(mid))]
    med = lo + (hi - lo) * (mid - math.floor(mid))
    signs = [1 if v > med else 0 for _, v in daily if v != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    nn = n1 + n2
    mu = 1 + 2.0 * n1 * n2 / nn
    sigma = math.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (float(nn) * nn * (nn - 1))
    )
    z = round((runs - mu) / sigma + 1e-9, 6)
    row = Q.queries()["runs_test"](spark, sf_dir).collect()[0]
    assert (row.n1, row.n2, row.n_runs) == (n1, n2, runs)
    assert abs(row.z_stat - z) < 1e-6


def test_gif_codec_roundtrip_random():
    """Pure-python property check: random and degenerate bitmaps
    round-trip bit-exactly through the real GIF87a/LZW codec."""
    import random

    from kafka_streams_homework_spark.operators.multimodal import (
        decode_gif_gray8,
        encode_gif_gray8,
    )

    rng = random.Random(7)
    cases = [
        [[rng.randrange(256) for _ in range(rng.randint(1, 48))]
         for _ in range(rng.randint(1, 48))]
        for _ in range(25)
    ]
    cases += [[[0]], [[255] * 60] * 60, [[7] * 3] * 50]
    for px in cases:
        w, h = len(px[0]), len(px)
        # rectangularize ragged random rows
        px = [row[:w] + [0] * (w - len(row)) for row in px]
        dw, dh, flat = decode_gif_gray8(encode_gif_gray8(px))
        assert (dw, dh) == (w, h)
        assert flat == [p for row in px for p in row]


def test_gif_pipeline_python_replay(spark, sf_dir):
    """Decoded mean pixel equals the closed form for every doc."""
    got = {
        r.doc_id: (r.width, r.height, r.n_pixels, r.mean_pixel)
        for r in Q.queries()["gif_pipeline"](spark, sf_dir).collect()
    }
    doc_ids = [
        r.doc_id for r in Q._t(spark, sf_dir, "documents")
        .select("doc_id").collect()
    ]
    assert set(got) == set(doc_ids)
    for did in doc_ids:
        d = int(did)
        w, h = 8 + d % 24, 8 + d % 16
        total = sum(
            (11 * x + 5 * y + 3 * d) % 256
            for x in range(w) for y in range(h)
        )
        exp = round(total / (w * h) + 1e-9, 6)
        assert got[did] == (w, h, w * h, exp), (did, got[did])


def test_katz_python_replay(spark, sf_dir):
    """Walk counts and the attenuated combination replayed in pure
    python from the raw lineitem pairs."""
    from collections import defaultdict

    from kafka_streams_homework_spark.queries.graph import _KATZ_ALPHA

    li = [
        (r.l_orderkey, r.l_partkey)
        for r in Q._t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    by_order = defaultdict(list)
    for ok, pk in li:
        by_order[ok].append(pk)
    w = defaultdict(int)
    for parts in by_order.values():
        for pa in parts:
            for pb in parts:
                if pa != pb:
                    w[(pa, pb)] += 1
    w1, w2, w3 = defaultdict(int), defaultdict(int), defaultdict(int)
    for (pa, pb), c in w.items():
        w1[pb] += c
    for (pa, pb), c in w.items():
        w2[pb] += c * w1[pa]
    for (pa, pb), c in w.items():
        w3[pb] += c * w2[pa]
    got = {
        r.part: (r.in_weight, r.katz)
        for r in Q.queries()["katz_centrality"](spark, sf_dir).collect()
    }
    assert set(got) == set(w1)
    a = _KATZ_ALPHA
    for node in w1:
        katz = round(a * w1[node] + a * a * w2[node]
                     + a * a * a * w3[node] + 1e-9, 6)
        assert got[node] == (w1[node], katz), (node, got[node])


def test_seq_pattern_support_python_replay(spark, sf_dir):
    """Support replayed by brute-force subsequence search over every
    user's ordered history (independent of the greedy-chain form)."""
    from collections import defaultdict
    from itertools import product

    ev = (
        Q._t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    hist = defaultdict(list)
    for r in ev:
        hist[r.user_id].append((r.ts, r.event_type))
    types = sorted({r.event_type for r in ev})

    def has_subseq(seq, pat):
        i = 0
        last = None
        for t, ty in seq:
            if ty == pat[i] and (last is None or t > last):
                last = t
                i += 1
                if i == len(pat):
                    return True
        return False

    support = defaultdict(int)
    for u, seq in hist.items():
        seq.sort()
        for pat in product(types, repeat=3):
            if has_subseq(seq, pat):
                support[pat] += 1
    got = {
        (r.a, r.b, r.c): (r.support, r.support_ratio)
        for r in Q.queries()["seq_pattern_support"](spark, sf_dir).collect()
    }
    exp = {p: s for p, s in support.items() if s > 0}
    assert set(got) == set(exp)
    nu = len(hist)
    for p, s in exp.items():
        assert got[p] == (s, round(s / nu + 1e-9, 6)), (p, got[p])


def test_bartlett_python_replay(spark, sf_dir):
    """Statistic replayed from per-group cent lists in pure python."""
    from collections import defaultdict

    ev = (
        Q._t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.round(F.col("value") * 100).alias("v"))
        .collect()
    )
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(int(r.v))
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    sp_num = sum_ln = sum_inv = 0.0
    for g in groups.values():
        ni = len(g)
        s1, s2 = sum(g), sum(x * x for x in g)
        s2g = (ni * s2 - s1 * s1) / (ni * (ni - 1)) / 10000.0
        sp_num += (ni - 1) * s2g
        sum_ln += (ni - 1) * math.log(s2g)
        sum_inv += 1.0 / (ni - 1)
    stat = ((n - k) * math.log(sp_num / (n - k)) - sum_ln) / (
        1.0 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1))
    )
    row = Q.queries()["bartlett_test"](spark, sf_dir).collect()[0]
    assert (row.n_groups, row.n_total) == (k, n)
    assert abs(row.bartlett_stat - round(stat + 1e-9, 6)) < 1e-6


def test_tukey_fences_python_replay(spark, sf_dir):
    """Quartiles, fences and outlier counts replayed in python."""
    from collections import defaultdict

    ev = (
        Q._t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.round(F.col("value") * 100).alias("v"))
        .collect()
    )
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(int(r.v))

    def pct(sorted_xs, p):
        mid = (len(sorted_xs) - 1) * p
        lo, hi = (
            sorted_xs[int(math.floor(mid))],
            sorted_xs[int(math.ceil(mid))],
        )
        return lo + (hi - lo) * (mid - math.floor(mid))

    got = {
        r.event_type: (r.q1, r.q3, r.n_low, r.n_high, r.n)
        for r in Q.queries()["tukey_outlier_fences"](spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for g, xs in groups.items():
        xs.sort()
        q1, q3 = pct(xs, 0.25), pct(xs, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        exp = (
            round(q1 / 100.0 + 1e-9, 6),
            round(q3 / 100.0 + 1e-9, 6),
            sum(1 for x in xs if x < lo),
            sum(1 for x in xs if x > hi),
            len(xs),
        )
        assert got[g] == exp, (g, got[g], exp)


def test_count_min_sketch_python_replay(spark, sf_dir):
    """Sketch cells, estimates and the one-sided error replayed with
    hashlib md5 in pure python; CMS guarantee est >= true pinned."""
    import hashlib
    from collections import Counter, defaultdict

    from kafka_streams_homework_spark.queries.sketches import (
        CMS_D,
        CMS_TOPK,
        CMS_W,
    )

    keys = [
        r.l_partkey
        for r in Q._t(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    ]
    true = Counter(keys)

    def col(j, k):
        h = hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) % CMS_W

    cells = defaultdict(int)
    for k, c in true.items():
        for j in range(CMS_D):
            cells[(j, col(j, k))] += c
    cand = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    got = {
        r.l_partkey: (r.true_cnt, r.cms_est, r.overest)
        for r in Q.queries()["count_min_sketch"](spark, sf_dir).collect()
    }
    assert set(got) == {k for k, _ in cand}
    for k, c in cand:
        est = min(cells[(j, col(j, k))] for j in range(CMS_D))
        assert got[k] == (c, est, est - c), (k, got[k])
        assert est >= c  # CMS one-sided guarantee


def test_rouge_n_pairs_python_replay(spark, sf_dir):
    """ROUGE-1/2 replayed with collections.Counter clipping over the
    same near-dup pair set."""
    from collections import Counter

    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in Q._t(spark, sf_dir, "documents").collect()
    }
    rows = Q.queries()["rouge_n_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        ta, tb = docs[r.doc_a], docs[r.doc_b]
        u_ov = sum((Counter(ta) & Counter(tb)).values())
        big = lambda t: Counter(
            [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        )
        b_ov = sum((big(ta) & big(tb)).values())
        na, nb = len(ta), len(tb)
        ban, bbn = max(na - 1, 0), max(nb - 1, 0)

        def f1(ov, nr, nc):
            if ov == 0:
                return 0.0
            p, rr = ov / nc, ov / nr
            return 2 * p * rr / (p + rr)

        assert abs(r.rouge1_recall - round(u_ov / na + 1e-9, 6)) < 2e-6
        assert abs(r.rouge1_precision - round(u_ov / nb + 1e-9, 6)) < 2e-6
        assert abs(r.rouge1_f - round(f1(u_ov, na, nb) + 1e-9, 6)) < 2e-6
        assert abs(r.rouge2_f - round(f1(b_ov, ban, bbn) + 1e-9, 6)) < 2e-6


def test_streaming_count_min_matches_batch_cells(spark, sf_dir):
    """The streaming-maintained sketch constants mirror the batch op
    and the emitted estimates obey the CMS one-sided guarantee; the
    estimate table equals a batch recomputation over the same
    events."""
    import hashlib
    from collections import Counter, defaultdict

    from kafka_streams_homework_spark.queries.sketches import (
        CMS_D,
        CMS_W,
    )
    from kafka_streams_homework_spark.queries.streaming import (
        SCMS_D,
        SCMS_TOPK,
        SCMS_W,
    )

    assert (SCMS_W, SCMS_D) == (CMS_W, CMS_D)  # constant parity
    users = [
        r.user_id
        for r in Q._t(spark, sf_dir, "events").select("user_id").collect()
    ]
    true = Counter(users)
    cells = defaultdict(int)

    def col(j, k):
        return int(
            hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:8], 16
        ) % SCMS_W

    for k, c in true.items():
        for j in range(SCMS_D):
            cells[(j, col(j, k))] += c
    cand = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:SCMS_TOPK]
    got = {
        r.user_id: (r.true_cnt, r.cms_est, r.overest)
        for r in Q.queries()["streaming_count_min"](spark, sf_dir).collect()
    }
    assert set(got) == {k for k, _ in cand}
    for k, c in cand:
        est = min(cells[(j, col(j, k))] for j in range(SCMS_D))
        assert got[k] == (c, est, est - c)
        assert est >= c
