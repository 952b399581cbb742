"""Property tests: the vectorized batch kernels vs brute-force Python
references on random inputs (hypothesis)."""

import collections

import hypothesis
import hypothesis.strategies as st
import numpy as np
import pyarrow as pa

words = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "e f".replace(" ", ""), "gg"]),
    min_size=1,
    max_size=12,
)
texts = st.lists(words.map(" ".join), min_size=1, max_size=8)


@hypothesis.given(texts)
@hypothesis.settings(max_examples=60, deadline=None)
def test_repetition_signals_match_bruteforce(ts):
    from ocr_ray.pipelines.queries_cc import _repetition_signals

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(ts)), pa.int64()),
            "text": pa.array(ts, pa.string()),
        }
    )
    out = _repetition_signals(batch).to_pandas()
    for i, t in enumerate(ts):
        ws = t.split(" ")
        n = len(ws)
        top_w = collections.Counter(ws).most_common(1)[0][1]
        bigrams = [" ".join(ws[j : j + 2]) for j in range(n - 1)]
        top_b = collections.Counter(bigrams).most_common(1)[0][1] if bigrams else 0
        r = out.iloc[i]
        assert r["n_words"] == n
        assert abs(r["distinct_word_frac"] - round(len(set(ws)) / n, 4)) < 1e-9
        assert abs(r["top_word_frac"] - round(top_w / n, 4)) < 1e-9
        want_b = round(top_b / (n - 1), 4) if n > 1 else 0.0
        assert abs(r["top_bigram_frac"] - want_b) < 1e-9


@hypothesis.given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),  # (user, ts seconds)
        min_size=1,
        max_size=40,
    )
)
@hypothesis.settings(max_examples=60, deadline=None)
def test_range_join_kernel_matches_bruteforce(rows):
    # the REAL per-bucket kernel (module-level since the overflow fix)
    from ocr_ray.pipelines.queries_rel import _FOLLOW_US, range_join_kernel

    s = 1_000_000
    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] * s for r in rows], dtype=np.int64)
    eid = np.arange(len(rows), dtype=np.int64)
    e, nf = range_join_kernel(uid, ts, eid, _FOLLOW_US)
    got = dict(zip(e.tolist(), nf.tolist()))
    for i in range(len(rows)):
        want = sum(
            1
            for j in range(len(rows))
            if uid[j] == uid[i] and ts[i] < ts[j] <= ts[i] + _FOLLOW_US
        )
        assert got[i] == want, (i, rows)


def test_range_join_kernel_overflow_fallback():
    """Per-user spans summing past 2^62 must take the per-segment
    searchsorted path and still answer exactly (the int64-overflow ADVICE
    fix: a global span multiple would corrupt adj silently)."""
    from ocr_ray.pipelines.queries_rel import range_join_kernel

    horizon = 300 * 1_000_000
    # 3 users, each spanning ~2^61 microseconds -> summed spans > 2^62
    uid, ts = [], []
    for u in range(3):
        uid += [u, u, u]
        ts += [0, horizon // 2, 2**61]
    uid = np.array(uid, np.int64)
    ts = np.array(ts, np.int64)
    eid = np.arange(len(uid), dtype=np.int64)
    e, nf = range_join_kernel(uid, ts, eid, horizon)
    got = dict(zip(e.tolist(), nf.tolist()))
    for i in range(len(uid)):
        want = sum(
            1
            for j in range(len(uid))
            if uid[j] == uid[i] and ts[i] < ts[j] <= ts[i] + horizon
        )
        assert got[i] == want
    # sanity: the fallback really was the path taken
    spans_sum = sum(
        float(ts[uid == u].max() - ts[uid == u].min() + horizon + 1)
        for u in range(3)
    )
    assert spans_sum >= float(2**62)


@hypothesis.given(st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=6), min_size=1, max_size=30))
@hypothesis.settings(max_examples=60, deadline=None)
def test_word_dims_matches_python_fold(ws):
    from ocr_ray.pipelines.queries_cc import _EMBED_DIM, _HASH_MOD, _word_dims

    got = _word_dims(ws)
    for w, g in zip(ws, got):
        cps = [ord(c) for c in w]
        h = cps[0]
        for c in cps[1:]:
            h = (h * 31 + c) % _HASH_MOD
        assert g == h % _EMBED_DIM


@hypothesis.given(
    st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 50),
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
@hypothesis.settings(max_examples=40, deadline=None)
def test_funnel_matches_bruteforce(rows):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.queries_rel import _FUNNEL, q_events_funnel

    base = 1_700_000_000_000_000
    s = 1_000_000
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([base + r[1] * s for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )

    def brute():
        by_user = {}
        for u, sec, et in rows:
            by_user.setdefault(u, []).append((sec, et))
        counts = {step: 0 for step in _FUNNEL}
        for evs in by_user.values():
            reach = -1
            ok = True
            for step in _FUNNEL:
                cand = [sec for sec, et in evs if et == step and sec > reach]
                if not ok or not cand:
                    ok = False
                    continue
                reach = min(cand)
                counts[step] += 1
        return counts

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = q_events_funnel(d).to_pandas().set_index("step")["n_users"].to_dict()
    want = brute()
    for step in _FUNNEL:
        assert out.get(step, 0) == want[step], (rows, out, want)
