"""HyperLogLog sketch tests (accuracy, merge associativity, determinism)."""

import numpy as np

from ocr_ray.functions import sketches as sk


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(7)
    values = ["item-{}".format(i) for i in range(20000)]
    # split across 8 'tasks' with overlap (duplicates between partials)
    parts = []
    for c in range(8):
        chunk = values[c * 2500 : (c + 1) * 2500] + [
            values[rng.randint(0, 20000)] for _ in range(500)
        ]
        regs = sk.hll_empty()
        sk.hll_add(regs, chunk)
        parts.append(regs)
    merged = sk.hll_empty()
    for p in parts:
        merged = sk.hll_merge(merged, p)
    est = sk.hll_estimate(merged)
    assert abs(est - 20000) / 20000 < 0.03  # ~1.6% standard error at m=4096

    # merge is order-insensitive
    merged2 = sk.hll_empty()
    for p in reversed(parts):
        merged2 = sk.hll_merge(merged2, p)
    assert (merged == merged2).all()


def test_hll_small_range_exactish():
    regs = sk.hll_empty()
    sk.hll_add(regs, ["a", "b", "c", "a", "b"])
    assert 2 <= sk.hll_estimate(regs) <= 4  # linear-counting regime


def test_hll_deterministic():
    r1, r2 = sk.hll_empty(), sk.hll_empty()
    sk.hll_add(r1, ["x", "y", "z"])
    sk.hll_add(r2, ["z", "y", "x"])
    assert (r1 == r2).all()


def test_hll_query_vs_exact(ray_session):
    """The pipeline estimate lands within 3% of the exact distinct-token
    count on the sf0.001 documents table."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.queries_ext import q_distinct_tokens_hll

    est = q_distinct_tokens_hll("/root/testdata/sf0.001").column(
        "distinct_tokens_est"
    )[0].as_py()
    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    exact = len({w for t in texts for w in t.split()})
    assert abs(est - exact) / exact < 0.03, (est, exact)


def test_misra_gries_contains_heavy_hitters():
    import random

    from ocr_ray.functions import sketches

    rng = random.Random(3)
    # heavy item 'hh' at ~20% of n=5000; k=64 -> threshold n/k ~ 78 << 1000
    stream = ["hh"] * 1000 + ["w%d" % rng.randrange(2000) for _ in range(4000)]
    rng.shuffle(stream)
    summ = sketches.mg_add(sketches.mg_empty(), stream, k=64)
    assert "hh" in summ
    # count is a lower bound within n/k of the truth
    assert 1000 - len(stream) / 64 <= summ["hh"] <= 1000


def test_misra_gries_merge_matches_single_pass_guarantee():
    from ocr_ray.functions import sketches

    a_stream = ["x"] * 500 + ["a%d" % i for i in range(300)]
    b_stream = ["x"] * 400 + ["b%d" % i for i in range(300)]
    k = 32
    a = sketches.mg_add(sketches.mg_empty(), a_stream, k=k)
    b = sketches.mg_add(sketches.mg_empty(), b_stream, k=k)
    merged = sketches.mg_merge(a, b, k=k)
    n = len(a_stream) + len(b_stream)
    assert "x" in merged
    assert 900 - 2 * n / k <= merged["x"] <= 900  # additive error across merges
    assert len(merged) <= 2 * k  # bounded summary


def test_bloom_no_false_negatives_and_low_fpr():
    import numpy as np

    from ocr_ray.functions import sketches

    seen = ["url-%d" % i for i in range(20000)]
    bits = sketches.bloom_add(sketches.bloom_empty(), seen)
    assert sketches.bloom_contains(bits, seen).all()  # no false negatives
    fresh = ["other-%d" % i for i in range(20000)]
    fpr = sketches.bloom_contains(bits, fresh).mean()
    # m=2^20, k=7, n=20k -> theoretical FPR ~ 2e-6; allow generous slack
    assert fpr < 0.001, fpr


def test_bloom_merge_is_union():
    from ocr_ray.functions import sketches

    a = sketches.bloom_add(sketches.bloom_empty(), ["a%d" % i for i in range(500)])
    b = sketches.bloom_add(sketches.bloom_empty(), ["b%d" % i for i in range(500)])
    m = sketches.bloom_merge(a, b)
    assert sketches.bloom_contains(m, ["a1", "b1", "a499", "b499"]).all()


def test_count_min_one_sided_error_and_merge():
    import numpy as np

    from ocr_ray.functions import sketches

    rng = np.random.default_rng(6)
    # zipf-ish key stream: heavy hitters + long tail
    keys = np.concatenate(
        [np.repeat(np.arange(10, dtype=np.int64), 2000),
         rng.integers(100, 100_000, size=30_000).astype(np.int64)]
    )
    rng.shuffle(keys)
    cm = sketches.cm_empty()
    sketches.cm_add(cm, keys)
    import collections

    truth = collections.Counter(keys.tolist())
    probe = np.array(list(truth)[:500], dtype=np.int64)
    est = sketches.cm_query(cm, probe)
    true = np.array([truth[int(k)] for k in probe])
    assert (est >= true).all()  # never undercounts
    # error bound: overestimate <= ~2N/W with large margin
    assert (est - true).max() <= 2 * len(keys) // sketches.CM_W + 50
    # mergeability: split-stream partials sum to the whole-stream sketch
    a = sketches.cm_add(sketches.cm_empty(), keys[: len(keys) // 2])
    b = sketches.cm_add(sketches.cm_empty(), keys[len(keys) // 2:])
    np.testing.assert_array_equal(sketches.cm_merge(a, b), cm)
