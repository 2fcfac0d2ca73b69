"""Semantics tests for winnowing fingerprints
(functions/text.py:winnow_fingerprints — Schleimer/Wilkerson/Aiken
SIGMOD 2003, the MOSS local fingerprinting algorithm).

The driver's oracle gate (`winnow_fingerprints`) checks positions and
hashes against an independent DuckDB formulation at sf0.01; here we
pin the paper's properties: the detection guarantee (shared substring
>= w+k-1 chars => shared fingerprint), short-text edges, position
bounds, selection density, and determinism across parallelism.
"""

import pytest
from pyspark.sql import functions as F

from siren_spark.functions.text import winnow_fingerprints

K, W = 8, 4
GUARANTEE = W + K - 1   # 11 chars


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_identical_docs_identical_fingerprints(spark):
    d = _df(spark, [(1, "the quick brown fox jumps"),
                    (2, "the quick brown fox jumps")])
    fps = _fps(winnow_fingerprints(d, k=K, w=W))
    assert fps[1] == fps[2] and fps[1]


def test_detection_guarantee_any_alignment(spark):
    # a shared run of exactly w+k-1 chars must yield >= 1 common fp
    # hash, wherever it sits in each doc (positions differ; hash set
    # intersection is the guarantee)
    shared = "zqxjkvbwpfy"[:GUARANTEE]
    assert len(shared) == GUARANTEE
    d = _df(spark, [(1, "aaaaaaaaaaaaaaa" + shared + "bbbbbb"),
                    (2, "cc" + shared + "ddddddddddddddddddd")])
    fps = _fps(winnow_fingerprints(d, k=K, w=W))
    assert {h for _, h in fps[1]} & {h for _, h in fps[2]}


def test_short_text_edges(spark):
    d = _df(spark, [(1, "1234567"),      # < k: no k-gram, no rows
                    (2, "12345678"),     # == k: one hash, one fp
                    (3, "123456789")])   # m=2 < w: window shrinks
    fps = _fps(winnow_fingerprints(d, k=K, w=W))
    assert 1 not in fps
    assert len(fps[2]) == 1 and next(iter(fps[2]))[0] == 1
    assert len(fps[3]) == 1              # min of the 2 hashes, once


def test_positions_in_bounds_and_density(spark):
    text = "abcdefghij klmnopqrst uvwxyz0123 456789abcd efghijklmn"
    d = _df(spark, [(1, text)])
    rows = winnow_fingerprints(d, k=K, w=W).collect()
    m = len(text) - K + 1
    assert all(1 <= r["pos"] <= m for r in rows)
    # paper: expected density 2/(w+1); allow a wide band, but a full
    # every-position selection (density 1.0) or a single pick would
    # both flag a broken window
    assert m // 8 <= len(rows) <= (2 * m) // 3


def test_fp_is_window_min_of_kgram_md5(spark):
    import hashlib
    text = "abcdefghijkl"         # m = 5, windows of 4: j = 1, 2
    hs = [hashlib.md5(text[i:i + K].encode()).hexdigest()[:8]
          for i in range(len(text) - K + 1)]
    expect = {min(hs[0:4]), min(hs[1:5])}
    d = _df(spark, [(1, text)])
    got = {r["fp"] for r in winnow_fingerprints(d, k=K, w=W).collect()}
    assert got == expect


def test_deterministic_across_parallelism(spark):
    rows = [(i, f"document number {i} with some shared boilerplate "
                f"and unique tail {i * 7919}") for i in range(30)]
    d = _df(spark, rows)
    a = sorted(map(tuple, winnow_fingerprints(d).collect()))
    b = sorted(map(tuple,
                   winnow_fingerprints(d.repartition(11)).collect()))
    assert a == b


def test_plan_no_shuffle_before_fanout(spark):
    d = _df(spark, [(1, "abcdefghijklmnop")])
    plan = (winnow_fingerprints(d, k=K, w=W)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_candidate_pairs_guarantee_and_cap(spark):
    from siren_spark.functions.text import winnow_candidate_pairs
    shared = "zqxjkvbwpfy"[:GUARANTEE]
    d = _df(spark, [
        (1, "aaaaaaaaaaaaaaa" + shared + "bbbbbb"),
        (2, "cc" + shared + "ddddddddddddddddddd"),
        (3, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),        # unrelated
    ])
    got = {(r.id_a, r.id_b): r.n_shared for r in
           winnow_candidate_pairs(d, k=K, w=W, min_shared=1)
           .collect()}
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert not any(3 in p for p in got)


def test_candidate_pairs_hot_fp_dropped(spark):
    from siren_spark.functions.text import winnow_candidate_pairs
    # the same text on 5 docs: with fp_doc_cap=4 every fingerprint is
    # "hot" and no pair survives; with the cap lifted all 10 do
    rows = [(i, "the quick brown fox jumps over") for i in range(5)]
    d = _df(spark, rows)
    assert winnow_candidate_pairs(d, k=K, w=W, min_shared=1,
                                  fp_doc_cap=4).count() == 0
    assert winnow_candidate_pairs(d, k=K, w=W, min_shared=1,
                                  fp_doc_cap=5).count() == 10


def test_candidate_pairs_partition_invariant(spark):
    from siren_spark.functions.text import winnow_candidate_pairs
    shared = "zqxjkvbwpfymgh"
    rows = [(i, f"pad{i:04d}xx" + shared + f"tail{i % 3}") for i in range(12)]
    base = {(r.id_a, r.id_b, r.n_shared) for r in
            winnow_candidate_pairs(_df(spark, rows), k=K, w=W,
                                   min_shared=1).collect()}
    re16 = {(r.id_a, r.id_b, r.n_shared) for r in
            winnow_candidate_pairs(_df(spark, rows).repartition(16),
                                   k=K, w=W, min_shared=1).collect()}
    assert base == re16 and base


def test_long_doc_segmented_evaluation_exact_and_bounded(spark):
    """Round-6 verdict item: a 100 KB page must not materialize a
    ~len(text) hash array in one projection. The segmented evaluation
    (seg_hashes windows per bound slice) must stay EXACTLY equal to
    the one-shot formulation — same selections at any segment size,
    including boundary-straddling windows — and run in linear time
    (the struct array_distinct it replaced was O(windows^2))."""
    import random
    import time

    from siren_spark.functions.text import winnow_fingerprints
    rng = random.Random(11)
    big = "".join(rng.choice("abcdef ghij") for _ in range(100_000))
    rows = [(1, big), (2, big[:4096 + 8 - 1]), (3, big[:7]), (4, big[:8])]
    d = _df(spark, rows)
    t0 = time.time()
    seg = sorted(map(tuple, winnow_fingerprints(d).collect()))
    dt = time.time() - t0
    one = sorted(map(tuple,
                     winnow_fingerprints(d, seg_hashes=10**7).collect()))
    tiny = sorted(map(tuple,
                      winnow_fingerprints(d, seg_hashes=5).collect()))
    assert seg == one == tiny and len(seg) > 30_000
    # linear-time guard: ~100k windows in single-digit seconds (the
    # quadratic formulation took minutes at this length)
    assert dt < 60, dt
