"""Semantics tests for mirror-host detection
(functions/graph.py:detect_mirror_hosts, the Bharat & Broder WWW'99
mirror-elimination recipe: shared-content host pairs over md5
fingerprints, with the high-frequency-fingerprint cutoff).

The driver's oracle gate (`mirror_hosts`) checks it against DuckDB at
sf0.01; here we pin the rule on a hand-built hosted corpus.
"""

import pytest

from siren_spark.functions.graph import detect_mirror_hosts


@pytest.fixture(scope="module")
def hosted(spark):
    rows = [
        # a1/a2: a full mirror (3 shared distinct texts)
        ("a1", "x"), ("a1", "y"), ("a1", "z"),
        ("a2", "x"), ("a2", "y"), ("a2", "z"),
        ("a2", "x"),                   # within-host duplicate: no effect
        # b1 shares only {x} with a1/a2: below min_shared=2
        ("b1", "x"), ("b1", "p"),
        # c1/c2 share {q}: below min_shared
        ("c1", "q"), ("c1", "r"), ("c1", "s"), ("c1", "t"),
        ("c2", "q"), ("c2", "u"), ("c2", "v"), ("c2", "w"),
        # a parked-page template on 4 hosts: pure fan-out, no signal
        ("e1", "PARKED"), ("e2", "PARKED"),
        ("e3", "PARKED"), ("e4", "PARKED"),
    ]
    return spark.createDataFrame(rows, "host string, text string")


def _pairs(df):
    return {(r["host_a"], r["host_b"]): r.asDict() for r in df.collect()}


def test_full_mirror_detected_with_exact_fields(hosted):
    out = _pairs(detect_mirror_hosts(hosted, fp_host_cap=3))
    assert ("a1", "a2") in out
    row = out[("a1", "a2")]
    # distinct fingerprints per host (a2's duplicate x collapses)
    assert (row["n_a"], row["n_b"], row["n_shared"]) == (3, 3, 3)
    assert row["overlap_milli"] == 1000


def test_below_min_shared_excluded(hosted):
    out = _pairs(detect_mirror_hosts(hosted, fp_host_cap=3))
    for pair in out:
        assert "b1" not in pair          # shares only {x}
        assert pair != ("c1", "c2")      # shares only {q}


def test_hot_fingerprint_cutoff(hosted):
    # PARKED is on 4 hosts: with cap 3 it is dropped, so no e* pair
    out = _pairs(detect_mirror_hosts(
        hosted, fp_host_cap=3, min_shared=1, min_overlap_milli=0))
    assert not any(a.startswith("e") for a, _ in out)
    # raising the cap re-admits it (6 e*-pairs at min_shared=1)
    wide = _pairs(detect_mirror_hosts(
        hosted, fp_host_cap=64, min_shared=1, min_overlap_milli=0))
    assert sum(a.startswith("e") for a, _ in wide) == 6


def test_overlap_milli_integer_division(hosted):
    # b1 vs a1 at min_shared=1: shared {x}, min(n)=2 -> 1000*1 div 2
    out = _pairs(detect_mirror_hosts(
        hosted, fp_host_cap=3, min_shared=1, min_overlap_milli=0))
    assert out[("a1", "b1")]["overlap_milli"] == 500
    # c1/c2: 1000*1 div 4 = 250
    assert out[("c1", "c2")]["overlap_milli"] == 250


def test_pairs_ordered_and_unique(hosted):
    out = detect_mirror_hosts(
        hosted, fp_host_cap=64, min_shared=1, min_overlap_milli=0)
    rows = out.collect()
    keys = [(r["host_a"], r["host_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_plan_digest_equijoin_never_host_cross(hosted):
    plan = (detect_mirror_hosts(hosted)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deterministic_across_parallelism(hosted):
    a = sorted(map(tuple, detect_mirror_hosts(hosted).collect()))
    b = sorted(map(tuple, detect_mirror_hosts(
        hosted.repartition(7, "text")).collect()))
    assert a == b
