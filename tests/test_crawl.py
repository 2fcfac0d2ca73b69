"""Frontier-equivalence, byte-identity-on-Spark, resume, politeness, Bloom.

The Spark engine must match the single-process oracle simulator exactly:
URL-seen set, per-round ordered schedule, extracted results (byte-
identical text), and counters (FIXTURES.md §4).
"""

import pytest
from pyspark.sql import functions as F

from siren_spark.crawl import CrawlConfig, run_crawl
from siren_spark.testing.oracle import simulate_crawl
from siren_spark.testing.sitegen import (
    SiteSpec, WINDOW_END, WINDOW_START, build_site,
)
from tests.conftest import pages_df, seeds_df

BUDGET = 7  # small budget so politeness deferral actually kicks in

# narrow mirror's 10..49 seed fan-out (kept faithful by default in sitegen)
# so each crawl converges in ~4 rounds instead of ~12
SPEC = SiteSpec(mirror_seed_range=(10, 19))


@pytest.fixture(scope="module")
def site():
    return build_site(SPEC)


@pytest.fixture(scope="module")
def sim(site):
    return simulate_crawl(
        site.pages, site.seeds, budget_per_host=BUDGET,
        window_start=WINDOW_START, window_end=WINDOW_END,
        keywords=SPEC.keywords,
    )


@pytest.fixture(scope="module")
def engine(spark, site, tmp_path_factory):
    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return run_crawl(spark, pages_df(spark, site.pages),
                     seeds_df(spark, site.seeds), cfg, ckpt)


def _result_key(r):
    return (r["source"], r["url"], r["title"] or "", r["text"], r["gen"])


def test_seen_set_identical(engine, sim):
    got = {r.url_canon for r in engine.seen.collect()}
    assert got == sim.seen


def test_results_byte_identical(engine, sim):
    got = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    exp = sorted(_result_key(r) for r in sim.results)
    assert got == exp


def test_counters_match(engine, sim):
    got = {}
    for r in engine.counters.collect():
        got[(r.gen, r.metric)] = got.get((r.gen, r.metric), 0) + r.n
    exp = {}
    for c in sim.counters:
        exp[(c["gen"], c["metric"])] = exp.get((c["gen"], c["metric"]), 0) + c["n"]
    # compare every metric the sim tracked (engine may emit zero-rows absent)
    for k, v in exp.items():
        assert got.get(k, 0) == v, (k, got.get(k, 0), v)


def test_round_count(engine, sim):
    assert engine.rounds == len(sim.schedule)


def test_politeness_budget_never_exceeded(engine, spark):
    # per (gen, domain): fetched <= BUDGET
    over = (
        engine.counters.filter(F.col("metric") == "fetched")
        .filter(F.col("n") > BUDGET).collect()
    )
    assert over == []


def test_schedule_per_round_matches_oracle(spark, site, sim, tmp_path):
    """Scheduled sets per round are checkpointed as seen deltas — compare
    each round's delta to the oracle's ordered schedule (as a set, plus
    global order determinism via the sorted comparison)."""
    from siren_spark.operators.checkpoint import CheckpointStore
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, salt_buckets=2)
    ckpt = str(tmp_path / "ck")
    run_crawl(spark, pages_df(spark, site.pages), seeds_df(spark, site.seeds),
              cfg, ckpt)
    store = CheckpointStore(ckpt)
    for gen, expected_round in enumerate(sim.schedule):
        delta = (store.read(spark, gen, "frontier_ann")
                 .filter("status = 'scheduled'").collect())
        assert sorted(r.url_canon for r in delta) == sorted(expected_round), gen


def test_resume_equals_uninterrupted(spark, site, engine, tmp_path):
    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
    )
    ckpt = str(tmp_path / "ck2")
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_crawl(spark, pages_df(spark, site.pages),
                  seeds_df(spark, site.seeds), cfg, ckpt, fail_after_round=1)
    resumed = run_crawl(spark, pages_df(spark, site.pages),
                        seeds_df(spark, site.seeds), cfg, ckpt, resume=True)
    a = sorted(_result_key(r.asDict()) for r in resumed.results.collect())
    b = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    assert a == b
    sa = {r.url_canon for r in resumed.seen.collect()}
    sb = {r.url_canon for r in engine.seen.collect()}
    assert sa == sb


def test_bloom_equals_exact(spark, site, tmp_path, engine):
    """Bloom + exact-confirm path produces the same crawl as plain anti-join."""
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False)
    ckpt = str(tmp_path / "ck3")
    exact = run_crawl(spark, pages_df(spark, site.pages),
                      seeds_df(spark, site.seeds), cfg, ckpt)
    a = sorted(_result_key(r.asDict()) for r in exact.results.collect())
    b = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    assert a == b


def test_robots_gating(spark, site, tmp_path, monkeypatch):
    """block-all domain yields zero fetches; path-prefix rules enforced.

    Also pins (spy) that the compiled matcher is broadcast exactly ONCE
    for the whole run, not re-pickled+re-shipped every round — at
    thousands of rounds a per-round broadcast is pure serial cost."""
    from siren_spark.operators.robots import RobotsMatcher

    robots = spark.createDataFrame(
        [("mirror-city.example", "User-agent: *\nDisallow: /\n")],
        "domain string, rules string",
    )
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, max_rounds=3)
    matcher_broadcasts = []
    real_broadcast = spark.sparkContext.broadcast
    monkeypatch.setattr(
        spark.sparkContext, "broadcast",
        lambda v: (matcher_broadcasts.append(v)
                   if isinstance(v, RobotsMatcher) else None,
                   real_broadcast(v))[1])
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg, str(tmp_path / "ck4"),
                    robots=robots)
    assert len(matcher_broadcasts) == 1
    mirror_fetched = (
        res.counters.filter((F.col("metric") == "fetched")
                            & (F.col("domain") == "mirror-city.example"))
        .agg(F.sum("n")).collect()[0][0]
    )
    assert not mirror_fetched
    blocked = (
        res.counters.filter(F.col("metric") == "robots_blocked")
        .agg(F.sum("n")).collect()[0][0]
    )
    assert blocked and blocked > 0
    assert res.results.filter(F.col("source") == "mirror").count() == 0


def test_bucketed_bloom_equals_broadcast(spark, site, tmp_path, engine):
    """The bucketed (cogroup) Bloom probe path crawls identically to the
    broadcast path — and its bitmap table is committed/resumable."""
    from siren_spark.operators.checkpoint import CheckpointStore
    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
        bloom_probe="bucketed",
    )
    ckpt = str(tmp_path / "ckb")
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg, ckpt)
    a = sorted(_result_key(r.asDict()) for r in res.results.collect())
    b = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    assert a == b
    store = CheckpointStore(ckpt)
    last = store.latest_gen()
    m = store.manifest(last)
    assert "bloom_table" in m["stats"]
    bm = spark.read.parquet(m["stats"]["bloom_table"])
    assert bm.count() <= 4                     # one row per bucket
    assert set(bm.columns) == {"bucket", "bitmap"}


def test_ht_headline_dedup(engine, site):
    """A3: at most one HT record per (gen, title) — and the sitegen
    cross-edition duplicate-headline fixture guarantees the dedup
    actually dropped records vs kernel-level output."""
    ht = [r for r in engine.results.collect() if r.source == "ht"]
    per: dict[tuple, int] = {}
    for r in ht:
        per[(r.gen, r.title)] = per.get((r.gen, r.title), 0) + 1
    assert ht and all(v == 1 for v in per.values())
    exp_ht = [e for e in site.expected if e["source"] == "ht"]
    assert len(ht) < len(exp_ht)


def test_robots_cogroup_crawl_equals_broadcast(spark, site, tmp_path):
    """The cogroup robots gate produces the identical crawl to the
    broadcast matcher path (same blocked set, same results)."""
    robots = spark.createDataFrame(
        [("mirror-city.example", "User-agent: *\nDisallow: /\n")],
        "domain string, rules string",
    )
    outs = []
    for probe in ("broadcast", "cogroup"):
        cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                          window_end=WINDOW_END, keywords=SPEC.keywords,
                          use_bloom=False, max_rounds=3, robots_probe=probe)
        res = run_crawl(spark, pages_df(spark, site.pages),
                        seeds_df(spark, site.seeds),
                        cfg, str(tmp_path / f"ck_{probe}"), robots=robots)
        outs.append((
            sorted(_result_key(r.asDict()) for r in res.results.collect()),
            sorted((r.gen, r.domain or "", r.metric, r.n)
                   for r in res.counters.collect()),
        ))
    assert outs[0] == outs[1]


def test_scale_paths_combined_equal_defaults(spark, site, tmp_path):
    """bucketed Bloom + cogroup robots TOGETHER (the full 10^10
    configuration) crawl identically to the broadcast defaults."""
    robots = spark.createDataFrame(
        [("mirror-city.example", "User-agent: *\nDisallow: /\n")],
        "domain string, rules string",
    )
    outs = []
    for probe in ({"robots_probe": "broadcast", "bloom_probe": "broadcast"},
                  {"robots_probe": "cogroup", "bloom_probe": "bucketed"}):
        cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                          window_end=WINDOW_END, keywords=SPEC.keywords,
                          use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4,
                          salt_buckets=4, max_rounds=3, **probe)
        res = run_crawl(spark, pages_df(spark, site.pages),
                        seeds_df(spark, site.seeds),
                        cfg, str(tmp_path / f"ck_{probe['bloom_probe']}"),
                        robots=robots)
        outs.append(sorted(_result_key(r.asDict())
                           for r in res.results.collect()))
    assert outs[0] == outs[1]


def test_headline_dedup_spans_rounds(spark, tmp_path):
    """A3 cross-round scope: the reference's done-set spans the whole
    scrape() (ht.py:261-268). HT-only crawl with a budget small enough
    that the duplicated-headline detail pages are fetched in DIFFERENT
    rounds: scope='run' emits one record per title for the whole run
    and matches the oracle simulator; scope='round' (the pre-round-3
    semantic) re-emits the title in the later round."""
    site = build_site(SPEC)
    ht_seeds = [s for s in site.seeds if s["source"] == "ht"]
    outs = {}
    for scope in ("run", "round"):
        cfg = CrawlConfig(budget_per_host=3, window_start=WINDOW_START,
                          window_end=WINDOW_END, keywords=SPEC.keywords,
                          use_bloom=False, salt_buckets=2,
                          headline_dedup_scope=scope)
        res = run_crawl(spark, pages_df(spark, site.pages),
                        seeds_df(spark, ht_seeds), cfg,
                        str(tmp_path / f"ck_{scope}"))
        outs[scope] = [r.asDict() for r in res.results.collect()]
    run_titles = [r["title"] for r in outs["run"]]
    assert len(run_titles) == len(set(run_titles))
    # the fixture actually exercises the cross-round case: round-scope
    # re-emits at least one title in a later gen
    assert len(outs["round"]) > len(outs["run"])
    by_title: dict[str, set] = {}
    for r in outs["round"]:
        by_title.setdefault(r["title"], set()).add(r["gen"])
    assert any(len(g) > 1 for g in by_title.values())
    # and the run-scope engine matches the oracle simulator exactly
    sim2 = simulate_crawl(site.pages, ht_seeds, budget_per_host=3,
                          window_start=WINDOW_START, window_end=WINDOW_END,
                          keywords=SPEC.keywords)
    got = sorted(_result_key(r) for r in outs["run"])
    exp = sorted(_result_key(r) for r in sim2.results)
    assert got == exp


def test_headline_dedup_cross_round_survives_resume(spark, tmp_path):
    """The (source, title) done-set is checkpoint state: a run killed
    mid-crawl and resumed must not re-emit titles from committed rounds."""
    site = build_site(SPEC)
    ht_seeds = [s for s in site.seeds if s["source"] == "ht"]
    cfg = CrawlConfig(budget_per_host=3, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, salt_buckets=2)
    ckpt = str(tmp_path / "ck_resume")
    with pytest.raises(RuntimeError):
        run_crawl(spark, pages_df(spark, site.pages),
                  seeds_df(spark, ht_seeds), cfg, ckpt, fail_after_round=1)
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, ht_seeds), cfg, ckpt, resume=True)
    titles = [r.title for r in res.results.collect()]
    assert len(titles) == len(set(titles))


def test_a3_window_scoped_to_dedup_sources(spark):
    """The (source, title) dedup window only ever receives rows of the
    headline-dedup sources: the source filter sits BELOW the window in
    the optimized plan, so mirror/toi/nm records never pay that shuffle
    (round-2 'What's wrong' #1 — the largest avoidable shuffle in the
    results path)."""
    from siren_spark.crawl import _apply_result_filters

    recs = spark.createDataFrame(
        [("mirror", "u1", "t1", None, None, None, "x", None, 0),
         ("ht", "u2", "t1", None, None, None, "y", None, 0)],
        "source string, url string, title string, author string, "
        "location string, published timestamp, text string, extra string, "
        "gen int")
    out = _apply_result_filters(recs, CrawlConfig())
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    win = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert win, plan
    # the window's subtree (deeper-indented lines below it) must contain
    # the dedup-source filter before indentation returns to window level
    depth = len(lines[win[0]]) - len(lines[win[0]].lstrip(" :+-"))
    sub = []
    for ln in lines[win[0] + 1:]:
        if len(ln) - len(ln.lstrip(" :+-")) <= depth:
            break
        sub.append(ln)
    assert any("ht" in ln and "Filter" in ln for ln in sub), plan


def test_counters_fallback_for_legacy_checkpoints(spark, tmp_path):
    """Rounds committed before the staged counters table existed get
    their counters synthesized from manifest by_status stats (the same
    backward-compat contract seen_sources already has)."""
    import json

    from siren_spark.crawl import _counters_with_fallback
    from siren_spark.operators.checkpoint import CheckpointStore

    site = build_site(SPEC)
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, max_rounds=2)
    ckpt = str(tmp_path / "ck_legacy")
    run_crawl(spark, pages_df(spark, site.pages),
              seeds_df(spark, site.seeds), cfg, ckpt)
    store = CheckpointStore(ckpt)
    # doctor round 0 into the legacy format: no counters table
    mp = store._manifest_path(0)
    m = json.load(open(mp))
    del m["tables"]["counters"]
    json.dump(m, open(mp, "w"))
    out = _counters_with_fallback(spark, store)
    rows = out.collect()
    g0 = {r.metric: r.n for r in rows if r.gen == 0}
    assert g0.get("fetched") == m["stats"]["by_status"]["scheduled"]
    assert all(r.domain is None for r in rows if r.gen == 0)
    assert any(r.gen == 1 and r.domain is not None for r in rows)


def test_robots_auto_switches_to_cogroup(spark, site, tmp_path, monkeypatch):
    """robots_probe='auto' must not collect a rules table above the
    broadcast threshold: RobotsMatcher (the broadcast path) is never
    constructed; the cogroup gate produces the same blocked set."""
    import siren_spark.crawl as crawl_mod

    def boom(*a, **k):
        raise AssertionError("broadcast matcher built for a large table")

    monkeypatch.setattr(crawl_mod, "RobotsMatcher", boom)
    robots = spark.createDataFrame(
        [("mirror-city.example", "User-agent: *\nDisallow: /\n"),
         ("a.example", ""), ("b.example", ""), ("c.example", "")],
        "domain string, rules string")
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, max_rounds=2,
                      robots_broadcast_max=2)   # 4 rows > 2 -> cogroup
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg,
                    str(tmp_path / "ck_auto"), robots=robots)
    blocked = res.counters.filter(
        (F.col("metric") == "robots_blocked") & (F.col("n") > 0)).collect()
    assert blocked and all(r.domain == "mirror-city.example" for r in blocked)


def test_crawl_lang_detect_column(spark, site, tmp_path):
    """lang_detect=True enriches results with the trigram-profile
    classifier's verdict — column-for-column what classify() returns on
    the same text (the production LLM-data path wired into the engine)."""
    from siren_spark.functions.langid import classify

    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, max_rounds=2, lang_detect=True)
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg,
                    str(tmp_path / "ck_lang"))
    rows = res.results.select("text", "lang").collect()
    assert rows and all(r.lang == classify(r.text) for r in rows)


def test_payload_projection_equivalence(spark, site, engine, tmp_path_factory):
    """CrawlConfig.payload_projection with the mirror ld+json projection
    must leave every observable crawl output byte-identical: the JVM
    pre-projection only shrinks what crosses the Arrow boundary, never
    what the kernels produce."""
    from siren_spark.kernels.sites import MIRROR_LDJSON_PROJECTION

    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
        payload_projection=MIRROR_LDJSON_PROJECTION,
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_proj"))
    proj = run_crawl(spark, pages_df(spark, site.pages),
                     seeds_df(spark, site.seeds), cfg, ckpt)

    a = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    b = sorted(_result_key(r.asDict()) for r in proj.results.collect())
    assert a == b
    ca = sorted((r.gen, r.domain or "", r.metric, r.n)
                for r in engine.counters.collect())
    cb = sorted((r.gen, r.domain or "", r.metric, r.n)
                for r in proj.counters.collect())
    assert ca == cb
    sa = {r.url_canon for r in engine.seen.collect()}
    sb = {r.url_canon for r in proj.seen.collect()}
    assert sa == sb
    # the projection must actually have fired on mirror articles —
    # otherwise this test proves nothing
    n_fired = (pages_df(spark, site.pages)
               .withColumn("p", F.expr(MIRROR_LDJSON_PROJECTION))
               .filter(F.length("p") > 0).count())
    assert n_fired > 0


def test_bucketed_pipeline_resume_equals_uninterrupted(
        spark, site, engine, tmp_path):
    """Round pipelining now stays effective in bucketed-bloom mode (the
    10^10-scale configuration): the round's bitmap table is staged in
    the overlap window and the prestaged next-round annotate reads it
    pre-commit. A kill mid-run must still resume to the byte-identical
    result set — the prestaged gen dir is uncommitted and rebuilt."""
    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
        bloom_probe="bucketed", pipeline_rounds=True,
    )
    ckpt = str(tmp_path / "ckbp")
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_crawl(spark, pages_df(spark, site.pages),
                  seeds_df(spark, site.seeds), cfg, ckpt, fail_after_round=1)
    resumed = run_crawl(spark, pages_df(spark, site.pages),
                        seeds_df(spark, site.seeds), cfg, ckpt, resume=True)
    a = sorted(_result_key(r.asDict()) for r in resumed.results.collect())
    b = sorted(_result_key(r.asDict()) for r in engine.results.collect())
    assert a == b
    sa = {r.url_canon for r in resumed.seen.collect()}
    sb = {r.url_canon for r in engine.seen.collect()}
    assert sa == sb


def test_completed_crawl_leaves_clean_checkpoint(spark, site, tmp_path):
    """A completed run must leave no uncommitted gen dir behind — the
    prestage is skipped once the observations prove the next frontier
    empty, and any staged-but-unconsumed dir is reclaimed at exit."""
    import os

    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=True, bloom_bits=1 << 16, bloom_buckets=4, salt_buckets=4,
    )
    ckpt = str(tmp_path / "ckclean")
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg, ckpt)
    committed = {f"gen={g}" for g in range(res.rounds)}
    on_disk = {d for d in os.listdir(ckpt) if d.startswith("gen=")}
    assert on_disk == committed


def test_debug_invariants_catch_domain_corruption(spark, site, engine,
                                                  tmp_path):
    """cfg.debug_invariants pins domain == f(url_canon) — the invariant
    the fused (domain, __salt) dup window relies on. A clean crawl
    passes with the checks on; a corrupted frontier row fails loud
    instead of silently double-scheduling the URL."""
    from siren_spark.crawl import _annotate_round

    cfg = CrawlConfig(
        budget_per_host=BUDGET, window_start=WINDOW_START,
        window_end=WINDOW_END, keywords=SPEC.keywords,
        use_bloom=False, debug_invariants=True, max_rounds=2,
    )
    res = run_crawl(spark, pages_df(spark, site.pages),
                    seeds_df(spark, site.seeds), cfg,
                    str(tmp_path / "ckdbg"))
    assert res.rounds >= 1   # checks on, crawl still runs

    bad = spark.createDataFrame(
        [("https://A.example/x", "https://a.example/x", "WRONG.example",
          1.0, 0, None, {})],
        "url string, url_canon string, domain string, priority double, "
        "depth int, via string, meta map<string,string>")
    # the corrupted row fails loud — either at plan time (the politeness
    # rank stats action inside _annotate_round) or at the first count
    with pytest.raises(Exception, match=r"domain != f\(url_canon\)"):
        _annotate_round(bad, cfg=cfg, bloom=None, seen_exact=None).count()


def test_politeness_rank_strategies_equivalent(spark):
    """The three phase-2 rank strategies — small-sliver per-domain
    window, key-threshold broadcast (realistic budgets), and the
    at-scale distributed exact rank — must produce identical per-URL
    statuses on a skewed frontier (one domain far over budget, several
    at the margin, cold tail). The cutover is a physical choice only;
    the scheduled set is defined by the same strict total order
    (domain, priority desc, url_canon)."""
    from pyspark.sql import functions as F

    from siren_spark.crawl import CrawlConfig, _annotate_round

    rows = []
    # hot domain: 400 urls with colliding priorities (rank ties broken
    # by url_canon alone)
    for i in range(400):
        u = f"https://hot.example/a/{i:04d}"
        rows.append((u, u, "hot.example", float(i % 7), 0, None, {}))
    # marginal domains: just over budget
    for d in range(5):
        for i in range(30):
            u = f"https://m{d}.example/p/{i:03d}"
            rows.append((u, u, f"m{d}.example", 1.0, 0, None, {}))
    # cold tail
    for i in range(50):
        u = f"https://c{i}.example/only"
        rows.append((u, u, f"c{i}.example", 1.0, 0, None, {}))
    fr = spark.createDataFrame(
        rows, "url string, url_canon string, domain string, "
              "priority double, depth int, via string, "
              "meta map<string,string>")

    def statuses(local_max, keys_max=1 << 22):
        caches: list = []
        cfg = CrawlConfig(budget_per_host=25, use_bloom=False,
                          politeness_rank_local_max=local_max,
                          politeness_threshold_keys_max=keys_max)
        ann = _annotate_round(fr, cfg=cfg, bloom=None, seen_exact=None,
                              cache_registry=caches,
                              frontier_rows=len(rows))
        try:
            return {(r.url_canon, r.status) for r in ann.collect()}
        finally:
            for c in caches:
                c.unpersist()

    threshold = statuses(0)            # default keys_max -> threshold tier
    windowed = statuses(1 << 30, keys_max=0)      # force per-domain window
    distributed = statuses(0, keys_max=0)     # force range-partition rank
    assert windowed == threshold
    assert windowed == distributed
    sched = {u for u, s in windowed if s == "scheduled"}
    assert sum(u.startswith("https://hot.") for u in sched) == 25
    # within the hot domain the kept set is the exact top-25 of the
    # total order: priority desc, then url_canon asc
    want = sorted((f"https://hot.example/a/{i:04d}" for i in range(400)),
                  key=lambda u: (-(int(u[-4:]) % 7), u))[:25]
    assert {u for u in sched if u.startswith("https://hot.")} == set(want)


def test_frontier_reconstruction_and_legacy_preference(spark, tmp_path):
    """The per-round frontier table was dropped (round 6): resume
    reconstructs the next frontier from the committed extracted +
    frontier_ann tables. A checkpoint written BEFORE the drop (manifest
    listing a frontier table) must still be preferred verbatim."""
    import json

    from siren_spark.crawl import _frontier_after
    from siren_spark.operators.checkpoint import CheckpointStore

    site = build_site(SPEC)
    cfg = CrawlConfig(budget_per_host=BUDGET, window_start=WINDOW_START,
                      window_end=WINDOW_END, keywords=SPEC.keywords,
                      use_bloom=False, max_rounds=2)
    ckpt = str(tmp_path / "ck_frontier")
    run_crawl(spark, pages_df(spark, site.pages),
              seeds_df(spark, site.seeds), cfg, ckpt)
    store = CheckpointStore(ckpt)
    m0 = store.manifest(0)
    assert "frontier" not in m0["tables"]        # new format
    rebuilt = _frontier_after(spark, store, 0)
    # reconstruction must equal the round-1 annotate's input: every
    # link of round 0 plus its deferred rows, with the loop's
    # deterministic priority/depth
    ex = spark.read.parquet(m0["tables"]["extracted"])
    n_links = ex.filter("kind = 'link'").count()
    ann = spark.read.parquet(m0["tables"]["frontier_ann"])
    n_def = ann.filter("status = 'deferred'").count()
    assert rebuilt.count() == n_links + n_def > 0
    # link rows (depth = gen+1 = 1) carry the loop's deterministic
    # priority; deferred rows keep their original one
    link_prios = set(rebuilt.filter("depth = 1").select("priority")
                     .distinct().toPandas()["priority"])
    assert link_prios == {round(1.0 / 2, 6)} or n_links == 0
    # legacy preference: doctor a frontier table into the manifest and
    # verify _frontier_after reads THAT instead of reconstructing
    legacy = rebuilt.limit(1)
    legacy_path = str(tmp_path / "legacy_frontier")
    legacy.write.parquet(legacy_path)
    mp = store._manifest_path(0)
    m = json.load(open(mp))
    m["tables"]["frontier"] = legacy_path
    json.dump(m, open(mp, "w"))
    assert _frontier_after(spark, store, 0).count() == 1
