"""The crawl engine: frontier generations as DataFrame batch rounds.

One round = one micro-batch (SURVEY.md §3.1 Spark lifecycle equivalent),
structured so each round materializes exactly two heavy jobs:

1. **annotate**: ONE plan over the frontier computes every scheduling
   decision as columns — robots verdict (vectorized matcher), in-frontier
   dedup rank (window over url_canon), seen-set probe (broadcast Bloom +
   exact-confirm join on the maybe-seen sliver only), and the salted
   two-phase per-host politeness top-k — and writes the annotated
   frontier with a ``status`` column
   (blocked | deduped | scheduled | deferred). Counters and the next
   round's inputs all derive from this parquet; nothing is recomputed.
2. **fetch+extract**: scheduled rows equi-join the pages store
   (co-partitioned on url_canon so only the small side shuffles) and run
   the single-pass Arrow extraction (links | records | errors).

The Bloom seen-filter is maintained incrementally: each round builds a
filter over its seen-delta only (mapInArrow) and OR-merges it into the
running filter driver-side, so no round rescans the seen history.

Every round commits atomically (manifest rename); a killed run resumes
from the last committed round with byte-identical final state.

Determinism: every tie is broken on url_canon, so the scheduled set and
crawl ordering are independent of parallelism — what makes the N-vs-4N
scaling comparison apples-to-apples.

Counter semantics match the reference-scheduling oracle
(siren_spark/testing/oracle.py; reference cites in the ops modules):
robots_blocked, deduped (in-frontier dup + seen hit), fetched
(= scheduled, ht.py:242-247 "attempted = seen"), deferred (politeness),
missing (frontier URL absent from pages — the reference's non-200 -> []
mirror.py:53), errors (kernel exceptions, mirror.py:81-85).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field as dc_field
from datetime import datetime

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from siren_spark.functions.udfs import canonicalize_udf, domain_udf, extract_pages
from siren_spark.operators.checkpoint import CheckpointStore
from siren_spark.operators.robots import RobotsMatcher
from siren_spark.operators.seen import (
    BloomFilter, build_bloom, build_bloom_partials, merge_blooms,
    or_reduce_bitmaps,
)

import pandas as pd

# Client-side strict date-window filter applies only where the reference
# applies it (P1): mirror.py:61, online/telegraph.py:48, newsminute.py:81-83.
DATE_FILTERED_SOURCES = ("mirror", "tg_online", "newsminute")
# Client-side keyword filter applies only to TG epaper (epaper/telegraph.py:80-88).
KEYWORD_FILTERED_SOURCES = ("tg_epaper",)
# Post-fetch headline dedup applies only to HT: the reference keeps one
# article per headline across all editions/keywords — including the
# ' - no data -' default (ht.py:152-157 headline property + __hash__,
# ht.py:261-268 scrape()-level done-set). Deterministic winner: url asc.
HEADLINE_DEDUP_SOURCES = ("ht",)


@dataclass
class CrawlConfig:
    budget_per_host: int = 50          # reference max_concurrency, config.toml:10
    salt_buckets: int = 16
    max_rounds: int = 30
    use_bloom: bool = True
    bloom_bits: int = 1 << 20
    bloom_buckets: int = 16
    # robots gate delivery: 'broadcast' collects the rules table to the
    # driver and broadcasts a compiled matcher (fine for ~10^3 domains);
    # 'cogroup' ships each task exactly its domains' rule rows — the
    # million-domain path, no driver copy (operators/robots.py); 'auto'
    # (default, mirroring bloom_probe) broadcasts small tables and
    # switches to cogroup above robots_broadcast_max rows, so a user who
    # never reads this flag cannot hit a driver OOM at scale.
    robots_probe: str = "auto"
    # 'broadcast': driver-held filter broadcast whole (fast while total
    #   bitmap is tens of MB); 'bucketed': filter lives as a (bucket,
    #   bitmap) checkpoint table, probe cogroups frontier with bitmaps so
    #   each task holds ONE bucket's bytes — the 10^10-URL path, where
    #   the full filter (~12.5 GB) can live on no single machine;
    # 'auto': bucketed once total bitmap bytes exceed 64 MB.
    bloom_probe: str = "auto"
    # compact the seen-set sources once more than this many tables back
    # it (keeps every round's seen read at O(1) inputs, not O(rounds))
    seen_compact_every: int = 8
    # pipeline consecutive rounds: round N+1's annotate depends only on
    # round N's STAGED tables (extracted links + annotated frontier) and
    # the Bloom state — not on the results/counters/frontier writes — so
    # it runs concurrently with them in the derived-writes window,
    # taking the ~flat annotate latency off the round critical path at
    # every cluster size. Works in bucketed-bloom mode too (the 10^10
    # configuration): the round's bitmap table is STAGED from the pool
    # right after annotate (it depends only on the staged annotated
    # frontier + last round's committed bitmaps), the prestaged
    # next-round annotate reads that staged-but-uncommitted path, and
    # the commit simply references it. Safe under kills: pre-staged
    # next-round tables are uncommitted, and resume rebuilds them from
    # the same deterministic committed inputs.
    pipeline_rounds: bool = True
    # debug-mode invariant checks (task-side assert_true columns, a
    # python-UDF cost — never enable in a measured run): currently
    # verifies domain == registrable_domain(url_canon) on every frontier
    # row, the invariant the fused (domain, __salt) dup window relies on
    debug_invariants: bool = False
    # exact-confirm strategy for maybe-seen (Bloom-positive) rows:
    # 'broadcast' inverts the join — the maybe-sliver keys broadcast
    # INTO the seen scan (left-semi) and only the tiny hit-set comes
    # back, so the O(crawl-history) seen table streams out of parquet
    # with no shuffle and the frontier never splits; 'join' keeps the
    # definite/candidate split with a sort-merge confirm (the
    # arbitrarily-large-frontier path); 'auto' broadcasts while the
    # frontier row estimate stays under broadcast_fetch_max
    seen_confirm: str = "auto"
    # enrich results with a detected-language column (trigram-profile
    # classifier, functions/langid.py) — the production-shaped LLM-data
    # path; off by default to keep the reference result schema exact
    lang_detect: bool = False
    # headline-dedup (A3) scope: 'run' carries a (source, title) done-set
    # across rounds — the reference semantic, where the done-set spans the
    # whole scrape() (ht.py:261-268); 'round' dedups within a round only.
    headline_dedup_scope: str = "run"
    # robots rules delivery threshold for robots_probe='auto': collect+
    # broadcast up to this many rule rows, cogroup above it (a
    # million-domain rules table must never be collected to the driver)
    robots_broadcast_max: int = 100_000

    def bloom_bucketed(self) -> bool:
        if self.bloom_probe == "bucketed":
            return True
        return (self.bloom_probe == "auto"
                and (self.bloom_bits // 8) * self.bloom_buckets > (64 << 20))
    window_start: datetime | None = None
    window_end: datetime | None = None
    keywords: list[str] = dc_field(default_factory=list)
    pages_partitions: int | None = None  # repartition pages on url_canon
    # broadcast the scheduled side of the fetch join below this row count
    # (above it: co-partitioned SMJ, the 10^10-scale path)
    broadcast_fetch_max: int = 2_000_000
    # fetch-join strategy: 'auto' broadcasts the scheduled side under
    # broadcast_fetch_max and falls back to SMJ above it; 'broadcast'
    # forces the broadcast; 'bucketed' assumes the pages frame reads a
    # table bucketed on url_canon (sources/pages.py
    # BucketedParquetPageStore, or Iceberg's bucket(N, url_canon)) and
    # plans a shuffled-hash join where ONLY the scheduled side shuffles
    # — no per-round broadcast build, no corpus exchange, no corpus
    # sort (plan pinned by tests/test_fetch_bucketed.py)
    fetch_join: str = "auto"
    # politeness phase-2 strategy cutover, keyed on the free driver-side
    # frontier-size estimate (an upper bound on any hot sliver): at or
    # under this, rank survivors with one per-domain window (a single
    # task sorts the sliver — sub-second at this size, no extra
    # caches); above it, compute the same exact rank distributively
    # (range-partition + per-partition offsets, all lazy) so no single
    # task ever sorts a hot domain's full sliver (the Amdahl term
    # measured at 0.39 efficiency on the binding-budget spot pair)
    politeness_rank_local_max: int = 1 << 16
    # politeness phase-2 middle tier: when salt_buckets * budget keys
    # fit one task comfortably (the realistic-budget regime — the
    # reference runs budget=50), each hot domain's exact B-th order key
    # is computed with two bounded key-only aggregates and broadcast
    # back; full-width rows never shuffle and nothing persists or
    # samples. Above this, the range-partition exact rank takes over
    # (no single task ever holds a domain's full key set).
    politeness_threshold_keys_max: int = 1 << 22
    # JVM-side payload pre-projection (SQL expression over `html`,
    # evaluated inside the scan pipeline BEFORE the Arrow crossing): when
    # it yields a non-empty string, that string replaces the page payload
    # handed to the extraction kernels; empty/NULL keeps the full html.
    # The JVM->Python Arrow shuttle is the dominant per-byte cost of the
    # fetch+extract stage once kernels are fast, so projecting a 20 KB
    # page down to the <200-byte fragment a kernel actually reads cuts
    # the crossing ~100x. CORRECTNESS PRECONDITION (caller-owned, like
    # any pushdown hint): the expression must be payload-preserving for
    # the kernels that will see it — i.e. parse_page(url, proj(html))
    # == parse_page(url, html) for every page it rewrites. Kernels
    # export vetted projections (kernels/sites.py
    # MIRROR_LDJSON_PROJECTION); equivalence is pinned by
    # tests/test_crawl.py::test_payload_projection_equivalence.
    payload_projection: str | None = None
    verbose: bool = False


RESULT_COLS = ["source", "url", "title", "author", "location", "published",
               "text", "extra", "gen"]

FRONTIER_COLS = ["url", "url_canon", "domain", "priority", "depth", "via",
                 "meta"]


def prepare_pages(pages: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Attach the canonical join key to the pages store — lazily.

    Deliberately NO repartition and NO cache: with the broadcast fetch
    join the pages side streams straight out of parquet every round
    (scan -> canonicalize -> hash-probe -> extract, one pipelined stage,
    column-pruned to url+html). Shuffling or caching the html column
    would move the whole corpus through memory/disk before any work
    happens — at 100 TB that is the difference between a scan and a
    catastrophe. ``pages_partitions`` exists for the SMJ fallback path,
    where a real deployment bucket-writes the table once at ingest
    (bucket(N, url_canon)) instead of repartitioning per crawl.
    """
    if "url_canon" in pages.columns:
        # canonical key precomputed at ingest (the production shape): the
        # scan stays pure-JVM. A pandas-UDF node here would force the
        # 20KB html column through the Arrow passthrough buffer on every
        # round — measured 5x the cost of the scan itself.
        p = pages.select("url_canon", F.col("url").alias("page_url"), "html")
    else:
        p = pages.select(
            canonicalize_udf(F.col("url")).alias("url_canon"),
            F.col("url").alias("page_url"),
            "html",
        )
    if cfg.pages_partitions:
        p = p.repartition(cfg.pages_partitions, "url_canon")
    return p


def _seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    meta = (F.col("meta") if "meta" in seeds.columns
            else F.create_map().cast("map<string,string>"))
    return (
        seeds.select(F.col("url"),
                     canonicalize_udf(F.col("url")).alias("url_canon"),
                     meta.alias("meta"))
        .withColumn("domain", domain_udf(F.col("url_canon")))
        .withColumn("priority", F.lit(1.0))
        .withColumn("depth", F.lit(0))
        .withColumn("via", F.lit(None).cast("string"))
        .select(*FRONTIER_COLS)
    )


def _annotate_round(
    frontier: DataFrame,
    *,
    cfg: CrawlConfig,
    matcher_bc=None,
    robots_df: DataFrame | None = None,
    bloom: BloomFilter | None,
    bloom_bitmaps: DataFrame | None = None,
    seen_exact: DataFrame | None,
    cache_registry: list | None = None,
    frontier_rows: int | None = None,
) -> DataFrame:
    """One plan: robots -> dedup -> seen -> politeness, as a status column.

    ``frontier_rows`` is the driver's (free, observation-derived)
    estimate of this round's frontier size, used only to pick the
    seen-confirm join strategy under ``cfg.seen_confirm='auto'``."""
    spark = frontier.sparkSession
    df = frontier

    if cfg.debug_invariants:
        # the fused dup window below partitions by (domain, __salt) and
        # relies on domain being a pure function of url_canon; both
        # frontier-construction sites enforce it (functions/udfs.py:101
        # link rows, _seeds_to_frontier seeds) — this filter makes the
        # invariant fail loud instead of silently double-fetching a URL
        # whose duplicate landed in another partition. assert_true
        # returns NULL on pass, so the filter keeps every row (and the
        # expression alive against column pruning).
        df = df.filter(F.assert_true(
            F.col("domain").eqNullSafe(domain_udf(F.col("url_canon"))),
            F.concat(F.lit("frontier domain != f(url_canon): "),
                     F.col("url"))).isNull())

    if robots_df is not None:
        # cogroup gate: each task receives exactly its domains' rules —
        # no driver collect, no whole-table broadcast (the
        # million-domain robots path)
        from siren_spark.operators.robots import robots_annotate_cogroup
        df = robots_annotate_cogroup(df, robots_df)
    elif matcher_bc is not None:
        # matcher broadcast ONCE by run_crawl (it is constant across the
        # run — re-broadcasting per round would pay a driver-side pickle
        # + transfer on every one of thousands of rounds, pure serial
        # per-round cost); here we only reference the handle
        bc = matcher_bc

        @F.pandas_udf("boolean")
        def allowed_udf(domains: pd.Series, urls: pd.Series) -> pd.Series:
            return pd.Series(bc.value.allowed_batch(domains, urls),
                             dtype=bool)

        df = df.withColumn("__allowed",
                           allowed_udf(F.col("domain"), F.col("url_canon")))
    else:
        df = df.withColumn("__allowed", F.lit(True))

    df = df.withColumn(
        "__salt", F.pmod(F.xxhash64("url_canon"), F.lit(cfg.salt_buckets)))

    bucketed = (seen_exact is not None and cfg.use_bloom
                and bloom_bitmaps is not None)
    bloom_bcast = (seen_exact is not None and cfg.use_bloom
                   and not bucketed and bloom is not None)
    plain_seen_join = seen_exact is not None and not bucketed \
        and not bloom_bcast

    # --- bucketed Bloom probe FIRST (it cogroups by bloom bucket, i.e.
    # repartitions the frontier) so the dup/politeness exchange below is
    # the LAST partitioning and phase-1 can reuse it -------------------
    if bucketed:
        # each task cogroups with exactly its bucket's bitmap — no
        # executor ever holds the full filter
        from siren_spark.operators.seen import probe_bloom_bucketed
        df = probe_bloom_bucketed(
            df, bloom_bitmaps, "url_canon",
            bits_per_bucket=cfg.bloom_bits, buckets=cfg.bloom_buckets)

    # --- broadcast-Bloom maybe-probe BEFORE the dup window (not after):
    # EvalPython nodes do not propagate outputPartitioning, so a probe
    # UDF sitting between the fused window and its downstream consumers
    # would hide the (domain, __salt) partitioning and force politeness
    # phase 1 to re-exchange the whole frontier — the exact shuffle the
    # fusion exists to remove. Probing first keeps the WindowExec as
    # the cached plan's tail, whose partitioning the cache reports.
    if (seen_exact is not None and cfg.use_bloom and not bucketed
            and bloom is not None):
        bcb = spark.sparkContext.broadcast(bloom)

        @F.pandas_udf("boolean")
        def maybe_udf(h1: pd.Series, h2: pd.Series) -> pd.Series:
            import numpy as np
            f = bcb.value
            return pd.Series(f.might_contain_np(
                h1.to_numpy(dtype="int64"), h2.to_numpy(dtype="int64")))

        from siren_spark.operators.seen import _SEED2
        df = df.withColumn("__maybe", maybe_udf(
            F.xxhash64(F.col("url_canon")),
            F.xxhash64(F.col("url_canon"), F.lit(_SEED2))))

    # --- in-frontier dedup, FUSED into the politeness partition family:
    # domain and __salt are both functions of url_canon, so a url_canon
    # group lives entirely inside one (domain, __salt) partition and the
    # deterministic representative (first row by the dup order, blocked
    # rows sinking so a blocked duplicate never steals the spot) is a
    # lag()-based first-flag over a url_canon-leading sort. One exchange
    # then serves dedup AND politeness phase 1 — the three-window
    # annotate plan was 3 full-frontier shuffles, flat ~5 s/round cost
    # that the N->4N ratio paid at every cluster size. (Exception: the
    # no-bloom exact-seen path keeps the url_canon window so the seen
    # SMJ below reuses ITS exchange instead.)
    dup_order = [F.desc("__allowed"), F.desc("priority"), F.asc("depth"),
                 F.asc_nulls_first("via"), F.asc("url")]
    dup_part = ["url_canon"] if plain_seen_join else ["domain", "__salt"]
    w_dup = Window.partitionBy(*dup_part).orderBy(F.asc("url_canon"),
                                                  *dup_order)
    df = df.withColumn(
        "__first",
        F.coalesce(F.lag("url_canon").over(w_dup) != F.col("url_canon"),
                   F.lit(True)))

    # --- seen confirm: Bloom negatives skip it entirely; maybe-seen
    # rows exact-confirm against the seen set --------------------------
    if bucketed or bloom_bcast:
        # df is consumed multiple times below (confirm sliver + eligible
        # count + final status): persist the small flag-annotated frame
        # so the upstream (gate UDF + window + probe) runs once
        df = df.persist()
        if cache_registry is not None:
            cache_registry.append(df)
        bcast_confirm = (
            cfg.seen_confirm == "broadcast"
            or (cfg.seen_confirm == "auto"
                and frontier_rows is not None
                and frontier_rows <= cfg.broadcast_fetch_max))
        if bcast_confirm:
            # INVERTED confirm: broadcast the maybe-sliver keys into the
            # seen scan (left-semi) and the tiny hit-set back onto the
            # frontier. The (big, O(crawl-history)) seen table streams
            # straight out of parquet with NO shuffle — the old
            # definite/candidate split-union sort-merge-joined the
            # full seen set every round — and both broadcast joins
            # preserve the frontier's (domain, __salt) partitioning so
            # politeness phase 1 needs no re-exchange.
            # no distinct on the sliver: duplicate build keys are free
            # in a semi-join hash set. hits IS distinct()ed — a
            # duplicate url_canon there would duplicate frontier rows
            # in the left join (the seen set is unique by invariant,
            # but this guard is one tiny-frame shuffle)
            cand = df.filter(F.col("__maybe")).select("url_canon")
            hits = (seen_exact.select("url_canon")
                    .join(F.broadcast(cand), "url_canon", "leftsemi")
                    .distinct()
                    .withColumn("__hit", F.lit(True)))
            df = (df.join(F.broadcast(hits), "url_canon", "left")
                  .withColumn("__seen",
                              F.col("__maybe")
                              & F.coalesce(F.col("__hit"), F.lit(False)))
                  .drop("__hit", "__maybe"))
        else:
            # at-scale confirm (frontier too large to broadcast its
            # sliver): classic definite/candidate split, SMJ on the
            # sliver only
            seen_keys = seen_exact.select("url_canon").withColumn(
                "__hit", F.lit(True))
            definite = df.filter(~F.col("__maybe")).withColumn(
                "__seen", F.lit(False))
            candidates = (
                df.filter(F.col("__maybe"))
                .join(seen_keys, "url_canon", "left")
                .withColumn("__seen",
                            F.coalesce(F.col("__hit"), F.lit(False)))
                .drop("__hit"))
            df = (definite.drop("__maybe")
                  .unionByName(candidates.drop("__maybe")))
            df = df.persist()
            if cache_registry is not None:
                cache_registry.append(df)
    elif plain_seen_join:
        seen_keys = seen_exact.select("url_canon").withColumn(
            "__hit", F.lit(True))
        df = (df.join(seen_keys, "url_canon", "left")
              .withColumn("__seen", F.coalesce(F.col("__hit"), F.lit(False)))
              .drop("__hit"))
        df = df.persist()
        if cache_registry is not None:
            cache_registry.append(df)
    else:
        df = df.withColumn("__seen", F.lit(False))
        df = df.persist()
        if cache_registry is not None:
            cache_registry.append(df)

    df = df.withColumn(
        "__eligible",
        F.col("__allowed") & F.col("__first") & ~F.col("__seen"),
    )

    # --- politeness: exact per-host top-budget ------------------------
    # Three physical strategies compute the same scheduled set — defined
    # by the strict per-domain total order (priority desc, url_canon
    # asc; url_canon is unique among eligible rows after the dup window)
    # — cut over on free driver-side bounds, never a driver action (a
    # driver action here would serialize the prestaged annotate into
    # multiple synchronized jobs — measured: the eager variant held the
    # binding-budget commit window at 2->8 efficiency 0.48 — where the
    # whole path must stay lazy so the politeness rank fuses into the
    # staged-annotate write job).
    out_cols = [*FRONTIER_COLS, "__allowed", "__first", "__seen", "__sched"]
    if frontier_rows is not None and frontier_rows <= cfg.budget_per_host:
        # whole-frontier fast path: the frontier row count (exact — it
        # is last round's observed links+deferred) cannot exceed the
        # budget, so no domain can either: every eligible row is
        # provably scheduled and the count/join/window machinery would
        # compute a constant — skip it all (throughput-mode rounds and
        # the long tail of small rounds hit this)
        df = df.withColumn("__sched", F.col("__eligible")).select(*out_cols)
        return _annotate_finish(df)
    if cfg.salt_buckets * cfg.budget_per_host \
            <= cfg.politeness_threshold_keys_max:
        # realistic budgets (the reference operates at budget=50,
        # config.toml:10): a scheduled row is exactly one whose ORDER
        # KEY is at or under its domain's B-th best eligible key, so
        # compute only that per-domain threshold — one two-level
        # JVM-side aggregate over (priority, url_canon) KEYS alone —
        # keep it for the (few, on a web frontier) domains whose
        # eligible count exceeds the budget, broadcast the
        # one-row-per-hot-domain result back, and filter. Full-width
        # rows never shuffle, nothing persists, no stage samples
        # (repartitionByRange's range-sampling job was a flat
        # ~per-round term the binding-budget 2->8 spot paid at both
        # core levels), and there is no cold/hot split-union — the
        # cached frontier streams through ONE branch with a broadcast
        # left join (under-budget domains simply have no threshold
        # row). Per-(domain, salt) top-B truncation before the merge
        # is lossless — a key cut in its bucket has >= B better keys
        # in that bucket alone — and bounds the per-domain merge task
        # to salt_buckets * B keys (<= politeness_threshold_keys_max
        # by this cutover; the truncating agg task itself holds one
        # bucket's eligible keys, the same bound the phase-1 window
        # sort holds in the other tiers). When a domain is over
        # budget its merged array holds >= B keys (each bucket
        # contributes min(bucket_n, B), so the truncated sum is
        # >= min(n, B)), hence its threshold is never null.
        b = cfg.budget_per_host
        key = F.struct((-F.col("priority")).alias("np"),
                       F.col("url_canon").alias("uc"))
        thr = (df.filter(F.col("__eligible"))
               .select("domain", "__salt", key.alias("__k"))
               .groupBy("domain", "__salt")
               .agg(F.slice(F.array_sort(F.collect_list("__k")),
                            1, b).alias("__ks"),
                    F.count(F.lit(1)).alias("__bn"))
               .groupBy("domain")
               .agg(F.try_element_at(
                        F.array_sort(F.flatten(F.collect_list("__ks"))),
                        F.lit(b)).alias("__thr"),
                    F.sum("__bn").alias("__n"))
               .filter(F.col("__n") > b)
               .select("domain", "__thr"))
        df = (df.join(F.broadcast(thr), "domain", "left")
              .withColumn(
                  "__sched",
                  F.col("__eligible")
                  & (F.col("__thr").isNull()     # domain under budget
                     | (key <= F.col("__thr"))))
              .select(*out_cols))
        return _annotate_finish(df)

    # window tiers: only domains whose eligible count exceeds the
    # budget need ranking at all — for an under-budget domain every
    # eligible row is provably scheduled (phase-1 rank <= per-bucket
    # eligible count <= budget, and phase 2 ranks all survivors within
    # the budget), so those rows bypass both windows. The over-budget
    # set is found with one map-side-combined count and broadcast back;
    # on a web frontier hot hosts are few, so phase 2's full-domain
    # sort — previously a whole-frontier exchange — moves only the hot
    # sliver. Phase 1 bounds any hot domain's phase-2 input to
    # salt_buckets*budget rows, so one hot host (30%+ of a web
    # frontier) cannot funnel through one task.
    hot = (df.filter(F.col("__eligible"))
           .groupBy("domain").agg(F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") > cfg.budget_per_host)
           .select("domain").withColumn("__hot", F.lit(True)))
    df = df.join(F.broadcast(hot), "domain", "left")

    cold = df.filter(F.col("__hot").isNull()).withColumn(
        "__sched", F.col("__eligible"))
    hotr = df.filter(F.col("__hot").isNotNull())
    order = [F.desc("__eligible"), F.desc("priority"),
             F.asc("url_canon")]
    w1 = Window.partitionBy("domain", "__salt").orderBy(*order)
    hotr = (hotr.withColumn("__rn1", F.row_number().over(w1))
            .withColumn(
                "__surv",
                F.col("__eligible")
                & (F.col("__rn1") <= cfg.budget_per_host)))
    if (frontier_rows or 0) <= cfg.politeness_rank_local_max:
        # small frontier: one per-domain window — a single task sorts
        # at most the (pre-bounded) sliver
        w2 = Window.partitionBy("domain").orderBy(
            F.desc("__surv"), F.desc("priority"), F.asc("url_canon"))
        hotr = (hotr.withColumn("__rn2", F.row_number().over(w2))
                .withColumn(
                    "__sched",
                    F.col("__surv")
                    & (F.col("__rn2") <= cfg.budget_per_host)))
        df = cold.select(*out_cols).unionByName(
            hotr.select(*out_cols))
        return _annotate_finish(df)
    # huge budgets: a plain Window.partitionBy("domain") would
    # funnel every survivor of a hot domain through ONE task —
    # measured as the term that capped the binding-budget 2->8 spot
    # at 0.39 (one core sorts while the rest idle). Compute the
    # EXACT rank distributively instead, fully lazily:
    # range-partition the survivors on the total order
    # (domain, priority desc, url_canon — strict: url_canon is
    # unique among eligible rows after the dup window), sort within
    # partitions, then global rank = rows of the same domain in
    # earlier partitions + the row's offset inside its domain's
    # contiguous block (monotonically_increasing_id minus the
    # block's min — exact because partitions are sorted). The
    # cross-partition offsets come from a per-(partition, domain)
    # count aggregate — O(partitions x hot domains) rows — ranked
    # by a window over that TINY frame and broadcast back: no
    # driver action anywhere, every stage parallel.
    # hotr is cached because the survivor and cut branches both
    # read it — uncached, each recomputes the window with its own
    # sliver exchange. monotonically_increasing_id is deterministic
    # here (fixed partition count, total-order sort), so the two
    # reads of surv — the offsets aggregate and the join left side
    # — agree even if a cached partition is recomputed.
    hotr = hotr.persist()
    if cache_registry is not None:
        cache_registry.append(hotr)
    surv = hotr.filter(F.col("__surv"))
    rest = hotr.filter(~F.col("__surv")).withColumn(
        "__sched", F.lit(False))
    p_n = spark.sparkContext.defaultParallelism * 2
    ord2 = [F.asc("domain"), F.desc("priority"), F.asc("url_canon")]
    surv = (surv.repartitionByRange(p_n, *ord2)
            .sortWithinPartitions(*ord2)
            .withColumn("__pid", F.spark_partition_id())
            .withColumn("__mid", F.monotonically_increasing_id())
            .persist())
    if cache_registry is not None:
        cache_registry.append(surv)
    w_off = (Window.partitionBy("domain").orderBy("__pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = (surv.groupBy("__pid", "domain")
              .agg(F.count(F.lit(1)).alias("__c"),
                   F.min("__mid").alias("__m0"))
              .withColumn("__off", F.coalesce(
                  F.sum("__c").over(w_off), F.lit(0)))
              .select("__pid", "domain", "__off", "__m0"))
    surv = (surv.join(F.broadcast(off_df), ["__pid", "domain"])
            .withColumn("__rank", F.col("__off")
                        + (F.col("__mid") - F.col("__m0")) + F.lit(1))
            .withColumn("__sched",
                        F.col("__rank") <= cfg.budget_per_host))
    df = (cold.select(*out_cols)
          .unionByName(surv.select(*out_cols))
          .unionByName(rest.select(*out_cols)))

    return _annotate_finish(df)


def _annotate_finish(df: DataFrame) -> DataFrame:
    status = (
        F.when(~F.col("__allowed"), F.lit("blocked"))
        .when(~F.col("__first") | F.col("__seen"), F.lit("deduped"))
        .when(F.col("__sched"), F.lit("scheduled"))
        .otherwise(F.lit("deferred"))
    )
    # partition_id = physical lineage (which task decided this row's
    # fate); together with (gen, domain, status) this is the queryable
    # per-partition lineage the checkpoints carry (SURVEY.md §1.4)
    return df.select(*FRONTIER_COLS, status.alias("status"),
                     F.spark_partition_id().alias("partition_id"))


def _apply_result_filters(
    records: DataFrame,
    cfg: CrawlConfig,
    hl_seen: DataFrame | None = None,
) -> DataFrame:
    out = records
    if cfg.window_start is not None and cfg.window_end is not None:
        in_window = (
            F.col("published").isNotNull()
            & (F.col("published") > F.lit(cfg.window_start))   # strict (P1)
            & (F.col("published") < F.lit(cfg.window_end))
        )
        out = out.filter(
            (~F.col("source").isin(*DATE_FILTERED_SOURCES)) | in_window)
    if cfg.keywords:
        kws = F.array(*[F.lit(k.lower()) for k in cfg.keywords])
        has_kw = F.exists(
            kws,
            lambda k: (
                F.col("title").isNotNull() & (F.col("title") != F.lit(""))
                & F.contains(F.lower(F.col("title")), k)
            ) | F.contains(F.lower(F.col("text")), k),
        )
        out = out.filter(
            (~F.col("source").isin(*KEYWORD_FILTERED_SOURCES)) | has_kw)
    # A3: per-source post-extraction headline dedup (HT). Split-union so
    # ONLY dedup-source rows pay the (source, title) window shuffle —
    # mirror/toi/nm records stream through untouched (at 100x scale the
    # whole-round window was the largest avoidable shuffle in the
    # results path). ``hl_seen`` (scope='run') is the cross-round
    # done-set: titles already emitted by an earlier round anti-join out,
    # matching the reference's scrape()-spanning set (ht.py:261-268).
    is_dedup_src = F.col("source").isin(*HEADLINE_DEDUP_SOURCES)
    rest = out.filter(~is_dedup_src)
    dd = out.filter(is_dedup_src)
    w_hl = Window.partitionBy("source", "title").orderBy(F.asc("url"))
    dd = (dd.withColumn("__rn_hl", F.row_number().over(w_hl))
          .filter(F.col("__rn_hl") == 1)
          .drop("__rn_hl"))
    if hl_seen is not None:
        dd = dd.join(hl_seen, ["source", "title"], "left_anti")
    return rest.unionByName(dd)


@dataclass
class CrawlResult:
    rounds: int
    results: DataFrame | None
    counters: DataFrame | None
    seen: DataFrame | None
    round_secs: list[float] | None = None      # wall time per executed round
    round_urls: list[int] | None = None        # scheduled+extracted per round


def _frontier_after(spark: SparkSession, store: CheckpointStore,
                    gen: int) -> DataFrame:
    """Round ``gen + 1``'s frontier from round ``gen``'s committed
    tables: discovered links (extracted, kind='link', with the loop's
    deterministic priority/depth for that generation) + deferred rows
    (frontier_ann). Checkpoints written before the dedicated frontier
    table was dropped still carry one — prefer it (cheaper and exact
    for however that round was built)."""
    m = store.manifest(gen)
    if "frontier" in m["tables"]:
        return spark.read.parquet(m["tables"]["frontier"])
    ex = spark.read.parquet(m["tables"]["extracted"])
    ann = spark.read.parquet(m["tables"]["frontier_ann"])
    links = (ex.filter(F.col("kind") == "link")
             .select("url", "url_canon", "meta", "via", "domain")
             .withColumn("priority", F.lit(round(1.0 / (gen + 2), 6)))
             .withColumn("depth", F.lit(gen + 1))
             .select(*FRONTIER_COLS))
    return links.unionByName(
        ann.filter(F.col("status") == "deferred").select(*FRONTIER_COLS))


def _seen_df(spark: SparkSession, sources: list[dict]) -> DataFrame | None:
    """The exact seen set (attempted = seen, ht.py:242-247) from an
    incremental source list: 'ann' entries are per-round annotated
    frontiers (filtered to scheduled), 'compact' entries are url_canon-
    only compaction tables. The list is bounded by seen_compact_every,
    so reconstructing the seen set reads O(1) tables per round instead
    of re-scanning every committed round's parquet (O(rounds^2) over a
    run — fatal at thousands of rounds)."""
    ann = [s["path"] for s in sources if s["kind"] == "ann"]
    comp = [s["path"] for s in sources if s["kind"] == "compact"]
    parts = []
    if comp:
        parts.append(spark.read.parquet(*comp).select("url_canon"))
    if ann:
        parts.append(spark.read.parquet(*ann)
                     .filter(F.col("status") == "scheduled")
                     .select("url_canon"))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _seen_sources_at(store: CheckpointStore, gen: int) -> list[dict]:
    """Seen sources recorded in round ``gen``'s manifest (with a
    fallback for checkpoints written before the incremental format:
    every committed round's frontier_ann)."""
    stats = store.manifest(gen)["stats"]
    if "seen_sources" in stats:
        return stats["seen_sources"]
    return [{"path": store.manifest(g)["tables"]["frontier_ann"],
             "kind": "ann"} for g in range(gen + 1)]


def _hl_seen_df(spark: SparkSession, sources: list[dict]) -> DataFrame | None:
    """The cross-round headline done-set (source, title) from an
    incremental source list: 'res' entries are per-round results tables
    (filtered to the headline-dedup sources), 'compact' entries are
    (source, title)-only compaction tables — the same O(1)-tables-per-
    round scheme as the URL seen set."""
    res = [s["path"] for s in sources if s["kind"] == "res"]
    comp = [s["path"] for s in sources if s["kind"] == "compact"]
    parts = []
    if comp:
        parts.append(spark.read.parquet(*comp).select("source", "title"))
    if res:
        parts.append(spark.read.parquet(*res)
                     .filter(F.col("source").isin(*HEADLINE_DEDUP_SOURCES))
                     .select("source", "title"))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _hl_sources_at(store: CheckpointStore, gen: int) -> list[dict]:
    """Headline done-set sources in round ``gen``'s manifest (fallback
    for checkpoints committed before this field existed: every
    committed round's results table)."""
    stats = store.manifest(gen)["stats"]
    if "hl_seen_sources" in stats:
        return stats["hl_seen_sources"]
    out = []
    for g in range(gen + 1):
        tables = store.manifest(g)["tables"]
        if "results" in tables:
            out.append({"path": tables["results"], "kind": "res"})
    return out


# status -> user-facing counter metric (oracle.py semantics)
_METRIC_OF_STATUS = {"blocked": "robots_blocked", "deduped": "deduped",
                     "scheduled": "fetched", "deferred": "deferred"}


def _counters_with_fallback(spark: SparkSession,
                            store: CheckpointStore) -> DataFrame | None:
    """All rounds' counters, synthesizing rows from manifest stats for
    generations committed before the staged counters table existed
    (mirroring _seen_sources_at's backward-compat fallback — resuming an
    old checkpoint must not silently drop those rounds' counters).
    Legacy rows carry domain=NULL: the old format kept whole-round
    rollups only."""
    last = store.latest_gen()
    if last is None:
        return None
    paths: list[str] = []
    legacy_rows: list[tuple] = []
    for g in range(last + 1):
        m = store.manifest(g)
        if "counters" in m["tables"]:
            paths.append(m["tables"]["counters"])
        else:
            for status, n in (m["stats"].get("by_status") or {}).items():
                legacy_rows.append(
                    (g, None, _METRIC_OF_STATUS.get(status, status), int(n)))
    parts = []
    if paths:
        parts.append(spark.read.parquet(*paths))
    if legacy_rows:
        parts.append(spark.createDataFrame(
            legacy_rows, "gen int, domain string, metric string, n long"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _round_counters(ann_r: DataFrame, ex: DataFrame, gen: int,
                    cache_registry: list | None = None) -> DataFrame:
    """Per-domain counters for one round as a (tiny, pre-aggregated)
    DataFrame — never collected to the driver. A web frontier has
    millions of registrable domains; this table is one row per
    (domain, metric) and lives in the round's checkpoint, while the
    manifest JSON keeps only whole-round rollups.

    Domains for extracted page/error/record rows were computed inside
    the extraction kernel (the URL is in Python there anyway), so this
    is two pure column-pruned aggregations — no join of the extraction
    output back to the annotated frontier (that equi-join re-shuffled
    ~1M rows per round into the derived-writes window, a fixed
    per-round term the N->4N comparison pays at every cluster size).
    The two tiny aggregated frames are persisted so the three-way
    union does not recompute their scans.
    """
    metric_map = F.create_map(
        *[F.lit(x) for kv in _METRIC_OF_STATUS.items() for x in kv])
    ann_cnt = (ann_r.groupBy("domain", "status")
               .agg(F.count(F.lit(1)).alias("n"))
               .select("domain", metric_map[F.col("status")].alias("metric"),
                       "n")).persist()
    exd = (ex.filter(F.col("kind").isin("page", "error", "record"))
           .select("domain", "kind")
           .groupBy("domain", "kind").agg(F.count(F.lit(1)).alias("n"))
           ).persist()
    if cache_registry is not None:
        cache_registry.extend([ann_cnt, exd])
    errors = (exd.filter(F.col("kind") == "error")
              .select("domain", F.lit("errors").alias("metric"), "n"))
    # 'records' rides along so the crawl loop reads its per-round record
    # count from this tiny table instead of re-scanning the extraction
    records = (exd.filter(F.col("kind") == "record")
               .select("domain", F.lit("records").alias("metric"), "n"))
    # missing = scheduled but absent from the pages store (the
    # reference's non-200 -> [] path, mirror.py:53)
    sched = (ann_cnt.filter(F.col("metric") == "fetched")
             .select("domain", F.col("n").alias("n_sched")))
    hits = (exd.filter(F.col("kind") == "page")
            .select("domain", F.col("n").alias("n_hit")))
    missing = (sched.join(hits, "domain", "left")
               .select("domain", F.lit("missing").alias("metric"),
                       (F.col("n_sched") - F.coalesce(F.col("n_hit"),
                                                      F.lit(0))).alias("n"))
               .filter(F.col("n") > 0))
    return (ann_cnt.unionByName(errors).unionByName(records)
            .unionByName(missing)
            .select(F.lit(gen).alias("gen"), "domain", "metric",
                    F.col("n").cast("long").alias("n")))


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    cfg: CrawlConfig,
    checkpoint_dir: str,
    *,
    robots: DataFrame | None = None,
    resume: bool = False,
    fail_after_round: int | None = None,  # test hook: simulate a kill
) -> CrawlResult:
    store = CheckpointStore(checkpoint_dir)
    pages_p = prepare_pages(pages, cfg)

    matcher = None
    robots_df = None
    if robots is not None:
        probe = cfg.robots_probe
        if probe == "auto":
            # never collect a huge rules table: probe the size with a
            # LIMIT'd count (O(threshold) scan, no driver materialization)
            over = (robots.limit(cfg.robots_broadcast_max + 1).count()
                    > cfg.robots_broadcast_max)
            probe = "cogroup" if over else "broadcast"
        if probe == "cogroup":
            robots_df = robots
        else:
            matcher = RobotsMatcher(
                [(r["domain"], r["rules"]) for r in robots.collect()])
    # broadcast the compiled matcher ONCE for the whole run — it is
    # constant across rounds, and a per-round broadcast would re-pickle
    # and re-ship it thousands of times (serial cost every cluster size
    # pays, i.e. exactly the term the N->4N scaling ratio punishes)
    matcher_bc = (spark.sparkContext.broadcast(matcher)
                  if matcher is not None else None)

    bloom: BloomFilter | None = None
    bloom_bitmaps: DataFrame | None = None   # bucketed-probe bitmap table
    seen_exact: DataFrame | None = None
    bucketed = cfg.use_bloom and cfg.bloom_bucketed()

    def _build_delta_bloom(delta: DataFrame) -> BloomFilter:
        return build_bloom(delta, "url_canon",
                           bits_per_bucket=cfg.bloom_bits,
                           buckets=cfg.bloom_buckets)

    def _delta_partials(delta: DataFrame) -> DataFrame:
        return build_bloom_partials(delta, "url_canon",
                                    bits_per_bucket=cfg.bloom_bits,
                                    buckets=cfg.bloom_buckets)

    seen_sources: list[dict] = []
    hl_sources: list[dict] = []
    if resume and (last := store.latest_gen()) is not None:
        start_gen = last + 1
        frontier = _frontier_after(spark, store, last)
        seen_sources = _seen_sources_at(store, last)
        seen_exact = _seen_df(spark, seen_sources)
        if cfg.headline_dedup_scope == "run":
            hl_sources = _hl_sources_at(store, last)
        if cfg.use_bloom and seen_exact is not None:
            if bucketed:
                bloom_path = store.manifest(last)["stats"].get("bloom_table")
                bloom_bitmaps = (
                    spark.read.parquet(bloom_path) if bloom_path
                    else or_reduce_bitmaps(_delta_partials(seen_exact)))
            else:
                bloom = _build_delta_bloom(seen_exact)
    else:
        start_gen = 0
        frontier = _seeds_to_frontier(seeds)

    # frontier size estimate for the seen-confirm strategy AND the
    # politeness whole-frontier fast path: free from each round's
    # observations (links + deferred); on resume or fresh start one
    # cheap count (row-group stats / tiny seed table — round 0
    # previously ran with no estimate, which forced the hot-domain
    # count/join/window machinery even for a seed list far under the
    # budget: pure fixed round-0 cost at every cluster size)
    frontier_rows: int | None = (frontier.count() if resume
                                 and start_gen > 0 else seeds.count())

    def _log(msg: str) -> None:
        if cfg.verbose:
            print(f"[crawl] {msg}", flush=True)

    round_secs: list[float] = []
    round_urls: list[int] = []

    def _stage_annotated(gen_: int, frontier_: DataFrame,
                         bloom_: BloomFilter | None,
                         seen_: DataFrame | None,
                         frontier_rows_: int | None,
                         bloom_bitmaps_: DataFrame | None = None,
                         ) -> tuple[str, dict]:
        """Annotate one round's frontier and stage it; returns
        (path, by-status counts). Pure function of committed/staged
        inputs, so it can run from a worker thread (round pipelining)
        or inline — byte-identical either way. ``bloom_bitmaps_``
        overrides the loop's committed bitmap table (the pipelined
        next-round annotate passes the round's staged-but-uncommitted
        table, which commits before that annotate is consumed)."""
        caches: list = []
        ann = _annotate_round(frontier_, cfg=cfg, matcher_bc=matcher_bc,
                              robots_df=robots_df,
                              bloom=bloom_,
                              bloom_bitmaps=(bloom_bitmaps_
                                             if bloom_bitmaps_ is not None
                                             else bloom_bitmaps),
                              seen_exact=seen_,
                              cache_registry=caches,
                              frontier_rows=frontier_rows_)
        # per-status counts ride the write as Observation metrics — no
        # second job over the staged parquet (part of the per-round
        # fixed cost the N->4N scaling comparison pays at every level)
        ann_obs = Observation(f"ann_{gen_}")
        ann = ann.observe(ann_obs, *[
            F.sum(F.when(F.col("status") == s, 1).otherwise(0)).alias(s)
            for s in ("blocked", "deduped", "scheduled", "deferred")])
        path = store.stage_table(gen_, "frontier_ann", ann)
        for c in caches:
            c.unpersist()
        return path, {k: int(v) for k, v in ann_obs.get.items() if v}

    # pre-staged next-round annotate: {"gen", "path", "counts"}
    pending: dict | None = None
    # one pool for the whole run: Bloom-delta builds / bucketed bitmap
    # staging launch right after annotate (overlapping fetch+extract);
    # the derived writes, seen/headline compactions and the pipelined
    # next-round annotate overlap at round end; the commit overlaps the
    # pipelined annotate's tail. Sized to the maximum concurrent task
    # set (3 writes + bloom + 2 compactions + prestage = 7) plus one so
    # the hl-compaction task — which WAITS on the results-write future —
    # can never be queued behind it (a same-pool wait on a queued task
    # would deadlock).
    pool = ThreadPoolExecutor(max_workers=8)

    try:
        for gen in range(start_gen, cfg.max_rounds):
            t0 = time.time()
            if frontier_rows == 0:
                # the frontier size is exact (observed links + deferred,
                # or a seed/resume count): an empty frontier needs no
                # annotate job and must not stage a table no round will
                # commit
                break

            # ---- job 1: annotate + commit scheduling decisions -------------
            if pending is not None and pending["gen"] == gen:
                # staged concurrently with the previous round's derived
                # writes (pipeline_rounds) — already durable in the gen dir
                ann_path, n_by_status = pending["path"], pending["counts"]
                pending = None
            else:
                ann_path, n_by_status = _stage_annotated(
                    gen, frontier, bloom, seen_exact, frontier_rows)
            ann_r = spark.read.parquet(ann_path)
            _log(f"gen {gen} annotate {time.time()-t0:.1f}s {n_by_status}")
            if not n_by_status:   # empty frontier -> done (no round committed)
                break

            # the Bloom state update depends only on the (already staged)
            # annotated frontier — kick it off NOW so it overlaps the long
            # fetch+extract stage instead of serializing ahead of the
            # pipelined next-round annotate in the writes window. In
            # bucketed mode the update is itself a staged table (delta
            # partials OR-merged into last round's committed bitmaps): it
            # lands in this round's uncommitted gen dir, the commit below
            # references it, and the prestaged next-round annotate reads it
            # pre-commit — which is what lets pipeline_rounds stay effective
            # in the 10^10-scale configuration.
            bloom_fut = None
            bloom_tbl_fut = None
            if cfg.use_bloom and not bucketed:
                delta_r = (ann_r.filter(F.col("status") == "scheduled")
                           .select("url_canon"))
                bloom_fut = pool.submit(_build_delta_bloom, delta_r)
            elif bucketed:
                prev_bitmaps = bloom_bitmaps

                def _stage_bloom_table() -> str:
                    delta_r = (ann_r.filter(F.col("status") == "scheduled")
                               .select("url_canon"))
                    partials = _delta_partials(delta_r)
                    if prev_bitmaps is not None:
                        partials = prev_bitmaps.unionByName(partials)
                    return store.stage_table(gen, "bloom",
                                             or_reduce_bitmaps(partials))

                bloom_tbl_fut = pool.submit(_stage_bloom_table)

            sched = ann_r.filter(F.col("status") == "scheduled")

            # ---- job 2: fetch-join + single-pass extract --------------------
            # Scheduled keys broadcast into a hash join against the pages
            # store: the (big) pages side never shuffles. Above the broadcast
            # threshold — as at true 10^10 scale — fall back to co-partitioned
            # SMJ where only the scheduled side shuffles (pages were
            # partitioned on url_canon at ingest).
            t1 = time.time()
            fetch_side = sched.select("url", "url_canon", "meta")
            n_sched = n_by_status.get("scheduled", 0)
            if cfg.fetch_join == "bucketed":
                # pages scan is bucketed on url_canon: the scheduled
                # side shuffles into the buckets and builds per-bucket
                # hash maps; the corpus streams through them — no
                # broadcast build, no corpus exchange, no sort
                fetched = pages_p.join(fetch_side.hint("shuffle_hash"),
                                       "url_canon", "inner")
            elif cfg.fetch_join == "broadcast" or \
                    n_sched <= cfg.broadcast_fetch_max:
                fetched = pages_p.join(F.broadcast(fetch_side), "url_canon",
                                       "inner")
            else:
                if cfg.pages_partitions:
                    fetch_side = fetch_side.repartition(cfg.pages_partitions,
                                                        "url_canon")
                fetched = fetch_side.join(pages_p, "url_canon", "inner")
            fetch_in = fetched.select("url", "html", "meta")
            if cfg.payload_projection:
                proj = F.expr(cfg.payload_projection)
                fetch_in = fetch_in.select(
                    "url",
                    F.when(F.length(proj) > 0, proj.cast("binary"))
                     .otherwise(F.col("html")).alias("html"),
                    "meta")
            # the discovered-link count rides the write as an Observation:
            # links + this round's deferred = next round's frontier size,
            # the (free) estimate the seen-confirm strategy keys on
            ex_obs = Observation(f"ex_{gen}")
            extracted_path = store.stage_table(
                gen, "extracted",
                extract_pages(fetch_in).observe(
                    ex_obs,
                    F.sum(F.when(F.col("kind") == "link", 1)
                          .otherwise(0)).alias("links")))
            ex = spark.read.parquet(extracted_path)
            frontier_rows = (int(ex_obs.get["links"] or 0)
                             + int(n_by_status.get("deferred", 0)))
            _log(f"gen {gen} fetch+extract {time.time()-t1:.1f}s")

            # ---- cheap derivations from the two committed tables ------------
            t2 = time.time()
            hl_seen = (_hl_seen_df(spark, hl_sources)
                       if cfg.headline_dedup_scope == "run" else None)
            results_round = _apply_result_filters(
                ex.filter(F.col("kind") == "record").drop("kind", "meta")
                  .withColumn("gen", F.lit(gen)),
                cfg,
                hl_seen=hl_seen,
            ).select(*RESULT_COLS)
            if cfg.lang_detect:
                from siren_spark.functions.langid import langid_udf
                results_round = results_round.withColumn(
                    "lang", langid_udf()(F.col("text")))

            # url_canon/domain were computed inside the extraction kernel
            # (the link strings were already in Python there) — this write is
            # a pure column-pruned select, no UDF job over the staged output
            links = (
                ex.filter(F.col("kind") == "link")
                .select("url", "url_canon", "meta", "via", "domain")
                .withColumn("priority", F.lit(round(1.0 / (gen + 2), 6)))
                .withColumn("depth", F.lit(gen + 1))
                .select(*FRONTIER_COLS)
            )
            next_frontier = links.unionByName(
                ann_r.filter(F.col("status") == "deferred").select(*FRONTIER_COLS))

            cnt_caches: list = []
            # the round's record count rides the counters write as an
            # Observation — no post-commit re-read of the counters table
            cnt_obs = Observation(f"cnt_{gen}")
            counters_df = _round_counters(ann_r, ex, gen, cnt_caches).observe(
                cnt_obs,
                F.sum(F.when(F.col("metric") == "records", F.col("n"))
                      .otherwise(F.lit(0))).alias("n_rec"))
            # The three derived tables depend only on the two committed
            # parquet tables (ann_r, ex) and are independent of each other —
            # stage them from concurrent driver threads so the cluster runs
            # them as overlapping jobs (tail tasks of one fill the slots of
            # another) instead of paying scheduling latency + straggler tail
            # three times in sequence. The round's Bloom-delta build (also
            # only a function of ann_path) overlaps in the same window.
            # Per-round serial cost is exactly what the N->4N scaling
            # comparison pays at every cluster size.
            tw = time.time()
            next_fut = None
            seen_sources_next = seen_sources + [{"path": ann_path,
                                                 "kind": "ann"}]

            def _prestage_next() -> dict | None:
                """Round gen+1's annotate, overlapped with this round's
                derived writes (they are independent: it reads only the two
                staged tables + the Bloom state). Any failure falls back to
                inline annotation next round — pipelining is an overlap,
                never a correctness dependency."""
                try:
                    merged = bloom
                    bb_next = None
                    if bloom_fut is not None:
                        merged = merge_blooms(bloom, bloom_fut.result())
                    if bloom_tbl_fut is not None:
                        # this round's staged (pre-commit) bitmap table; the
                        # commit below references exactly this path before
                        # the prestaged annotate is ever consumed
                        bb_next = spark.read.parquet(bloom_tbl_fut.result())
                    nf = links.unionByName(
                        ann_r.filter(F.col("status") == "deferred")
                        .select(*FRONTIER_COLS))
                    seen_next = _seen_df(spark, seen_sources_next)
                    path, counts = _stage_annotated(
                        gen + 1, nf, merged, seen_next, frontier_rows,
                        bloom_bitmaps_=bb_next)
                    return {"gen": gen + 1, "path": path, "counts": counts}
                except Exception as e:       # noqa: BLE001
                    _log(f"gen {gen}   prestage next-round annotate "
                         f"failed ({e!r}); will annotate inline")
                    return None

            # NO dedicated "frontier" table: its content is exactly
            # links(extracted) + deferred(frontier_ann) — both already
            # committed this round — so writing it again was a fully
            # redundant ~frontier-sized parquet job in every round's
            # derived-writes window (resume reconstructs the same frame
            # from the committed tables, _frontier_after)
            futs = {name: pool.submit(store.stage_table, gen, name, df)
                    for name, df in (("results", results_round),
                                     ("counters", counters_df))}
            # seen/headline compactions fold into the same overlap window
            # (previously serial staging steps after the writes — ~1 s of
            # per-round critical path whenever they fired): the seen
            # compaction reads only already-staged annotated frontiers; the
            # headline compaction additionally waits on the results write
            # future (its pool slot is guaranteed — see max_workers above —
            # and stage_table paths are deterministic, so the source list
            # can be built before the write lands)
            seen_sources = seen_sources_next
            compact_fut = None
            if len(seen_sources) > cfg.seen_compact_every:
                compact_fut = pool.submit(
                    store.stage_table, gen, "seen_compact",
                    _seen_df(spark, seen_sources))
            hl_fut = None
            hl_sources_next = hl_sources
            if cfg.headline_dedup_scope == "run":
                hl_sources_next = hl_sources + [
                    {"path": os.path.join(store._gen_dir(gen), "results"),
                     "kind": "res"}]
                if len(hl_sources_next) > cfg.seen_compact_every:

                    def _stage_hl_compact() -> str:
                        futs["results"].result()   # read-after-write dep
                        return store.stage_table(
                            gen, "hl_compact",
                            _hl_seen_df(spark, hl_sources_next))

                    hl_fut = pool.submit(_stage_hl_compact)
            # skip the prestage when this round's observations already prove
            # the next frontier empty (links + deferred == 0): the loop is
            # about to terminate, and the annotate would only stage a table
            # no round consumes — wasted cluster time, plus an uncommitted
            # gen dir the run would leave behind
            if cfg.pipeline_rounds and gen + 1 < cfg.max_rounds \
                    and (frontier_rows or 0) > 0:
                next_fut = pool.submit(_prestage_next)
            staged_paths = {name: f.result() for name, f in futs.items()}
            _log(f"gen {gen}   write frontier|results|counters "
                 f"{time.time()-tw:.1f}s")
            for c in cnt_caches:
                c.unpersist()

            # seen bookkeeping: this round's scheduled rows extend the seen
            # set; compacted every seen_compact_every rounds so reads stay
            # O(1)-table (amortized O(1) per round, staged concurrently
            # above)
            staged_tables = ["frontier_ann", "extracted", "results",
                             "counters"]
            if compact_fut is not None:
                compact_path = compact_fut.result()
                seen_sources = [{"path": compact_path, "kind": "compact"}]
                staged_tables.append("seen_compact")
            if cfg.headline_dedup_scope == "run":
                hl_sources = hl_sources_next
                if hl_fut is not None:
                    hl_path = hl_fut.result()
                    hl_sources = [{"path": hl_path, "kind": "compact"}]
                    staged_tables.append("hl_compact")

            stats: dict = {
                "by_status": {k: int(v) for k, v in n_by_status.items()},
                "seen_sources": seen_sources,
            }
            if cfg.headline_dedup_scope == "run":
                stats["hl_seen_sources"] = hl_sources
            if bucketed:
                # bucketed filter state: the round's delta partials were
                # OR-merged into the running bitmap table and staged from
                # the pool right after annotate (overlapping fetch+extract)
                # — fully distributed, the driver never materializes a
                # bitmap; the commit references the staged path and the
                # checkpoint carries it
                bloom_path = bloom_tbl_fut.result()
                staged_tables.append("bloom")
                stats["bloom_table"] = bloom_path
                bloom_bitmaps = spark.read.parquet(bloom_path)

            store.write_round(
                gen, {}, stats=stats,
                staged={n: f"{store._gen_dir(gen)}/{n}" for n in staged_tables})
            # roll forward from committed state: next_frontier reads
            # only this round's committed staged parquet (extracted +
            # frontier_ann), so it IS durable state — no re-listing of
            # anything, no dedicated frontier table (see _frontier_after
            # for the identical resume-time reconstruction)
            frontier = next_frontier
            seen_exact = _seen_df(spark, seen_sources)
            if bloom_fut is not None:
                # the delta filter was built concurrently with fetch+extract;
                # only the (numpy, driver-side, ~ms) OR-merge is left
                bloom = merge_blooms(bloom, bloom_fut.result())
            if next_fut is not None:
                # next round's annotate was staged concurrently with this
                # round's writes + commit (None if it failed -> annotate
                # inline)
                pending = next_fut.result()

            # the round timer closes only after every overlapped task the
            # round started has landed — steady-state throughput must not
            # hide pipelined work in the gap between timers
            _log(f"gen {gen} commit {time.time()-t2:.1f}s "
                 f"total {time.time()-t0:.1f}s")
            round_secs.append(time.time() - t0)
            n_rec = int(cnt_obs.get["n_rec"] or 0)
            round_urls.append(int(n_by_status.get("scheduled", 0)) + n_rec)

            if fail_after_round is not None and gen >= fail_after_round:
                raise RuntimeError(f"simulated kill after round {gen}")

            if n_by_status.get("scheduled", 0) == 0 and \
                    n_by_status.get("deferred", 0) == 0:
                break

    except BaseException:
        # a failing Spark action must not leave non-daemon pool
        # workers driving queued jobs (concurrent.futures' atexit
        # join would otherwise block interpreter shutdown until an
        # in-flight pre-staged annotate finishes): cancel queued
        # work and surface the error. Any in-flight pre-stage
        # write lands in an uncommitted gen dir that resume
        # ignores and cleans.
        pool.shutdown(wait=False, cancel_futures=True)
        raise
    pool.shutdown(wait=True)
    if matcher_bc is not None:
        # returned frames are all parquet-backed (no live plan holds the
        # gate UDF), so the broadcast can be released eagerly
        matcher_bc.unpersist()
    last = store.latest_gen()
    # reclaim any staged-but-never-committed gen dir (an inline annotate
    # of a frontier that turned out empty, or a prestage raced by an
    # unusual termination): harmless for resume — manifests gate every
    # read — but a completed crawl should leave a clean checkpoint
    store.drop_uncommitted((last + 1) if last is not None else 0)
    return CrawlResult(
        rounds=(last + 1 if last is not None else 0),
        results=store.read_all(spark, "results"),
        counters=_counters_with_fallback(spark, store),
        seen=(_seen_df(spark, _seen_sources_at(store, last))
              if last is not None else None),
        round_secs=round_secs,
        round_urls=round_urls,
    )


__all__ = ["CrawlConfig", "CrawlResult", "run_crawl", "prepare_pages"]
