"""The crawl engine: frontier generations as DataFrame batch rounds.

One round = one micro-batch (SURVEY.md §3.1 Spark lifecycle equivalent):

    frontier --robots gate--> allowed            (blocked -> counter)
            --Bloom + exact anti-join vs seen--> new      (deduped -> counter)
            --politeness top-k per host-->  scheduled | deferred
    scheduled ⋈ pages (equi-join on url_canon)   (miss -> counter, dropped
                                                  like the reference's
                                                  non-200 -> [] mirror.py:53)
            --extract_pages (one Arrow pass)-->  links + records + errors
    records --per-source date window (P1) + keyword (P3) filters--> results
    links   --canonicalize + in-round dedup-->   next frontier (∪ deferred)
    seen   ∪= scheduled   (attempted = seen, ht.py:242-247 semantics)

Every round checkpoints (frontier, seen delta, results, counters) with an
atomic manifest; a killed run resumes from the last committed round and
produces byte-identical final state (tests/test_crawl.py).

Determinism: every tie is broken on url_canon, so the scheduled set and
crawl ordering are independent of parallelism — the property that makes
the N-vs-4N scaling comparison apples-to-apples.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from siren_spark.functions.udfs import canonicalize_udf, domain_udf, extract_pages
from siren_spark.operators.checkpoint import CheckpointStore
from siren_spark.operators.politeness import politeness_schedule
from siren_spark.operators.robots import robots_gate
from siren_spark.operators.seen import filter_unseen

# Client-side strict date-window filter applies only where the reference
# applies it (P1): mirror.py:61, online/telegraph.py:48, newsminute.py:81-83.
DATE_FILTERED_SOURCES = ("mirror", "tg_online", "newsminute")
# Client-side keyword filter applies only to TG epaper (epaper/telegraph.py:80-88).
KEYWORD_FILTERED_SOURCES = ("tg_epaper",)


@dataclass
class CrawlConfig:
    budget_per_host: int = 50          # reference max_concurrency, config.toml:10
    salt_buckets: int = 16
    max_rounds: int = 30
    use_bloom: bool = True
    bloom_bits: int = 1 << 20
    bloom_buckets: int = 16
    window_start: datetime | None = None
    window_end: datetime | None = None
    keywords: list[str] = dc_field(default_factory=list)
    pages_partitions: int | None = None  # repartition pages on url_canon


RESULT_COLS = ["source", "url", "title", "author", "location", "published",
               "text", "extra", "gen"]


def prepare_pages(pages: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Canonicalize page keys once; partition by key for the fetch joins.

    At cluster scale this is the bucketed-write of the pages table
    (bucket(N, url_canon)) done at ingest so every round's fetch join is
    co-located; locally we emulate with an explicit repartition + cache.
    """
    p = pages.select(
        canonicalize_udf(F.col("url")).alias("url_canon"),
        F.col("url").alias("page_url"),
        "html",
    )
    if cfg.pages_partitions:
        p = p.repartition(cfg.pages_partitions, "url_canon")
    return p


def _seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    cols = dict.fromkeys(seeds.columns)
    meta = F.col("meta") if "meta" in cols else F.create_map().cast(
        "map<string,string>")
    return seeds.select(
        F.col("url"),
        canonicalize_udf(F.col("url")).alias("url_canon"),
        meta.alias("meta"),
    ).withColumn("domain", domain_udf(F.col("url_canon"))) \
     .withColumn("priority", F.lit(1.0)) \
     .withColumn("depth", F.lit(0)) \
     .withColumn("via", F.lit(None).cast("string"))


def _dedup_frontier(frontier: DataFrame) -> DataFrame:
    """In-frontier dedup by url_canon, deterministic representative."""
    w = Window.partitionBy("url_canon").orderBy(
        F.desc("priority"), F.asc("depth"), F.asc_nulls_first("via"), F.asc("url")
    )
    return (frontier.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _apply_result_filters(records: DataFrame, cfg: CrawlConfig) -> DataFrame:
    out = records
    if cfg.window_start is not None and cfg.window_end is not None:
        in_window = (
            F.col("published").isNotNull()
            & (F.col("published") > F.lit(cfg.window_start))   # strict (P1)
            & (F.col("published") < F.lit(cfg.window_end))
        )
        out = out.filter(
            (~F.col("source").isin(*DATE_FILTERED_SOURCES)) | in_window
        )
    if cfg.keywords:
        kws = F.array(*[F.lit(k.lower()) for k in cfg.keywords])
        has_kw = F.exists(
            kws,
            lambda k: (
                F.col("title").isNotNull()
                & (F.col("title") != F.lit(""))
                & F.contains(F.lower(F.col("title")), k)
            ) | F.contains(F.lower(F.col("text")), k),
        )
        out = out.filter(
            (~F.col("source").isin(*KEYWORD_FILTERED_SOURCES)) | has_kw
        )
    return out


@dataclass
class CrawlResult:
    rounds: int
    results: DataFrame | None
    counters: DataFrame | None
    seen: DataFrame | None


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
    pages_p = prepare_pages(pages, cfg).persist()

    if resume and (last := store.latest_gen()) is not None:
        start_gen = last + 1
        frontier = store.read(spark, last, "frontier")
        seen = store.read_all(spark, "seen_delta", upto_gen=last)
    else:
        start_gen = 0
        frontier = _seeds_to_frontier(seeds)
        seen = None

    for gen in range(start_gen, cfg.max_rounds):
        frontier = frontier.persist()
        if frontier.isEmpty():
            frontier.unpersist()
            break

        # 1. robots gate (RFC 9309; reference has none — new surface)
        allowed, blocked = robots_gate(frontier, robots)

        # 2. dedup: in-frontier + against the persistent seen set
        allowed = _dedup_frontier(allowed)
        new = filter_unseen(
            allowed, seen, bloom=cfg.use_bloom,
            bits_per_bucket=cfg.bloom_bits, buckets=cfg.bloom_buckets,
        ).persist()

        # 3. politeness: per-host budget, deterministic order
        scheduled, deferred = politeness_schedule(
            new, budget_per_host=cfg.budget_per_host,
            salt_buckets=cfg.salt_buckets,
        )
        scheduled = scheduled.persist()

        # 4. fetch = equi-join against the pages store
        fetched = scheduled.join(pages_p, "url_canon", "left")
        hits = fetched.filter(F.col("html").isNotNull())

        # 5. extract: one Arrow pass -> links | records | errors
        extracted = extract_pages(
            hits.select(F.col("url"), F.col("html"), F.col("meta"))
        ).persist()

        records = (
            extracted.filter(F.col("kind") == "record")
            .drop("kind", "meta")
            .withColumn("gen", F.lit(gen))
        )
        results_round = _apply_result_filters(records, cfg).select(*RESULT_COLS)

        links = (
            extracted.filter(F.col("kind") == "link")
            .select(
                F.col("url"),
                canonicalize_udf(F.col("url")).alias("url_canon"),
                "meta", "via",
            )
            .withColumn("domain", domain_udf(F.col("url_canon")))
            .withColumn("priority", F.lit(round(1.0 / (gen + 2), 6)))
            .withColumn("depth", F.lit(gen + 1))
        )
        # no dedup here: the next round's round-start dedup handles it and
        # counts it, keeping the deduped counter equal to the oracle's
        next_frontier = links.select(*deferred.columns).unionByName(deferred)

        # 6. counters (per-domain lineage, SURVEY.md §1.4)
        def _cnt(df: DataFrame, metric: str) -> DataFrame:
            return df.groupBy("domain").agg(F.count("*").alias("n")) \
                     .withColumn("metric", F.lit(metric))

        err_count = extracted.filter(F.col("kind") == "error") \
            .withColumn("domain", domain_udf(F.col("url"))) \
            .groupBy("domain").agg(F.count("*").alias("n")) \
            .withColumn("metric", F.lit("errors"))
        missing = fetched.filter(F.col("html").isNull())
        counters = (
            _cnt(scheduled, "fetched")
            .unionByName(_cnt(missing, "missing"))
            .unionByName(_cnt(blocked, "robots_blocked"))
            .unionByName(_cnt(deferred, "deferred"))
            .unionByName(err_count)
            .withColumn("gen", F.lit(gen))
            .select("gen", "domain", "metric", "n")
        )
        # deduped = rows removed by in-frontier dedup + the seen-set filter
        n_frontier = frontier.count()
        n_blocked = blocked.count()
        n_new = new.count()
        dedup_row = spark.createDataFrame(
            [(gen, "*", "deduped", n_frontier - n_blocked - n_new)],
            "gen int, domain string, metric string, n long",
        )
        counters = counters.unionByName(dedup_row)

        seen_delta = scheduled.select("url_canon")
        store.write_round(gen, {
            "frontier": next_frontier,
            "seen_delta": seen_delta,
            "results": results_round,
            "counters": counters,
        }, stats={"frontier_in": n_frontier, "scheduled": scheduled.count()})

        # roll forward (read back from checkpoint: keeps lineage short and
        # makes resume state == in-flight state)
        frontier.unpersist()
        new.unpersist()
        extracted.unpersist()
        scheduled.unpersist()
        frontier = store.read(spark, gen, "frontier")
        seen = store.read_all(spark, "seen_delta", upto_gen=gen)

        if fail_after_round is not None and gen >= fail_after_round:
            pages_p.unpersist()
            raise RuntimeError(f"simulated kill after round {gen}")

    pages_p.unpersist()
    last = store.latest_gen()
    return CrawlResult(
        rounds=(last + 1 if last is not None else 0),
        results=store.read_all(spark, "results"),
        counters=store.read_all(spark, "counters"),
        seen=store.read_all(spark, "seen_delta"),
    )


__all__ = ["CrawlConfig", "CrawlResult", "run_crawl", "prepare_pages"]
