"""Corpus-curation operators for training-data pipelines, as engine API.

The ops a web-scale pretraining pipeline runs between the crawl and the
tokenizer, beyond dedup/similarity (functions/similarity.py) and
per-doc stats (functions/text.py):

- deterministic hash sampling (``sample_hash``) — C4-style corpus
  downsampling that is reproducible at any parallelism and re-runnable
  incrementally (the keep/drop decision is a pure function of the key,
  never of partition layout or an RNG seed table);
- deterministic split assignment (``split_by_hash``) — train/val/test
  labels as a pure function of the key, immune to re-shuffle leakage;
- token-frequency tables (``token_frequencies``) — the tokenizer-
  training / vocab-coverage word count with a deterministic top-k;
- per-group quota sampling (``sample_quota_per_group``) — data-mixing
  caps ("at most K docs per domain/source"), the FineWeb/Gopher recipe
  for flattening domain skew, built on the same salted two-phase top-k
  as the politeness scheduler (operators/politeness.py) so one hot
  domain cannot funnel a window through a single task;
- benchmark decontamination (``decontaminate_ngrams``) — flag training
  docs sharing any word n-gram with an eval/benchmark set (the GPT-3
  appendix-C / Gopher 13-gram overlap rule);
- per-domain quality rollup (``domain_quality_rollup``) — the
  aggregate view quality-filter thresholds are tuned against;
- domain blocklist filtering (``filter_domain_blocklist``) — drop rows
  whose host matches a blocklist entry exactly OR by DNS suffix
  (blocking ``example.com`` drops ``news3.example.com``), the standard
  URL-level filter in C4/RefinedWeb pipelines;
- token-budget mixing (``mix_by_token_budget``) — Pile/Dolma-style
  mixture construction: fill each source's token budget greedily in
  deterministic hash order, as a distributed prefix-sum (no per-source
  single-task window);
- corpus search (``search_topk``) — TF-IDF bag-of-words retrieval with
  integer milli-nat idf, the query-time counterpart to
  ``inverted_index``;
- per-group length-outlier filtering (``filter_length_outliers``) —
  Tukey-fence percentile cuts with binary-exact band edges;
- snapshot content diff (``snapshot_diff``) — recrawl CDC: one row per
  added/removed/changed key across two corpus snapshots, fingerprints
  (not documents) on the shuffle.

All determinism contracts match functions/text.py: integer outputs are
BIGINT, floats are ROUND(...,4), orderings are total (hash, then key),
so results are independent of partitioning and execution order — the
driver's value-hash oracle gate relies on this.

Scale notes (100 TB): sample_hash and decontaminate's doc side are flat
maps (no shuffle); the benchmark n-gram set is small by nature and
broadcast; quota sampling shuffles once on the salted group key with
per-task volume bounded by salt_buckets x quota regardless of skew; the
rollup is one combiner-friendly groupBy; blocklist filtering explodes a
bounded (~label-count) suffix array and broadcast-anti-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 16 ** 8  # first 8 hex chars of md5 = 32 uniform bits


def _hash8(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt|key) — the shared sampling hash.

    Kept to plain md5/substring so the DuckDB oracle replicates it
    verbatim (``substr(md5(...), 1, 8)``).
    """
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), key.cast("string"))), 1, 8)


def sample_hash(
    df: DataFrame,
    *,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash(key) < rate.

    The keep decision is a pure function of (salt, key): re-running on
    a grown corpus keeps every previously-kept row (stable incremental
    sampling), and disjoint salts give independent samples for held-out
    splits. Pure column math — stays in whole-stage codegen, no
    shuffle, nothing driver-side.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return df
    threshold = format(int(rate * _HASH_SPACE), "08x")
    return df.filter(_hash8(F.col(key_col), salt) < F.lit(threshold))


def split_by_hash(
    df: DataFrame,
    *,
    splits: list[tuple[str, float]] = (("train", 0.98), ("val", 0.01),
                                       ("test", 0.01)),
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.

    ``splits`` is (name, fraction) in priority order; fractions must sum
    to 1. Assignment is a pure function of (salt, key) — the same doc
    always lands in the same split across re-runs and corpus growth (no
    train/test leakage from re-shuffling), and a distinct salt re-draws
    the whole assignment. Pure column math, no shuffle.
    """
    splits = list(splits)
    total = sum(frac for _, frac in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if any(frac < 0 for _, frac in splits):
        raise ValueError("split fractions must be non-negative")
    h = _hash8(F.col(key_col), salt)
    expr = F.lit(splits[-1][0])  # last split takes the hash-space tail
    cum = 0.0
    uppers = []
    for name, frac in splits[:-1]:
        cum += frac
        uppers.append((name, format(int(cum * _HASH_SPACE), "08x")))
    for name, upper in reversed(uppers):
        expr = F.when(h < F.lit(upper), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def token_frequencies(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus token-frequency table (token, n) — the tokenizer-training
    and vocab-coverage input. With ``top_k``, keeps the K most frequent
    tokens under a total order (n desc, token asc) so the result set is
    deterministic across partitionings even through count ties.

    Plan shape: classic word-count — explode is narrow, the groupBy
    partial-aggregates map-side (shuffle carries one row per distinct
    token per task), and top-k compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of K rows), never a global sort.
    """
    tok = (df.filter(F.length(text_col) > 0)
           .select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
           .filter(F.length("token") > 0))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    if top_k is not None:
        if top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        counts = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_k)
    return counts


def sample_quota_per_group(
    df: DataFrame,
    *,
    quota: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep a deterministic pseudo-random quota of rows per group.

    Order within a group is by (hash(key), key) — uniform "random" but
    reproducible at any parallelism. Skew-robust the same way the
    politeness scheduler is (operators/politeness.py:23): phase 1 ranks
    within (group, xxhash-salt bucket) and keeps at most ``quota`` per
    bucket, so the phase-2 per-group window sees at most
    salt_buckets x quota rows for even the hottest group.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    hkey = _hash8(F.col(key_col), salt)
    order = [F.asc("__hkey"), F.asc(key_col)]
    salted = (df.withColumn("__hkey", hkey)
              .withColumn("__salt",
                          F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                                 F.lit(salt_buckets))))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order)
    pre = (salted.withColumn("__rn", F.row_number().over(w1))
           .filter(F.col("__rn") <= quota).drop("__rn"))
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (pre.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= quota)
            .drop("__rn", "__salt", "__hkey"))


def _word_ngrams(text: Column, n: int) -> Column:
    """All word n-grams of a single-space-tokenized text column
    (empty array when the doc has fewer than n words)."""
    w = F.split(text, " ")
    return F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(1), F.size(w) - n + 1),
                    lambda i: F.array_join(F.slice(w, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate_ngrams(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag docs sharing any word ``n``-gram with ``benchmark``.

    The GPT-3/Gopher eval-decontamination rule: a training document is
    contaminated if any of its word n-grams appears in the benchmark
    text. Returns (id_col, contaminated BOOLEAN), one row per doc.

    Plan shape: the benchmark side (small by nature — eval sets are
    thousands of docs, not billions) collapses to a distinct md5(gram)
    set and is BROADCAST; the doc side explodes its per-doc distinct
    gram hashes and broadcast-left-joins them (narrow — the doc text
    never shuffles), then ONE combiner-friendly groupBy(id) folds the
    per-gram hits to a boolean — map-side partial max means the single
    shuffle carries one (id, bool) pair per doc per task.
    ``explode_outer`` keeps docs shorter than n words (contaminated =
    false). Requires ``id_col`` to be unique per doc.
    """
    grams = _word_ngrams(F.col(text_col), n)
    bench_grams = (
        benchmark
        .select(F.explode(grams).alias("__g"))
        .select(F.md5("__g").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(True)))
    doc_grams = (
        docs
        .select(F.col(id_col),
                F.explode_outer(F.array_distinct(grams)).alias("__g"))
        .withColumn("__gh", F.md5("__g")))
    return (doc_grams
            .join(F.broadcast(bench_grams.select("__gh", "__hit")),
                  "__gh", "left")
            .groupBy(id_col)
            .agg(F.coalesce(F.max("__hit"), F.lit(False))
                 .alias("contaminated")))


def domain_quality_rollup(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus stats: the table quality thresholds are tuned on.

    Returns one row per group: n_docs, n_tokens (whitespace), avg_chars
    (ROUND 4), short_doc_share (ROUND 4; docs under 50 tokens — the
    length_score<0.5 knee from functions/text.py:with_quality_score).
    One combiner-friendly groupBy — partial aggregation map-side, tiny
    shuffle (one row per group), no skew surface.
    """
    t = F.col(text_col)
    n_tok = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
             + F.lit(1)).cast("long")
    return (df.filter(F.length(t) > 0)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(n_tok).alias("n_tokens"),
                 F.round(F.avg(F.length(t).cast("double")), 4)
                 .alias("avg_chars"),
                 F.round(F.avg((n_tok < 50).cast("double")), 4)
                 .alias("short_doc_share")))


def _host_suffixes(host: Column) -> Column:
    """All DNS suffixes of a host: a.b.c -> [a.b.c, b.c, c]."""
    p = F.split(host, "[.]")
    return F.transform(
        F.sequence(F.lit(1), F.size(p)),
        lambda i: F.array_join(F.slice(p, i, F.size(p) - i + 1), "."))


def filter_domain_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    *,
    domain_col: str = "domain",
    blocked_col: str = "blocked",
) -> DataFrame:
    """Drop rows whose host matches a blocklist entry exactly or by
    DNS suffix (blocking ``example.com`` drops ``news3.example.com``;
    label-anchored, so ``ample.com`` does NOT).

    Plan shape: DISTINCT hosts (tiny vs rows — a 100 TB crawl has
    ~10^7-10^8 hosts vs 10^10 pages) explode into <= label-count
    suffixes (~6 for real hosts), broadcast-semi-join the blocklist to
    find blocked hosts, and the blocked-host set broadcast-anti-joins
    back onto the data — the data side never shuffles. Memory bound:
    the broadcast is |hosts matching the blocklist|, not |rows|; if a
    blocklist entry covers a huge shared-hosting domain, swap the final
    join for a shuffle anti-join on the host column.
    """
    sfx = (df.select(F.col(domain_col).alias("__host")).distinct()
           .select("__host", F.explode(_host_suffixes(F.col("__host")))
                   .alias("__sfx")))
    blocked_hosts = (sfx.join(
        F.broadcast(blocklist.select(F.col(blocked_col).alias("__sfx"))),
        "__sfx", "left_semi").select("__host").distinct())
    return df.join(
        F.broadcast(blocked_hosts),
        df[domain_col] == blocked_hosts["__host"], "left_anti")


__all__ = [
    "sample_hash",
    "split_by_hash",
    "token_frequencies",
    "sample_quota_per_group",
    "decontaminate_ngrams",
    "domain_quality_rollup",
    "filter_domain_blocklist",
]


def tfidf_topk_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the standard keyword /
    topic-signature extractor a corpus-exploration or mixing pipeline
    runs over web text (reference parity: per-article keyword columns
    the scrapers emit; here generalized to corpus-relative weighting).

    Per doc: tf = in-doc term count (whitespace tokens); idf =
    ln(N / df) with df = number of docs containing the term and N the
    corpus size; score = ROUND(tf * idf, 4). Returns the ``top_k``
    terms per doc under the total order (score desc, term asc) with a
    1-based ``rank`` — deterministic through ties, so the result is
    independent of partitioning (the driver's value-hash gate relies
    on this).

    Plan shape at 100 TB: tf is computed DOC-LOCALLY — a document's
    tokens all live in its own row, so the (doc, term) counts need no
    shuffle at all; one ``mapInArrow`` pass tokenizes with
    ``pyarrow.compute.split_pattern`` and counts with a vectorized
    pandas groupby per batch (the JVM explode + (doc, term)
    HashAggregate this replaced shuffled one row per (doc, term) and
    owned the query cost). The tf frame then takes ONE hash(doc)
    repartition that both consumers share: df reduces tf by term
    (vocab-sized, Zipf-safe — the combiner collapses hot terms per
    task before the tiny shuffle) and joins back as a BROADCAST, so
    bulk data is never partitioned by term (a stopword term would own
    a corpus-sized partition); the per-doc top-k window reuses the
    same hash(doc) partitioning — no further exchange. N rides in as
    a broadcast 1-row cross join (never a driver ``.count()`` — the
    whole plan stays lazy).

    The df aggregate deliberately references every tf column
    (``WHEN SUM(tf) > 0 THEN COUNT(__doc)`` — tf >= 1, so the value IS
    the row count): without it, column pruning narrows the df branch,
    the two repartition exchanges stop being canonically identical,
    and AQE's runtime exchange reuse cannot fire — the tokenize pass
    would then run TWICE (measured 2x the query cost).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    import pyarrow as pa

    from siren_spark.functions.similarity import _spread

    id_dtype = df.schema[id_col].dataType.simpleString()
    # _spread: a single-file input otherwise pins the whole tokenize
    # pass to one scan task (one parquet row group = one non-empty
    # split); no-op at corpus scale where files >= cores
    base = _spread(df.filter(F.length(text_col) > 0)).select(
        F.col(id_col).alias("__doc"), F.col(text_col))

    def tf_batches(batches):
        import pyarrow.compute as pc
        for b in batches:
            ids, texts = b.column(0), b.column(1)
            lists = pc.split_pattern(texts, " ")
            flat = lists.flatten()
            keep = pc.not_equal(flat, "")
            doc_ids = ids.take(pc.list_parent_indices(lists)).filter(keep)
            terms = flat.filter(keep)
            # native Arrow hash-groupby — measured 2.4x faster than the
            # pandas groupby it replaced (no to_pandas copies, no
            # object-dtype term column); single-threaded: the task IS
            # the unit of parallelism, oversubscribing 32 tasks x N
            # arrow threads only adds kernel scheduler pressure
            g = (pa.table({"__doc": doc_ids, "term": terms})
                 .group_by(["__doc", "term"], use_threads=False)
                 .aggregate([([], "count_all")]))
            yield pa.record_batch(
                [g.column("__doc").combine_chunks(),
                 g.column("term").combine_chunks(),
                 g.column("count_all").cast(pa.int64()).combine_chunks()],
                names=["__doc", "term", "tf"])

    tf = (base.mapInArrow(tf_batches,
                          f"__doc {id_dtype}, term string, tf long")
          .repartition("__doc"))
    dfreq = tf.groupBy("term").agg(
        F.when(F.sum("tf") > 0, F.count("__doc")).alias("df"))
    n = df.filter(F.length(text_col) > 0).select(
        F.count(F.lit(1)).alias("__n"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(n))
              .select(F.col("__doc"),
                      "term",
                      F.round(F.col("tf")
                              * F.log(F.col("__n").cast("double")
                                      / F.col("df")), 4).alias("tfidf")))
    w = Window.partitionBy("__doc").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(F.col("__doc").alias(id_col), "term", "tfidf",
                    F.col("rank").cast("int").alias("rank")))


def score_linear_classifier(
    df: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "token",
    weight_col: str = "weight_milli",
    bias_milli: int = 0,
    broadcast_weights: bool = True,
    out_col: str = "logit",
) -> DataFrame:
    """Bag-of-words linear classifier scoring — the model-based quality
    filter shape (fastText-style: FineWeb-Edu / DCLM / CCNet run
    exactly this to keep or drop documents at corpus scale). ``weights``
    is a (token, weight_milli BIGINT) table — integer milli-weights so
    the per-doc accumulation is integer-exact and the result is
    independent of summation order (float sums are not; the driver's
    value-hash gate and any 1000-executor re-run rely on this).

    logit = (bias_milli + Σ w_milli(t)·count(t) / n_tokens) / 1000 —
    the fastText mean-of-token-scores form, ROUND 4. ``label`` =
    logit >= 0 (≡ sigmoid >= 0.5; sigmoid is monotone so thresholding
    on the logit avoids cross-engine exp() divergence). Out-of-vocab
    tokens weigh 0 but still count in n_tokens, as in fastText.

    Plan shape at 100 TB: explode is narrow; the vocab join is a
    broadcast hash join by default (a pruned fastText vocab is
    ~10^5-10^6 rows — set ``broadcast_weights=False`` to shuffle-join
    a huge vocab on the token key instead); one combiner-friendly
    groupBy per doc carries (sum, count) longs. The scored frame never
    holds more than one row per (doc, token).
    """
    t = F.col(text_col)
    tok = (df.filter(F.length(t) > 0)
           .select(F.col(id_col).alias("__doc"),
                   F.explode(F.split(t, " ")).alias("__tok"))
           .filter(F.length("__tok") > 0))
    w = weights.select(F.col(token_col).alias("__tok"),
                       F.col(weight_col).cast("long").alias("__w"))
    if broadcast_weights:
        w = F.broadcast(w)
    scored = (tok.join(w, "__tok", "left")
              .groupBy("__doc")
              .agg(F.sum(F.coalesce(F.col("__w"), F.lit(0)))
                   .alias("__sum"),
                   F.count(F.lit(1)).alias("__n")))
    logit = F.round(
        (F.lit(float(bias_milli))
         + F.col("__sum").cast("double") / F.col("__n")) / F.lit(1000.0),
        4)
    return (scored.select(F.col("__doc").alias(id_col),
                          logit.alias(out_col))
            .withColumn("label", F.col(out_col) >= 0))


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    sequence-preparation step between curation and tokenization
    (context-length chunking with overlap, the HF ``return_overflowing_
    tokens`` shape). Whitespace tokens; windows start every
    ``chunk_tokens - overlap`` tokens; the final window is the
    remainder (never an extra window that only repeats overlap).

    Returns (id, chunk_idx 0-based, chunk_text, n_tokens). All window
    arithmetic is integer (count = ceil((n - overlap) / stride) via
    integer division), so the result is exact under any partitioning
    and mirrored verbatim by the SQL oracle.

    Plan shape: flat map — split, one explode over the per-doc window
    index sequence (bounded by n/stride), slice + join per window. No
    shuffle; output rows ≈ input tokens / stride regardless of doc
    length skew, and no task ever holds more than one document's
    tokens.
    """
    if chunk_tokens < 2:
        raise ValueError(f"chunk_tokens must be >= 2, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.floor((n - F.lit(overlap) + F.lit(stride) - 1)
                       / F.lit(stride)).cast("long")
    n_chunks = F.greatest(n_chunks, F.lit(1).cast("long"))
    base = (df.filter(F.length(text_col) > 0)
            .select(F.col(id_col), toks.alias("__toks"),
                    n.alias("__n"),
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         n_chunks - 1))
                    .alias("chunk_idx")))
    start = F.col("chunk_idx") * stride
    length = F.least(F.lit(chunk_tokens).cast("long"),
                     F.col("__n") - start)
    piece = F.slice("__toks", (start + 1).cast("int"),
                    length.cast("int"))
    return base.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"))


def inverted_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | float | None = 0.5,
) -> DataFrame:
    """Build a term -> postings-list inverted index over the corpus.

    The retrieval-side primitive a training-data pipeline needs for
    corpus search / example lookup (and the exact structure behind
    decontamination-by-lookup): one row per term with its document
    frequency and the sorted posting list. ``min_df`` drops hapax noise,
    ``max_df`` drops stopword-grade terms whose posting lists are the
    skew hazard at 100 TB (a term in every document is a posting list
    the size of the corpus — cap it, the term carries no signal).

    ``max_df`` accepts an absolute document count (int) or a corpus
    fraction (float in (0, 1]); the skew guard is ON BY DEFAULT at
    half the corpus (``max_df=0.5``) — a term in more than half of all
    documents collects a corpus-sized posting list into one aggregate
    row, so opting OUT (``max_df=None``) is the explicit choice, not
    the silent default. The fractional threshold rides in as a
    broadcast one-row count frame, never a driver action.

    Postings are emitted as a comma-joined string of sorted doc ids so
    the output is flat, totally ordered, and hashable cross-engine.

    Scale: explode(distinct tokens) is a flat map; the single shuffle
    groups by term with partial aggregation on count; collect_list is
    bounded by max_df when set. NOTE: the cap filters AFTER the
    per-term aggregation (df is not known earlier), so one stopword
    row is still built before being dropped; at true corpus scale
    pre-filter known stopwords upstream if even that is too hot.
    """
    if isinstance(max_df, float) and not 0.0 < max_df <= 1.0:
        raise ValueError(
            f"fractional max_df must be in (0, 1], got {max_df}")
    toks = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.explode(
                          F.array_distinct(F.split(F.col(text_col), " ")))
                      .alias("term"))
            .where(F.col("term") != ""))
    out = (toks.groupBy("term")
           .agg(F.count("*").cast("long").alias("df"),
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("doc_id")),
                                lambda x: x.cast("string")), ",")
                .alias("postings"))
           .where(F.col("df") >= min_df))
    if isinstance(max_df, float):
        n = df.agg(F.count(F.lit(1)).alias("__n"))
        out = (out.crossJoin(F.broadcast(n))
               .where(F.col("df") <= F.col("__n") * max_df)
               .drop("__n"))
    elif max_df is not None:
        out = out.where(F.col("df") <= max_df)
    return out


def mix_by_token_budget(
    df: DataFrame,
    *,
    budget_tokens: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    buckets: int = 256,
) -> DataFrame:
    """Greedy per-group token-budget fill — the data-mixing step.

    Pile/Dolma-style mixture construction: each source gets a token
    budget; docs are taken in a deterministic pseudo-random order
    (md5 hash of the key, same contract as ``sample_hash``) until the
    next doc would push the source's running token total past
    ``budget_tokens``. Returns the kept rows as
    (key, group, n_tokens, cum_tokens) where cum_tokens is the running
    total *including* the row — reproducible at any parallelism.

    Scale: a naive per-group window cumsum funnels each source through
    ONE task (a hot source = the whole corpus through one sort). This
    is a distributed prefix-sum instead: the order key is the 8-hex-char
    doc hash, and the bucket is its leading hex pair — so (bucket asc,
    hash asc) IS hash order. Phase 1 partial-aggregates per-(group,
    bucket) token sums (tiny: |groups| x buckets rows); phase 2 windows
    the running bucket offsets over that tiny frame; phase 3
    broadcast-joins offsets back and windows only within (group,
    bucket), so per-task window volume is ~1/buckets of the hottest
    group. Exactly the salted-window trick the politeness scheduler
    uses (operators/politeness.py:23), adapted to a running sum.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = (df.where(F.length(text_col) > 0)
            .withColumn("__h", _hash8(F.col(key_col), salt))
            .withColumn("__b", F.substring("__h", 1, 2))
            .withColumn("n_tokens", n_tok))
    per_bucket = (base.groupBy(group_col, "__b")
                  .agg(F.sum("n_tokens").alias("__bsum")))
    w_off = (Window.partitionBy(group_col).orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = per_bucket.withColumn(
        "__off", F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)))
    w_local = (Window.partitionBy(group_col, "__b")
               .orderBy(F.asc("__h"), F.asc(key_col))
               .rowsBetween(Window.unboundedPreceding, 0))
    return (base.join(F.broadcast(offsets.select(group_col, "__b", "__off")),
                      [group_col, "__b"])
            .withColumn("cum_tokens",
                        (F.col("__off")
                         + F.sum("n_tokens").over(w_local)).cast("long"))
            .where(F.col("cum_tokens") <= budget_tokens)
            .select(F.col(key_col), F.col(group_col), "n_tokens",
                    "cum_tokens"))


def search_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF corpus search: top-k docs for a bag-of-words query.

    The retrieval counterpart to ``inverted_index`` — score(doc) =
    sum over matched query terms of tf(term, doc) * idf_milli(term),
    idf_milli = floor(1000 * ln(N / df)) (integer milli-nats, the same
    cross-engine-exact log trick as functions/lm.py), so scores are
    BIGINT and the (score desc, id asc) top-k is a total order.

    Plan shape: the token explode is pre-filtered to the query terms
    (a literal IN over a handful of strings — the scan output is only
    matching postings, never the corpus tokens); tf is one (id, term)
    groupBy; the per-term df/idf frame has at most len(query_terms)
    rows and broadcasts back onto tf; N rides in as a broadcast 1-row
    aggregate. The final top-k compiles to TakeOrderedAndProject
    (per-partition heap, driver merge of k rows) — no global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = [str(t) for t in query_terms]
    corpus = df.where(F.length(text_col) > 0)
    n_docs = corpus.agg(F.count("*").alias("__n"))
    tf = (corpus
          .select(F.col(id_col),
                  F.explode(F.split(F.col(text_col), " ")).alias("__t"))
          .where(F.col("__t").isin(terms))
          .groupBy(id_col, "__t")
          .agg(F.count("*").cast("long").alias("tf")))
    idf = (tf.groupBy("__t")
           .agg(F.count("*").cast("long").alias("df"))
           .join(F.broadcast(n_docs))
           .select("__t",
                   F.floor(F.lit(1000.0)
                           * F.log(F.col("__n").cast("double")
                                   / F.col("df")))
                   .cast("long").alias("idf_milli")))
    return (tf.join(F.broadcast(idf), "__t")
            .groupBy(id_col)
            .agg(F.sum(F.col("tf") * F.col("idf_milli"))
                 .cast("long").alias("score_milli"),
                 F.count("*").cast("long").alias("n_terms_matched"))
            .orderBy(F.desc("score_milli"), F.asc(id_col))
            .limit(k))


def filter_length_outliers(
    df: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    fence: float = 1.5,
) -> DataFrame:
    """Drop docs whose token length is a Tukey outlier within its group.

    The percentile-cut flavor of the Gopher length rules: per group,
    keep docs with n_tokens in [p25 - fence*IQR, p75 + fence*IQR].
    Exact quartiles (see length_quantiles): the interpolation fractions
    are binary-exact quarters over integer token counts and ``fence``
    defaults to a binary-exact 1.5, so the band edges are the same IEEE
    doubles in any engine — the integer-vs-edge comparisons that decide
    keep/drop are deterministic, not ulp-lottery.

    Scale: one combiner-friendly groupBy collapses the corpus to
    |groups| quantile rows, which broadcast back onto the (unshuffled)
    doc side as a filter — the docs themselves never shuffle.
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = (df.where(F.length(text_col) > 0)
            .withColumn("n_tokens", n_tok))
    pct = F.expr("percentile(CAST(n_tokens AS DOUBLE), "
                 "array(0.25D, 0.75D))")
    bands = (base.groupBy(group_col)
             .agg(F.element_at(pct, 1).alias("__p25"),
                  F.element_at(pct, 2).alias("__p75"))
             .select(group_col,
                     (F.col("__p25")
                      - F.lit(fence) * (F.col("__p75") - F.col("__p25")))
                     .alias("lo"),
                     (F.col("__p75")
                      + F.lit(fence) * (F.col("__p75") - F.col("__p25")))
                     .alias("hi")))
    return (base.join(F.broadcast(bands), group_col)
            .where(F.col("n_tokens").cast("double").between(
                F.col("lo"), F.col("hi")))
            .select(F.col(id_col), F.col(group_col), "n_tokens",
                    F.round("lo", 4).alias("lo"),
                    F.round("hi", 4).alias("hi")))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-level diff between two corpus snapshots (recrawl CDC).

    The incremental-recrawl bookkeeping step: given the previous and
    current snapshot of a corpus keyed by ``key_col``, emit one row per
    key whose content changed — status ``added`` (new only),
    ``removed`` (old only), or ``changed`` (both, md5(text) differs) —
    with both fingerprints. Unchanged keys are dropped (at recrawl
    scale they are ~all the corpus; emitting them would make the diff
    as big as the input). Requires ``key_col`` unique per snapshot —
    duplicate keys would fan out the join.

    Scale: text collapses to a 32-char md5 BEFORE the join, so the
    full-outer shuffle carries (key, fingerprint), never documents —
    at 100 TB the shuffle is ~2% of corpus bytes. With both snapshots
    bucketed by key the exchange disappears entirely.
    """
    o = old.select(F.col(key_col).alias("__k"),
                   F.md5(F.col(text_col)).alias("old_md5"))
    n = new.select(F.col(key_col).alias("__k"),
                   F.md5(F.col(text_col)).alias("new_md5"))
    status = (F.when(F.col("old_md5").isNull(), "added")
              .when(F.col("new_md5").isNull(), "removed")
              .when(F.col("old_md5") != F.col("new_md5"), "changed")
              .otherwise("unchanged"))
    return (o.join(n, "__k", "full_outer")
            .select(F.col("__k").alias(key_col),
                    status.alias("status"), "old_md5", "new_md5")
            .where(F.col("status") != "unchanged"))


def dedup_lines_global(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level exact line dedup (the RefinedWeb / CCNet recipe).

    Boilerplate removal at line granularity: any line occurring in
    >= ``min_docs`` DISTINCT documents ("share on facebook", cookie
    banners, nav menus) is removed from EVERY document; remaining lines
    are reassembled in original order. Lines whose trimmed length is
    below ``min_chars`` (blank separators) never participate and are
    always kept. One row out per row in: (id, cleaned text, n_kept,
    n_removed) — a document whose every line recurs comes back with
    empty text, not silently dropped.

    Reference parity: the reference keeps per-site scrapers clean by
    construction; on raw crawl text this is the standard corpus-level
    substitute (RefinedWeb sec. 3.3 exact line dedup).

    Scale: lines collapse to md5 digests before any wide exchange — the
    distinct-doc count groups by digest (16 bytes + id on the shuffle,
    never line bytes), and the removal is a left_anti equi-join on the
    digest, so Catalyst/AQE broadcasts the (small) recurring-line set
    when it fits and falls back to a hash join when it does not.
    Reassembly is one groupBy(doc) whose state is bounded by the
    largest single document — the same bound the input row itself pays.
    """
    # coalesce NULL text to '': split(NULL) is NULL and posexplode
    # would eliminate the row entirely, silently breaking the
    # one-row-out-per-row-in contract for NULL-text documents
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("__pos", "__line"))
    digested = lines.withColumn("__h", F.md5("__line"))
    dup = (digested
           .where(F.length(F.trim("__line")) >= min_chars)
           .select("__h", id_col).distinct()
           .groupBy("__h").count()
           .where(F.col("count") >= min_docs)
           .select("__h"))
    kept = digested.join(dup, "__h", "left_anti")
    zero = F.lit(0).cast("long")
    agg = (kept.groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__pos", "__line"))),
                        lambda s: s["__line"]),
                    "\n").alias(text_col)))
    totals = (lines.groupBy(id_col)
              .agg(F.count("*").cast("long").alias("__total")))
    return (totals.join(agg, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
                    F.coalesce("n_kept", zero).alias("n_kept"),
                    (F.col("__total") - F.coalesce("n_kept", zero))
                    .cast("long").alias("n_removed")))


def length_quantiles(
    df: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-group token-length quartiles (p25/p50/p75) + count.

    The distribution view length-filter thresholds are tuned against
    (the Gopher length rules are percentile cuts). Exact `percentile`,
    not approx_percentile: the driver's value-hash gate needs
    determinism, and the quartile fractions are binary-exact so the
    p*(n-1) interpolation index is the same IEEE double in any engine.
    At 100 TB swap in approx_percentile(..., accuracy) — same plan
    shape, one combiner-friendly groupBy either way.
    """
    pct = F.expr(
        f"percentile(CAST(size(split({text_col}, ' ')) AS DOUBLE), "
        "array(0.25D, 0.5D, 0.75D))")
    return (df.where(F.length(text_col) > 0)
            .groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.round(F.element_at(pct, 1), 4).alias("p25_tokens"),
                 F.round(F.element_at(pct, 2), 4).alias("p50_tokens"),
                 F.round(F.element_at(pct, 3), 4).alias("p75_tokens")))
