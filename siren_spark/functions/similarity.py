"""Near-duplicate detection and similarity search as engine API.

DataFrame -> DataFrame operators for the dedup/similarity stages of a
training-data pipeline:

- MinHash + LSH banding (Broder 1997): shingle -> minhash signature ->
  band keys -> candidate pairs via an equi-join on band key. Never
  all-pairs; the only shuffle is on band_key, and hot bands (empty or
  boilerplate documents that share every band) are capped so no single
  band goes quadratic inside one task.
- SimHash (Charikar 2002): 16-bit parity variant plus a 64-bit
  signature split into two 32-bit halves (no signed overflow) with a
  pigeonhole Hamming band join for near-dup pairs.
- Embedding LSH (random-hyperplane signs, Indyk–Motwani / Charikar):
  sign-bucket blocking with a configurable plane count and optional
  multi-probe (flip one bit) expansion, for near-dup pairs and for
  top-k similarity search with NO cross join in the plan.
- Exact n-gram Jaccard verification over a candidate-pair frame (the
  verify stage after MinHash candidates).

Everything is built from JVM column expressions (md5 slices, integer
dot products on floor(x*1000) quantized embeddings) so results are
bit-deterministic regardless of partitioning — the driver's DuckDB
value-hash oracle verifies these exact functions.

All hash math is chosen to be expressible in both Spark SQL and DuckDB
(md5 hex slices, not xxhash64) precisely so the oracle gate can check
the real engine code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to default parallelism when the input arrives as
    fewer files (e.g. one small parquet file). At corpus scale the
    condition is false and this is a no-op — no gratuitous shuffle —
    but a single-file test input would otherwise pin the whole
    shingle/token stage to one core.

    ``inputFiles()`` is a metadata listing; the obvious alternative
    (``df.rdd.getNumPartitions()``) forces a DataFrame->RDD conversion
    that costs ~3 s of driver latency per call on a fresh session.
    In-memory frames report no files and pass through untouched.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if 0 < n_files < p:
        return df.repartition(p)
    return df


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    perms: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, m0..m{perms-1}) minhash signature per document.

    ``perms`` permutations come from disjoint 8-hex-char slices of
    md5(s)||md5(s||'#')||md5(s||'##')||... per shingle — each md5 is 32
    hex chars = 4 disjoint slices, so ceil(perms/4) hashes instead of
    ``perms`` (max 16 perms with this suffix family). Documents with
    fewer than ``shingle_size`` tokens are dropped (no shingle exists;
    both SQL dialects agree on this rule).

    Plan shape: the whole shingle -> hash -> per-document min pipeline
    is DOC-LOCAL — a document's shingles all live in its own row — so
    it runs as one ``mapInArrow`` flat map with NO shuffle at all: per
    document, hashlib's C md5 hashes each shingle (bit-identical to
    the JVM/DuckDB ``md5``) and the per-slice minimum is tracked as a
    plain string compare (all slices are fixed-width lowercase hex, so
    lexicographic and numeric order agree). Duplicate shingles are NOT
    deduplicated: ``min`` is idempotent, so repeated shingles cannot
    change any signature. The JVM formulation this replaced exploded
    one row per shingle and aggregated perms mins through a groupBy
    exchange; the flat map removes the exchange and the per-row
    expression overhead (measured ~2x on the LSH-pairs query).
    """
    assert 1 <= perms <= 16, "4 md5s provide 16 disjoint 8-hex slices"
    import pyarrow as pa

    n_hashes = -(-perms // 4)   # each md5 hex digest = 4 slices of 8
    id_dtype = df.schema[id_col].dataType.simpleString()
    suffixes = ["#" * k for k in range(1, n_hashes)]

    def sigs(batches):
        from hashlib import md5

        import numpy as np

        # the 8-hex-char slice at offset 8*k of a digest is exactly the
        # k-th big-endian uint32 of its raw bytes, and lexicographic
        # order on lowercase fixed-width hex == numeric order — so the
        # per-slice minimum is one vectorized u32 column-min over the
        # doc's digest matrix instead of perms Python string compares
        # per shingle (measured 1.8x), formatted back to the identical
        # hex string. Shingles repeat heavily across near-duplicate
        # docs and common phrases: a per-task digest memo (capped so a
        # pathological task cannot hoard memory) removes the repeated
        # md5 calls (a further ~2x on corpora with shared phrasing).
        bsuffixes = [b""] + [s.encode() for s in suffixes]
        cache: dict[str, bytes] = {}
        # ~100 B per entry (digest bytes + shingle string): ~50 MB cap
        cache_cap = 1 << 19
        width = 4 * n_hashes
        for b in batches:
            ids, texts = b.column(0), b.column(1)
            out_ids, out_mins = [], [[] for _ in range(perms)]
            for i, t in enumerate(texts.to_pylist()):
                toks = (t or "").split(" ")
                n_sh = len(toks) - shingle_size + 1
                if n_sh < 1:
                    continue
                digs = bytearray()
                for s0 in range(n_sh):
                    s = " ".join(toks[s0:s0 + shingle_size])
                    d = cache.get(s)
                    if d is None:
                        e = s.encode()
                        d = b"".join(md5(e + suf).digest()
                                     for suf in bsuffixes)
                        if len(cache) < cache_cap:
                            cache[s] = d
                    digs += d
                mat = np.frombuffer(bytes(digs), dtype=">u4")
                mins = mat.reshape(n_sh, width)[:, :perms].min(axis=0)
                out_ids.append(i)
                for j in range(perms):
                    out_mins[j].append("%08x" % mins[j])
            yield pa.record_batch(
                [ids.take(pa.array(out_ids, type=pa.int32()))]
                + [pa.array(m, type=pa.string()) for m in out_mins],
                names=["id"] + [f"m{j}" for j in range(perms)])

    schema = ", ".join([f"id {id_dtype}"]
                       + [f"m{j} string" for j in range(perms)])
    return (_spread(df)
            .select(F.col(id_col).alias("id"), F.col(text_col))
            .mapInArrow(sigs, schema))


def minhash_band_keys(
    sigs: DataFrame,
    *,
    perms: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, b, band_key): LSH banding of a signature frame.

    rows-per-band r = perms/bands; two docs collide in band b iff all r
    minhashes of that band agree — P(candidate) = 1-(1-s^r)^b for
    Jaccard s, the standard S-curve knob.
    """
    assert perms % bands == 0, "perms must split evenly into bands"
    r = perms // bands
    keys = F.array(*[
        F.concat(*[F.col(f"m{b * r + j}") for j in range(r)])
        for b in range(bands)])
    return sigs.select(
        "id", F.posexplode(keys).alias("b", "band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    perms: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    band_cap: int | None = 256,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) via MinHash LSH.

    ``band_cap`` guards the band grouping against hot keys: a band_key
    shared by n documents produces n^2/2 pairs in one task, and at web
    scale the empty/boilerplate band is a single key covering millions
    of documents. Bands larger than the cap are dropped (their members
    are better handled by exact dedup upstream — identical docs share
    *every* band, so a capped band loses nothing that md5-exact dedup
    would not catch). Pass ``band_cap=None`` to disable — with the
    caveat that one degenerate band then materializes its full n^2
    pair array inside a single row.

    Plan shape: ONE pass over the (expensive) shingle->minhash pipeline
    — bands groupBy(b, band_key) into an id list and pairs are expanded
    with JVM array lambdas. The previous band-key self-join referenced
    the signature frame twice, so Catalyst recomputed the whole
    explode/md5/groupBy pipeline for each side (measured ~2x the query
    cost at sf0.1); the groupBy form also gets the hot-band cap for
    free (``size(ids)``) instead of a count window.
    """
    sigs = minhash_signatures(df, id_col, text_col,
                              perms=perms, shingle_size=shingle_size)
    bk = minhash_band_keys(sigs, perms=perms, bands=bands)
    grp = (bk.groupBy("b", "band_key")
           .agg(F.collect_list("id").alias("ids"))
           .where(F.size("ids") >= 2))
    if band_cap is not None:
        grp = grp.where(F.size("ids") <= band_cap)
    # all (x, y) with x < y from the band's id list — set-identical to
    # the old a.id < b.id self-join condition, order-insensitive to the
    # nondeterministic collect_list ordering
    pair_structs = F.filter(
        F.flatten(F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.col("ids"),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))))),
        lambda s: s["doc_a"] < s["doc_b"])
    return (grp.select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.doc_a").cast("long").alias("doc_a"),
                    F.col("p.doc_b").cast("long").alias("doc_b"))
            .distinct())


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Exact token-set Jaccard for candidate (doc_a, doc_b) pairs.

    The verify stage after LSH blocking: joins each side to its token
    set (two hash joins on doc id — never all-pairs) and computes
    |A∩B| / |A∪B| exactly. ``min_jaccard`` filters confirmed pairs.
    """
    toksets = df.select(F.col(id_col).alias("__id"),
                        F.array_distinct(F.split(F.col(text_col), " "))
                        .alias("__toks"))
    ta = toksets.select(F.col("__id").alias("doc_a"),
                        F.col("__toks").alias("__ta"))
    tb = toksets.select(F.col("__id").alias("doc_b"),
                        F.col("__toks").alias("__tb"))
    out = (pairs.join(ta, "doc_a").join(tb, "doc_b")
           .select(
               F.col("doc_a").cast("long").alias("doc_a"),
               F.col("doc_b").cast("long").alias("doc_b"),
               F.round(
                   F.size(F.array_intersect("__ta", "__tb")).cast("double")
                   / F.size(F.array_union("__ta", "__tb")).cast("double"),
                   4).alias("jaccard")))
    if min_jaccard is not None:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out


def edit_distance_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    prefix_chars: int = 256,
    min_sim_milli: int | None = None,
) -> DataFrame:
    """Exact Levenshtein verification for candidate (doc_a, doc_b) pairs.

    The character-level sibling of ``jaccard_verify``: after LSH/SimHash
    blocking proposes candidates, confirm with edit distance over a
    bounded document prefix (``prefix_chars`` caps the O(n*m) DP cost —
    full-document Levenshtein at web scale is quadratic in a 100 KB
    page, the prefix is the standard compromise). All math is JVM-side
    (`F.levenshtein`, whole-stage codegen) — no Python on the hot path.

    Outputs per pair: ``lev`` (distance), ``max_len`` (longer prefix),
    and ``sim_milli`` = floor(1000 * (max_len - lev) / max_len), an
    integer similarity in [0, 1000] that is bit-exact across engines
    (pure integer division — no float accumulation). Two empty prefixes
    are identical (sim 1000). ``min_sim_milli`` filters confirmed pairs.

    Scale: two hash joins on doc id (never all-pairs), then a flat map.
    """
    sides = df.select(
        F.col(id_col).alias("__id"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("__t"))
    ta = sides.select(F.col("__id").alias("doc_a"), F.col("__t").alias("__pa"))
    tb = sides.select(F.col("__id").alias("doc_b"), F.col("__t").alias("__pb"))
    lev = F.levenshtein("__pa", "__pb").cast("long")
    max_len = F.greatest(F.length("__pa"), F.length("__pb")).cast("long")
    out = (pairs.join(ta, "doc_a").join(tb, "doc_b")
           .select(
               F.col("doc_a").cast("long").alias("doc_a"),
               F.col("doc_b").cast("long").alias("doc_b"),
               lev.alias("lev"),
               max_len.alias("max_len"),
               F.when(max_len == 0, F.lit(1000).cast("long"))
                .otherwise(F.floor((F.lit(1000) * (max_len - lev)) / max_len))
                .alias("sim_milli")))
    if min_sim_milli is not None:
        out = out.where(F.col("sim_milli") >= min_sim_milli)
    return out


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 16,
) -> DataFrame:
    """Exact duplicate-span detection per document (the scalable
    fixed-window variant of exact substring dedup, Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    Every ``window``-token sliding window of every document is
    fingerprinted (md5 over the space-joined tokens — the same
    DuckDB-expressible hash family as the MinHash stage), and a window
    occurrence counts as duplicated when the same fingerprint appears
    in at least one OTHER document (same-document repeats are not
    duplication). Output, one row per input document:

    - ``n_windows``     total sliding windows (0 for docs shorter than
      ``window`` tokens),
    - ``n_dup_windows`` occurrences of cross-document-shared windows,
    - ``dup_frac``      their ratio (0.0 when there are no windows) —
      the per-document drop/trim signal.

    A suffix array finds arbitrary-length duplicated spans; the fixed
    window is the standard distributed approximation (any duplicated
    span of >= ``window`` tokens is caught, shorter ones are not).

    Plan shape — no join back to the exploded frame and no all-pairs
    anywhere: explode -> groupBy (fingerprint, doc) -> count-over-window
    partitioned by fingerprint (rows are one per (fingerprint, doc)
    after the groupBy, so plain COUNT(*) IS the distinct-doc count) ->
    groupBy doc -> one broadcast-able join onto the per-doc base. Every
    shuffle carries only (32-char fingerprint, id, count) rows — never
    document text — keyed by fingerprint then id, the same exchange
    family as the MinHash band join.
    """
    df = _spread(df)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    fps = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - window + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col),
        F.greatest(F.size(toks) - window + 1, F.lit(0))
         .cast("long").alias("n_windows"),
        fps.alias("__fps"),
    )
    occ = (base.select(id_col, F.explode("__fps").alias("__fp"))
           .groupBy("__fp", id_col).agg(F.count("*").alias("__c")))
    dup = (occ
           .withColumn("__nd", F.count("*").over(
               Window.partitionBy("__fp")))
           .where(F.col("__nd") > 1)
           .groupBy(id_col).agg(F.sum("__c").alias("__ndup")))
    return (base.select(id_col, "n_windows")
            .join(dup, id_col, "left")
            .select(
                F.col(id_col),
                F.col("n_windows"),
                F.coalesce(F.col("__ndup"), F.lit(0))
                 .cast("long").alias("n_dup_windows"),
                F.round(
                    F.when(F.col("n_windows") > 0,
                           F.coalesce(F.col("__ndup"), F.lit(0))
                           / F.col("n_windows"))
                    .otherwise(F.lit(0.0)), 4).alias("dup_frac")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_map(df: DataFrame, id_col: str, text_col: str,
                 n_hex: int, n_bits: int, out_fn) -> DataFrame:
    """Shared doc-local simhash kernel: one ``mapInArrow`` flat map.

    A document's simhash depends only on its own distinct tokens, so
    the old explode -> md5 -> groupBy(doc) pipeline shuffled one row
    per (doc, token) only to reassemble rows that never needed to come
    apart. This computes the ±1 bit sums per document in NumPy with NO
    shuffle at all; a per-task token -> bit-vector memo removes
    repeated md5/bit-expansion for the (Zipf-repetitive) vocabulary.
    Bit maths replicate the JVM/oracle exactly: h = the integer of the
    token md5's first ``n_hex`` hex chars, bit i of h contributes +1
    iff h & (1 << i), ties (sum == 0) are 0-bits; callers map h's bit
    indices onto their output words. ``out_fn(sums) -> list of output
    column arrays`` packs the per-doc sums; empty-string tokens hash
    like any other (split semantics), NULL text drops the row
    (explode-of-null semantics).
    """
    import numpy as np
    import pyarrow as pa

    n_out = len(out_fn(np.zeros((0, n_bits), dtype=np.int64)))
    names = ["doc_id"] + [f"c{j}" for j in range(n_out)]

    def batches_fn(batches):
        from hashlib import md5

        import pyarrow.compute as pc
        memo: dict[str, object] = {}
        shifts = np.arange(n_bits, dtype=np.uint64)
        for b in batches:
            ids, texts = b.column(0), b.column(1)
            out_ids, out_sums = [], []
            for i, t in enumerate(texts.to_pylist()):
                if t is None:
                    continue
                acc = np.zeros(n_bits, dtype=np.int64)
                for tok in set(t.split(" ")):
                    v = memo.get(tok)
                    if v is None:
                        h = int(md5(tok.encode()).hexdigest()[:n_hex], 16)
                        v = (((h >> shifts) & 1) * 2 - 1).astype(np.int64)
                        # ~0.5 KB per 64-bit entry: cap keeps a
                        # diverse-vocab task under ~70 MB of memo
                        if len(memo) < (1 << 17):
                            memo[tok] = v
                    acc += v
                out_ids.append(i)
                out_sums.append(acc)
            sums = (np.array(out_sums) if out_sums
                    else np.zeros((0, n_bits), dtype=np.int64))
            yield pa.record_batch(
                [pc.cast(ids.take(pa.array(out_ids, type=pa.int32())),
                         pa.int64())] + out_fn(sums),
                names=names)

    schema = ", ".join(["doc_id long"]
                       + [f"c{j} long" for j in range(n_out)])
    return (_spread(df)
            .select(F.col(id_col), F.col(text_col))
            .mapInArrow(batches_fn, schema))


def _pack_bits(sums, lo: int, hi: int):
    """Unsigned value from sign bits lo..hi-1 of the per-doc sum rows."""
    import numpy as np
    weights = (np.uint64(1) << np.arange(hi - lo, dtype=np.uint64))
    return pa_int64((sums[:, lo:hi] > 0) @ weights.astype(np.int64))


def pa_int64(arr):
    import pyarrow as pa
    return pa.array(arr.astype("int64"), type=pa.int64())


def simhash16(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, simhash16): 16-bit parity simhash over distinct tokens.

    Kept for oracle parity and tiny corpora; 16 bits saturate around
    10^5 documents — use :func:`simhash64` beyond that.

    Doc-local ``mapInArrow`` pass (see :func:`_simhash_map`) — no
    shuffle; the JVM 16-conditional-sum groupBy formulation this
    replaced paid a (doc, token)-row exchange for math each doc can do
    alone. Bit parity identical: h is the uint32 of md5 hex chars 1-8
    and bits 0..15 (its LOW half) are tested, exactly the old
    ``h & (1 << i)``.
    """
    out = _simhash_map(df, id_col, text_col, 8, 16,
                       lambda s: [_pack_bits(s, 0, 16)])
    return out.select("doc_id", F.col("c0").alias("simhash16"))


def simhash64(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, sim_hi, sim_lo): 64-bit simhash as two 32-bit halves.

    Two unsigned-32 halves avoid signed-BIGINT overflow at bit 63 in
    both Spark and DuckDB. Hash source: md5 hex slices (chars 1-8 ->
    low half bits, 9-16 -> high half bits), so the oracle can replicate
    bit-for-bit. Same doc-local ``mapInArrow`` shape as
    :func:`simhash16` — no shuffle, per-task token memo. h here is the
    integer of the first 16 hex chars, so h's HIGH word (bits 32..63)
    is hlo (chars 1-8 -> sim_lo) and its LOW word (bits 0..31) is hhi
    (chars 9-16 -> sim_hi).
    """
    out = _simhash_map(df, id_col, text_col, 16, 64,
                       lambda s: [_pack_bits(s, 0, 32),
                                  _pack_bits(s, 32, 64)])
    return out.select("doc_id", F.col("c0").alias("sim_hi"),
                      F.col("c1").alias("sim_lo"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with 64-bit simhash distance <=
    ``max_hamming``.

    Blocking: the 64-bit signature splits into n_chunks equal slices,
    where n_chunks is the smallest of 4/8/16/32/64 with
    n_chunks >= max_hamming + 1 — by pigeonhole any pair within the
    distance bound agrees on at least one chunk, so candidates come
    from n_chunks equi-joins on (chunk_idx, chunk_value) — never
    all-pairs — then verify with bit_count. (Deriving the chunk count
    from max_hamming keeps the bound sound for every argument; a fixed
    4x16 split silently loses pairs at max_hamming >= 4. More chunks =
    shorter chunks = weaker blocking, so large distances cost more
    candidates — the intrinsic simhash trade.)
    """
    assert 0 <= max_hamming <= 63, "64-bit signature bounds the distance"
    sig = simhash64(df, id_col, text_col)
    n_chunks = next(c for c in (4, 8, 16, 32, 64) if c >= max_hamming + 1)
    width = 64 // n_chunks
    mask = (1 << width) - 1
    per_half = 32 // width
    chunks = F.array(*[
        F.shiftright(half, j * width).bitwiseAND(F.lit(mask))
        for half in ("sim_lo", "sim_hi")
        for j in range(per_half)])
    blocked = sig.select("doc_id", "sim_hi", "sim_lo",
                         F.posexplode(chunks).alias("c", "ck"))
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = (F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
           + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))))
    return (a.join(b, [F.col("a.c") == F.col("b.c"),
                       F.col("a.ck") == F.col("b.ck"),
                       F.col("a.doc_id") < F.col("b.doc_id")])
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.first(ham).alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", F.col("hamming").cast("long")
                    .alias("hamming")))


# ---------------------------------------------------------------------------
# Embedding LSH (sign-random-projection) — near-dup + top-k search
# ---------------------------------------------------------------------------

# plane multipliers: the weight pattern is a function of mult mod 13,
# so the 12 usable planes are exactly the 12 distinct non-zero residues.
# The first four stay (1,2,3,5) — they are pinned by the DuckDB oracles.
_PLANE_MULTS = [1, 2, 3, 5, 4, 6, 7, 8, 9, 10, 11, 12]
assert len({m % 13 for m in _PLANE_MULTS}) == len(_PLANE_MULTS)


def quantize_embedding(emb: Column) -> Column:
    """floor(x*1000) as BIGINT — exact integer dot products downstream,
    deterministic under any aggregation order."""
    return F.transform(
        emb, lambda x: F.floor(x.cast("double") * 1000).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def _plane_weights(ev: Column, mult: int) -> Column:
    """Deterministic pseudo-random hyperplane: w[i] = (i*mult+7)%13-6."""
    return F.transform(F.sequence(F.lit(0), F.size(ev) - 1),
                       lambda i: ((i * mult + 7) % 13 - 6).cast("long"))


def embedding_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    n_planes: int = 4,
) -> DataFrame:
    """(vec_id, ev, bucket): sign-LSH bucket id from ``n_planes``
    deterministic hyperplanes (plane p contributes bit 2^(n-1-p) when
    the projection is positive). 2·log2(N) planes keep expected bucket
    size ~sqrt-ish at corpus size N; max 12 planes with this weight
    family."""
    assert 1 <= n_planes <= len(_PLANE_MULTS)
    ev = quantize_embedding(F.col(emb_col)).alias("ev")
    base = df.select(F.col(id_col).alias("vec_id"), ev)
    bucket = F.lit(0)
    for p in range(n_planes):
        d = _dot(F.col("ev"), _plane_weights(F.col("ev"), _PLANE_MULTS[p]))
        bucket = bucket + F.when(d > 0,
                                 F.lit(1 << (n_planes - 1 - p))).otherwise(0)
    return base.withColumn("bucket", bucket.cast("long"))


def _cosine(a: Column, b: Column) -> Column:
    return (F.round(_dot(a, b).cast("double")
                    / F.sqrt(_dot(a, a).cast("double")
                             * _dot(b, b).cast("double")), 6))


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    threshold: float = 0.35,
    n_planes: int = 4,
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold, blocked by
    sign-LSH bucket (pairs only form inside a bucket — the 10^10-scale
    shape; raise ``n_planes`` toward 2·log2(N) as the corpus grows so
    buckets stay sub-quadratic).

    ``bucket_cap`` bounds the within-bucket self-join the same way
    minhash's band_cap does: a degenerate bucket (e.g. a zero-vector
    pile, or too few planes for the corpus) would otherwise go
    quadratic inside one task; buckets above the cap are dropped — the
    signal to raise ``n_planes``, not to eat the join."""
    bb = embedding_lsh_buckets(df, id_col, emb_col, n_planes=n_planes)
    if bucket_cap is not None:
        w = Window.partitionBy("bucket")
        bb = (bb.withColumn("__n", F.count(F.lit(1)).over(w))
              .where(F.col("__n") <= bucket_cap).drop("__n"))
    x, y = bb.alias("x"), bb.alias("y")
    raw = (_dot(F.col("x.ev"), F.col("y.ev")).cast("double")
           / F.sqrt(_dot(F.col("x.ev"), F.col("x.ev")).cast("double")
                    * _dot(F.col("y.ev"), F.col("y.ev")).cast("double")))
    return (x.join(y, [F.col("x.bucket") == F.col("y.bucket"),
                       F.col("x.vec_id") < F.col("y.vec_id")])
            .select(F.col("x.vec_id").cast("long").alias("vec_a"),
                    F.col("y.vec_id").cast("long").alias("vec_b"),
                    F.round(raw, 6).alias("cosine"),
                    raw.alias("__raw"))
            .where(F.col("__raw") >= threshold)   # threshold pre-rounding
            .drop("__raw"))


def ann_lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    query_filter: Column,
    k: int = 3,
    n_planes: int = 4,
    multiprobe: bool = True,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(q_id, vec_id, cosine): top-k neighbors per query via LSH
    blocking — the scale path: NO cross join anywhere in the plan.

    Queries probe their own bucket plus (``multiprobe``) every
    one-bit-flip neighbor bucket, then candidates are scored exactly
    and ranked. Recall vs brute force is a function of n_planes ×
    multiprobe; the test suite pins it against the brute-force oracle.

    ``bucket_cap`` guards the probe join the same way
    :func:`embedding_near_dups` guards its self-join: one degenerate
    corpus bucket (zero vectors, or too few planes for the corpus)
    would otherwise be scanned by every probing query. Buckets above
    the cap are dropped from the CANDIDATE side only — queries keep
    probing their other buckets; an over-cap bucket is the signal to
    raise ``n_planes``. The cap is OPT-IN (default ``None``) because a
    dropped bucket silently lowers recall: true nearest neighbors
    living in an over-cap bucket vanish from the top-k with no error.
    At cluster scale pass an explicit cap (e.g. 4096) sized so
    probes x cap stays within a task's memory, and monitor recall.

    .. versionchanged:: round 4
       ``bucket_cap`` default changed from 4096 to ``None``: the old
       default silently dropped true neighbors living in over-cap
       buckets. Callers that relied on the implicit cap must now pass
       ``bucket_cap=4096`` explicitly (and accept the recall loss it
       implies); callers that pass nothing get exact candidate
       coverage at the cost of unbounded bucket size.
    """
    bb = embedding_lsh_buckets(df, id_col, emb_col, n_planes=n_planes)
    qs = bb.where(query_filter)
    if bucket_cap is not None:
        w_cap = Window.partitionBy("bucket")
        bb = (bb.withColumn("__n", F.count(F.lit(1)).over(w_cap))
              .where(F.col("__n") <= bucket_cap).drop("__n"))
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
              for p in range(n_planes)])
    else:
        probes = F.array(F.col("bucket"))
    q = qs.select(F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"),
                  F.explode(probes).alias("bucket"))
    cand = (q.join(bb, "bucket")
            .where(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "qv", "vec_id", "ev")
            .distinct())        # a candidate may appear via several probes
    scored = cand.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        _cosine(F.col("qv"), F.col("ev")).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn"))


def ann_brute_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    query_filter: Column,
    k: int = 3,
) -> DataFrame:
    """(q_id, vec_id, cosine): EXACT top-k neighbors per query by
    brute-force scoring — the ground-truth sibling of
    :func:`ann_lsh_topk` (recall harnesses, small query sets over a
    large corpus).

    The query set is collected to the driver (model-sized, like k-means
    centroids — keep it small; it is shipped in the task closure) with
    its vectors already JVM-quantized; every corpus batch is then scored
    in ONE NumPy int64 matrix multiply inside ``mapInArrow`` (guide
    shape: let Spark do distribution + I/O, hand whole Arrow batches to
    vectorized native code). Integer dot products on floor(x*1000)
    quantized vectors are exact under any order, and the final
    ``cosine`` is the same JVM expression the SQL formulation uses
    (ROUND(dot / sqrt(nq*ne), 6)) — bit-identical results, ~10x less
    per-row overhead than interpreted array lambdas over a cross join.

    Scale: the corpus is scanned once, never shuffled; the only
    exchange carries (q_id, vec_id, cosine) rows already reduced to
    top-k per query per task by WindowGroupLimit.
    """
    import numpy as np
    import pyarrow as pa

    q_rows = (df.where(query_filter)
              .select(F.col(id_col).cast("long").alias("q_id"),
                      quantize_embedding(F.col(emb_col)).alias("qv"))
              .collect())
    if not q_rows:
        raise ValueError("query_filter selected no rows")
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["qv"] for r in q_rows], dtype=np.int64)
    nq = (qm * qm).sum(axis=1)
    n_q = len(q_ids)

    def score(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            flat = (b.column(1).flatten()
                    .to_numpy(zero_copy_only=False).astype(np.float64))
            ev = np.floor(flat * 1000.0).astype(np.int64).reshape(n, -1)
            dots = ev @ qm.T                      # (n, n_q) exact int64
            ne = (ev * ev).sum(axis=1)
            vec_id = np.repeat(ids.astype(np.int64), n_q)
            qid = np.tile(q_ids, n)
            keep = qid != vec_id
            yield pa.record_batch(
                [pa.array(qid[keep]), pa.array(vec_id[keep]),
                 pa.array(dots.reshape(-1)[keep]),
                 pa.array(np.tile(nq, n)[keep]),
                 pa.array(np.repeat(ne, n_q)[keep])],
                names=["q_id", "vec_id", "dot", "nq", "ne"])

    # no _spread here: repartitioning shuffles the embedding arrays
    # themselves, and that costs more than the single-task Python pass
    # saves (measured 0.40s -> 0.57s on a one-row-group input at sf1.0)
    scored = (df.select(F.col(id_col).cast("long").alias("vec_id"),
                        F.col(emb_col))
              .mapInArrow(score,
                          "q_id long, vec_id long, dot long, "
                          "nq long, ne long"))
    cosine = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("nq").cast("double") * F.col("ne").cast("double")), 6)
    out = scored.select("q_id", "vec_id", cosine.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (out.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn"))


def ann_ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    *,
    query_filter: Column,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """(q_id, vec_id, cosine): top-k neighbors via an IVF index.

    Coarse quantizer: the first ``n_centroids`` vectors (by id) act as
    centroids — the deterministic stand-in for training the quantizer
    on a sample, chosen so the DuckDB oracle can re-derive it exactly.
    Every vector is assigned to its nearest centroid (exact integer
    cosine, ties to the lowest centroid id); queries probe their
    ``nprobe`` nearest cells and score candidates exactly.

    Plan note: the assignment stage deliberately scores all
    ``n_centroids`` per vector through a broadcast of the K-row
    centroid table — O(N·K) with tiny constant K is intrinsic to IVF
    assignment and is NOT an all-pairs corpus join. The candidate join
    is an equi-join on cell id.
    """
    e = df.select(F.col(id_col).alias("vec_id"),
                  quantize_embedding(F.col(emb_col)).alias("ev"))
    cents = (e.where(F.col("vec_id") < n_centroids)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("ev").alias("cv")))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "ev", "cent_id",
        _cosine(F.col("ev"), F.col("cv")).alias("ccos"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"),
                                             F.asc("cent_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    db = (ranked.where(F.col("rn") == 1)
          .select("vec_id", "ev", F.col("cent_id").alias("cell")))
    qs = (ranked.where(query_filter & (F.col("rn") <= nprobe))
          .select(F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"),
                  F.col("cent_id").alias("cell")))
    cand = (qs.join(db, "cell")
            .where(F.col("q_id") != F.col("vec_id")))
    out = cand.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        _cosine(F.col("qv"), F.col("ev")).alias("cosine"))
    wk = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                            F.asc("vec_id"))
    return (out.withColumn("rn", F.row_number().over(wk))
            .where(F.col("rn") <= k).drop("rn"))


# ---------------------------------------------------------------------------
# Near-dup cluster resolution: pairs -> connected components -> keep-list
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014): every node links each strictly
    larger neighbor to the minimum of its closed neighborhood. Edges in
    and out hold the (u > v) orientation invariant."""
    sym = e.unionByName(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m")))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node links its smaller neighbors (and
    itself) to the minimum of that set. Input/output oriented u > v."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    relink = (e.join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_edge = mins.select("u", F.col("m").alias("v"))
    return (relink.unionByName(self_edge)
            .where(F.col("u") != F.col("v"))
            .distinct())


def dedup_components(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
    max_iters: int = 32,
) -> DataFrame:
    """(doc_id, component_id, is_canonical): connected components over a
    near-duplicate pair frame, with one canonical keeper per cluster —
    the last stage of a production dedup (CCNet/DataComp-style): LSH
    emits pairs, this turns pairs into a keep-list.

    Algorithm: alternating large-star/small-star joins (Kiveris et al.
    2014) — converges in O(log N) rounds, every round is two shuffles
    on node id, and NO driver state beyond the O(1) convergence probe.
    component_id = min doc id of the component; is_canonical marks the
    row to keep (1) vs drop (0), as BIGINT so both SQL dialects hash
    identically.

    ``ids`` (optional, one ``id_col`` column) adds singleton documents —
    docs in no pair — as their own canonical component, so the output is
    a total keep-list over the corpus, not just over paired docs.

    Doc ids must be integral (they are ``cast('long')``; a non-numeric
    string id becomes NULL and its edges silently vanish — hash string
    ids to int64 first, e.g. ``F.xxhash64``). Raises ``RuntimeError``
    if the loop fails to reach a fixed point within ``max_iters``.

    Each iteration localCheckpoints the edge frame: iterative self-joins
    otherwise double the lineage every round (exponential plan-analysis
    cost). On a cluster, point ``spark.sparkContext.setCheckpointDir``
    at durable storage and swap for ``checkpoint`` if executor loss
    during the (short) iteration window matters.
    """
    e = (pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("u"),
            F.least(F.col(a_col), F.col(b_col)).cast("long").alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iters):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # converged when the edge multiset is unchanged: equal counts
        # plus an empty one-sided difference (both frames are distinct)
        n_prev, n_next = e.count(), nxt.count()
        changed = (n_prev != n_next
                   or nxt.exceptAll(e).limit(1).count() > 0)
        e = nxt
        if not changed:
            converged = True
            break
    if not converged:
        # the post-loop star extraction is only valid at a fixed point;
        # a non-converged edge set would yield silently wrong
        # component_id/is_canonical — fail loudly instead (the
        # algorithm converges in O(log N) rounds, so hitting 32 means
        # pathological input such as ids overflowing the long cast)
        raise RuntimeError(
            f"dedup_components did not converge within {max_iters} "
            f"large-star/small-star iterations; raise max_iters")
    # at convergence every component is a star rooted at its min id
    members = e.select(F.col("u").alias(id_col),
                       F.col("v").alias("component_id"))
    roots = e.select(F.col("v").alias(id_col),
                     F.col("v").alias("component_id")).distinct()
    comp = (members.unionByName(roots)
            .groupBy(id_col).agg(F.min("component_id").alias("component_id")))
    if ids is not None:
        universe = ids.select(F.col(id_col).cast("long").alias(id_col))
        comp = (universe.join(comp, id_col, "left")
                .select(id_col,
                        F.coalesce(F.col("component_id"), F.col(id_col))
                        .alias("component_id")))
    return comp.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col("component_id").cast("long").alias("component_id"),
        F.when(F.col(id_col) == F.col("component_id"), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("is_canonical"))


__all__ = ["minhash_signatures", "minhash_band_keys", "minhash_lsh_pairs",
           "jaccard_verify", "edit_distance_verify",
           "simhash16", "simhash64", "simhash_near_dups",
           "quantize_embedding", "embedding_lsh_buckets",
           "embedding_near_dups", "ann_lsh_topk", "ann_brute_topk",
           "ann_ivf_topk",
           "dedup_components"]
