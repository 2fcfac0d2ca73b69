"""Partitioned Bloom URL-seen set (build: mapInArrow; probe: pandas UDF).

The scale analog of the reference's ``set()`` / ``done`` dedup
(mirror.py:33-39,106-108; ht.py:242-247,261-268). At 10^10 URLs an exact
anti-join shuffles the full frontier against the full seen table every
round; the Bloom sidecar makes the common case (definitely-new URL) a
map-side vectorized bit test, and only the "maybe seen" sliver — bloom
positives, |sliver| ≈ |true dups| + fpr·|frontier| — pays the exact
anti-join, which guards against Bloom false positives silently dropping
URLs (SURVEY.md §4.3).

Design notes for cluster scale:
- hashes (xxhash64) are computed JVM-side; Python only ever sees int64
  numpy arrays — no per-row string crossings.
- the filter is bucketed by ``hash % buckets``. Two probe paths:
  * **broadcast** (small filters): partials OR-combine on the driver and
    the whole filter broadcasts — every executor holds all buckets.
    Right up to ~tens of MB of total bitmap; beyond that it is NOT the
    scale path (10^10 URLs needs ~12.5 GB of bitmap, and broadcasting
    that to every executor — or OR-merging it on the driver — is
    exactly the bottleneck bucketing is supposed to avoid).
  * **bucketed** (the 10^10 path): the filter lives as a DataFrame of
    (bucket, bitmap) rows, maintained by a distributed OR-reduce
    (``or_reduce_bitmaps``) with no driver copy, and the probe cogroups
    the frontier with the bitmap table on bucket id
    (``probe_bloom_bucketed``) so each task receives exactly its
    bucket's bitmap — per-task filter bytes = one bucket (e.g. 12 MB of
    a 12.5 GB filter at 1024 buckets), at the cost of one shuffle of
    the (narrow) frontier by bucket.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED2 = 0x9E3779B9  # second hash = xxhash64(col, seed2) for double hashing


@dataclass
class BloomFilter:
    """Bucketed Bloom filter over xxhash64 keys (double hashing)."""

    bits_per_bucket: int
    num_hashes: int
    buckets: int
    bitmaps: dict[int, np.ndarray]  # bucket -> uint8 bitmap

    def might_contain_np(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        m = self.bits_per_bucket
        bucket_ids = (h1.astype(np.uint64) % np.uint64(self.buckets)).astype(np.int64)
        out = np.ones(len(h1), dtype=bool)
        for b in np.unique(bucket_ids):
            bm = self.bitmaps.get(int(b))
            sel = bucket_ids == b
            if bm is None:
                out[sel] = False
                continue
            acc = np.ones(sel.sum(), dtype=bool)
            hh1 = h1[sel].astype(np.uint64)
            hh2 = h2[sel].astype(np.uint64)
            for i in range(self.num_hashes):
                idx = (hh1 + np.uint64(i) * hh2) % np.uint64(m)
                acc &= (bm[(idx >> np.uint64(3)).astype(np.int64)]
                        >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
            out[sel] = acc
        return out


def merge_blooms(a: BloomFilter | None, b: BloomFilter) -> BloomFilter:
    """OR-combine two filters built with identical parameters.

    Lets the crawl loop maintain one running filter incrementally —
    each round builds a small filter over its seen-delta only and ORs it
    in, instead of rescanning the whole seen history (at 10^10 URLs the
    history scan would dominate every round)."""
    if a is None:
        return b
    assert (a.bits_per_bucket, a.num_hashes, a.buckets) == (
        b.bits_per_bucket, b.num_hashes, b.buckets)
    merged = dict(a.bitmaps)
    for k, bm in b.bitmaps.items():
        merged[k] = (merged[k] | bm) if k in merged else bm
    return BloomFilter(a.bits_per_bucket, a.num_hashes, a.buckets, merged)


def _hash_cols(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn("__h1", F.xxhash64(F.col(col))).withColumn(
        "__h2", F.xxhash64(F.col(col), F.lit(_SEED2))
    )


def build_bloom_partials(
    df: DataFrame,
    col: str,
    *,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 5,
    buckets: int = 16,
) -> DataFrame:
    """Distributed Bloom build: (bucket, bitmap) rows, one per bucket.

    Rows shuffle to their bucket first so each task emits exactly one
    partial bitmap: total volume = B * m/8 bytes, independent of input
    partitioning (without this, partials = partitions x buckets bitmaps).
    The result is a DataFrame — callers either ``collect()`` it into a
    driver-side :class:`BloomFilter` (small filters, broadcast probe) or
    keep it distributed and OR-merge with :func:`or_reduce_bitmaps`
    (the 10^10 path — the driver never holds a bitmap).
    """
    hashed = _hash_cols(df.select(col), col).select("__h1", "__h2")
    m = bits_per_bucket
    k = num_hashes
    B = buckets
    hashed = hashed.repartition(B, F.pmod(F.col("__h1"), F.lit(B)))

    def build(batches):
        local: dict[int, np.ndarray] = {}
        for batch in batches:
            h1 = batch.column("__h1").to_numpy(zero_copy_only=False).astype(np.uint64)
            h2 = batch.column("__h2").to_numpy(zero_copy_only=False).astype(np.uint64)
            bucket_ids = (h1 % np.uint64(B)).astype(np.int64)
            for b in np.unique(bucket_ids):
                bm = local.setdefault(int(b), np.zeros(m // 8, dtype=np.uint8))
                sel = bucket_ids == b
                hh1, hh2 = h1[sel], h2[sel]
                for i in range(k):
                    idx = (hh1 + np.uint64(i) * hh2) % np.uint64(m)
                    np.bitwise_or.at(
                        bm,
                        (idx >> np.uint64(3)).astype(np.int64),
                        (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                    )
        if local:
            yield pa.RecordBatch.from_pydict({
                "bucket": pa.array(list(local.keys()), pa.int32()),
                "bitmap": pa.array([bm.tobytes() for bm in local.values()],
                                   pa.binary()),
            })

    return hashed.mapInArrow(build, "bucket int, bitmap binary")


def or_reduce_bitmaps(partials: DataFrame) -> DataFrame:
    """OR-combine (bucket, bitmap) partials per bucket, distributedly.

    The reduce shuffles only bitmap bytes (B rows), never URL rows, and
    no single process ever holds more than one bucket's partials — this
    is how the running filter is maintained at sizes where a driver-side
    merge (``merge_blooms``) would hold the full multi-GB filter.
    """
    def orit(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitmap"]]
        return pd.DataFrame({"bucket": [pdf["bucket"].iloc[0]],
                             "bitmap": [np.bitwise_or.reduce(arrs).tobytes()]})

    return partials.groupBy("bucket").applyInPandas(
        orit, "bucket int, bitmap binary")


def probe_bloom_bucketed(
    df: DataFrame,
    bitmaps: DataFrame,
    key: str = "url_canon",
    *,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 5,
    buckets: int = 16,
    out_col: str = "__maybe",
) -> DataFrame:
    """Bucket-pruned Bloom probe: cogroup frontier rows with their
    bucket's bitmap so each task deserializes exactly ONE bucket's
    filter bytes (vs the broadcast probe, where every executor holds
    every bucket). Costs one shuffle of the (narrow) frontier by bucket
    — the trade that wins once the total filter exceeds broadcast size.

    Adds boolean ``out_col``; rows in buckets with no bitmap are
    definitely-new (False).
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    m, k, B = bits_per_bucket, num_hashes, buckets
    dfh = _hash_cols(df, key).withColumn(
        "__bucket", F.pmod(F.col("__h1"), F.lit(B)).cast("int"))
    out_schema = StructType(
        dfh.schema.fields + [StructField(out_col, BooleanType())])
    in_cols = [f.name for f in dfh.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=[*in_cols, out_col])
        # cogroup semantics guarantee at most one bitmap row per bucket
        # (or_reduce_bitmaps emits one row per bucket) — this assert IS
        # the per-task-bytes-=-one-bucket claim, enforced at runtime
        assert len(right) <= 1, f"got {len(right)} bitmaps for one bucket"
        if len(right) == 0:
            left[out_col] = False
            return left
        bm = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
        h1 = left["__h1"].to_numpy(dtype=np.int64).astype(np.uint64)
        h2 = left["__h2"].to_numpy(dtype=np.int64).astype(np.uint64)
        acc = np.ones(len(left), dtype=bool)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            acc &= (bm[(idx >> np.uint64(3)).astype(np.int64)]
                    >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        left[out_col] = acc
        return left

    probed = (dfh.groupBy("__bucket")
              .cogroup(bitmaps.groupBy("bucket"))
              .applyInPandas(probe, out_schema))
    return probed.drop("__h1", "__h2", "__bucket")


def build_bloom(
    df: DataFrame,
    col: str,
    *,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 5,
    buckets: int = 16,
) -> BloomFilter:
    """Driver-side :class:`BloomFilter` for the broadcast probe path
    (small filters). Collected volume = B * m/8 bytes."""
    partials = build_bloom_partials(
        df, col, bits_per_bucket=bits_per_bucket,
        num_hashes=num_hashes, buckets=buckets).collect()
    bitmaps: dict[int, np.ndarray] = {}
    for row in partials:
        bm = np.frombuffer(row.bitmap, dtype=np.uint8)
        if row.bucket in bitmaps:
            bitmaps[row.bucket] = bitmaps[row.bucket] | bm
        else:
            bitmaps[row.bucket] = bm.copy()
    return BloomFilter(bits_per_bucket, num_hashes, buckets, bitmaps)


def filter_unseen(
    frontier: DataFrame,
    seen: DataFrame | None,
    *,
    key: str = "url_canon",
    bloom: bool = True,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 5,
    buckets: int = 16,
) -> DataFrame:
    """Rows of ``frontier`` whose ``key`` is not in ``seen``.

    Bloom path: definitely-new rows (bloom negative) pass with zero
    shuffle; maybe-seen rows are exact-confirmed by a left-anti join so
    false positives never drop URLs. ``seen=None`` -> identity.
    """
    if seen is None:
        return frontier
    if not bloom:
        return frontier.join(seen.select(key), key, "left_anti")

    bf = build_bloom(seen, key, bits_per_bucket=bits_per_bucket,
                     num_hashes=num_hashes, buckets=buckets)
    spark = frontier.sparkSession
    bc = spark.sparkContext.broadcast(bf)

    @F.pandas_udf("boolean")
    def maybe_seen(h1: pd.Series, h2: pd.Series) -> pd.Series:
        f = bc.value
        return pd.Series(f.might_contain_np(
            h1.to_numpy(dtype=np.int64), h2.to_numpy(dtype=np.int64)))

    hashed = _hash_cols(frontier, key).withColumn(
        "__maybe", maybe_seen(F.col("__h1"), F.col("__h2"))
    )
    definite_new = hashed.filter(~F.col("__maybe")).drop("__h1", "__h2", "__maybe")
    candidates = hashed.filter(F.col("__maybe")).drop("__h1", "__h2", "__maybe")
    confirmed_new = candidates.join(seen.select(key), key, "left_anti")
    return definite_new.unionByName(confirmed_new)


__all__ = ["BloomFilter", "build_bloom", "build_bloom_partials",
           "or_reduce_bitmaps", "probe_bloom_bucketed", "filter_unseen"]
