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
- the filter is bucketed by ``hash % buckets`` so each executor builds a
  partial bitmap for its partition's buckets; partials OR-combine on the
  driver (tiny: bits/8 bytes total) and broadcast back.
- at 10^10 URLs you'd raise ``bits`` to ~10^11 (12.5 GB across e.g. 1024
  buckets → 12 MB per bucket, broadcast-able); the structure and code
  path are identical at sandbox scale.
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


def build_bloom(
    df: DataFrame,
    col: str,
    *,
    bits_per_bucket: int = 1 << 20,
    num_hashes: int = 5,
    buckets: int = 16,
) -> BloomFilter:
    """Build a bucketed Bloom filter over ``df[col]`` distributedly.

    Each task emits (bucket, partial bitmap) rows via mapInArrow; the
    driver ORs partials per bucket. Shuffle-free: partials are built from
    whatever rows land in each input partition.
    """
    hashed = _hash_cols(df.select(col), col).select("__h1", "__h2")
    m = bits_per_bucket
    k = num_hashes
    B = buckets
    # shuffle rows to their bucket so each task emits exactly one partial
    # bitmap: collected volume = B * m/8 bytes, independent of input
    # partitioning (without this, partials = partitions x buckets bitmaps)
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

    schema = "bucket int, bitmap binary"
    partials = hashed.mapInArrow(build, schema).collect()
    bitmaps: dict[int, np.ndarray] = {}
    for row in partials:
        bm = np.frombuffer(row.bitmap, dtype=np.uint8)
        if row.bucket in bitmaps:
            bitmaps[row.bucket] = bitmaps[row.bucket] | bm
        else:
            bitmaps[row.bucket] = bm.copy()
    return BloomFilter(m, k, B, bitmaps)


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


__all__ = ["BloomFilter", "build_bloom", "filter_unseen"]
