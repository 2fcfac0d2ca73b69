"""Distributed k-means (Lloyd) over embedding columns.

The corpus-organization primitive a training-data pipeline runs over
document embeddings — topic balancing, SemDeDup-style cluster-then-
dedup, and training the coarse quantizer behind IVF ANN search
(functions/similarity.py's ``ann_ivf_topk`` uses a fixed deterministic
quantizer; this is how you'd fit a better one on the corpus itself).

Everything runs on floor(x*1000) integer-quantized vectors
(similarity.quantize_embedding — the same convention every embedding
oracle in this repo uses), so distances are exact BIGINT sums and the
centroid update floors an exact rational mean: results are
bit-identical under ANY aggregation order, partitioning, or engine.
Classic float k-means diverges across summation orders; at 1000
executors that means unreproducible clusters — quantized Lloyd
trades ~1e-3 centroid resolution for exact reproducibility.

Scale per iteration (the textbook distributed shape):
- assignment + the per-batch partial (cluster, dim) sums run in ONE
  NumPy pass per Arrow batch (``mapInArrow``): dist2 to all k
  centroids is a single int64 matrix expression, argmin ties to the
  lowest cluster id; nothing shuffles but k×d partial (sum, count)
  rows per batch (the earlier formulation evaluated k interpreted
  zip_with/aggregate lambdas per row — no codegen — and posexploded
  every vector into d rows before the update groupBy);
- the update is ONE combiner-friendly groupBy over (cluster, dim);
- new centroids (k×d longs) collect to the driver and re-enter the
  next iteration's plan as literals — the canonical broadcast-the-
  model / shuffle-the-stats loop; k·d·iters is driver-trivial
  (8×64×5 longs here, ~10^6 at realistic web scale).

Init is deterministic: the k smallest ids' vectors (k-means++ would
introduce RNG; at corpus scale you seed with a hash-sample instead).
Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_np(flat, n, centroids_np):
    """(cluster, dist2) per row from a flat float array of n vectors.

    Exact int64 math: quantize with floor(x*1000) (identical IEEE
    double steps as the JVM/DuckDB expression), then
    dist2 = |ev|^2 - 2 ev·c + |c|^2 per centroid; argmin's
    first-occurrence rule IS the tie-to-lowest-cluster-id rule.
    """
    import numpy as np

    ev = np.floor(flat.astype(np.float64) * 1000.0).astype(np.int64) \
        .reshape(n, -1)
    cm = centroids_np                        # (k, d) int64
    d2 = ((ev * ev).sum(axis=1, keepdims=True)
          - 2 * (ev @ cm.T)
          + (cm * cm).sum(axis=1)[None, :])  # (n, k) exact int64
    cluster = np.argmin(d2, axis=1)
    dist2 = d2[np.arange(n), cluster]
    return ev, cluster.astype(np.int64), dist2


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (exact integer
    squared-L2; ties to the lowest cluster id). Returns
    (id, cluster INT, dist2 BIGINT). Flat map — no shuffle."""
    import numpy as np
    import pyarrow as pa

    if not centroids:
        raise ValueError("centroids must be non-empty")
    d = len(centroids[0])
    if any(len(c) != d for c in centroids):
        raise ValueError("centroids must share one dimensionality")
    cm = np.array([[int(v) for v in c] for c in centroids], dtype=np.int64)

    def assign(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            flat = b.column(1).flatten().to_numpy(zero_copy_only=False)
            _, cluster, dist2 = _assign_np(flat, n, cm)
            yield pa.record_batch(
                [pa.array(ids.astype(np.int64)),
                 pa.array(cluster.astype(np.int32)),
                 pa.array(dist2)],
                names=["__id", "cluster", "dist2"])

    out = (df.select(F.col(id_col).cast("long"), F.col(emb_col))
           .mapInArrow(assign, "__id long, cluster int, dist2 long"))
    return out.select(F.col("__id").alias(id_col), "cluster", "dist2")


def _update(df: DataFrame, emb_col: str,
            centroids: list[list[int]]) -> list[list[int]]:
    """One exact Lloyd update: floor of the per-(cluster, dim) mean.

    Assignment and per-batch partial sums happen in the same NumPy
    pass; the shuffle carries at most k×d (cluster, dim, s, n) rows
    per Arrow batch.
    """
    import numpy as np
    import pyarrow as pa

    k, d = len(centroids), len(centroids[0])
    cm = np.array([[int(v) for v in c] for c in centroids], dtype=np.int64)

    def stats(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            flat = b.column(0).flatten().to_numpy(zero_copy_only=False)
            ev, cluster, _ = _assign_np(flat, n, cm)
            cl_out, dim_out, s_out, n_out = [], [], [], []
            for j in np.unique(cluster):
                m = cluster == j
                s = ev[m].sum(axis=0)
                cnt = int(m.sum())
                cl_out.append(np.full(d, j, dtype=np.int64))
                dim_out.append(np.arange(d, dtype=np.int64))
                s_out.append(s)
                n_out.append(np.full(d, cnt, dtype=np.int64))
            yield pa.record_batch(
                [pa.array(np.concatenate(cl_out)),
                 pa.array(np.concatenate(dim_out)),
                 pa.array(np.concatenate(s_out)),
                 pa.array(np.concatenate(n_out))],
                names=["cluster", "dim", "s", "n"])

    rows = (df.select(F.col(emb_col))
            .mapInArrow(stats, "cluster long, dim long, s long, n long")
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect())
    new = [list(c) for c in centroids]      # empty clusters keep theirs
    for r in rows:
        # floor division is exact while |s| < 2^63 (quantized coords)
        new[int(r.cluster)][int(r.dim)] = int(r.s) // int(r.n)
    assert all(len(c) == d for c in new) and len(new) == k
    return new


def kmeans_fit(
    df: DataFrame,
    k: int,
    *,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[list[list[int]], DataFrame]:
    """Run ``iters`` exact Lloyd updates from the deterministic init
    (quantized vectors of the k smallest ids) and return
    (final integer centroids, final assignment DataFrame)."""
    from siren_spark.functions.similarity import quantize_embedding

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    seeds = (df.select(F.col(id_col).alias("__id"),
                       quantize_embedding(F.col(emb_col)).alias("__ev"))
             .orderBy("__id").limit(k).collect())
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seeds)}")
    centroids = [list(r["__ev"]) for r in seeds]
    for _ in range(iters):
        centroids = _update(df, emb_col, centroids)
    return centroids, kmeans_assign(df, centroids,
                                    id_col=id_col, emb_col=emb_col)


__all__ = ["kmeans_assign", "kmeans_fit"]
