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
- assignment is a flat map — k×d integer multiply-adds per row in
  whole-stage codegen (no UDF, no shuffle); argmin via array_min over
  (dist2, cluster) structs, ties to the lowest cluster id;
- the update is ONE combiner-friendly groupBy over (cluster, dim):
  the shuffle carries k×d partial (sum, count) rows per task;
- new centroids (k×d longs) collect to the driver and re-enter the
  next iteration's plan as literals — the canonical broadcast-the-
  model / shuffle-the-stats loop; k·d·iters is driver-trivial
  (8×64×5 longs here, ~10^6 at realistic web scale).

Init is deterministic: the k smallest ids' vectors (k-means++ would
introduce RNG; at corpus scale you seed with a hash-sample instead).
Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siren_spark.functions.similarity import quantize_embedding


def _dist2(ev: Column, cv: list[int]) -> Column:
    """Exact squared L2 between an integer vector column and an
    integer centroid literal."""
    lit = F.array(*[F.lit(int(v)) for v in cv])
    return F.aggregate(
        F.zip_with(ev, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


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
    if not centroids:
        raise ValueError("centroids must be non-empty")
    d = len(centroids[0])
    if any(len(c) != d for c in centroids):
        raise ValueError("centroids must share one dimensionality")
    best = _best(quantize_embedding(F.col(emb_col)), centroids)
    return df.select(F.col(id_col).cast("long").alias(id_col),
                     best["cluster"].cast("int").alias("cluster"),
                     best["dist2"].alias("dist2"))


def _best(ev: Column, centroids: list[list[int]]) -> Column:
    return F.array_min(F.array(*[
        F.struct(_dist2(ev, cv).alias("dist2"),
                 F.lit(j).alias("cluster"))
        for j, cv in enumerate(centroids)]))


def _update(assigned_with_ev: DataFrame,
            centroids: list[list[int]]) -> list[list[int]]:
    """One exact Lloyd update: floor of the per-(cluster, dim) mean."""
    k, d = len(centroids), len(centroids[0])
    stats = (assigned_with_ev
             .select("cluster", F.posexplode("__ev").alias("dim", "x"))
             .groupBy("cluster", "dim")
             .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
             .collect())
    new = [list(c) for c in centroids]      # empty clusters keep theirs
    for r in stats:
        # floor division is exact while |s| < 2^63 (quantized coords)
        new[r.cluster][r.dim] = r.s // r.n
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
    base = df.select(quantize_embedding(F.col(emb_col)).alias("__ev"))
    for _ in range(iters):
        # assignment rides inline on the quantized frame — no join,
        # the iteration is scan + one (cluster, dim) aggregate
        assigned = base.select(
            "__ev", _best(F.col("__ev"), centroids)["cluster"]
            .alias("cluster"))
        centroids = _update(assigned, centroids)
    return centroids, kmeans_assign(df, centroids,
                                    id_col=id_col, emb_col=emb_col)


__all__ = ["kmeans_assign", "kmeans_fit"]
