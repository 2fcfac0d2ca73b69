"""Language-model perplexity scoring for corpus quality bucketing —
the CCNet recipe (train a small LM on a trusted reference corpus,
score every candidate document, bucket head/middle/tail by score),
implemented as a character-trigram model with add-one smoothing.

CCNet uses a 5-gram KenLM; the trigram model keeps the identical
pipeline shape (train counts → per-doc NLL → percentile buckets)
while staying exactly expressible in SQL for the oracle gate. The
production swap-in is the same plumbing with a KenLM pandas UDF.

Determinism: log-probabilities are quantized to integer milli-nats
at training time (floor(1000·ln((c+1)/(total+V)))), so scoring sums
BIGINTs — per-doc NLL is exact under any aggregation order and
partitioning, unlike float log-prob sums which drift with summation
order at 1000 executors.

Scale: training is one trigram groupBy over the (small, trusted)
reference corpus; (total, V) are two scalars — the one driver-side
collect, i.e. the model artifact itself. Scoring is explode →
vocab join (broadcast by default: char-trigram vocab is bounded by
charset³, ~10⁵ for text; shuffle-join opt-out for byte-level or
CJK-heavy vocabs) → one per-doc combiner groupBy. Bucketing is a
global ntile — a total sort of one small (doc_id, score) row per
doc, the only whole-corpus step, same cost class as any percentile
cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _trigrams(text: Column) -> Column:
    """All character trigrams (spaces included), [] when len < 3."""
    n = F.length(text)
    return F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: text.substr(i, F.lit(3)))).otherwise(F.array())


def train_char_trigram_lm(
    ref: DataFrame,
    *,
    text_col: str = "text",
) -> tuple[DataFrame, int]:
    """Train on a reference corpus; returns (weights, oov_logp_milli).

    ``weights`` is (gram, logp_milli BIGINT) with
    logp_milli = floor(1000·ln((count+1) / (total+V))); the int is the
    smoothed out-of-vocabulary log-prob floor(1000·ln(1/(total+V))).
    """
    import math
    grams = (ref.filter(F.length(text_col) >= 3)
             .select(F.explode(_trigrams(F.col(text_col)))
                     .alias("gram")))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    total, v = counts.agg(
        F.sum("c"), F.count(F.lit(1))).first()
    if not total:
        raise ValueError("reference corpus has no trigrams")
    denom = int(total) + int(v)
    weights = counts.select(
        "gram",
        F.floor(F.lit(1000.0)
                * F.log((F.col("c") + 1).cast("double") / denom))
        .cast("long").alias("logp_milli"))
    return weights, math.floor(1000.0 * math.log(1.0 / denom))


def score_char_trigram_nll(
    df: DataFrame,
    weights: DataFrame,
    oov_logp_milli: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 3,
    broadcast_weights: bool = True,
) -> DataFrame:
    """Score every document with >= 1 trigram: (id, n_grams,
    nll_milli — exact BIGINT sum of negated milli-nat log-probs,
    nll_per_gram ROUND 4, bucket 1..``buckets`` by ascending
    nll_per_gram with id tie-break — bucket 1 is CCNet's 'head')."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    g = (df.filter(F.length(text_col) >= 3)
         .select(F.col(id_col).alias("__doc"),
                 F.explode(_trigrams(F.col(text_col))).alias("gram")))
    w = weights.select("gram", "logp_milli")
    if broadcast_weights:
        w = F.broadcast(w)
    scored = (g.join(w, "gram", "left")
              .groupBy("__doc")
              .agg((-F.sum(F.coalesce(F.col("logp_milli"),
                                      F.lit(int(oov_logp_milli)))))
                   .alias("nll_milli"),
                   F.count(F.lit(1)).alias("n_grams")))
    per = F.round(F.col("nll_milli").cast("double")
                  / F.col("n_grams"), 4)
    win = Window.orderBy(F.asc("nll_per_gram"), F.asc(id_col))
    return (scored.select(F.col("__doc").alias(id_col),
                          F.col("n_grams"),
                          F.col("nll_milli"),
                          per.alias("nll_per_gram"))
            .withColumn("bucket", F.ntile(buckets).over(win)))


__all__ = ["train_char_trigram_lm", "score_char_trigram_nll"]
