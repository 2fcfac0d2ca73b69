"""Stateful streaming exact dedup (streaming/dedup_state.py) vs the
batch dedup semantics: single-drain equivalence to the min-id winner,
cross-batch state carry (a duplicate arriving in a LATER micro-batch
is dropped), and exactly-one-winner-per-fingerprint invariance.
"""

import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from siren_spark.streaming.dedup_state import run_dedup_query

SCHEMA = StructType([StructField("doc_id", LongType()),
                     StructField("text", StringType())])

ROWS = [(i, f"content-{i % 7}") for i in range(21)]  # 7 distinct texts


def _drain(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    mode = "overwrite"
    for batch in batches:
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.mode(mode).parquet(src)
        mode = "append"
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .format("parquet").load(src))
        q = run_dedup_query(stream, out, ck)
        q.awaitTermination(120)
    time.sleep(0.5)
    return spark.read.parquet(out)


def test_single_drain_equals_batch_min_id(spark, tmp_path):
    got = {(r.fp, r.doc_id) for r in _drain(spark, tmp_path, [ROWS]).collect()}
    expect = {(r.fp, r.doc_id) for r in
              (spark.createDataFrame(ROWS, SCHEMA)
               .select(F.md5("text").alias("fp"), "doc_id")
               .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
               .collect())}
    assert got == expect
    assert len(got) == 7


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    # batch 2 re-sends every text with NEW ids plus one genuinely new
    # text; only the new text may emit
    b2 = [(100 + i, f"content-{i % 7}") for i in range(14)]
    b2.append((999, "brand new content"))
    df = _drain(spark, tmp_path, [ROWS, b2])
    rows = df.collect()
    assert len(rows) == 8                       # 7 + the new one
    winners = {r.doc_id for r in rows}
    assert 999 in winners
    assert all(d < 100 or d == 999 for d in winners)


def test_one_winner_per_fingerprint(spark, tmp_path):
    df = _drain(spark, tmp_path, [ROWS[:10], ROWS[10:]])
    fps = [r.fp for r in df.collect()]
    assert len(fps) == len(set(fps)) == 7
