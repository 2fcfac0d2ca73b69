"""Engine-API tests for functions/curation.py (sampling, mixing,
decontamination, rollup, blocklist).

The driver's oracle gate checks these against DuckDB on the testdata
tables; here we pin *semantics* on hand-built fixtures: determinism
across parallelism, incremental-sampling stability, quota skew
behavior, contamination edge cases, suffix-anchored blocking, and
plan shape (no shuffle where none is promised).
"""

import pytest
from pyspark.sql import functions as F

from siren_spark.functions.curation import (
    decontaminate_ngrams,
    domain_quality_rollup,
    filter_domain_blocklist,
    sample_hash,
    sample_quota_per_group,
    split_by_hash,
    token_frequencies,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 5}",
             " ".join(f"w{(i * 7 + j) % 23}" for j in range(4 + i % 9)))
            for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


# ---------------------------------------------------------------- sampling

def test_sample_hash_deterministic_and_partition_independent(spark, docs):
    a = sorted(r.doc_id for r in
               sample_hash(docs, rate=0.3, salt="x").collect())
    b = sorted(r.doc_id for r in
               sample_hash(docs.repartition(17), rate=0.3, salt="x")
               .collect())
    assert a == b and 0 < len(a) < 200


def test_sample_hash_incremental_stability(spark, docs):
    """Growing the corpus never flips a previously-kept row."""
    small = docs.filter(F.col("doc_id") < 100)
    kept_small = {r.doc_id for r in sample_hash(small, rate=0.4).collect()}
    kept_full = {r.doc_id for r in sample_hash(docs, rate=0.4).collect()}
    assert kept_small == {i for i in kept_full if i < 100}


def test_sample_hash_rate_approx_and_salt_independence(spark, docs):
    n1 = sample_hash(docs, rate=0.5, salt="a").count()
    n2 = sample_hash(docs, rate=0.5, salt="b").count()
    assert abs(n1 - 100) < 30 and abs(n2 - 100) < 30
    ids1 = {r.doc_id for r in sample_hash(docs, rate=0.5, salt="a").collect()}
    ids2 = {r.doc_id for r in sample_hash(docs, rate=0.5, salt="b").collect()}
    assert ids1 != ids2  # different salts draw different samples


def test_sample_hash_edges(spark, docs):
    assert sample_hash(docs, rate=1.0).count() == 200
    assert sample_hash(docs, rate=0.0).count() == 0
    with pytest.raises(ValueError):
        sample_hash(docs, rate=1.5)


def test_sample_hash_no_shuffle(spark, docs):
    plan = sample_hash(docs, rate=0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_quota_caps_every_group(spark, docs):
    out = sample_quota_per_group(docs, quota=7, group_col="source")
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(v == 7 for v in counts.values()) and len(counts) == 5


def test_sample_quota_deterministic_under_skew(spark):
    # one group is 95% of rows; result must not depend on layout
    rows = [(i, "hot" if i % 20 else "cold", "t") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    a = sorted(r.doc_id for r in
               sample_quota_per_group(df, quota=10).collect())
    b = sorted(r.doc_id for r in
               sample_quota_per_group(df.repartition(31), quota=10)
               .collect())
    assert a == b and len(a) == 20


def test_sample_quota_small_group_kept_whole(spark, docs):
    out = sample_quota_per_group(docs, quota=1000)
    assert out.count() == 200  # quota above group size keeps everything
    with pytest.raises(ValueError):
        sample_quota_per_group(docs, quota=0)


def test_split_by_hash_partition_and_consistency(spark, docs):
    out = split_by_hash(docs, splits=[("train", 0.8), ("val", 0.1),
                                      ("test", 0.1)], salt="sp")
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == 200 and {r.split for r in rows} <= {
        "train", "val", "test"}
    again = {(r.doc_id, r.split) for r in
             split_by_hash(docs.repartition(13),
                           splits=[("train", 0.8), ("val", 0.1),
                                   ("test", 0.1)], salt="sp")
             .select("doc_id", "split").collect()}
    assert {(r.doc_id, r.split) for r in rows} == again
    n_train = sum(1 for r in rows if r.split == "train")
    assert 130 < n_train < 195  # ~160 expected


def test_split_by_hash_consistent_with_sample_hash(spark, docs):
    """The train split at fraction f equals sample_hash at rate f —
    one shared hash, so samples and splits compose predictably."""
    tr = {r.doc_id for r in
          split_by_hash(docs, splits=[("a", 0.4), ("b", 0.6)], salt="z")
          .filter("split = 'a'").collect()}
    sh = {r.doc_id for r in
          sample_hash(docs, rate=0.4, salt="z").collect()}
    assert tr == sh


def test_split_by_hash_validates(spark, docs):
    with pytest.raises(ValueError):
        split_by_hash(docs, splits=[("a", 0.5), ("b", 0.2)])
    with pytest.raises(ValueError):
        split_by_hash(docs, splits=[("a", 1.5), ("b", -0.5)])
    plan = split_by_hash(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_token_frequencies_counts_and_topk(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "")], ["doc_id", "text"])
    full = {r.token: r.n for r in token_frequencies(df).collect()}
    assert full == {"a": 3, "b": 2, "c": 1}
    top = token_frequencies(df, top_k=2).collect()
    assert [(r.token, r.n) for r in
            sorted(top, key=lambda r: (-r.n, r.token))] == [
        ("a", 3), ("b", 2)]


def test_token_frequencies_topk_tie_break_deterministic(spark):
    # every token appears exactly once -> top-k decided by token asc
    df = spark.createDataFrame([(1, "z y x w v")], ["doc_id", "text"])
    top = {r.token for r in token_frequencies(df, top_k=3).collect()}
    assert top == {"v", "w", "x"}
    with pytest.raises(ValueError):
        token_frequencies(df, top_k=0)


# ---------------------------------------------------------- decontamination

def test_decontaminate_flags_exact_overlap(spark):
    s = spark
    docs = s.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different words in this training document here"),
         (3, "short doc")],
        ["doc_id", "text"])
    bench = s.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        ["doc_id", "text"])
    out = {r.doc_id: r.contaminated
           for r in decontaminate_ngrams(docs, bench, n=5).collect()}
    # doc 1 shares the 5-gram "the quick brown fox jumps"
    assert out == {1: True, 2: False, 3: False}


def test_decontaminate_short_docs_and_row_count(spark, docs):
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    out = decontaminate_ngrams(docs, bench, n=4)
    rows = out.collect()
    assert len(rows) == 200  # one row per doc, short docs included
    flagged = {r.doc_id for r in rows if r.contaminated}
    assert {i for i in range(0, 200, 50)} <= flagged  # self-matches


def test_decontaminate_n_larger_than_any_doc(spark, docs):
    bench = docs.limit(5)
    out = decontaminate_ngrams(docs, bench, n=1000)
    assert out.filter("contaminated").count() == 0
    assert out.count() == 200


def test_decontaminate_benchmark_broadcast(spark, docs):
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plan = decontaminate_ngrams(docs, bench, n=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------ rollup

def test_domain_quality_rollup_values(spark):
    df = spark.createDataFrame(
        [(1, "s1", "a b c"),           # 3 tokens, short
         (2, "s1", " ".join(["w"] * 60)),  # 60 tokens, long
         (3, "s2", ""),                # dropped (empty)
         (4, "s2", "x y")],            # 2 tokens, short
        ["doc_id", "source", "text"])
    out = {r.source: r for r in domain_quality_rollup(df).collect()}
    assert out["s1"].n_docs == 2 and out["s1"].n_tokens == 63
    assert out["s1"].short_doc_share == 0.5
    assert out["s2"].n_docs == 1 and out["s2"].short_doc_share == 1.0
    assert out["s1"].avg_chars == round((5 + 119) / 2, 4)


# --------------------------------------------------------------- blocklist

def test_blocklist_suffix_anchored(spark):
    df = spark.createDataFrame(
        [(1, "news3.example.com"),   # blocked by suffix example.com
         (2, "example.com"),         # blocked exactly
         (3, "notexample.com"),      # NOT blocked (label-anchored)
         (4, "media.sample.net"),    # kept
         (5, "a.b.news3.example.com")],  # blocked (deep subdomain)
        ["id", "domain"])
    bl = spark.createDataFrame([("example.com",)], ["blocked"])
    kept = sorted(r.id for r in
                  filter_domain_blocklist(df, bl).collect())
    assert kept == [3, 4]


def test_blocklist_empty_blocks_nothing(spark):
    df = spark.createDataFrame([(1, "a.com"), (2, "b.net")],
                               ["id", "domain"])
    bl = spark.createDataFrame([], "blocked string")
    assert filter_domain_blocklist(df, bl).count() == 2


def test_blocklist_no_data_side_shuffle(spark):
    df = spark.createDataFrame(
        [(i, f"h{i % 9}.example{i % 4}.com") for i in range(100)],
        ["id", "domain"])
    bl = spark.createDataFrame([("example1.com",)], ["blocked"])
    plan = filter_domain_blocklist(df, bl)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    kept = filter_domain_blocklist(df, bl).count()
    assert kept == 75


# ----------------------------------------------------------------- tf-idf

def test_tfidf_hand_values(spark):
    """3 docs, vocab {a,b,c}: scores match the ln(N/df) formula."""
    import math
    from siren_spark.functions.curation import tfidf_topk_terms
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "a c c")], ["doc_id", "text"])
    out = {(r.doc_id, r.term): (r.tfidf, r.rank)
           for r in tfidf_topk_terms(d, top_k=3).collect()}
    # df: a=3, b=2, c=1; N=3
    assert out[(1, "a")] == (round(2 * math.log(3 / 3), 4), 1) or \
        out[(1, "a")][0] == 0.0
    assert out[(1, "b")][0] == round(math.log(3 / 2), 4)
    assert out[(3, "c")] == (round(2 * math.log(3 / 1), 4), 1)
    # doc 1: b (0.4055) beats a (0.0); rank order (score desc, term asc)
    assert out[(1, "b")][1] == 1 and out[(1, "a")][1] == 2


def test_tfidf_topk_and_tiebreak(spark):
    """Equal scores break ties on term asc; top_k truncates per doc."""
    from siren_spark.functions.curation import tfidf_topk_terms
    d = spark.createDataFrame(
        [(1, "x y"), (2, "x z"), (3, "y z")], ["doc_id", "text"])
    rows = tfidf_topk_terms(d, top_k=1).collect()
    # every term has df=2, tf=1: all scores equal -> lexicographic win
    want = {1: "x", 2: "x", 3: "y"}
    assert {r.doc_id: r.term for r in rows} == want
    assert all(r.rank == 1 for r in rows)


def test_tfidf_partition_independent(spark, docs):
    from siren_spark.functions.curation import tfidf_topk_terms
    a = sorted(map(tuple, tfidf_topk_terms(docs, top_k=2).collect()))
    b = sorted(map(tuple,
                   tfidf_topk_terms(docs.repartition(17), top_k=2)
                   .collect()))
    assert a == b and len(a) == 400  # 200 docs x 2


def test_tfidf_validates(spark, docs):
    from siren_spark.functions.curation import tfidf_topk_terms
    with pytest.raises(ValueError):
        tfidf_topk_terms(docs, top_k=0)


# ------------------------------------------------------- linear classifier

def test_classifier_hand_values_and_oov(spark):
    """logit = (bias + sum(w*count)/n_tokens)/1000; OOV tokens weigh 0
    but count in the denominator (fastText mean-of-scores)."""
    from siren_spark.functions.curation import score_linear_classifier
    d = spark.createDataFrame(
        [(1, "good good bad"), (2, "oov oov oov"), (3, "")],
        ["doc_id", "text"])
    w = spark.createDataFrame(
        [("good", 900), ("bad", -600)], ["token", "weight_milli"])
    out = {r.doc_id: (r.logit, r.label)
           for r in score_linear_classifier(d, w, bias_milli=50)
           .collect()}
    # doc1: (50 + (2*900 - 600)/3)/1000 = 0.45
    assert out[1] == (0.45, True)
    # doc2: all OOV -> (50 + 0)/1000
    assert out[2] == (0.05, True)
    assert 3 not in out  # empty text excluded


def test_classifier_negative_label(spark):
    from siren_spark.functions.curation import score_linear_classifier
    d = spark.createDataFrame([(1, "bad bad")], ["doc_id", "text"])
    w = spark.createDataFrame([("bad", -400)], ["token", "weight_milli"])
    r = score_linear_classifier(d, w).first()
    assert r.logit == -0.4 and r.label is False


def test_classifier_broadcast_vs_shuffle_join(spark, docs):
    """Both join strategies produce identical results; default plan
    broadcasts the vocab, opt-out plan does not."""
    from pyspark.sql import functions as F
    from siren_spark.functions.curation import score_linear_classifier
    w = (docs.select(F.explode(F.split("text", " ")).alias("token"))
         .distinct()
         .select("token", (F.crc32("token") % 1001 - 500)
                 .cast("long").alias("weight_milli")))
    a = score_linear_classifier(docs, w)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    b = score_linear_classifier(docs, w, broadcast_weights=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


# ---------------------------------------------------------------- chunking

def test_chunk_documents_hand_values(spark):
    """10 tokens, chunk 4, overlap 1 (stride 3): ceil((10-1)/3) = 3
    windows at 0/3/6 cover every token — and no phantom tail window
    whose tokens are all already covered."""
    from siren_spark.functions.curation import chunk_documents
    d = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"])
    rows = sorted((r.chunk_idx, r.chunk_text, r.n_tokens)
                  for r in chunk_documents(d, chunk_tokens=4,
                                           overlap=1).collect())
    assert rows == [(0, "t0 t1 t2 t3", 4), (1, "t3 t4 t5 t6", 4),
                    (2, "t6 t7 t8 t9", 4)]
    # 11 tokens -> a genuine remainder window appears
    d2 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], ["doc_id", "text"])
    rows2 = sorted((r.chunk_idx, r.n_tokens)
                   for r in chunk_documents(d2, chunk_tokens=4,
                                            overlap=1).collect())
    assert rows2 == [(0, 4), (1, 4), (2, 4), (3, 2)]


def test_chunk_documents_short_doc_single_chunk(spark):
    from siren_spark.functions.curation import chunk_documents
    d = spark.createDataFrame([(1, "a b"), (2, "")], ["doc_id", "text"])
    rows = chunk_documents(d, chunk_tokens=128, overlap=16).collect()
    assert len(rows) == 1  # empty doc dropped, short doc = one chunk
    assert (rows[0].chunk_idx, rows[0].chunk_text,
            rows[0].n_tokens) == (0, "a b", 2)


def test_chunk_documents_exact_multiple_no_phantom_tail(spark):
    """n == chunk_tokens: exactly one window, no tail that would only
    repeat overlap."""
    from siren_spark.functions.curation import chunk_documents
    d = spark.createDataFrame([(1, " ".join("x" * 1 for _ in range(8)))],
                              ["doc_id", "text"])
    rows = chunk_documents(d, chunk_tokens=8, overlap=2).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 8


def test_chunk_documents_coverage_and_validation(spark, docs):
    """Every token position is covered by >= 1 chunk; chunk sizes never
    exceed chunk_tokens; params validate."""
    import pytest
    from pyspark.sql import functions as F
    from siren_spark.functions.curation import chunk_documents
    out = chunk_documents(docs, chunk_tokens=5, overlap=2)
    assert out.filter(F.col("n_tokens") > 5).count() == 0
    # coverage: sum of (n_tokens - overlap) + overlap >= doc tokens
    per_doc = (out.groupBy("doc_id")
               .agg(F.sum("n_tokens").alias("s"),
                    F.count("*").alias("k")))
    joined = (docs.select("doc_id",
                          F.size(F.split("text", " ")).alias("n"))
              .join(per_doc, "doc_id"))
    bad = joined.filter(
        F.col("s") - (F.col("k") - 1) * 2 != F.col("n")).count()
    assert bad == 0
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=1)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


# ---------------------------------------------------------- inverted index

def test_inverted_index_postings_sorted_and_distinct(spark):
    from siren_spark.functions.curation import inverted_index
    docs = spark.createDataFrame(
        [(5, "a b a"), (2, "b c"), (9, "b  c"), (1, "")],
        ["doc_id", "text"])
    # max_df=None: this test pins postings mechanics, not the skew guard
    out = {r.term: r for r in inverted_index(docs, max_df=None).collect()}
    # duplicate token within a doc counts once; postings sorted asc
    assert out["a"].df == 1 and out["a"].postings == "5"
    assert out["b"].df == 3 and out["b"].postings == "2,5,9"
    assert out["c"].df == 2 and out["c"].postings == "2,9"
    # double-space yields an empty token — must be dropped, and the
    # empty doc contributes nothing
    assert "" not in out


def test_inverted_index_df_bounds(spark):
    from siren_spark.functions.curation import inverted_index
    docs = spark.createDataFrame(
        [(i, ("stop rare" if i == 0 else "stop")) for i in range(10)],
        ["doc_id", "text"])
    out = {r.term for r in
           inverted_index(docs, min_df=2, max_df=9).collect()}
    assert out == set()  # 'stop' df=10 > max, 'rare' df=1 < min
    out2 = {r.term: r.df for r in
            inverted_index(docs, min_df=1, max_df=10).collect()}
    assert out2 == {"stop": 10, "rare": 1}


def test_inverted_index_default_caps_corpus_wide_terms(spark):
    """The stopword skew guard is ON by default: a term present in
    every document (a corpus-sized posting list at scale) is dropped
    at the default max_df=0.5 corpus fraction, while ordinary terms
    survive; opting out requires an explicit max_df=None."""
    import pytest
    from siren_spark.functions.curation import inverted_index
    docs = spark.createDataFrame(
        [(i, f"everywhere word{i}") for i in range(8)],
        ["doc_id", "text"])
    out = {r.term: r.df for r in inverted_index(docs).collect()}
    assert "everywhere" not in out          # df=8 > 0.5*8
    assert out["word3"] == 1                # rare terms unaffected
    full = {r.term: r.df
            for r in inverted_index(docs, max_df=None).collect()}
    assert full["everywhere"] == 8          # explicit opt-out keeps it
    frac = {r.term: r.df
            for r in inverted_index(docs, max_df=1.0).collect()}
    assert frac["everywhere"] == 8          # df == N passes at 1.0
    with pytest.raises(ValueError):
        inverted_index(docs, max_df=1.5)


def test_inverted_index_partition_independent(spark, docs):
    from siren_spark.functions.curation import inverted_index
    a = sorted(map(tuple, inverted_index(docs).collect()))
    b = sorted(map(tuple, inverted_index(docs.repartition(13)).collect()))
    assert a == b and len(a) > 0


# --------------------------------------------------------- length quantiles

def test_length_quantiles_matches_numpy(spark):
    import numpy as np
    from siren_spark.functions.curation import length_quantiles
    rows = [(i, "g" + str(i % 2),
             " ".join("t" for _ in range(3 + (i * 5) % 17)))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r.lang: r for r in length_quantiles(df).collect()}
    for g in ("g0", "g1"):
        lens = [3 + (i * 5) % 17 for i in range(40) if i % 2 == int(g[1])]
        assert got[g].n_docs == len(lens)
        p25, p50, p75 = np.percentile(lens, [25, 50, 75],
                                      method="linear")
        assert got[g].p25_tokens == round(float(p25), 4)
        assert got[g].p50_tokens == round(float(p50), 4)
        assert got[g].p75_tokens == round(float(p75), 4)


def test_length_quantiles_excludes_empty_text(spark):
    from siren_spark.functions.curation import length_quantiles
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", ""), (3, "en", "a b c d e")],
        ["doc_id", "lang", "text"])
    row = length_quantiles(df).collect()[0]
    assert row.n_docs == 2 and row.p50_tokens == 4.0


# ------------------------------------------------- mix_by_token_budget

def _mix_reference(rows, budget):
    """Greedy per-source prefix in (md5-hash, key) order, in plain python."""
    import hashlib
    from collections import defaultdict
    by_src = defaultdict(list)
    for doc_id, source, text in rows:
        if not text:
            continue
        h = hashlib.md5(f"|{doc_id}".encode()).hexdigest()[:8]
        by_src[source].append((h, doc_id, len(text.split(" "))))
    keep = {}
    for source, docs_ in by_src.items():
        cum = 0
        for h, doc_id, n in sorted(docs_):
            cum += n
            if cum > budget:
                break
            keep[doc_id] = (source, n, cum)
    return keep


def test_mix_by_token_budget_matches_reference(spark):
    from siren_spark.functions.curation import mix_by_token_budget
    rows = [(i, f"s{i % 3}",
             " ".join(f"w{j}" for j in range(1 + (i * 13) % 40)))
            for i in range(300)] + [(999, "s0", "")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
           for r in mix_by_token_budget(df, budget_tokens=250).collect()}
    assert got == _mix_reference(rows, 250)
    assert got  # non-degenerate fixture


def test_mix_by_token_budget_partition_independent(spark):
    from siren_spark.functions.curation import mix_by_token_budget
    rows = [(i, "hot" if i % 10 else f"s{i}",  # one skewed group
             " ".join("x" for _ in range(1 + i % 7)))
            for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    a = sorted(map(tuple, mix_by_token_budget(
        df, budget_tokens=120).collect()))
    b = sorted(map(tuple, mix_by_token_budget(
        df.repartition(13), budget_tokens=120).collect()))
    assert a == b == sorted(
        (k, *v[0:1], v[1], v[2])
        for k, v in _mix_reference(rows, 120).items())


def test_mix_by_token_budget_edges(spark):
    from siren_spark.functions.curation import mix_by_token_budget
    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, "a", "x")], ["doc_id", "source", "text"])
    assert mix_by_token_budget(df, budget_tokens=0).count() == 0
    full = mix_by_token_budget(df, budget_tokens=10_000).collect()
    assert sorted(r.cum_tokens for r in full)[-1] == 3  # all kept
    with pytest.raises(ValueError):
        mix_by_token_budget(df, budget_tokens=-1)


# -------------------------------------------------------- search_topk

def test_search_topk_hand_values(spark):
    import math
    from siren_spark.functions.curation import search_topk
    df = spark.createDataFrame(
        [(1, "apple apple pear"),
         (2, "apple banana"),
         (3, "pear pear pear"),
         (4, "kiwi")],
        ["doc_id", "text"])
    got = {r.doc_id: (r.score_milli, r.n_terms_matched)
           for r in search_topk(df, ["apple", "pear"], k=10).collect()}
    idf_apple = math.floor(1000 * math.log(4 / 2))  # in docs 1,2
    idf_pear = math.floor(1000 * math.log(4 / 2))   # in docs 1,3
    assert got == {
        1: (2 * idf_apple + 1 * idf_pear, 2),
        2: (1 * idf_apple, 1),
        3: (3 * idf_pear, 1),
    }


def test_search_topk_k_and_tiebreak(spark):
    from siren_spark.functions.curation import search_topk
    # all docs identical score -> top-k is the k smallest doc_ids
    df = spark.createDataFrame(
        [(i, "term filler") for i in range(20)], ["doc_id", "text"])
    got = [r.doc_id for r in search_topk(df, ["term"], k=5).collect()]
    assert got == [0, 1, 2, 3, 4]


def test_search_topk_validates_and_plan(spark):
    from siren_spark.functions.curation import search_topk
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        search_topk(df, [])
    with pytest.raises(ValueError):
        search_topk(df, ["a"], k=0)
    plan = search_topk(df, ["a"], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort


# ---------------------------------------------- filter_length_outliers

def test_filter_length_outliers_matches_numpy_fence(spark):
    import numpy as np
    from siren_spark.functions.curation import filter_length_outliers
    lens = [5, 6, 7, 8, 9, 10, 11, 12, 100]  # 100 is the outlier
    rows = [(i, "en", " ".join("w" for _ in range(n)))
            for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = filter_length_outliers(df).collect()
    p25, p75 = np.percentile(lens, [25, 75], method="linear")
    lo, hi = p25 - 1.5 * (p75 - p25), p75 + 1.5 * (p75 - p25)
    assert sorted(r.doc_id for r in got) == [
        i for i, n in enumerate(lens) if lo <= n <= hi]
    assert all(r.lo == round(lo, 4) and r.hi == round(hi, 4) for r in got)
    assert not any(r.doc_id == 8 for r in got)  # the outlier is dropped


def test_filter_length_outliers_band_inclusive_and_broadcast(spark):
    from siren_spark.functions.curation import filter_length_outliers
    # constant lengths: IQR = 0, band collapses to a point -> all kept
    df = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(8)], ["doc_id", "lang", "text"])
    out = filter_length_outliers(df)
    assert out.count() == 8
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # band frame broadcasts, docs don't shuffle


# --------------------------------------------------------- snapshot_diff

def test_snapshot_diff_statuses(spark):
    from siren_spark.functions.curation import snapshot_diff
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma EDITED"), (4, "delta"), (5, "epsilon")],
        ["doc_id", "text"])
    got = {r.doc_id: r.status
           for r in snapshot_diff(old, new).collect()}
    # 2 and 4 are unchanged -> dropped; 1 removed, 3 changed, 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_fingerprints_and_partitioning(spark):
    import hashlib
    from siren_spark.functions.curation import snapshot_diff
    old = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "text"])
    new = spark.createDataFrame([(1, "z")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in snapshot_diff(
        old.repartition(7), new.repartition(3)).collect()}
    assert rows[1].old_md5 == hashlib.md5(b"x").hexdigest()
    assert rows[1].new_md5 == hashlib.md5(b"z").hexdigest()
    assert rows[2].status == "removed" and rows[2].new_md5 is None
