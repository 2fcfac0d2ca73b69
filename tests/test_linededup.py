"""Semantics tests for corpus-level exact line dedup
(functions/curation.py:dedup_lines_global, the RefinedWeb sec. 3.3 /
CCNet boilerplate-removal recipe).

The driver's oracle gate (`dedup_lines_global` in __spark_entry__)
checks it against DuckDB at sf0.01; here we pin the rule itself on a
hand-built corpus: distinct-doc counting (not occurrence counting),
order preservation, blank-line immunity, the min_docs boundary, the
everything-removed document, and determinism across parallelism.
"""

import pytest
from pyspark.sql import functions as F

from siren_spark.functions.curation import dedup_lines_global

BOILER = "SHARE ON FACEBOOK"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # boilerplate line in 3 docs; "unique to one" appears twice in
        # doc 1 (occurrences != docs — must NOT be removed at
        # min_docs=3, must be at min_docs=2... it is 1 doc, never).
        (1, f"alpha\n{BOILER}\n\nunique to one\nunique to one"),
        (2, f"{BOILER}\nbeta gamma"),
        (3, f"delta\n{BOILER}"),
        (4, BOILER),          # every line recurs -> empty text out
        (5, ""),              # empty doc: one blank line, kept
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_recurring_line_removed_everywhere(corpus):
    out = _collect(dedup_lines_global(corpus))
    assert out[1]["text"] == "alpha\n\nunique to one\nunique to one"
    assert out[2]["text"] == "beta gamma"
    assert out[3]["text"] == "delta"
    for i in (1, 2, 3, 4):
        assert BOILER not in out[i]["text"]


def test_counts_and_row_preservation(corpus):
    out = _collect(dedup_lines_global(corpus))
    assert set(out) == {1, 2, 3, 4, 5}          # one row out per doc
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (4, 1)
    assert (out[4]["n_kept"], out[4]["n_removed"]) == (0, 1)
    assert out[4]["text"] == ""


def test_blank_lines_never_removed(corpus):
    # the blank separator in doc 1 and the empty doc 5 both survive,
    # though '' "occurs" in 2 docs.
    out = _collect(dedup_lines_global(corpus))
    assert "\n\n" in out[1]["text"]
    assert (out[5]["text"], out[5]["n_kept"], out[5]["n_removed"]) \
        == ("", 1, 0)


def test_distinct_doc_counting_not_occurrences(corpus):
    # "unique to one" occurs twice but only in doc 1 -> kept even at
    # min_docs=2; at min_docs=5 nothing recurs widely enough.
    out = _collect(dedup_lines_global(corpus, min_docs=5))
    assert BOILER in out[2]["text"]
    assert out[1]["n_removed"] == 0


def test_min_docs_boundary(corpus):
    # BOILER is in exactly 4 distinct docs (1..4): removed at
    # min_docs=4, kept at 5 (the >= boundary, both sides).
    at4 = _collect(dedup_lines_global(corpus, min_docs=4))
    assert BOILER not in at4[3]["text"]


def test_deterministic_across_parallelism(corpus):
    a = dedup_lines_global(corpus).orderBy("doc_id").collect()
    b = (dedup_lines_global(corpus.repartition(7, "text"))
         .orderBy("doc_id").collect())
    assert a == b
