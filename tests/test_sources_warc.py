"""Tests for sources/warc.py: round-trip fidelity, interop with
externally-produced WARC bytes (hand-built per ISO 28500, single gzip
member — the layout our writer does NOT produce), file rotation,
record-type filtering, and malformed-input errors.
"""

import gzip
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from siren_spark.sources.warc import (
    DEFAULT_DATE,
    read_warc,
    write_warc,
)


def _staged(spark, n=20, parts=4):
    return (spark.range(n).repartition(parts).select(
        F.concat(F.lit("https://t.example/p/"), F.col("id")).alias("url"),
        F.concat(F.lit("body-"), F.col("id")).cast("binary")
        .alias("payload")))


def test_roundtrip_gzip_and_plain(spark):
    for gz in (True, False):
        out = tempfile.mkdtemp(prefix="warc_t_")
        man = write_warc(_staged(spark), out, gzip_members=gz)
        assert man.agg(F.sum("n_records")).first()[0] == 20
        ext = ".warc.gz" if gz else ".warc"
        assert all(f.endswith(ext) for f in os.listdir(out))
        back = read_warc(spark, out)
        rows = {r.url: bytes(r.payload) for r in back.collect()}
        assert len(rows) == 20
        assert rows["https://t.example/p/7"] == b"body-7"


def test_roundtrip_unicode_and_empty_payload(spark):
    out = tempfile.mkdtemp(prefix="warc_t_")
    d = spark.createDataFrame(
        [("https://t.example/u", "résumé 中文"),
         ("https://t.example/e", "")],
        ["url", "payload"])
    write_warc(d, out)
    got = {r.url: (bytes(r.payload), r.content_length)
           for r in read_warc(spark, out).collect()}
    body = "résumé 中文".encode()
    assert got["https://t.example/u"] == (body, len(body))
    assert got["https://t.example/e"] == (b"", 0)


def test_reader_parses_external_single_member_gzip(spark):
    """A conformant file our writer never produces: two records inside
    ONE gzip member, LF-free headers in a different order, extra
    header the schema ignores."""
    rec = (b"WARC/1.0\r\n"
           b"Content-Length: 5\r\n"
           b"WARC-Date: 2020-05-06T01:02:03Z\r\n"
           b"WARC-Type: response\r\n"
           b"X-Extra: ignored\r\n"
           b"WARC-Target-URI: https://ext.example/a\r\n"
           b"WARC-Record-ID: <urn:uuid:0>\r\n"
           b"\r\n"
           b"hello\r\n\r\n")
    rec2 = rec.replace(b"/a", b"/b").replace(b"hello", b"world")
    out = tempfile.mkdtemp(prefix="warc_t_")
    with open(os.path.join(out, "ext.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(rec + rec2))
    rows = sorted((r.url, bytes(r.payload), r.warc_date)
                  for r in read_warc(spark, out).collect())
    assert rows == [
        ("https://ext.example/a", b"hello", "2020-05-06T01:02:03Z"),
        ("https://ext.example/b", b"world", "2020-05-06T01:02:03Z")]


def test_rotation_bounds_file_size(spark):
    out = tempfile.mkdtemp(prefix="warc_t_")
    man = write_warc(_staged(spark, n=50, parts=1), out,
                     max_file_bytes=600, gzip_members=False)
    files = man.collect()
    assert len(files) > 1                       # actually rotated
    assert sum(r.n_records for r in files) == 50
    assert read_warc(spark, out).count() == 50


def test_type_filter_and_warcinfo(spark):
    out = tempfile.mkdtemp(prefix="warc_t_")
    man = write_warc(_staged(spark, parts=2), out)
    n_files = man.count()
    every = read_warc(spark, out, record_types=None)
    by_type = {r["warc_type"]: r["count"]
               for r in every.groupBy("warc_type").count().collect()}
    assert by_type == {"warcinfo": n_files, "response": 20}
    # default filter hides warcinfo
    assert read_warc(spark, out).count() == 20


def test_date_column_and_deterministic_ids(spark):
    out = tempfile.mkdtemp(prefix="warc_t_")
    d = spark.createDataFrame(
        [("https://t.example/d", "x", "2021-02-03T04:05:06Z")],
        ["url", "payload", "fetched_at"])
    write_warc(d, out, date_col="fetched_at")
    r1 = read_warc(spark, out).first()
    assert r1.warc_date == "2021-02-03T04:05:06Z"
    # same (url, date) in a second write dir -> identical record id
    out2 = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(d, out2, date_col="fetched_at")
    r2 = read_warc(spark, out2).first()
    assert r1.record_id == r2.record_id
    # default date applies when no column is given
    out3 = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(d.drop("fetched_at"), out3)
    assert read_warc(spark, out3).first().warc_date == DEFAULT_DATE


@pytest.mark.parametrize("blob,err", [
    (b"HTTP/1.1 200 OK\r\n\r\n", "expected WARC"),
    (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n", "Content-Length"),
    (b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort", "truncated"),
])
def test_malformed_warc_raises(spark, blob, err):
    out = tempfile.mkdtemp(prefix="warc_t_")
    with open(os.path.join(out, "bad.warc"), "wb") as fh:
        fh.write(blob)
    with pytest.raises(Exception, match=err):
        read_warc(spark, out).count()


def test_truncated_gzip_member_raises(spark):
    out = tempfile.mkdtemp(prefix="warc_t_")
    good = gzip.compress(b"WARC/1.0\r\nContent-Length: 0\r\n"
                         b"WARC-Type: response\r\n\r\n\r\n\r\n")
    with open(os.path.join(out, "cut.warc.gz"), "wb") as fh:
        fh.write(good[:-4])
    with pytest.raises(Exception, match="truncated gzip"):
        read_warc(spark, out).count()


# ------------------------------------------------------- CDX random access

def test_cdx_index_and_random_access(spark):
    from siren_spark.sources.warc import fetch_warc_records, read_cdx
    out = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(_staged(spark, n=40, parts=3), out, cdx=True,
               max_file_bytes=900)
    idx = read_cdx(spark, out)
    assert idx.count() == 40
    # warcinfo records are not indexed: every offset is > 0
    assert idx.filter(F.col("offset") <= 0).count() == 0
    sel = idx.filter(F.col("url").rlike("/p/1?3$"))   # 3, 13
    got = {r.url: bytes(r.payload)
           for r in fetch_warc_records(spark, out, sel).collect()}
    assert got == {"https://t.example/p/3": b"body-3",
                   "https://t.example/p/13": b"body-13"}


def test_cdx_offsets_are_member_exact(spark):
    """Seek+read of (offset, length) yields a standalone gzip member
    parseable WITHOUT any surrounding file context."""
    import gzip as _gz
    from siren_spark.sources.warc import read_cdx
    out = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(_staged(spark, n=5, parts=1), out, cdx=True)
    row = read_cdx(spark, out).orderBy("url").first()
    with open(os.path.join(out, row.file), "rb") as fh:
        fh.seek(row.offset)
        member = fh.read(row.length)
    rec = _gz.decompress(member)
    assert rec.startswith(b"WARC/1.0\r\n")
    assert row.url.encode() in rec


def test_cdx_random_access_plain_warc(spark):
    from siren_spark.sources.warc import fetch_warc_records, read_cdx
    out = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(_staged(spark, n=10, parts=2), out, cdx=True,
               gzip_members=False)
    idx = read_cdx(spark, out).filter(F.col("url").endswith("8"))
    got = fetch_warc_records(spark, out, idx).collect()
    assert len(got) == 1 and bytes(got[0].payload) == b"body-8"


def test_fetch_short_read_raises(spark):
    from siren_spark.sources.warc import fetch_warc_records, read_cdx
    out = tempfile.mkdtemp(prefix="warc_t_")
    write_warc(_staged(spark, n=3, parts=1), out, cdx=True)
    idx = read_cdx(spark, out).withColumn(
        "offset", F.col("offset") + F.lit(10 ** 6))
    with pytest.raises(Exception, match="short read"):
        fetch_warc_records(spark, out, idx).count()
