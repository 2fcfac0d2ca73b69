"""WARC source and sink (ISO 28500) — the web-archive interchange
format CommonCrawl distributes, i.e. the ingestion format a web-scale
training-data pipeline actually starts from.

The reference engine persists fetched pages in its own local store
(reference: ht.py's page fetch + local sink family, SURVEY §2.1 S8);
this module adds the standard external interchange for the same data:
``write_warc`` serializes a DataFrame of (url, payload) rows into
``.warc.gz`` files (one gzip member per record, the CommonCrawl
layout, so any conformant reader can seek records independently) and
``read_warc`` parses WARC files back into a DataFrame.

Scale design (100 TB):

- The file is the unit of parallelism, exactly as in CommonCrawl
  (~64k files × ~1 GB per crawl): ``read_warc`` lists files with
  Spark's ``binaryFile`` source, so every file is one task and a
  100 TB crawl parses with ~100k-way parallelism and zero shuffle.
- The parser is a generator over per-record gzip members: records are
  yielded in bounded Arrow batches (``batch_rows``), never
  materialized as one Python list per file.
- ``write_warc`` rotates output files at ``max_file_bytes``
  (default 1 GiB, the CommonCrawl convention), which also bounds
  read-side task memory. The writer runs inside ``mapInPandas`` —
  each task streams its partition straight to disk and emits only a
  tiny per-file manifest row, so no page payload ever shuffles or
  collects.
- The sink writes to a path visible to the executors (local mode:
  any dir; cluster: a shared mount), matching the reference's
  local-sink contract; parquet/bucketed stores remain the engine's
  internal format (sources/pages.py).

Determinism: record bytes are a pure function of the row (record ids
are UUIDv5-style digests of url+date, dates default to a fixed
timestamp unless a column is given), so the parsed-back result is
independent of partitioning — file *names* depend on task layout, but
no query result does.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
DEFAULT_DATE = "2026-01-01T00:00:00Z"
_CRLF = b"\r\n"

READ_SCHEMA = ("warc_file string, warc_type string, record_id string, "
               "url string, warc_date string, content_type string, "
               "content_length long, payload binary")

_MANIFEST_SCHEMA = "file string, n_records long, n_bytes long"


def _record_id(url: str, date: str) -> str:
    """Deterministic RFC-9562-shaped urn:uuid from (url, date)."""
    h = hashlib.md5(f"{url}\x1f{date}".encode()).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=h)}>"


def _record_bytes(warc_type: str, headers: list[tuple[str, str]],
                  payload: bytes) -> bytes:
    buf = io.BytesIO()
    buf.write(WARC_VERSION + _CRLF)
    buf.write(f"WARC-Type: {warc_type}".encode() + _CRLF)
    for k, v in headers:
        buf.write(f"{k}: {v}".encode() + _CRLF)
    buf.write(f"Content-Length: {len(payload)}".encode() + _CRLF)
    buf.write(_CRLF)
    buf.write(payload)
    buf.write(_CRLF + _CRLF)
    return buf.getvalue()


def _warcinfo_bytes(date: str) -> bytes:
    body = b"software: siren_spark\r\nformat: WARC File Format 1.0\r\n"
    return _record_bytes("warcinfo", [
        ("WARC-Record-ID", _record_id("urn:warcinfo", date)),
        ("WARC-Date", date),
        ("Content-Type", "application/warc-fields"),
    ], body)


class _RotatingWriter:
    """Per-task WARC file writer, rolling at max_file_bytes. With
    ``cdx=True`` each rolled file gets a ``<name>.cdx`` sidecar of
    tab-separated (url, offset, length) lines — offset/length of the
    record's own gzip member (or raw record bytes when uncompressed),
    so a reader can fetch any single record with one seek."""

    def __init__(self, path: str, pid: int, *, gzip_members: bool,
                 max_file_bytes: int, info_date: str, cdx: bool = False):
        self.path, self.pid = path, pid
        self.gzip_members = gzip_members
        self.max_file_bytes = max_file_bytes
        self.info_date = info_date
        self.cdx = cdx
        self.seq = -1
        self.fh = None
        self.bytes_in_file = 0
        self.manifest: list[tuple[str, int, int]] = []
        self.n_in_file = 0
        self.cdx_rows: list[tuple[str, int, int]] = []

    def _roll(self) -> None:
        self._close()
        self.seq += 1
        ext = ".warc.gz" if self.gzip_members else ".warc"
        name = f"part-{self.pid:05d}-{self.seq:04d}{ext}"
        self.fh = open(os.path.join(self.path, name), "wb")
        self.current = name
        self.bytes_in_file = 0
        self.n_in_file = 0
        self.cdx_rows = []
        self._emit(_warcinfo_bytes(self.info_date))

    def _emit(self, record: bytes) -> int:
        if self.gzip_members:
            record = gzip.compress(record, mtime=0)
        self.fh.write(record)
        self.bytes_in_file += len(record)
        return len(record)

    def write(self, record: bytes, url: str | None = None) -> None:
        if self.fh is None or self.bytes_in_file >= self.max_file_bytes:
            self._roll()
        offset = self.bytes_in_file
        length = self._emit(record)
        self.n_in_file += 1
        if self.cdx and url is not None:
            self.cdx_rows.append((url, offset, length))

    def _close(self) -> None:
        if self.fh is not None:
            self.fh.close()
            self.manifest.append(
                (self.current, self.n_in_file, self.bytes_in_file))
            if self.cdx:
                with open(os.path.join(self.path,
                                       self.current + ".cdx"), "w") as fh:
                    for url, off, ln in self.cdx_rows:
                        fh.write(f"{url}\t{off}\t{ln}\n")
            self.fh = None

    def close(self) -> list[tuple[str, int, int]]:
        self._close()
        return self.manifest


def write_warc(
    df: DataFrame,
    path: str,
    *,
    url_col: str = "url",
    payload_col: str = "payload",
    date_col: str | None = None,
    warc_type: str = "response",
    content_type: str = "application/http; msgtype=response",
    gzip_members: bool = True,
    max_file_bytes: int = 1 << 30,
    cdx: bool = False,
) -> DataFrame:
    """Write (url, payload) rows as WARC files under ``path``.

    Returns the small per-file manifest DataFrame (file, n_records,
    n_bytes) — already materialized (the write has happened when this
    returns), so callers can assert counts without re-scanning.
    ``cdx=True`` additionally writes a ``<file>.cdx`` offset sidecar
    per file (see ``read_cdx`` / ``fetch_warc_records``).
    """
    os.makedirs(path, exist_ok=True)
    cols = [F.col(url_col).cast("string").alias("url"),
            F.col(payload_col).cast("binary").alias("payload")]
    if date_col is not None:
        cols.append(F.col(date_col).cast("string").alias("date"))
    staged = df.select(*cols)
    has_date = date_col is not None

    def write_partition(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        w = _RotatingWriter(path, pid, gzip_members=gzip_members,
                            max_file_bytes=max_file_bytes,
                            info_date=DEFAULT_DATE, cdx=cdx)
        for pdf in batches:
            dates = (pdf["date"] if has_date
                     else pd.Series([DEFAULT_DATE] * len(pdf)))
            for url, payload, date in zip(pdf["url"], pdf["payload"],
                                          dates):
                if url is None:
                    continue
                body = bytes(payload) if payload is not None else b""
                date = date if date else DEFAULT_DATE
                w.write(_record_bytes(warc_type, [
                    ("WARC-Record-ID", _record_id(url, date)),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", url),
                    ("Content-Type", content_type),
                ], body), url=url)
        rows = w.close()
        yield pd.DataFrame(rows, columns=["file", "n_records", "n_bytes"])

    rows = staged.mapInPandas(write_partition,
                              schema=_MANIFEST_SCHEMA).collect()
    return df.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time
    (bounded memory per member, not per file)."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(blob[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC file")
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def _parse_records(buf: bytes, filename: str) -> Iterator[tuple]:
    """Parse consecutive WARC records from a decompressed buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        while buf[pos:pos + 2] == _CRLF:  # inter-record padding
            pos += 2
        if pos >= n:
            return
        eol = buf.index(_CRLF, pos)
        version = buf[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"{filename}: expected WARC/x.y header at offset {pos}, "
                f"got {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.index(_CRLF, pos)
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"{filename}: record missing Content-Length")
        payload = buf[pos:pos + clen]
        if len(payload) != clen:
            raise ValueError(f"{filename}: truncated payload "
                             f"({len(payload)}/{clen} bytes)")
        pos += clen
        yield (filename,
               headers.get("warc-type", ""),
               headers.get("warc-record-id", ""),
               headers.get("warc-target-uri"),
               headers.get("warc-date", ""),
               headers.get("content-type", ""),
               clen,
               payload)


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: Iterable[str] | None = ("response",),
    batch_rows: int = 1024,
) -> DataFrame:
    """Read WARC (.warc / .warc.gz) files under ``path`` as a
    DataFrame. ``record_types`` filters by WARC-Type (default keeps
    only responses, dropping warcinfo/request records); pass None to
    surface every record.
    """
    wanted = None if record_types is None else set(record_types)
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_file", "warc_type", "record_id", "url",
                "warc_date", "content_type", "content_length", "payload"]
        pending: list[tuple] = []
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                blob = bytes(blob)
                name = os.path.basename(fpath)
                if fpath.endswith(".gz"):
                    chunks: Iterable[bytes] = _gzip_members(blob)
                else:
                    chunks = (blob,)
                for chunk in chunks:
                    for rec in _parse_records(chunk, name):
                        if wanted is not None and rec[1] not in wanted:
                            continue
                        pending.append(rec)
                        if len(pending) >= batch_rows:
                            yield pd.DataFrame(pending, columns=cols)
                            pending = []
        if pending:
            yield pd.DataFrame(pending, columns=cols)

    return files.mapInPandas(parse, schema=READ_SCHEMA)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read the ``.cdx`` offset sidecars under ``path`` as a DataFrame
    (url, file, offset, length). The index is tiny relative to the
    archive (~40 bytes/record vs pages), so it usually broadcasts —
    this is exactly CommonCrawl's CDX consumption pattern: query the
    index, fetch only the matching members."""
    lines = (spark.read.format("text")
             .option("pathGlobFilter", "*.cdx")
             .load(path)
             .select(F.split(F.col("value"), "\t").alias("p"),
                     F.element_at(F.split(F.input_file_name(), "/"), -1)
                     .alias("sidecar")))
    return lines.select(
        F.col("p")[0].alias("url"),
        F.regexp_replace("sidecar", r"\.cdx$", "").alias("file"),
        F.col("p")[1].cast("long").alias("offset"),
        F.col("p")[2].cast("long").alias("length"))


def fetch_warc_records(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    *,
    batch_rows: int = 1024,
) -> DataFrame:
    """Random-access fetch: given CDX index rows (file, offset,
    length[, url]), seek-read exactly those members from the WARC
    files under ``path`` and parse them — never scanning a full file.

    This is the targeted re-extraction path at scale: filter the
    (tiny) index with ordinary DataFrame ops, then pay I/O only for
    the selected records — re-parsing 10^6 pages out of a 10^10-page
    archive touches ~0.01% of the bytes. Each task sorts its index
    rows by (file, offset) so reads are sequential per file handle.
    """
    idx = index.select("file", "offset", "length")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_file", "warc_type", "record_id", "url",
                "warc_date", "content_type", "content_length", "payload"]
        pending: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(["file", "offset"])
            open_name, fh = None, None
            try:
                for fname, off, ln in zip(pdf["file"], pdf["offset"],
                                          pdf["length"]):
                    if fname != open_name:
                        if fh is not None:
                            fh.close()
                        fh = open(os.path.join(path, fname), "rb")
                        open_name = fname
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                    if len(blob) != int(ln):
                        raise ValueError(
                            f"{fname}: short read at offset {off}")
                    if fname.endswith(".gz"):
                        blob = next(_gzip_members(blob))
                    pending.extend(_parse_records(blob, fname))
                    if len(pending) >= batch_rows:
                        yield pd.DataFrame(pending, columns=cols)
                        pending = []
            finally:
                if fh is not None:
                    fh.close()
        if pending:
            yield pd.DataFrame(pending, columns=cols)

    return idx.mapInPandas(fetch, schema=READ_SCHEMA)


__all__ = ["write_warc", "read_warc", "read_cdx", "fetch_warc_records",
           "READ_SCHEMA", "DEFAULT_DATE"]
