"""Multimodal (image/audio/video) column operators.

Media payloads are opaque ``binary`` columns with typed metadata structs
— the same shape as ``pages.html`` (the reference's OCR path fetches
page-chunk JPEGs as bytes, ocr.py:27-39, S10 in SURVEY.md §2.1). The
Spark-side plumbing here — schemas, Arrow batching, mapInPandas
signatures, partition behavior — is real and tested; the codec-dependent
decode step is stubbed (PIL/tesseract/ffmpeg are not in this runtime)
behind ``set_image_decoder``: install a real decoder in production, or
use the deterministic fake for pipeline tests.

Operators:
- ``sniff_media_meta``:   binary -> struct(format, width, height, n_bytes)
  (real header parsing for PNG/JPEG/GIF/WAV — pure byte-math, no codec)
- ``image_features``:     binary -> array<float> embedding (decoder-backed;
  deterministic fake = seeded bytes-hash projection)
- ``resize_meta``:        plan-level resize bookkeeping (target dims col)
- ``frame_sample``:       video binary -> exploded frame index rows (the
  sampling schedule is real; frame bytes come from the decoder)
- ``ocr_text``:           image binary -> string (K8, ocr.py:27-56; stub
  returns '' exactly like the reference's error path ocr.py:45-49 unless
  a real OCR engine is installed via ``set_ocr_engine``)
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pluggable codec hooks (absent in this runtime -> deterministic fakes)
# ---------------------------------------------------------------------------

_image_decoder: Callable[[bytes], "np.ndarray"] | None = None
_ocr_engine: Callable[[bytes], str] | None = None


def set_image_decoder(fn: Callable[[bytes], "np.ndarray"]) -> None:
    """Install a real decoder (e.g. PIL-backed bytes -> HxWx3 uint8)."""
    global _image_decoder
    _image_decoder = fn


def set_ocr_engine(fn: Callable[[bytes], str]) -> None:
    """Install a real OCR engine (reference: pytesseract.image_to_string
    over a grayscaled PIL image, ocr.py:31-44)."""
    global _ocr_engine
    _ocr_engine = fn


def _fake_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in decode: bytes -> pseudo-pixel grid seeded by
    content hash. Keeps every downstream shape/dtype contract honest."""
    h = hashlib.sha256(data or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# header sniffing — real, codec-free
# ---------------------------------------------------------------------------

def sniff_bytes(data: bytes | None) -> tuple[str, int, int, int]:
    """(format, width, height, n_bytes) from magic numbers + headers."""
    if not data:
        return ("empty", 0, 0, 0)
    n = len(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n" and n >= 24:
        w, h = _struct.unpack(">II", data[16:24])
        return ("png", w, h, n)
    if data[:3] == b"\xff\xd8\xff":
        # walk JPEG segments to SOF0/2 for dimensions
        i = 2
        while i + 9 < n:
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xC0, 0xC2):
                h, w = _struct.unpack(">HH", data[i + 5:i + 9])
                return ("jpeg", w, h, n)
            seglen = _struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seglen
        return ("jpeg", 0, 0, n)
    if data[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        w, h = _struct.unpack("<HH", data[6:10])
        return ("gif", w, h, n)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return ("wav", 0, 0, n)
    return ("unknown", 0, 0, n)


META_SCHEMA = ("url string, format string, width int, height int, "
               "n_bytes bigint")


def sniff_media_meta(df: DataFrame, *, payload_col: str = "html",
                     url_col: str = "url") -> DataFrame:
    """binary column -> typed media-metadata rows (one Arrow pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_bytes(bytes(b) if b is not None else None)
                     for b in pdf[payload_col]]
            yield pd.DataFrame({
                "url": pdf[url_col],
                "format": [m[0] for m in metas],
                "width": pd.array([m[1] for m in metas], dtype="int32"),
                "height": pd.array([m[2] for m in metas], dtype="int32"),
                "n_bytes": pd.array([m[3] for m in metas], dtype="int64"),
            })

    return df.select(url_col, payload_col).mapInPandas(run, META_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction / frame sampling / OCR — decoder-backed, stub-safe
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = "url string, embedding array<float>"


def image_features(df: DataFrame, *, dim: int = 16,
                   payload_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """binary -> fixed-dim float embedding (mean-pooled pixel projection).

    With the stub decoder the embedding is a deterministic function of the
    bytes — stable across runs and parallelism, so tests can assert exact
    values while the Spark plumbing (schemas, batching) is production-real.
    """
    decoder = _image_decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                px = decoder(bytes(b) if b is not None else b"")
                flat = px.astype(np.float32).reshape(-1)
                reps = int(np.ceil(dim * 1.0 * 3 / max(flat.size, 1))) + 1
                tiled = np.tile(flat, reps)[: dim * 3].reshape(dim, 3)
                out.append((tiled.mean(axis=1) / 255.0).astype(np.float32))
            yield pd.DataFrame({"url": pdf[url_col], "embedding": out})

    return df.select(url_col, payload_col).mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, *, every_n: int = 10, max_frames: int = 5,
                 payload_col: str = "html", url_col: str = "url",
                 n_frames_col: str | None = None) -> DataFrame:
    """Video frame-sampling schedule: explode (url, frame_idx) rows.

    The schedule (deterministic stride sampling) is the real, tested
    part; fetching the frame bytes is the decoder's job. Without a
    frame-count column a stub count derived from payload size is used.
    """
    if n_frames_col is None:
        df = df.withColumn("__nf",
                           (F.length(F.col(payload_col)) / 1024 + 1)
                           .cast("int"))
        n_frames_col = "__nf"
    idx = F.sequence(F.lit(0),
                     F.least(F.col(n_frames_col) - 1,
                             F.lit(every_n * (max_frames - 1))),
                     F.lit(every_n))
    return (df.select(url_col, F.explode(idx).alias("frame_idx"))
            .withColumnRenamed(url_col, "url"))


def ocr_text(df: DataFrame, *, payload_col: str = "html",
             url_col: str = "url") -> DataFrame:
    """K8 (ocr.py:27-56): image bytes -> text; errors/missing engine -> ''
    (the reference's own error path returns '' too, ocr.py:45-49)."""
    engine = _ocr_engine

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for b in pdf[payload_col]:
                if engine is None:
                    texts.append("")
                    continue
                try:
                    texts.append(engine(bytes(b)))
                except Exception:
                    texts.append("")
            yield pd.DataFrame({"url": pdf[url_col], "text": texts})

    return df.select(url_col, payload_col).mapInPandas(
        run, "url string, text string")


def ocr_page_chunks(df: DataFrame, key_cols: tuple[str, ...] = ("page_key",),
                    chunks_col: str = "chunks") -> DataFrame:
    """J5/A6 composed (ocr.py:74-110): page -> level-2 chunks -> OCR ->
    per-page map of chunk_url -> text.

    Input: one row per page, ``chunks_col`` an
    array<struct<url:string, ..., data:binary>> (the reference's
    PageLevel.chunks with fetched bytes). Output: one row per page with
    ``matches: map<string,string>`` containing only chunks whose OCR
    produced text (ocr.py:88-91 keeps non-empty only); pages with no
    matches keep an EMPTY map, like PageResult(matches={}) — they are
    not dropped (ocr.py:92).

    Plan shape: explode -> Arrow-batched OCR UDF -> map_from_entries
    over a sorted collect_list grouped back by page key. The only
    shuffle carries (page_key, chunk_url, text) — never image bytes.
    """
    engine = _ocr_engine

    @F.pandas_udf("string")
    def ocr_udf(data: pd.Series) -> pd.Series:
        out = []
        for b in data:
            if engine is None:
                out.append("")
                continue
            try:
                out.append(engine(bytes(b)))
            except Exception:        # ocr.py:45-49: errors -> ''
                out.append("")
        return pd.Series(out)

    key_list = list(key_cols)
    ex = df.select(*key_list, F.explode(F.col(chunks_col)).alias("__c"))
    ocd = ex.select(*key_list,
                    F.col("__c.url").alias("__curl"),
                    ocr_udf(F.col("__c.data")).alias("__txt"))
    matched = (ocd.filter(F.col("__txt") != "")
               .groupBy(*key_list)
               .agg(F.map_from_entries(F.sort_array(F.collect_list(
                   F.struct(F.col("__curl"), F.col("__txt")))))
                   .alias("matches")))
    base = df.select(*key_list)
    return (base.join(matched, key_list, "left")
            .withColumn("matches",
                        F.coalesce(F.col("matches"),
                                   F.create_map().cast(
                                       "map<string,string>"))))


__all__ = [
    "sniff_bytes", "sniff_media_meta", "image_features", "frame_sample",
    "ocr_text", "ocr_page_chunks", "set_image_decoder", "set_ocr_engine",
]
