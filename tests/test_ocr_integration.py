"""Executable OCR-engine integration path (K8), Iceberg-style.

The sandbox runtime has no tesseract/PIL, so the suite carries the OCR
pipeline with a stub engine (reference semantics: errors and missing
engine -> '', ocr.py:45-49). This module is the skip-marked *real
engine* evidence, mirroring tests/test_sources_iceberg.py: on a host
with pytesseract + Pillow installed it wires the reference's own
engine shape (grayscale PIL image -> image_to_string, ocr.py:31-44)
into ``set_ocr_engine`` and runs the Spark-side ``ocr_text`` /
``ocr_page_chunks`` operators end to end against it, asserting both
the happy path and the errors->'' contract.
"""

from __future__ import annotations

import importlib.util

import pytest


def _have(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


requires_tesseract = pytest.mark.skipif(
    not (_have("pytesseract") and _have("PIL")),
    reason="pytesseract/Pillow absent (sandbox has no OCR runtime; "
           "pip install pytesseract pillow + apt tesseract-ocr to run)")


def _render_png(text: str) -> bytes:
    """White-on-black PNG with ``text`` drawn large enough for OCR."""
    import io

    from PIL import Image, ImageDraw

    img = Image.new("L", (48 * len(text) + 40, 96), color=255)
    ImageDraw.Draw(img).text((20, 20), text, fill=0)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _reference_engine(data: bytes) -> str:
    # the reference's engine shape: bytes -> grayscale PIL image ->
    # pytesseract.image_to_string (ocr.py:31-44)
    import io

    import pytesseract
    from PIL import Image

    return pytesseract.image_to_string(
        Image.open(io.BytesIO(data)).convert("L"))


@requires_tesseract
def test_ocr_text_with_real_engine(spark):
    from siren_spark.functions import multimodal as mm

    old = mm._ocr_engine
    mm.set_ocr_engine(_reference_engine)
    try:
        df = spark.createDataFrame(
            [("u1", bytearray(_render_png("HELLO"))),
             ("u2", bytearray(b"\x00not-an-image"))],   # error path -> ''
            "url string, html binary")
        rows = {r.url: r.text for r in mm.ocr_text(df).collect()}
    finally:
        mm._ocr_engine = old
    assert "HELLO" in rows["u1"].upper()
    assert rows["u2"] == ""          # ocr.py:45-49: any error -> ''


@requires_tesseract
def test_ocr_page_chunks_with_real_engine(spark):
    from pyspark.sql import Row

    from siren_spark.functions import multimodal as mm

    old = mm._ocr_engine
    mm.set_ocr_engine(_reference_engine)
    try:
        df = spark.createDataFrame([
            Row(page_key="p1", chunks=[
                Row(url="c1", data=bytearray(_render_png("CRISIS"))),
                Row(url="c2", data=bytearray(b"broken")),
            ]),
            Row(page_key="p2", chunks=[
                Row(url="c3", data=bytearray(b"also-broken")),
            ]),
        ])
        out = {r.page_key: dict(r.matches)
               for r in mm.ocr_page_chunks(df).collect()}
    finally:
        mm._ocr_engine = old
    # p1: only the readable chunk survives (ocr.py:88-91 non-empty only)
    assert set(out["p1"]) == {"c1"} and "CRISIS" in out["p1"]["c1"].upper()
    # p2: no matches -> EMPTY map, page kept (PageResult(matches={}))
    assert out["p2"] == {}


def test_ocr_contract_stub_matches_error_path(spark):
    """Runs everywhere: with NO engine installed the operators yield ''
    / empty matches — the same observable as the real engine's error
    path above, so the stub and the integration test pin one contract."""
    from siren_spark.functions import multimodal as mm

    assert mm._ocr_engine is None     # sandbox default
    df = spark.createDataFrame(
        [("u1", bytearray(b"anything"))], "url string, html binary")
    assert [r.text for r in mm.ocr_text(df).collect()] == [""]
