"""Multimodal plumbing: header sniffing, features, frame sampling, OCR stub."""

import struct

from pyspark.sql import functions as F

from siren_spark.functions.multimodal import (
    frame_sample, image_features, ocr_text, set_ocr_engine, sniff_bytes,
    sniff_media_meta,
)


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", w, h) + b"\x00" * 16


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _jpeg(w, h):
    # SOI + APP0 + SOF0 segment carrying dims
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_sniff_bytes():
    assert sniff_bytes(_png(640, 480))[:3] == ("png", 640, 480)
    assert sniff_bytes(_gif(10, 20))[:3] == ("gif", 10, 20)
    assert sniff_bytes(_jpeg(320, 200))[:3] == ("jpeg", 320, 200)
    assert sniff_bytes(b"RIFF....WAVEfmt ")[0] == "wav"
    assert sniff_bytes(None) == ("empty", 0, 0, 0)
    assert sniff_bytes(b"garbage")[0] == "unknown"


def test_sniff_media_meta_spark(spark):
    df = spark.createDataFrame(
        [("u1", _png(640, 480)), ("u2", _jpeg(32, 16)), ("u3", b"xx")],
        "url string, html binary",
    )
    rows = {r.url: r for r in sniff_media_meta(df).collect()}
    assert rows["u1"].format == "png" and rows["u1"].width == 640
    assert rows["u2"].format == "jpeg" and rows["u2"].height == 16
    assert rows["u3"].format == "unknown" and rows["u3"].n_bytes == 2


def test_image_features_deterministic(spark):
    df = spark.createDataFrame([("a", b"imgbytes"), ("b", b"imgbytes"),
                                ("c", b"other")],
                               "url string, html binary")
    rows = {r.url: list(r.embedding) for r in
            image_features(df, dim=8).collect()}
    assert len(rows["a"]) == 8
    assert rows["a"] == rows["b"]          # content-deterministic
    assert rows["a"] != rows["c"]
    assert all(0.0 <= v <= 1.0 for v in rows["a"])
    # stable across partitioning
    rows2 = {r.url: list(r.embedding) for r in
             image_features(df.repartition(3), dim=8).collect()}
    assert rows2 == rows


def test_frame_sample_schedule(spark):
    df = spark.createDataFrame([("v", bytearray(50 * 1024))],
                               "url string, html binary")
    idx = sorted(r.frame_idx for r in
                 frame_sample(df, every_n=10, max_frames=5).collect())
    assert idx == [0, 10, 20, 30, 40]


def test_ocr_stub_and_plugged_engine(spark):
    df = spark.createDataFrame([("i", b"\x89PNG1234")], "url string, html binary")
    assert ocr_text(df).collect()[0].text == ""   # no engine -> '' (ocr.py:45-49)
    set_ocr_engine(lambda b: f"ocr:{len(b)}")
    try:
        assert ocr_text(df).collect()[0].text == "ocr:8"  # len(b"\x89PNG1234")
        set_ocr_engine(lambda b: 1 / 0)           # engine error -> '' too
        assert ocr_text(df).collect()[0].text == ""
    finally:
        import siren_spark.functions.multimodal as mm
        mm._ocr_engine = None


def test_ocr_page_chunks_pipeline(spark):
    """J5/A6 composed pipeline vs a direct per-page dict oracle
    (ocr.py:74-110): explode chunks -> OCR -> per-page url->text map;
    empty OCR results excluded; pages with no matches keep {}."""
    from siren_spark.functions import multimodal as mm

    def fake_ocr(data: bytes) -> str:
        s = data.decode()
        return f"text:{s}" if "hit" in s else ""

    pages = [
        ("p1", [("c1", b"hit-a"), ("c2", b"miss"), ("c3", b"hit-b")]),
        ("p2", [("c4", b"miss"), ("c5", b"miss")]),
        ("p3", []),
    ]
    # the reference oracle: dict comprehension mirroring Page.search
    expected = {
        key: {u: fake_ocr(d) for (u, d) in chunks if fake_ocr(d)}
        for key, chunks in pages
    }

    rows = [(k, [{"url": u, "data": d} for (u, d) in chunks])
            for k, chunks in pages]
    df = spark.createDataFrame(
        rows, "page_key string, chunks array<struct<url:string,data:binary>>")
    mm.set_ocr_engine(fake_ocr)
    try:
        got = {r.page_key: dict(r.matches)
               for r in mm.ocr_page_chunks(df).collect()}
    finally:
        mm.set_ocr_engine(None)
    assert got == expected
    assert got["p3"] == {}
