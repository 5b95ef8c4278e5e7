"""Real-decoder multimodal tests, gated on PIL presence.

This sandbox has no image library, so every test here skips; on a
cluster image that carries PIL they run the REAL decode path end-to-end
(decode_image / resize_image / decoded_image_features), closing the
documented seam in operators/multimodal.py. The deterministic-fake
plumbing (media_features / frame_samples) is oracle-checked separately
and does not depend on PIL.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")

from data_pipeline_example_spark.operators import multimodal  # noqa: E402


def _png_bytes(width: int, height: int, color=(200, 10, 10)) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (width, height), color).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_roundtrip():
    img = multimodal.decode_image(_png_bytes(12, 7))
    assert (img.width, img.height) == (12, 7)
    assert img.mode == "RGB"


def test_resize_image_reencodes():
    out = multimodal.resize_image(_png_bytes(12, 7), 4, 3)
    img = multimodal.decode_image(out)
    assert (img.width, img.height) == (4, 3)


def test_decode_image_rejects_garbage():
    with pytest.raises(Exception):
        multimodal.decode_image(b"definitely not an image")


def test_decoded_image_features_end_to_end(spark):
    rows = [(1, "image/png", _png_bytes(12, 7)), (2, "image/png", _png_bytes(3, 5))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["mode"])
        for r in multimodal.decoded_image_features(media).collect()
    }
    assert got == {1: (12, 7, "RGB"), 2: (3, 5, "RGB")}
