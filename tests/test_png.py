"""Unit tests for the pure-Python PNG codec (formats/png_py.py) and its
registration on the multimodal decode seam."""

from __future__ import annotations

import struct
import zlib

import pytest

from dynamic_partitioner_spark.formats.png_py import (
    PngFormatError, PngImage, decode_png, encode_png, png_stats_codec,
    register_png_codec, synthetic_dims, synthetic_pixel, synthetic_png)


def _pixels(n: int, seed: int = 1) -> bytes:
    return bytes((seed * 97 + i * 31 + (i % 7) * 5) % 256
                 for i in range(n))


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3),
                                                 (4, 2), (6, 4)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_color_type_and_filter(color_type, channels,
                                               ftype):
    w, h = 13, 9
    px = _pixels(w * h * channels, seed=ftype + 10 * color_type)
    blob = encode_png(px, w, h, color_type,
                      filter_choice=lambda y: ftype)
    img = decode_png(blob)
    assert (img.width, img.height, img.channels) == (w, h, channels)
    assert img.pixels == px


def test_roundtrip_mixed_filters_wide_and_tall():
    for w, h in [(1, 1), (1, 40), (40, 1), (17, 23)]:
        px = _pixels(w * h * 4, seed=w * 100 + h)
        blob = encode_png(px, w, h, 6, filter_choice=lambda y: y % 5)
        assert decode_png(blob).pixels == px


def test_signature_and_crc_rejected():
    blob = synthetic_png(42)
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"NOPE" + blob[4:])
    # flip one IDAT payload bit -> CRC must catch it
    corrupt = bytearray(blob)
    idat_at = blob.index(b"IDAT")
    corrupt[idat_at + 6] ^= 0x01
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(corrupt))


def test_truncation_and_unsupported_profiles_rejected():
    blob = synthetic_png(7)
    with pytest.raises(PngFormatError):
        decode_png(blob[:len(blob) // 2])
    # rebuild IHDR with 16-bit depth -> rejected, not misdecoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 6, 0, 0, 0)
    chunk = (struct.pack(">I", 13) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\x0a" + chunk)
    with pytest.raises(PngFormatError):
        decode_png(None)


def test_synthetic_fixture_matches_rule():
    for doc_id in [0, 1, 17, 123456]:
        w, h = synthetic_dims(doc_id)
        img = decode_png(synthetic_png(doc_id))
        assert (img.width, img.height) == (w, h)
        expect = bytes(synthetic_pixel(doc_id, i)
                       for i in range(w * h * 4))
        assert img.pixels == expect


def test_stats_codec_sums_and_registry(spark):
    # registry DDL validation needs the active session (`spark` unused
    # otherwise)
    doc_id = 99
    stats = png_stats_codec(synthetic_png(doc_id))
    w, h = synthetic_dims(doc_id)
    n = w * h * 4
    vals = [synthetic_pixel(doc_id, i) for i in range(n)]
    assert stats["width"] == w and stats["height"] == h
    assert stats["n_px"] == w * h
    for c, name in enumerate(["sum_r", "sum_g", "sum_b", "sum_a"]):
        assert stats[name] == sum(v for i, v in enumerate(vals)
                                  if i % 4 == c)
    # grayscale payload refuses the RGBA stats codec
    gray = encode_png(_pixels(16), 4, 4, color_type=0)
    with pytest.raises(PngFormatError, match="RGBA"):
        png_stats_codec(gray)
    from dynamic_partitioner_spark.operators.multimodal import (
        _CODEC_REGISTRY, unregister_codec)
    register_png_codec()
    try:
        assert "image/png" in _CODEC_REGISTRY
    finally:
        unregister_codec("image/png")


def test_sniff_agrees_with_codec():
    """The magic-byte sniffer must route real PNG bytes to this codec's
    mode string."""
    from dynamic_partitioner_spark.operators.multimodal import MAGIC_MIME
    blob = synthetic_png(5)
    prefix, mime = MAGIC_MIME[0]
    assert mime == "image/png"
    assert blob.hex().upper().startswith(prefix)
    assert isinstance(decode_png(blob), PngImage)


def test_text_chunks_roundtrip_and_meta_codec():
    from dynamic_partitioner_spark.formats.png_py import png_meta_codec

    meta = {"lang": "de", "source": "src7", "zz": "last"}
    blob = synthetic_png(11, text_chunks=meta)
    img = decode_png(blob)
    assert img.text == meta
    # pixels unaffected by the tEXt chunks
    assert img.pixels == decode_png(synthetic_png(11)).pixels
    out = png_meta_codec(blob)
    w, h = synthetic_dims(11)
    assert (out["width"], out["height"], out["n_text"]) == (w, h, 3)
    assert out["meta_json"] == \
        '{"lang":"de","source":"src7","zz":"last"}'
    # no tEXt -> empty JSON object, zero count
    bare = png_meta_codec(synthetic_png(11))
    assert (bare["n_text"], bare["meta_json"]) == (0, "{}")
    # NUL in a value must be rejected at encode time, not smuggled
    with pytest.raises(ValueError, match="tEXt"):
        synthetic_png(11, text_chunks={"k": "a\x00b"})


def test_dhash_codec_known_gradients():
    """Hand-checked hashes: constant luma → 0; a strictly decreasing
    horizontal gradient sets bits 0–6 of every row (bit 7 wraps to the
    brighter column 0) → 0x7F per row-byte in both halves."""
    from dynamic_partitioner_spark.formats.png_py import (
        encode_png, png_dhash_codec)

    flat = encode_png(bytes([128, 128, 128, 255]) * 64, 8, 8,
                      color_type=6)
    out = png_dhash_codec(flat)
    assert (out["width"], out["height"]) == (8, 8)
    assert out["dhash_hi"] == 0 and out["dhash_lo"] == 0

    px = bytearray()
    for _r in range(8):
        for c in range(8):
            v = 200 - 10 * c
            px += bytes([v, v, v, 255])
    grad = png_dhash_codec(encode_png(bytes(px), 8, 8, color_type=6))
    assert grad["dhash_lo"] == 0x7F7F7F7F
    assert grad["dhash_hi"] == 0x7F7F7F7F


def test_dhash_codec_rejects_small_images():
    from dynamic_partitioner_spark.formats.png_py import (
        PngFormatError, encode_png, png_dhash_codec)

    tiny = encode_png(bytes([0, 0, 0, 255]) * 21, 7, 3, color_type=6)
    with pytest.raises(PngFormatError, match="8x8"):
        png_dhash_codec(tiny)


def test_dhash_codec_matches_pixel_rule():
    """The codec on the synthetic fixture equals a straight numpy
    evaluation of the pixel rule — the same independence the DuckDB
    twin certifies (but cheap enough to pin per-commit)."""
    import numpy as np

    from dynamic_partitioner_spark.formats.png_py import (
        png_dhash_codec, synthetic_dims, synthetic_pixel)

    for doc_id in (0, 7, 38, 123):
        w, h = synthetic_dims(doc_id)
        px = np.array([synthetic_pixel(doc_id, i)
                       for i in range(w * h * 4)]).reshape(h, w, 4)
        luma = (299 * px[:8, :8, 0] + 587 * px[:8, :8, 1]
                + 114 * px[:8, :8, 2])
        bits = (luma > np.roll(luma, -1, axis=1)).astype(int).ravel()
        lo = sum(int(bits[k]) << k for k in range(32))
        hi = sum(int(bits[32 + k]) << k for k in range(32))
        out = png_dhash_codec(synthetic_png(doc_id))
        assert (out["dhash_hi"], out["dhash_lo"]) == (hi, lo), doc_id


def test_png_r14_hardening():
    """r14 review pins (r15-adjusted): (1) duplicate IHDR rejected (a
    second one silently rewrote the geometry); (2) repeated tEXt
    keywords — spec-valid per ISO 15948 §11.3.3.2 — ACCUMULATE under
    deterministic suffix-indexed keys instead of rejecting (r15
    ADVICE; the r14 rejection was stricter than the spec), with
    literal-collision bumping; (3) a small payload whose IHDR declares
    a huge image is rejected BEFORE inflating (decompression-bomb
    guard, cap overridable per call), and the inflate itself is
    bounded to the declared size."""
    import struct as _struct
    import zlib as _zlib

    from dynamic_partitioner_spark.formats.png_py import (
        _SIGNATURE, _chunk)

    def ihdr(w, h, ct=0):
        return _chunk(b"IHDR",
                      _struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))

    # (1) duplicate IHDR
    raw = bytes([0]) * (1 + 1)            # 1x1 gray: filter byte + px
    blob = (_SIGNATURE + ihdr(1, 1) + ihdr(1, 1)
            + _chunk(b"IDAT", _zlib.compress(raw))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngFormatError, match="duplicate IHDR"):
        decode_png(blob)

    # (2) repeated tEXt keywords accumulate in chunk order; a literal
    # "Comment#2" keyword already present bumps the repeat past it
    blob = (_SIGNATURE + ihdr(1, 1)
            + _chunk(b"tEXt", b"Comment\x00a")
            + _chunk(b"tEXt", b"Comment#2\x00literal")
            + _chunk(b"tEXt", b"Comment\x00b")
            + _chunk(b"tEXt", b"Comment\x00c")
            + _chunk(b"IDAT", _zlib.compress(raw))
            + _chunk(b"IEND", b""))
    img = decode_png(blob)
    assert img.text == {"Comment": "a", "Comment#2": "literal",
                        "Comment#3": "b", "Comment#4": "c"}
    assert len(img.text) == 4             # n_text == tEXt chunk count

    # (3) declared-size cap fires before any inflate, and is a per-call
    # parameter (default MAX_DECODED_BYTES)
    bomb = (_SIGNATURE + ihdr(60000, 60000)
            + _chunk(b"IDAT", _zlib.compress(b"\x00" * 64))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngFormatError, match="decode cap"):
        decode_png(bomb)
    with pytest.raises(PngFormatError, match="decode cap"):
        decode_png(blob, max_decoded_bytes=1)   # valid file, tiny cap
    from dynamic_partitioner_spark.formats.png_py import (
        MAX_DECODED_BYTES)
    assert MAX_DECODED_BYTES == 256 * 1024 * 1024

    # bounded inflate: stream longer than declared rejected, not
    # silently truncated
    long_raw = bytes([0]) * (2 * (1 + 1))  # two rows for a 1x1 image
    blob = (_SIGNATURE + ihdr(1, 1)
            + _chunk(b"IDAT", _zlib.compress(long_raw))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngFormatError, match="expected"):
        decode_png(blob)
