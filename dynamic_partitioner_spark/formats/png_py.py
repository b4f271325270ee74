"""Minimal pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only) —
the real decoder the multimodal registry was missing.

Implements the public PNG specification (W3C/ISO 15948, RFC 2083):
8-bit-depth images, color types 0 (grayscale), 2 (RGB), 4 (gray+alpha)
and 6 (RGBA), interlace method 0, all five scanline filter types
(None/Sub/Up/Average/Paeth), chunk CRC-32 verification.  Palette,
sub-byte depths, 16-bit and Adam7 interlacing are out of scope and
REJECTED loudly — this codec exists to exercise the
``operators.multimodal.register_codec`` seam end-to-end with honest
bytes, not to replace libpng: per-scanline unfiltering runs a Python
loop for the sequential filters (Sub/Average/Paeth carry a
left-neighbor dependency), which is fine for the thumbnail-scale
fixtures here and would be the first thing a PIL-backed codec replaces
at real media sizes (the registry swap is one ``register_codec`` call;
none of the Spark plumbing changes).

No counterpart in the reference (its binary handling stops at opaque
``bytes``, ``common/StructuredToOrcTransformer.java:129-134``).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_SIGNATURE = b"\x89PNG\r\n\x1a\x0a"

#: color type -> samples per pixel (bit depth 8 => bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: default cap on the DECLARED decoded size (row bytes + filter bytes)
#: — IHDR dims are attacker-controlled 32-bit values, so the cap fires
#: BEFORE any inflate; 256 MiB covers ~8192x8192 RGB.  Callers with
#: deliberately large assets raise it per call via
#: ``decode_png(..., max_decoded_bytes=...)`` (r15 ADVICE: the limit
#: must be visible and overridable, not a buried magic number).
MAX_DECODED_BYTES = 256 * 1024 * 1024


class PngFormatError(ValueError):
    """Payload is not a PNG this codec can decode (bad signature, bad
    CRC, truncated stream, or a feature outside the supported
    profile)."""


@dataclass
class PngImage:
    width: int
    height: int
    color_type: int
    channels: int
    pixels: bytes  # row-major, ``width*channels`` bytes per row
    #: tEXt chunks, keyword -> value (latin-1); spec-valid repeated
    #: keywords are suffix-indexed (``kw``, ``kw#2``, …) in chunk
    #: order, so ``len(text)`` is the exact tEXt chunk count
    text: dict | None = None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    pos = len(_SIGNATURE)
    while pos < len(data):
        if pos + 8 > len(data):
            raise PngFormatError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngFormatError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length


def decode_png(payload: bytes,
               max_decoded_bytes: int = MAX_DECODED_BYTES) -> PngImage:
    """Decode a PNG byte string into raw row-major pixel bytes.

    Raises :class:`PngFormatError` on anything outside the supported
    profile — a decode seam must fail loudly, never guess.

    ``max_decoded_bytes`` caps the DECLARED decoded size (filter byte
    + row bytes, per IHDR) before any inflate — the decompression-bomb
    guard; default :data:`MAX_DECODED_BYTES` (256 MiB).  Repeated tEXt
    keywords (spec-valid: ISO 15948 §11.3.3.2 permits the same keyword
    in multiple tEXt chunks) accumulate under deterministic
    suffix-indexed keys — the first occurrence keeps the bare keyword,
    later ones become ``kw#2``, ``kw#3``, … in chunk order (bumping
    past any literal collision) — so ``len(img.text)`` counts tEXt
    chunks exactly and no spec-valid file is rejected (r15 ADVICE:
    the r14 duplicate-rejection was stricter than the spec).  Known
    ambiguity of the flattening: a synthesized ``kw#2`` is
    indistinguishable from a literal ``kw#2`` keyword in ``img.text``
    (two such files flatten identically); a caller needing exact
    chunk identity should walk ``_chunks`` directly.
    """
    if payload is None or not payload.startswith(_SIGNATURE):
        raise PngFormatError("missing PNG signature")
    width = height = None
    color_type = channels = None
    idat = bytearray()
    text: dict = {}
    saw_end = False
    for ctype, body in _chunks(payload):
        if ctype == b"IHDR":
            if width is not None:
                # exactly one IHDR per spec — a second one silently
                # rewrote the geometry the IDAT check then validated
                # against (r14 review)
                raise PngFormatError("duplicate IHDR chunk")
            if len(body) != 13:
                raise PngFormatError("IHDR must be 13 bytes")
            (width, height, depth, color_type, comp, filt,
             interlace) = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngFormatError(
                    f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter")
            if interlace != 0:
                raise PngFormatError("Adam7 interlace not supported")
            if width == 0 or height == 0:
                raise PngFormatError("zero-dimension image")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            if width is None:
                raise PngFormatError("IDAT before IHDR")
            idat.extend(body)
        elif ctype == b"tEXt":
            # keyword\0value, both latin-1 per the spec
            sep = body.find(b"\x00")
            if sep < 1:
                raise PngFormatError("malformed tEXt chunk")
            kw = body[:sep].decode("latin-1")
            # repeated keywords are spec-valid (ISO 15948 §11.3.3.2);
            # suffix-index them in chunk order so every chunk keeps a
            # distinct key and len(text) counts chunks exactly —
            # deterministic, and bumps past a literal "kw#2" keyword
            # already present in the file
            key, i = kw, 1
            while key in text:
                i += 1
                key = f"{kw}#{i}"
            text[key] = body[sep + 1:].decode("latin-1")
        elif ctype == b"IEND":
            saw_end = True
            break
    if width is None or not saw_end:
        raise PngFormatError("missing IHDR or IEND")
    rb = width * channels  # row bytes, excluding the filter byte
    expected = (rb + 1) * height
    if expected > max_decoded_bytes:
        # sanity-cap the DECLARED geometry before inflating: IHDR
        # dims are attacker-controlled 32-bit values (r14 review)
        raise PngFormatError(
            f"declared image size {expected} bytes exceeds the "
            f"{max_decoded_bytes}-byte decode cap (raise via "
            "decode_png(..., max_decoded_bytes=...))")
    try:
        # bounded inflate: a small crafted payload with a
        # high-ratio stream must not allocate gigabytes before the
        # size check — inflate at most expected+1 bytes and reject
        # overlong output (r14 review)
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngFormatError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) != expected or not dobj.eof \
            or dobj.unconsumed_tail or dobj.unused_data:
        raise PngFormatError(
            f"decompressed size {len(raw)}{'+' if not dobj.eof else ''}"
            f" != expected {expected}")
    bpp = channels
    out = bytearray(rb * height)
    prior = bytes(rb)
    for y in range(height):
        ftype = raw[y * (rb + 1)]
        line = bytearray(raw[y * (rb + 1) + 1:(y + 1) * (rb + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for j in range(bpp, rb):
                line[j] = (line[j] + line[j - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for j in range(rb):
                line[j] = (line[j] + prior[j]) & 0xFF
        elif ftype == 3:  # Average
            for j in range(rb):
                a = line[j - bpp] if j >= bpp else 0
                line[j] = (line[j] + ((a + prior[j]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for j in range(rb):
                a = line[j - bpp] if j >= bpp else 0
                c = prior[j - bpp] if j >= bpp else 0
                line[j] = (line[j] + _paeth(a, prior[j], c)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype} row {y}")
        out[y * rb:(y + 1) * rb] = line
        prior = bytes(line)
    return PngImage(width, height, color_type, channels, bytes(out),
                    text or None)


def _filter_line(ftype: int, line: bytes, prior: bytes,
                 bpp: int) -> bytes:
    rb = len(line)
    f = bytearray(rb)
    if ftype == 0:
        return bytes(line)
    for j in range(rb):
        a = line[j - bpp] if j >= bpp else 0
        b = prior[j]
        c = prior[j - bpp] if j >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown filter type {ftype}")
        f[j] = (line[j] - pred) & 0xFF
    return bytes(f)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               color_type: int = 6,
               filter_choice=None,
               text_chunks: dict | None = None) -> bytes:
    """Encode row-major 8-bit pixel bytes as a valid PNG.

    ``filter_choice``: optional ``fn(y) -> int`` selecting the scanline
    filter type per row (default: 0/None).  The fixtures rotate through
    all five types so a decoder bug in ANY filter shows up as a
    value-hash mismatch, not just in unit tests.

    ``text_chunks``: optional keyword -> value metadata written as
    tEXt chunks (latin-1, per the spec) between IHDR and IDAT, in
    sorted-keyword order for determinism.
    """
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    rb = width * channels
    if len(pixels) != rb * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {rb}*{height}")
    raw = bytearray()
    prior = bytes(rb)
    for y in range(height):
        line = pixels[y * rb:(y + 1) * rb]
        ftype = int(filter_choice(y)) if filter_choice else 0
        raw.append(ftype)
        raw.extend(_filter_line(ftype, line, prior, channels))
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    texts = b""
    for kw in sorted(text_chunks or {}):
        val = text_chunks[kw]
        if not kw or "\x00" in kw or "\x00" in val:
            raise ValueError(f"invalid tEXt keyword/value for {kw!r}")
        texts += _chunk(b"tEXt", kw.encode("latin-1") + b"\x00"
                        + val.encode("latin-1"))
    return (_SIGNATURE + _chunk(b"IHDR", ihdr) + texts
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------
# Deterministic synthetic fixture + the registered stats codec
# ---------------------------------------------------------------------

#: pixel rule for the synthetic fixture — EVERY term is expressible in
#: ANSI SQL over a generate_series of the byte index, so the DuckDB
#: oracle recomputes the expected plane statistics WITHOUT any PNG
#: machinery: Spark goes rule -> encode -> decode -> stats, the oracle
#: goes rule -> stats, and the hash match certifies the codec round
#: trip byte-for-byte.
def synthetic_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 9, 8 + doc_id % 7


def synthetic_pixel(doc_id: int, i: int) -> int:
    return (doc_id * 7919 + i * 37 + (i % 11) * 13) % 256


def synthetic_png(doc_id: int, text_chunks: dict | None = None) -> bytes:
    """Deterministic RGBA PNG for ``doc_id``: dims and pixels from the
    SQL-expressible rule above; scanline filter rotates through all
    five types with a per-image phase; optional tEXt metadata."""
    import numpy as np

    w, h = synthetic_dims(doc_id)
    i = np.arange(w * h * 4, dtype=np.int64)
    px = ((doc_id * 7919 + i * 37 + (i % 11) * 13) % 256) \
        .astype(np.uint8).tobytes()
    return encode_png(px, w, h, color_type=6,
                      filter_choice=lambda y: (doc_id + y) % 5,
                      text_chunks=text_chunks)


PNG_STATS_DDL = ("width int, height int, n_px bigint, "
                 "sum_r bigint, sum_g bigint, sum_b bigint, sum_a bigint")


def png_stats_codec(payload: bytes) -> dict:
    """Registry codec: decode an RGBA PNG and return exact-integer
    per-plane byte sums (means are derived JVM/SQL-side so the float
    rounding happens identically in both engines)."""
    import numpy as np

    img = decode_png(payload)
    if img.color_type != 6:
        raise PngFormatError(
            f"stats codec expects RGBA, got color type {img.color_type}")
    planes = np.frombuffer(img.pixels, dtype=np.uint8).reshape(-1, 4)
    sums = [int(x) for x in planes.astype(np.int64).sum(axis=0)]
    return {"width": img.width, "height": img.height,
            "n_px": img.width * img.height,
            "sum_r": sums[0], "sum_g": sums[1],
            "sum_b": sums[2], "sum_a": sums[3]}


def register_png_codec() -> None:
    """Register the PNG stats codec for mode ``image/png`` on the
    multimodal decode seam."""
    from ..operators.multimodal import register_codec
    register_codec("image/png", PNG_STATS_DDL, png_stats_codec)


PNG_META_DDL = "width int, height int, n_text int, meta_json string"


def png_meta_codec(payload: bytes) -> dict:
    """Registry codec for metadata extraction WITHOUT touching pixels:
    dimensions plus the tEXt chunks as one canonical JSON string
    (sorted keys, compact separators — deterministic bytes), so
    engine-side field extraction stays JVM-side ``get_json_object``."""
    import json

    img = decode_png(payload)
    kv = img.text or {}
    return {"width": img.width, "height": img.height,
            "n_text": len(kv),
            "meta_json": json.dumps(kv, sort_keys=True,
                                    separators=(",", ":"))}


def register_png_meta_codec() -> None:
    """Register the tEXt metadata codec for mode ``image/png;text``."""
    from ..operators.multimodal import register_codec
    register_codec("image/png;text", PNG_META_DDL, png_meta_codec)


PNG_DHASH_DDL = "width int, height int, dhash_hi bigint, dhash_lo bigint"


def png_dhash_codec(payload: bytes) -> dict:
    """Registry codec: 64-bit perceptual GRADIENT hash (the dHash
    family — Krawetz's difference hash, bit = "is this pixel brighter
    than its right neighbor?") over the top-left 8×8 luma crop.

    Classic dHash resizes to 9×8 first; with no resampling libraries
    in this container the crop stands in for the downsample — the
    8×8 grid wraps horizontally so every row still yields 8
    comparisons and the hash stays 64 bits.  Luma is the integer
    BT.601 approximation ``299·R + 587·G + 114·B`` (no /1000 — the
    comparison is scale-invariant), so every operand is exact integer
    arithmetic a SQL twin reproduces from the synthetic pixel rule.
    Bit ``k = 8·row + col`` is set iff
    ``luma[row][col] > luma[row][(col+1) % 8]``; bits 0–31 pack into
    ``dhash_lo``, 32–63 into ``dhash_hi`` (two BIGINTs — a single
    int64 would overflow signed at bit 63)."""
    import numpy as np

    img = decode_png(payload)
    if img.color_type != 6:
        raise PngFormatError(
            f"dhash codec expects RGBA, got color type {img.color_type}")
    if img.width < 8 or img.height < 8:
        raise PngFormatError(
            f"dhash codec needs an 8x8 crop, image is "
            f"{img.width}x{img.height}")
    a = (np.frombuffer(img.pixels, dtype=np.uint8)
         .reshape(img.height, img.width, 4).astype(np.int64))
    luma = (299 * a[:8, :8, 0] + 587 * a[:8, :8, 1]
            + 114 * a[:8, :8, 2])
    bits = (luma > np.roll(luma, -1, axis=1)).astype(np.int64).ravel()
    lo = int(sum(int(bits[k]) << k for k in range(32)))
    hi = int(sum(int(bits[32 + k]) << k for k in range(32)))
    return {"width": img.width, "height": img.height,
            "dhash_hi": hi, "dhash_lo": lo}


def register_png_dhash_codec() -> None:
    """Register the perceptual-hash codec for mode ``image/png;dhash``."""
    from ..operators.multimodal import register_codec
    register_codec("image/png;dhash", PNG_DHASH_DDL, png_dhash_codec)
