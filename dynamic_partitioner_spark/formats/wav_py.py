"""Pure-Python RIFF/WAV PCM16 codec for the multimodal decode seam.

The audio sibling of :mod:`formats.png_py`: no audio libraries exist
in this container, so the container format itself (RIFF chunking, the
``fmt `` descriptor, word alignment) is implemented from the public
WAVE/RIFF specification (Microsoft/IBM *Multimedia Programming
Interface and Data Specifications 1.0*, 1991 — the canonical WAV
layout), and a deterministic synthetic fixture makes every decoded
statistic SQL-expressible: Spark goes rule → encode → decode → stats
while the oracle goes rule → stats with NO WAV machinery, so a chunk-
walk, alignment, or sample-unpacking defect breaks the value hash.

Real audio work (resampling, spectral features) still belongs to
registered codecs with real DSP libraries; this module certifies the
CONTAINER path end-to-end the way png_py.py certifies PNG filters.

No counterpart in the reference (its sinks never decode payloads).
"""

from __future__ import annotations

import struct


class WavFormatError(ValueError):
    """Malformed or unsupported RIFF/WAVE payload."""


def encode_wav(samples: bytes, rate: int, channels: int) -> bytes:
    """Canonical RIFF/WAVE container around interleaved little-endian
    PCM16 ``samples`` (raw bytes, length divisible by 2·channels).

    Writes the minimal spec-complete layout: RIFF header, 16-byte
    ``fmt `` chunk (audio format 1 = PCM), ``data`` chunk, plus an
    odd-sized unknown ``junk`` chunk BEFORE ``data`` so decoders that
    skip unknown chunks (ours included) are actually exercised —
    naive parsers that assume ``data`` starts at byte 36 break here.
    """
    if channels < 1:
        raise WavFormatError("channels must be >= 1")
    if len(samples) % (2 * channels):
        raise WavFormatError(
            f"{len(samples)} sample bytes do not tile {channels} "
            "16-bit channels")
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, 16)
    # odd-sized unknown chunk: exercises the spec's word-alignment
    # pad byte in the chunk walk.  A genuinely unknown fourcc, not
    # LIST: RIFF requires a LIST body to open with a 4-byte list-type
    # fourcc, so a 3-byte LIST body was spec-malformed (r14 review)
    info = b"dps"
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"junk" + struct.pack("<I", len(info)) + info + b"\x00"
              # no data pad byte: len(samples) is always even (it
              # tiles 2*channels), so the odd-data alignment path is
              # exercised only by the junk chunk above (r14 review:
              # a conditional pad here was dead code)
              + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a RIFF/WAVE container → (rate, channels, pcm16 bytes).

    Walks chunks with word alignment, skipping unknown ones; requires
    exactly PCM (format 1) at 16 bits.  Raises
    :class:`WavFormatError` on structural damage — truncation, a
    missing fmt/data chunk, or a data length that does not tile the
    channel block size.
    """
    if payload is None:
        # registry contract is fn(payload: bytes | None) — the PNG
        # sibling raises its format error on None; a bare
        # len(None) TypeError mid-Arrow-batch is the r14 multimodal
        # review class
        raise WavFormatError("missing payload (NULL)")
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_len > len(payload):
        raise WavFormatError("RIFF length exceeds payload")
    pos, end = 12, 8 + riff_len
    fmt = None
    data = None
    while pos + 8 <= end:
        ctype = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > end:
            # bound against the DECLARED RIFF extent, not the raw
            # payload: a shrunken riff_len with trailing bytes would
            # otherwise decode silently (r14 review)
            raise WavFormatError(f"truncated {ctype!r} chunk")
        body = payload[pos + 8:pos + 8 + clen]
        if ctype == b"fmt ":
            if clen < 16:
                raise WavFormatError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen % 2)        # word alignment
    if fmt is None or data is None:
        raise WavFormatError("missing fmt or data chunk")
    audio_format, channels, rate, _brate, block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise WavFormatError(
            f"only PCM16 supported (format={audio_format}, bits={bits})")
    if channels < 1:
        # keeps the documented error contract: a crafted channels=0 /
        # block=0 header would otherwise pass 0 == 2·0 and escape as a
        # raw ZeroDivisionError from the modulo below (code-review r8)
        raise WavFormatError("fmt chunk declares zero channels")
    if block != 2 * channels:
        raise WavFormatError(
            f"block align {block} != 2 x {channels} channels")
    if len(data) % block:
        raise WavFormatError(
            f"{len(data)} data bytes do not tile block size {block}")
    return rate, channels, data


# --------------------------------------------------------------- fixture

#: SQL-expressible synthetic sample rule (the png_py synthetic_pixel
#: pattern): the oracle recomputes decoded statistics straight from
#: these expressions over an index series, with no WAV machinery.
def synthetic_audio_dims(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, channels, rate) for ``doc_id``."""
    return 256 + doc_id % 128, 1 + doc_id % 2, 8000 + (doc_id % 3) * 4000


def synthetic_sample(doc_id: int, i: int) -> int:
    """Interleaved PCM16 sample ``i`` of ``doc_id`` — int16 range."""
    return (doc_id * 2654435761 + i * 48271) % 65536 - 32768


def synthetic_wav(doc_id: int) -> bytes:
    """Deterministic PCM16 WAV for ``doc_id`` from the rule above."""
    import numpy as np

    n_frames, channels, rate = synthetic_audio_dims(doc_id)
    i = np.arange(n_frames * channels, dtype=np.int64)
    pcm = ((doc_id * 2654435761 + i * 48271) % 65536 - 32768) \
        .astype("<i2").tobytes()
    return encode_wav(pcm, rate, channels)


WAV_STATS_DDL = ("rate int, channels int, n_frames bigint, "
                 "sum_abs bigint, peak int, zero_crossings bigint")


def wav_stats_codec(payload: bytes) -> dict:
    """Registry codec: decode PCM16 WAV and reduce to exact-integer
    waveform statistics — total |sample| mass, peak amplitude, and
    per-channel sign-change (zero-crossing) count, the standard cheap
    silence/noise screens an audio ingest pipeline gates on.  All
    integer arithmetic, so the SQL twin reproduces every column from
    the synthetic sample rule."""
    import numpy as np

    rate, channels, data = decode_wav(payload)
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n_frames = len(s) // channels
    # per-channel crossings: compare sample i with i+channels over the
    # interleaved stream (zero counts as non-negative)
    neg = s < 0
    zc = int((neg[channels:] != neg[:-channels]).sum()) if len(s) > channels \
        else 0
    return {"rate": rate, "channels": channels, "n_frames": n_frames,
            "sum_abs": int(np.abs(s).sum()),
            "peak": int(np.abs(s).max()) if len(s) else 0,
            "zero_crossings": zc}


def register_wav_codec() -> None:
    """Register the WAV stats codec for mode ``audio/wav``."""
    from ..operators.multimodal import register_codec
    register_codec("audio/wav", WAV_STATS_DDL, wav_stats_codec)
