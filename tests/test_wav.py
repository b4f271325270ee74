"""RIFF/WAV codec: container round-trip, chunk-walk robustness, and
the synthetic fixture ↔ rule agreement the mm_wav_stats oracle needs."""

from __future__ import annotations

import struct

import pytest

from dynamic_partitioner_spark.formats.wav_py import (
    WavFormatError,
    decode_wav,
    encode_wav,
    synthetic_audio_dims,
    synthetic_sample,
    synthetic_wav,
    wav_stats_codec,
)


def test_roundtrip_mono_and_stereo():
    pcm = struct.pack("<8h", 0, 100, -100, 32767, -32768, 5, -5, 1)
    for ch in (1, 2):
        rate, channels, data = decode_wav(encode_wav(pcm, 44100, ch))
        assert (rate, channels, data) == (44100, ch, pcm)


def test_unknown_chunk_and_alignment_are_walked():
    """encode_wav plants an odd-sized unknown chunk before data — a
    parser that assumes data at byte 36 or skips the pad byte fails.
    (r14 review: the chunk's fourcc is 'junk', not LIST — a RIFF LIST
    body must open with a list-type fourcc, so a 3-byte LIST body was
    itself spec-malformed.)"""
    blob = encode_wav(struct.pack("<2h", 7, -7), 8000, 1)
    assert b"junk" in blob
    assert decode_wav(blob)[2] == struct.pack("<2h", 7, -7)


def test_decode_wav_r14_hardening():
    """r14 review pins: NULL payload raises the format error (not a
    bare TypeError — the registry contract the PNG sibling honors),
    and a chunk body crossing the DECLARED RIFF extent is rejected
    even when trailing payload bytes could cover it."""
    with pytest.raises(WavFormatError, match="NULL"):
        decode_wav(None)
    blob = encode_wav(struct.pack("<2h", 7, -7), 8000, 1)
    (riff_len,) = struct.unpack_from("<I", blob, 4)
    shrunk = blob[:4] + struct.pack("<I", riff_len - 2) + blob[8:]
    with pytest.raises(WavFormatError, match="truncated"):
        decode_wav(shrunk)


def test_structural_damage_rejected():
    blob = encode_wav(struct.pack("<2h", 1, 2), 8000, 1)
    with pytest.raises(WavFormatError, match="RIFF"):
        decode_wav(b"JUNK" + blob[4:])
    with pytest.raises(WavFormatError, match="exceeds"):
        decode_wav(blob[:20])
    # non-PCM format code
    bad = blob.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
    with pytest.raises(WavFormatError, match="PCM16"):
        decode_wav(bad)
    with pytest.raises(WavFormatError, match="tile"):
        encode_wav(b"\x00\x01\x02", 8000, 1)
    # crafted channels=0 / block=0 header: must be the documented
    # error class, not a ZeroDivisionError from the tiling modulo
    zero_ch = blob.replace(struct.pack("<HHIIHH", 1, 1, 8000, 16000,
                                       2, 16),
                           struct.pack("<HHIIHH", 1, 0, 8000, 16000,
                                       0, 16), 1)
    with pytest.raises(WavFormatError, match="zero channels"):
        decode_wav(zero_ch)


def test_codec_matches_sample_rule():
    """Spark goes rule→encode→decode→stats; this pins the same
    independence cheaply per-commit (the DuckDB twin re-derives it in
    SQL at driver time)."""
    import numpy as np

    for doc_id in (0, 1, 5, 38, 123):
        n, ch, rate = synthetic_audio_dims(doc_id)
        s = np.array([synthetic_sample(doc_id, i) for i in range(n * ch)])
        neg = s < 0
        out = wav_stats_codec(synthetic_wav(doc_id))
        assert out == {
            "rate": rate, "channels": ch, "n_frames": n,
            "sum_abs": int(np.abs(s).sum()),
            "peak": int(np.abs(s).max()),
            "zero_crossings": int((neg[ch:] != neg[:-ch]).sum()),
        }, doc_id


def test_codec_registry_wiring(spark):
    from dynamic_partitioner_spark.formats.wav_py import register_wav_codec
    from dynamic_partitioner_spark.operators.multimodal import decode_media

    register_wav_codec()
    df = spark.createDataFrame(
        [(7, synthetic_wav(7))], "doc_id long, payload binary")
    row = decode_media(df, "audio/wav").collect()[0]
    n, ch, rate = synthetic_audio_dims(7)
    assert (row.rate, row.channels, row.n_frames) == (rate, ch, n)
