"""Byte-level checks for the REAL media header decoder (multimodal.py):
the WAV leg is verified against Python's stdlib ``wave`` writer — a fully
independent RIFF implementation — so the parser is proven against real
container bytes, not just against our own planter."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from cocktails_data_engineering_spark.operators.multimodal import (
    decode_media_real,
    plant_bmp,
    plant_wav,
)


def test_wav_parser_agrees_with_stdlib_wave_writer():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)  # 16-bit PCM
        w.setframerate(44100)
        w.writeframes(b"\x00\x01" * 2 * 1000)  # 1000 stereo frames
    d = decode_media_real(buf.getvalue())
    assert d["codec"] == "wav"
    assert d["channels"] == 2
    assert d["sample_rate_hz"] == 44100
    assert d["bits"] == 16
    # 1000 frames / 44100 Hz = 22675.7… µs, floored
    assert d["duration_us"] == 1000 * 1_000_000 // 44100


def test_planter_emits_stdlib_identical_wav():
    """plant_wav must produce byte-identical output to the stdlib writer
    for the same parameters — the planted fixtures ARE real WAV files."""
    data = b"payload-bytes" * 7
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(data + (b"\x00" if len(data) % 2 else b""))
    # stdlib pads frames to whole frames; compare against same-length data
    planted = plant_wav(data + (b"\x00" if len(data) % 2 else b""), 8000, 1)
    assert planted == buf.getvalue()


def test_wav_chunk_walk_skips_unknown_and_odd_chunks():
    """RIFF chunks are word-aligned: an odd-sized LIST chunk before fmt
    must be skipped with its pad byte or every later offset is off by
    one."""
    data = b"abcdef"
    base = plant_wav(data, 16000, 1)
    fmt_and_rest = base[12:]
    odd_chunk = struct.pack("<4sI", b"LIST", 3) + b"xyz" + b"\x00"  # pad
    riff_size = 4 + len(odd_chunk) + len(fmt_and_rest)
    doctored = struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + odd_chunk + fmt_and_rest
    d = decode_media_real(doctored)
    assert d["sample_rate_hz"] == 16000
    assert d["duration_us"] == len(data) * 1_000_000 // (16000 * 2)


def test_bmp_parser_reads_dimensions_and_topdown_height():
    d = decode_media_real(plant_bmp(b"\x00" * 12, 640, 480))
    assert (d["codec"], d["width"], d["height"], d["bits"]) == ("bmp", 640, 480, 24)
    # top-down BMPs store negative height; magnitude is the image height
    header = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 32, -64, 1, 24, 0, 0, 0, 0, 0, 0)
    d2 = decode_media_real(header + info)
    assert (d2["width"], d2["height"]) == (32, 64)


def test_unknown_codec_still_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_media_real(b"\xff\xd8\xff\xe0 not actually decodable jpeg")
    with pytest.raises(ValueError):
        # RIFF/WAVE magic but no fmt/data chunks = malformed, not unknown
        decode_media_real(struct.pack("<4sI4s", b"RIFF", 4, b"WAVE"))
