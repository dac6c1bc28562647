"""Malformed-WAV hardening for both decoder paths.

The data pipeline parses untrusted RIFF bytes with a native C++ decoder
(native/wavio.cpp) and a NumPy fallback (data/wavio.py). A production
loader must survive corrupt or adversarial files with a clean Python
error — never a native crash, a multi-GB allocation driven by a lying
header, or an incidental exception type (ZeroDivisionError /
struct.error). The reference leans on libsndfile for this
(src/processing/audio_loader.py:84); these tests pin the equivalent
guarantees for our decoders:

* data-chunk sizes are clamped to the bytes actually present (libsndfile
  semantics) — a 100-byte file claiming 4 GB decodes its real frames;
* pathological channel counts (65535) decode within bounded memory;
* zero-channel / zero-bit / truncated / non-RIFF inputs raise ValueError;
* random fuzz around valid magic never crashes the interpreter.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from speakerverification_tpu.data.wavio import (
    _read_wav_python,
    native_available,
    read_wav,
    wav_info,
    write_wav,
)


def _header(audio_format=1, channels=1, sample_rate=8000, bits=16,
            data_size=0):
    # block_align/byte_rate are ignored by both parsers; clamp to field width
    block_align = min(max(channels * bits // 8, 1), 0xFFFF)
    byte_rate = min(sample_rate * block_align, 0xFFFF_FFFF)
    h = b"RIFF" + struct.pack("<I", min(36 + data_size, 0xFFFF_FFFF)) + b"WAVE"
    h += b"fmt " + struct.pack("<IHHIIHH", 16, audio_format, channels,
                               sample_rate, byte_rate, block_align, bits)
    h += b"data" + struct.pack("<I", data_size)
    return h


def _decoders():
    paths = [("python", lambda p: _read_wav_python(p))]
    if native_available():
        paths.append(("native", lambda p: read_wav(p)))
    return paths


@pytest.fixture(params=[d[0] for d in _decoders()])
def decode(request):
    return dict(_decoders())[request.param]


def test_lying_data_size_is_clamped(tmp_path, decode):
    """Header claims ~4 GB of samples; 64 real frames follow."""
    payload = (np.arange(64, dtype="<i2")).tobytes()
    raw = _header(data_size=0xFFFF_FFF0) + payload
    p = tmp_path / "lie.wav"
    p.write_bytes(raw)
    audio, sr = decode(p)
    assert sr == 8000
    assert audio.shape == (64,)
    np.testing.assert_allclose(audio, np.arange(64) / 32768.0, atol=1e-7)


def test_lying_data_size_wav_info(tmp_path):
    p = tmp_path / "lie.wav"
    p.write_bytes(_header(data_size=0xFFFF_FFF0)
                  + np.zeros(64, "<i2").tobytes())
    sr, frames, ch = wav_info(p)
    assert (sr, frames, ch) == (8000, 64, 1)


def test_truncated_data_rounds_to_whole_frames(tmp_path, decode):
    """Stereo 16-bit with a dangling odd byte: partial frame dropped."""
    payload = np.zeros(10, "<i2").tobytes() + b"\x01"   # 2.75 stereo frames
    raw = _header(channels=2, data_size=len(payload)) + payload
    p = tmp_path / "trunc.wav"
    p.write_bytes(raw)
    audio, _ = decode(p)
    assert audio.shape == (5,)


def test_many_channels_bounded_memory(tmp_path, decode):
    """65535-channel header must not drive a multi-GB staging buffer."""
    ch = 65535
    payload = np.zeros(ch * 2, "<i2").tobytes()          # 2 frames
    raw = _header(channels=ch, data_size=len(payload)) + payload
    p = tmp_path / "wide.wav"
    p.write_bytes(raw)
    audio, _ = decode(p)
    assert audio.shape == (2,)
    np.testing.assert_allclose(audio, 0.0)


@pytest.mark.parametrize("channels,bits", [(0, 16), (1, 0), (0, 0)])
def test_zero_fields_raise_valueerror(tmp_path, channels, bits):
    p = tmp_path / "zero.wav"
    p.write_bytes(_header(channels=channels, bits=bits, data_size=4)
                  + b"\0\0\0\0")
    with pytest.raises(ValueError):
        _read_wav_python(p)
    if native_available():
        # native path reports the format error and falls through to the
        # python parser, which raises the same ValueError
        with pytest.raises(ValueError):
            read_wav(p)


def test_unsupported_bit_depth_raises(tmp_path):
    p = tmp_path / "b12.wav"
    p.write_bytes(_header(bits=12, data_size=6) + b"\0" * 6)
    with pytest.raises(ValueError):
        _read_wav_python(p)


@pytest.mark.parametrize("raw", [
    b"",                                   # empty
    b"RIFF",                               # cut inside magic
    b"RIFF\x10\x00\x00\x00WAVE",           # no chunks
    b"RIFF\x10\x00\x00\x00WAVEfmt ",       # chunk tag, no size
    b"garbage-not-a-wav-file-at-all",      # non-RIFF
    _header()[:20],                        # truncated fmt body
    _header(data_size=0)[:-8],             # fmt only, no data chunk
])
def test_truncated_headers_raise_valueerror(tmp_path, raw):
    p = tmp_path / "bad.wav"
    p.write_bytes(raw)
    with pytest.raises((ValueError, IndexError)):
        _read_wav_python(p)
    if native_available():
        with pytest.raises((ValueError, IndexError)):
            read_wav(p)


def test_data_before_fmt_raises(tmp_path):
    raw = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
           + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    p = tmp_path / "dbf.wav"
    p.write_bytes(raw)
    with pytest.raises(ValueError):
        _read_wav_python(p)


def test_huge_skip_chunk_terminates(tmp_path):
    """A junk chunk claiming 4 GB must terminate parsing, not hang."""
    raw = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"JUNK" + struct.pack("<I", 0xFFFF_FFFF) + b"\0" * 16)
    p = tmp_path / "skip.wav"
    p.write_bytes(raw)
    with pytest.raises(ValueError):
        _read_wav_python(p)
    if native_available():
        with pytest.raises(ValueError):
            read_wav(p)


def test_fuzz_never_crashes(tmp_path):
    """Random bytes behind valid RIFF/WAVE magic: clean error or decode."""
    rng = np.random.default_rng(0)
    p = tmp_path / "fuzz.wav"
    for trial in range(40):
        body = rng.integers(0, 256, rng.integers(0, 200),
                            dtype=np.uint8).tobytes()
        raw = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
        p.write_bytes(raw)
        for _name, fn in _decoders():
            try:
                audio, _sr = fn(p)
                assert audio.dtype == np.float32
            except (ValueError, IndexError, struct.error):
                pass


def test_fuzz_bitflips_on_valid_file(tmp_path):
    """Single-byte corruptions of a well-formed WAV: no interpreter crash,
    no huge allocation; errors surface as ValueError at worst."""
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 0.1, 256).astype(np.float32)
    p0 = tmp_path / "ok.wav"
    write_wav(p0, sig, 8000)
    raw = bytearray(p0.read_bytes())
    p = tmp_path / "flip.wav"
    for trial in range(60):
        flipped = bytearray(raw)
        idx = int(rng.integers(0, min(64, len(raw))))   # header region
        flipped[idx] ^= int(rng.integers(1, 256))
        p.write_bytes(bytes(flipped))
        for _name, fn in _decoders():
            try:
                audio, _sr = fn(p)
                assert len(audio) <= 16 * len(raw)      # no header-lie blowup
            except (ValueError, IndexError, struct.error):
                pass


def test_valid_roundtrip_still_exact(tmp_path, decode):
    """Hardening must not change the well-formed path."""
    sig = (np.linspace(-0.9, 0.9, 128)).astype(np.float32)
    p = tmp_path / "ok.wav"
    write_wav(p, sig, 16000)
    audio, sr = decode(p)
    assert sr == 16000
    q = (np.clip(sig, -1, 1) * 32767).astype("<i2") / 32768.0
    np.testing.assert_allclose(audio, q, atol=1e-7)
