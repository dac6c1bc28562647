"""WAV I/O: native C++ decoder (ctypes) with a pure-NumPy fallback.

Replaces the reference's soundfile/libsndfile dependency
(src/processing/audio_loader.py:84). The native decoder
(native/wavio.cpp) releases the GIL during decode so the threaded data
pipeline scales; the NumPy fallback parses RIFF chunks directly.

Both paths return mono float32 in [-1, 1] (multi-channel averaged),
matching ``sf.read(dtype='float32')`` + mono conventions.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = ["read_wav", "write_wav", "wav_info", "native_available"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsvwav.so"
_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load_native():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.sv_wav_info.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.sv_wav_info.restype = ctypes.c_int
        lib.sv_wav_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int)]
        lib.sv_wav_read.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_native() is not None


def wav_info(path: str | Path) -> Tuple[int, int, int]:
    """Returns (sample_rate, num_frames, channels) without decoding."""
    lib = _load_native()
    if lib is not None:
        sr = ctypes.c_int()
        nf = ctypes.c_int64()
        ch = ctypes.c_int()
        rc = lib.sv_wav_info(str(path).encode(), ctypes.byref(sr),
                             ctypes.byref(nf), ctypes.byref(ch))
        if rc == 0:
            return sr.value, nf.value, ch.value
    sr, data, ch, _bits = _parse_wav(Path(path).read_bytes(), header_only=True)
    return sr, data, ch


def read_wav(path: str | Path) -> Tuple[np.ndarray, int]:
    """Decode a WAV file → (mono float32 array, sample_rate)."""
    lib = _load_native()
    if lib is not None:
        sr_i = ctypes.c_int()
        nf = ctypes.c_int64()
        ch = ctypes.c_int()
        rc = lib.sv_wav_info(str(path).encode(), ctypes.byref(sr_i),
                             ctypes.byref(nf), ctypes.byref(ch))
        if rc == 0:
            out = np.empty(nf.value, dtype=np.float32)
            n = lib.sv_wav_read(str(path).encode(),
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                nf.value, ctypes.byref(sr_i))
            if n >= 0:
                return out[:n], sr_i.value
    return _read_wav_python(path)


def _parse_wav(raw: bytes, header_only: bool = False):
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = pos + 8
        if tag == b"fmt ":
            if body + 16 > len(raw):
                raise ValueError("truncated fmt chunk")
            audio_format, channels, sample_rate = struct.unpack_from(
                "<HHI", raw, body)
            bits = struct.unpack_from("<H", raw, body + 14)[0]
            if audio_format == 0xFFFE and size >= 40 and body + 26 <= len(raw):
                audio_format = struct.unpack_from("<H", raw, body + 24)[0]
            fmt = (audio_format, channels, sample_rate, bits)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            audio_format, channels, sample_rate, bits = fmt
            frame_bytes = channels * (bits // 8)
            if frame_bytes == 0:
                raise ValueError(
                    f"invalid WAV format: channels={channels} bits={bits}")
            # clamp a lying data-chunk size to the bytes actually present,
            # rounded down to whole frames (libsndfile semantics)
            size = min(size, len(raw) - body)
            size -= size % frame_bytes
            frames = size // frame_bytes
            if header_only:
                return sample_rate, frames, channels, bits
            return fmt, raw[body:body + size]
        pos = body + size + (size & 1)
    raise ValueError("no data chunk found")


def _read_wav_python(path: str | Path) -> Tuple[np.ndarray, int]:
    fmt, data = _parse_wav(Path(path).read_bytes())
    audio_format, channels, sample_rate, bits = fmt
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int8).astype(np.int32) << 16))
        x = x.astype(np.float32) / 8388608.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_format == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format={audio_format} bits={bits}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), sample_rate


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int,
              subtype: str = "PCM_16") -> None:
    """Write mono/stereo float audio to WAV (PCM_16 or FLOAT)."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[:, None]
    channels = audio.shape[1]
    if subtype == "PCM_16":
        payload = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        bits, audio_format = 16, 1
    elif subtype == "FLOAT":
        payload = audio.astype("<f4").tobytes()
        bits, audio_format = 32, 3
    else:
        raise ValueError(f"unsupported subtype {subtype!r}")
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, audio_format, channels,
                                    sample_rate, byte_rate, block_align, bits)
    header += b"data" + struct.pack("<I", len(payload))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(header + payload)
