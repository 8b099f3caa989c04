"""Native (C++) data-path loader.

Compiles ``native/datapath.cc`` on first use (g++, cached as a shared
object next to the source) and binds it with ctypes.  Every entry point has
a numpy fallback, so the framework runs identically without a toolchain —
the native path just makes the host-side data pipeline cheaper (the
reference burned 8 DataLoader worker processes on this, SURVEY.md §2.1).

API: ``mulaw_encode(audio, q)``, ``gather_windows(data, starts, width)``,
``float_to_pcm16(audio)``, ``pcm16_to_float(pcm)``, ``available()``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "datapath.cc"
_LIB_PATH = _SRC.parent / "libdatapath.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        if lib.datapath_abi_version() != 2:
            return None
        lib.mulaw_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.gather_windows.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ]
        lib.float_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ]
        lib.pcm16_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.parse_smf_events.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.parse_smf_events.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def mulaw_encode(audio: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is not None:
        out = np.empty(audio.shape, np.int32)
        lib.mulaw_encode(
            _ptr(audio, ctypes.c_float), _ptr(out, ctypes.c_int32),
            audio.size, quantization_channels,
        )
        return out
    # numpy fallback — same formula
    mu = np.float32(quantization_channels - 1)
    safe_abs = np.abs(np.clip(audio, -1.0, 1.0))
    magnitude = np.log1p(mu * safe_abs) / np.log1p(mu)
    signal = np.sign(audio) * magnitude
    return ((signal + 1) / 2 * mu + 0.5).astype(np.int32)


def gather_windows(data: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(data, np.int32)
    starts = np.ascontiguousarray(starts, np.int64)
    if lib is not None:
        out = np.empty((len(starts), width), np.int32)
        lib.gather_windows(
            _ptr(data, ctypes.c_int32), _ptr(starts, ctypes.c_int64),
            _ptr(out, ctypes.c_int32), len(starts), width,
        )
        return out
    pos = starts[:, None] + np.arange(width)[None, :]
    return data[pos].astype(np.int32)


def float_to_pcm16(audio: np.ndarray) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, np.float32)
    if lib is not None:
        out = np.empty(audio.shape, np.int16)
        lib.float_to_pcm16(_ptr(audio, ctypes.c_float), _ptr(out, ctypes.c_int16), audio.size)
        return out
    return (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")


def pcm16_to_float(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    pcm = np.ascontiguousarray(pcm, np.int16)
    if lib is not None:
        out = np.empty(pcm.shape, np.float32)
        lib.pcm16_to_float(_ptr(pcm, ctypes.c_int16), _ptr(out, ctypes.c_float), pcm.size)
        return out
    return pcm.astype(np.float32) / 32768.0


def parse_smf_events(raw: bytes, output_ticks_per_quarter_note: int) -> np.ndarray | None:
    """Extract ``[N, 4]`` float64 note events (begin_tick, length, freq,
    velocity) from raw SMF bytes via the C++ parser — the hot loop of the
    MIDI corpus pipeline (data/midi.midi_to_song_data).  Returns ``None``
    when the native library is unavailable or declines the file (structural
    error / SMPTE division); the caller then runs the pure-Python parser,
    which raises precise exceptions."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(raw, np.uint8)
    cap = max(len(raw), 16)
    out = np.empty((cap, 4), np.float64)
    n = lib.parse_smf_events(
        _ptr(buf, ctypes.c_uint8), len(raw), output_ticks_per_quarter_note,
        _ptr(out, ctypes.c_double), cap,
    )
    if n < 0:
        return None
    return out[:n].copy()
