"""ctypes bindings for the native runtime (native/qpg_native.cpp).

Builds on demand with `make -C native` (g++); every entry point has a pure
NumPy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqpg_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always invoke make: its mtime check decides whether to recompile, so
    # a stale .so can never shadow an edited qpg_native.cpp. Keep a stale
    # binary only if the toolchain is absent and one already exists.
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.qpg_levenshtein_matrix.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p]
    lib.qpg_levenshtein.restype = ctypes.c_int32
    lib.qpg_levenshtein.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64]
    lib.qpg_parse_floats.restype = ctypes.c_int64
    lib.qpg_parse_floats.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64]
    lib.qpg_store_create.restype = ctypes.c_void_p
    lib.qpg_store_create.argtypes = [ctypes.c_char_p]
    lib.qpg_store_append.restype = ctypes.c_int64
    lib.qpg_store_append.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.qpg_store_finalize.restype = ctypes.c_int64
    lib.qpg_store_finalize.argtypes = [ctypes.c_void_p]
    lib.qpg_store_open.restype = ctypes.c_void_p
    lib.qpg_store_open.argtypes = [ctypes.c_char_p]
    lib.qpg_store_count.restype = ctypes.c_int64
    lib.qpg_store_count.argtypes = [ctypes.c_void_p]
    lib.qpg_store_record_len.restype = ctypes.c_int64
    lib.qpg_store_record_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.qpg_store_read.restype = ctypes.c_int64
    lib.qpg_store_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_int64]
    lib.qpg_store_close.argtypes = [ctypes.c_void_p]
    lib.qpg_pitch_world.restype = ctypes.c_long
    lib.qpg_pitch_world.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_long]
    _lib = lib
    return _lib


def pitch_world_native(wav: np.ndarray, fs: int,
                       frame_period: float,
                       f0_floor: float = 71.0, f0_ceil: float = 800.0,
                       channels_in_octave: float = 2.0,
                       allowed_range: float = 0.1) -> Optional[np.ndarray]:
    """Native WORLD DIO+StoneMask (qpg_pitch_world); None when the library
    is unavailable so callers fall back to the NumPy transcription.
    Cross-verified against pipelines/pitch_world.py in tests/test_native.py
    (identical voicing masks, <1e-6 relative f0 agreement)."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(wav, np.float64)
    n_frames = int(1000.0 * len(x) / fs / frame_period) + 1
    out = np.zeros(n_frames, np.float64)
    got = lib.qpg_pitch_world(
        x.ctypes.data_as(ctypes.c_void_p), len(x), fs,
        ctypes.c_double(frame_period), ctypes.c_double(f0_floor),
        ctypes.c_double(f0_ceil), ctypes.c_double(channels_in_octave),
        ctypes.c_double(allowed_range),
        out.ctypes.data_as(ctypes.c_void_p), n_frames)
    if got < 0:
        return None
    return out[:got]


def levenshtein_matrix_native(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Q, L) x (N, L) -> (Q, N) int32; NumPy fallback when unbuilt."""
    lib = get_lib()
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    assert a.shape[1] == b.shape[1], (
        f"shared string length mismatch: {a.shape[1]} vs {b.shape[1]} "
        "(the C kernel assumes equal-length rows; the NumPy fallback "
        "handles unequal lengths, so don't rely on it silently)")
    if lib is None:
        from ..ops.levenshtein import levenshtein_matrix_np
        return levenshtein_matrix_np(a, b)
    out = np.zeros((a.shape[0], b.shape[0]), np.int32)
    lib.qpg_levenshtein_matrix(
        a.ctypes.data_as(ctypes.c_void_p), a.shape[0],
        b.ctypes.data_as(ctypes.c_void_p), b.shape[0], a.shape[1],
        out.ctypes.data_as(ctypes.c_void_p))
    return out


def parse_floats_native(text: str, expected: int) -> np.ndarray:
    """Bulk ASCII float parsing; falls back to numpy split/parse."""
    lib = get_lib()
    if lib is None:
        return np.array(text.split(), dtype=np.float64)[:expected]
    raw = text.encode()
    out = np.zeros(expected, np.float64)
    n = lib.qpg_parse_floats(raw, len(raw),
                             out.ctypes.data_as(ctypes.c_void_p), expected)
    return out[:n]


class RecordStore:
    """Append-only mmap record store — the LMDB-cache replacement."""

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib

    # -- writing -----------------------------------------------------------
    @classmethod
    def create(cls, path: str) -> "RecordStoreWriter":
        lib = get_lib()
        if lib is None:
            return _PyStoreWriter(path)
        h = lib.qpg_store_create(path.encode())
        if not h:
            raise OSError(f"cannot create store {path}")
        return _NativeStoreWriter(h, lib)

    # -- reading -----------------------------------------------------------
    @classmethod
    def open(cls, path: str) -> "RecordStore":
        lib = get_lib()
        if lib is None:
            return _PyStore(path)
        h = lib.qpg_store_open(path.encode())
        if not h:
            raise OSError(f"cannot open store {path}")
        return cls(h, lib)

    def __len__(self) -> int:
        return int(self._lib.qpg_store_count(self._h))

    def __getitem__(self, i: int) -> bytes:
        ln = self._lib.qpg_store_record_len(self._h, i)
        if ln < 0:
            raise IndexError(i)
        buf = ctypes.create_string_buffer(ln)
        got = self._lib.qpg_store_read(self._h, i, buf, ln)
        assert got == ln
        return buf.raw

    def close(self) -> None:
        if self._h:
            self._lib.qpg_store_close(self._h)
            self._h = None


class _NativeStoreWriter:
    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib

    def append(self, data: bytes) -> int:
        return int(self._lib.qpg_store_append(self._h, data, len(data)))

    def finalize(self) -> int:
        n = int(self._lib.qpg_store_finalize(self._h))
        self._h = None
        return n


class _PyStoreWriter:
    """Pure-python fallback with the same on-disk format."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write((0x51504753544F5245).to_bytes(8, "little"))
        self._pos = 8
        self._offsets: list = []
        self._lengths: list = []

    def append(self, data: bytes) -> int:
        self._offsets.append(self._pos)
        self._lengths.append(len(data))
        self._f.write(data)
        self._pos += len(data)
        return len(self._offsets) - 1

    def finalize(self) -> int:
        index_off = self._pos
        for off in self._offsets:
            self._f.write(off.to_bytes(8, "little"))
        for ln in self._lengths:
            self._f.write(ln.to_bytes(8, "little"))
        self._f.write(len(self._offsets).to_bytes(8, "little"))
        self._f.write(index_off.to_bytes(8, "little"))
        self._f.close()
        return len(self._offsets)


class _PyStore:
    def __init__(self, path: str):
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        size = self._mm.shape[0]
        # mirror the native reader's tail-index validation
        # (qpg_store_open): a truncated or corrupt store must fail to
        # open here too, not read garbage records
        if size < 32:
            raise OSError(f"store too small: {path}")
        magic = int.from_bytes(self._mm[:8].tobytes(), "little")
        if magic != 0x51504753544F5245:  # QPG_MAGIC (qpg_native.cpp:112)
            raise OSError(f"bad magic in store: {path}")
        self._n = int.from_bytes(self._mm[size - 16:size - 8].tobytes(),
                                 "little")
        index_off = int.from_bytes(self._mm[size - 8:].tobytes(), "little")
        if (index_off < 8 or index_off > size
                or self._n > (size - index_off) // 16
                or index_off + 16 * self._n + 16 != size):
            raise OSError(f"corrupt store index: {path}")
        idx = self._mm[index_off:index_off + 16 * self._n].tobytes()
        arr = np.frombuffer(idx, np.uint64)
        self._offsets = arr[:self._n]
        self._lengths = arr[self._n:]
        if self._n and (int(self._offsets.max(initial=0)) > index_off
                        or any(int(o) + int(l) > index_off
                               for o, l in zip(self._offsets,
                                               self._lengths))):
            raise OSError(f"corrupt store records: {path}")

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> bytes:
        off, ln = int(self._offsets[i]), int(self._lengths[i])
        return self._mm[off:off + ln].tobytes()

    def close(self) -> None:
        del self._mm
