"""Native (C++) ingest kernels with automatic build + NumPy fallback.

The shared library is compiled once with g++ -O3 on first use and cached
next to the source; every entry point has a NumPy fallback so the package
works without a toolchain. See unpack.cc for the reference mapping.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "unpack.cc")
_LIB = os.path.join(_HERE, "_libgnssnative.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> str | None:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        fptr = ctypes.POINTER(ctypes.c_float)
        for name, in_type in (
            ("ishort_to_planar", ctypes.POINTER(ctypes.c_int16)),
            ("ibyte_to_planar", ctypes.POINTER(ctypes.c_int8)),
            ("cfloat_to_planar", fptr),
            ("short_to_planar", ctypes.POINTER(ctypes.c_int16)),
        ):
            fn = getattr(lib, name)
            fn.argtypes = [in_type, fptr, fptr, ctypes.c_size_t]
            fn.restype = None
        lib.unpack2bit_cpx_to_planar.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), fptr, fptr, ctypes.c_size_t,
            ctypes.c_int]
        lib.unpack2bit_cpx_to_planar.restype = None
        i8ptr = ctypes.POINTER(ctypes.c_int8)
        lib.cfloat_quantize_i8.argtypes = [fptr, i8ptr, i8ptr,
                                           ctypes.c_size_t, ctypes.c_float]
        lib.cfloat_quantize_i8.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _planar_out(n: int):
    return (np.empty(n, dtype=np.float32), np.empty(n, dtype=np.float32))


def _c(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def interleaved_to_planar(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved I,Q integer/float array -> planar float32 pair."""
    raw = np.ascontiguousarray(raw)
    n = raw.shape[0] // 2
    lib = _load()
    if lib is None:
        flat = raw.astype(np.float32)
        return (np.ascontiguousarray(flat[0::2]),
                np.ascontiguousarray(flat[1::2]))
    re, im = _planar_out(n)
    if raw.dtype == np.int16:
        lib.ishort_to_planar(_c(raw, ctypes.c_int16), _c(re, ctypes.c_float),
                             _c(im, ctypes.c_float), n)
    elif raw.dtype == np.int8:
        lib.ibyte_to_planar(_c(raw, ctypes.c_int8), _c(re, ctypes.c_float),
                            _c(im, ctypes.c_float), n)
    elif raw.dtype == np.float32:
        lib.cfloat_to_planar(_c(raw, ctypes.c_float), _c(re, ctypes.c_float),
                             _c(im, ctypes.c_float), n)
    else:
        flat = raw.astype(np.float32)
        return (np.ascontiguousarray(flat[0::2]),
                np.ascontiguousarray(flat[1::2]))
    return re, im


def real_to_planar(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    raw = np.ascontiguousarray(raw)
    n = raw.shape[0]
    lib = _load()
    if lib is not None and raw.dtype == np.int16:
        re, im = _planar_out(n)
        lib.short_to_planar(_c(raw, ctypes.c_int16), _c(re, ctypes.c_float),
                            _c(im, ctypes.c_float), n)
        return re, im
    return raw.astype(np.float32), np.zeros(n, dtype=np.float32)


def complex_to_quantized_i8(samples: np.ndarray, q: float
                            ) -> tuple[np.ndarray, np.ndarray]:
    """complex64 -> planar int8 pair at scale ``q`` (one native pass; the
    production receiver's ingest-ring conversion)."""
    samples = np.ascontiguousarray(samples, dtype=np.complex64)
    n = samples.shape[0]
    lib = _load()
    if lib is None:
        re = np.clip(samples.real * q, -127, 127).astype(np.int8)
        im = np.clip(samples.imag * q, -127, 127).astype(np.int8)
        return re, im
    flat = samples.view(np.float32)
    re8 = np.empty(n, dtype=np.int8)
    im8 = np.empty(n, dtype=np.int8)
    lib.cfloat_quantize_i8(_c(flat, ctypes.c_float), _c(re8, ctypes.c_int8),
                           _c(im8, ctypes.c_int8), n, float(q))
    return re8, im8


def unpack_2bit_cpx_planar(
    data: np.ndarray, reverse_iq: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = 2 * data.shape[0]
    lib = _load()
    if lib is None:
        from gnss_sdr_tpu.sources.unpack import unpack_byte_2bit_cpx_samples

        x = unpack_byte_2bit_cpx_samples(data, reverse_iq)
        return (np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag))
    re, im = _planar_out(n)
    lib.unpack2bit_cpx_to_planar(
        _c(data, ctypes.c_uint8), _c(re, ctypes.c_float),
        _c(im, ctypes.c_float), data.shape[0], int(reverse_iq))
    return re, im
