"""ctypes bindings for the native host runtime (native/styletts2_native.cpp).

Builds on demand with ``make -C native`` and degrades gracefully to the pure
numpy/JAX paths when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstyletts2_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as exc:
            logger.info("native build unavailable (%s); using pure fallbacks", exc)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        logger.info("native load failed (%s); using pure fallbacks", exc)
        return None

    lib.maximum_path.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pcm16_to_float.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def maximum_path_host(values: np.ndarray, text_lengths: np.ndarray,
                      mel_lengths: np.ndarray) -> np.ndarray:
    """Host-native monotonic DP (b, t_text, t_mel) -> int32 one-hot paths."""
    lib = _load()
    values = np.ascontiguousarray(values, dtype=np.float32)
    b, t_text, t_mel = values.shape
    paths = np.zeros_like(values, dtype=np.int32)
    tx = np.ascontiguousarray(text_lengths, dtype=np.int32)
    ty = np.ascontiguousarray(mel_lengths, dtype=np.int32)
    if lib is None:
        # numpy fallback (same DP)
        for i in range(b):
            paths[i] = _numpy_dp(values[i], int(tx[i]), int(ty[i]))
        return paths
    lib.maximum_path(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_text, t_mel,
        tx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ty.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return paths


def _numpy_dp(value: np.ndarray, tx: int, ty: int) -> np.ndarray:
    neg = -1e9
    t_text, t_mel = value.shape
    v = np.full_like(value, neg, dtype=np.float64)
    for y in range(ty):
        for x in range(max(0, tx + y - ty), min(tx, y + 1)):
            v_cur = neg if (x == y or y == 0) else v[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else neg
            else:
                v_prev = neg if y == 0 else v[x - 1, y - 1]
            v[x, y] = max(v_prev, v_cur) + value[x, y]
    path = np.zeros((t_text, t_mel), np.int32)
    index = tx - 1
    for y in range(ty - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or (y > 0 and v[index, y - 1] < v[index - 1, y - 1])):
            index -= 1
    return path


def resample_host(wave: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-native polyphase resampling for the data pipeline."""
    from .audio.resample import _sinc_kernel

    if orig_freq == new_freq:
        return np.asarray(wave, np.float32)
    kernels, width, orig, new = _sinc_kernel(orig_freq, new_freq)
    wave = np.ascontiguousarray(wave, np.float32)
    padded = np.pad(wave, (width, width + orig)).astype(np.float32)
    n_out = int(np.ceil(new_freq * len(wave) / orig_freq))
    out = np.zeros(n_out, np.float32)
    lib = _load()
    if lib is None:
        frames = (len(padded) - kernels.shape[1]) // orig + 1
        strided = np.lib.stride_tricks.sliding_window_view(padded, kernels.shape[1])[::orig]
        full = strided @ kernels.T
        return full.reshape(-1)[:n_out].astype(np.float32)
    kernels = np.ascontiguousarray(kernels, np.float32)
    lib.resample_poly(
        padded.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(padded),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        kernels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        kernels.shape[0], kernels.shape[1], orig,
    )
    return out
