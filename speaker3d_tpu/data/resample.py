"""Segment-targeted polyphase resampling for the host data pipeline.

The training loader's speed perturbation (reference: sox `speed 0.9/1.1`
inside WavReader, speakerlab/process/processor.py:30-52) is a rational
polyphase resample followed by a random fixed-length crop. Resampling the
WHOLE utterance and then cropping wastes most of the filtering work —
worse, scipy's upfirdn kernel is a scalar loop (~1.3 GMAC/s measured on
this box), costing ~1.2 ms per 4 s utterance: the dominant host cost that
starves the chip on small hosts (docs/BENCH.md soak section).

`resample_poly_segment` computes exactly `resample_poly(x, up, down)[o0 :
o0+n_out]` — the filter is designed with scipy's own recipe so the
frequency response is identical, and only the crop's receptive field is
touched. The hot loop runs in the native runtime
(runtime/src/hostops.cpp, ctypes) when built, with a scipy fallback.
Outputs match scipy within float32 reassociation (<=2e-6 abs, pinned by
tests/test_host_resample.py).
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@lru_cache(maxsize=1)
def _native_lib():
    """The hostops shared library, or None (scipy fallback)."""
    path = os.environ.get(
        "S3D_HOSTOPS_LIB",
        os.path.join(_REPO, "runtime", "build", "libs3d_hostops.so"))
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    fn = lib.s3d_resample_segment_f32
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # x, n_in
        ctypes.c_int32, ctypes.c_int32,                   # up, down
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # h_pad, h_len
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,   # npr, o0, n_out
        ctypes.POINTER(ctypes.c_float),                   # out
    ]
    return fn


@lru_cache(maxsize=None)
def _design(up: int, down: int):
    """scipy resample_poly's exact filter for (up, down) + offset meta."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate,
               window=("kaiser", 5.0)).astype(np.float32)
    h = h * np.float32(up)
    n_pre_pad = down - half_len % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h_pad = np.ascontiguousarray(
        np.concatenate([np.zeros(n_pre_pad, np.float32), h]))
    return h_pad, n_pre_remove


def out_len(n_in: int, up: int, down: int) -> int:
    """Output length of resample_poly(x, up, down) for len(x) == n_in."""
    return -(-n_in * up // down)


def resample_poly_segment(x: np.ndarray, up: int, down: int, o0: int,
                          n_out: int) -> np.ndarray:
    """== scipy.signal.resample_poly(x, up, down)[o0:o0+n_out] (float32)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    assert x.ndim == 1
    total = out_len(len(x), up, down)
    if not (0 <= o0 and o0 + n_out <= total):
        raise ValueError(f"segment [{o0}, {o0+n_out}) outside [0, {total})")
    fn = _native_lib()
    if fn is None:
        from scipy.signal import resample_poly

        return resample_poly(x, up, down)[o0:o0 + n_out].astype(
            np.float32, copy=False)
    h_pad, npr = _design(up, down)
    out = np.empty(n_out, np.float32)
    rc = fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
            up, down,
            h_pad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(h_pad),
            npr, o0, n_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"s3d_resample_segment_f32 failed (rc={rc})")
    return out


def speed_ratio(speed: float):
    """sox `speed S` == resample by 1/S: (up, down) in lowest terms."""
    ratio = {0.9: (10, 9), 1.1: (10, 11)}.get(speed)
    if ratio is None:
        from fractions import Fraction

        fr = Fraction(1.0 / speed).limit_denominator(100)
        ratio = (fr.numerator, fr.denominator)
    return ratio
