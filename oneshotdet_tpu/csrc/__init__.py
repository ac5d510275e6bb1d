"""Native host-runtime extensions (C++ via ctypes; no pybind11 in image).

``load()`` compiles oneshotdet_tpu/csrc/*.cpp on first use (g++ -O3, cached
next to the source) and returns the ctypes library, or None when no
compiler is available — callers fall back to the python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fast_collate.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_fast_collate.so")


def load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.resize_normalize_pad.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.pad_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ]
            lib.space_to_depth2.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p,
            ]
            _LIB = lib
        except (OSError, subprocess.CalledProcessError):
            _LIB = None
        return _LIB


def resize_normalize_pad(src_u8, dst_f32, out_hw, mean, std, to_bgr255=True):
    """Fused resize+normalize+pad into a batch slot.

    src_u8: (h0, w0, 3) uint8 C-contiguous RGB.
    dst_f32: (pad_h, pad_w, 3) float32 C-contiguous, pre-zeroed.
    out_hw: resample target (oh, ow) with oh <= pad_h, ow <= pad_w.
    Returns True on success, False if the native lib is unavailable.
    """
    import numpy as np

    lib = load()
    if lib is None:
        return False
    src = np.ascontiguousarray(src_u8, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    assert dst_f32.flags["C_CONTIGUOUS"] and dst_f32.dtype == np.float32
    lib.resize_normalize_pad(
        src.ctypes.data, src.shape[0], src.shape[1],
        dst_f32.ctypes.data, int(out_hw[0]), int(out_hw[1]),
        dst_f32.shape[0], dst_f32.shape[1],
        mean.ctypes.data, std.ctypes.data, int(bool(to_bgr255)),
    )
    return True


def space_to_depth_native(arr):
    """(N, H, W, C) f32 -> (N, H/2, W/2, 4C), or None if lib unavailable.
    Bit-identical to data/transforms.space_to_depth's numpy formulation."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(arr, np.float32)
    n, h, w, c = src.shape
    out = np.empty((n, h // 2, w // 2, 4 * c), np.float32)
    step_in = h * w * c * 4
    step_out = out.shape[1] * out.shape[2] * out.shape[3] * 4
    for i in range(n):
        lib.space_to_depth2(src.ctypes.data + i * step_in, h, w, c,
                            out.ctypes.data + i * step_out)
    return out
