"""MSER detector — host-side native component tree + TPU-side adaptation.

The component tree is the one genuinely sequential, pointer-chasing
algorithm in the pipeline (reference detectors/mser/**, ~7000 LoC of
C/C++ union-find); here it is a compact native C++ flood-fill MSER
(native/mser.cpp) loaded through ctypes, feeding ellipse frames into the
same padded Keypoints representation the TPU stages consume.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..config import MSERParams
from ..types import Keypoints

_LIB: Optional[ctypes.CDLL] = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "mser.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmser.so")


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    if (not os.path.exists(_SO)) or (os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True)
    lib = ctypes.CDLL(_SO)
    lib.mser_detect.restype = ctypes.c_int
    lib.mser_detect.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_longlong, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    _LIB = lib
    return lib


def detect_mser(img: np.ndarray, par: MSERParams,
                max_regions: int = 4096) -> Keypoints:
    """img: float32/uint8 [H,W] -> padded Keypoints (both polarities).

    reference: DetectMSERs (detectors/mser/extrema/extrema.cpp:92-193)
    with CMP margin-stability semantics: FixedTh uses min_margin as the
    tree-level threshold; the other modes build with threshold 1.0 and
    cut the margin-ranked list (prepareKeysForExport, extrema.cpp:24-90).
    """
    import jax.numpy as jnp
    lib = _load()
    u8 = np.ascontiguousarray(np.clip(img, 0, 255), dtype=np.uint8)
    h, w = u8.shape
    # reference max_size excludes the 1px processing frame
    max_size = int(par.max_area * (w - 2) * (h - 2))
    min_margin = (float(par.min_margin)
                  if par.detector_mode == "FixedTh" else 1.0)
    out = np.zeros((max_regions, 8), np.float64)
    n = lib.mser_detect(
        u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        int(par.min_size), max_size, min_margin, 2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_regions)
    if par.detector_mode in ("FixedRegNumber", "RegNumber"):
        n = min(n, par.reg_number)
    elif par.detector_mode == "RelativeRegNumber":
        n = min(n, int(n * par.rel_threshold) if par.rel_threshold > 1
                else int(np.floor(n * max(par.rel_threshold, 0.0))) or n)
    elif par.detector_mode == "NotLessThanRegions":
        # margin >= min_margin wins unless fewer than reg_number
        # (extrema.cpp:67-81)
        n_th = int(np.sum(out[:n, 7] >= par.min_margin))
        n = min(n, max(n_th, min(par.reg_number, n)))
    kp = Keypoints(
        xy=jnp.asarray(np.pad(out[:n, 0:2], ((0, max_regions - n), (0, 0))).astype(np.float32)),
        A=jnp.asarray(np.pad(out[:n, 2:6].reshape(-1, 2, 2),
                             ((0, max_regions - n), (0, 0), (0, 0))).astype(np.float32)),
        s=jnp.asarray(np.pad(out[:n, 6], (0, max_regions - n)).astype(np.float32)),
        response=jnp.asarray(np.pad(out[:n, 7], (0, max_regions - n)).astype(np.float32)),
        valid=jnp.asarray(np.arange(max_regions) < n),
    )
    return kp
