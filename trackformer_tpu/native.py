"""ctypes binding for the native host library (native/trackformer_native.cpp).

Fused resize+normalize+pad for the per-frame input pipeline and the COCO RLE
codec. Gracefully unavailable (callers fall back to PIL/numpy) when the .so
hasn't been built: `make -C native`.
"""
from __future__ import annotations

import ctypes
import os.path as osp
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "native", "libtrackformer_native.so")
    if not osp.exists(path):
        return None
    # containers often under-report nproc; libgomp reads this at init
    import os
    os.environ.setdefault("OMP_NUM_THREADS", "8")
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.tf_resize_normalize_pad.argtypes = [
        u8p, i64, i64, f32p, i64, i64, i64, i64, f32p, f32p]
    lib.tf_resize_normalize_pad.restype = None
    lib.tf_rle_encode.argtypes = [u8p, i64, i64, ctypes.c_char_p, i64]
    lib.tf_rle_encode.restype = i64
    lib.tf_rle_decode.argtypes = [ctypes.c_char_p, i64, i64, i64, u8p]
    lib.tf_rle_decode.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_normalize_pad(img_u8: np.ndarray, out_hw: Tuple[int, int],
                         pad_hw: Tuple[int, int],
                         mean: np.ndarray, std: np.ndarray
                         ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w = img_u8.shape[:2]
    out = np.empty((pad_hw[0], pad_hw[1], 3), np.float32)
    lib.tf_resize_normalize_pad(
        img_u8, h, w, out, out_hw[0], out_hw[1], pad_hw[0], pad_hw[1],
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32))
    return out


def rle_encode(mask: np.ndarray) -> Optional[str]:
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = 2 * h * w + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.tf_rle_encode(mask, h, w, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def rle_decode(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    s = counts.encode("ascii")
    if lib.tf_rle_decode(s, len(s), h, w, out) != 0:
        return None
    return out.astype(bool)
