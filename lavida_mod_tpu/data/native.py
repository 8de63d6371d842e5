"""ctypes bridge to the native image-preprocessing extension (csrc/).

Auto-builds libimage_prep.so on first use (g++ is in the image); every
entry point falls back to the PIL path transparently when the toolchain or
library is unavailable, so nothing hard-depends on native code.

Output matches the PIL pipeline to the uint8 quantization boundary
(PIL quantizes after each resample pass; so do we).  The win is thread
scaling: rows are processed across all cores, so on many-core serving
hosts the 5-view anyres prep parallelizes; on a 1-vCPU dev box PIL's
single-core SIMD is still faster — measure before switching the default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libimage_prep.so"))
_lib = None
_tried = False

FILTER_BILINEAR = 0
FILTER_BICUBIC = 1
FILTER_LANCZOS = 2


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.prep_view.restype = ctypes.c_int
        lib.prep_pad_view.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def native_available() -> bool:
    return _load() is not None


def prep_view_native(
    image: np.ndarray,                  # uint8 [H, W, C]
    out_size: tuple[int, int],          # (h, w)
    filter_id: int = FILTER_BICUBIC,
    rescale: float = 1 / 255,
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
) -> Optional[np.ndarray]:
    """Resample + normalize -> float32 [C, h, w]; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    oh, ow = out_size
    dst = np.empty((c, oh, ow), np.float32)
    m = (ctypes.c_double * c)(*mean[:c])
    s = (ctypes.c_double * c)(*std[:c])
    rc = lib.prep_view(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, filter_id, ctypes.c_double(rescale), m, s,
    )
    return dst if rc == 0 else None


def prep_pad_view_native(
    image: np.ndarray,
    target: tuple[int, int],            # (h, w) canvas
    inner: tuple[int, int],             # (h, w) resized content
    paste: tuple[int, int],             # (y, x)
    filter_id: int = FILTER_BICUBIC,
    rescale: float = 1 / 255,
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    th, tw = target
    nh, nw = inner
    py, px = paste
    dst = np.empty((c, th, tw), np.float32)
    m = (ctypes.c_double * c)(*mean[:c])
    s = (ctypes.c_double * c)(*std[:c])
    rc = lib.prep_pad_view(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        th, tw, nh, nw, py, px,
        filter_id, ctypes.c_double(rescale), m, s,
    )
    return dst if rc == 0 else None


# ---------------------------------------------------------------------------
# native BPE merge engine (csrc/bpe.cpp)
# ---------------------------------------------------------------------------

_BPE_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libbpe.so"))
_bpe_lib = None
_bpe_tried = False


def _load_bpe_lib() -> Optional[ctypes.CDLL]:
    global _bpe_lib, _bpe_tried
    if _bpe_lib is not None or _bpe_tried:
        return _bpe_lib
    _bpe_tried = True
    if not os.path.exists(_BPE_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC), "libbpe.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_BPE_LIB_PATH)
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = [ctypes.c_int] + [
            ctypes.POINTER(ctypes.c_int)] * 4
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_apply.restype = ctypes.c_int
        lib.bpe_apply.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _bpe_lib = lib
    except OSError:
        return None
    return _bpe_lib


class NativeBPE:
    """Integer-domain BPE merge table + one-call-per-encode bridge
    (csrc/bpe.cpp).  The merge rules are ByteLevelBPE.ranks projected
    through the vocab: (id(l), id(r)) -> (id(l+r), rank)."""

    def __init__(self, lib, ctx):
        self._lib = lib
        self._ctx = ctx

    def __del__(self):
        try:
            if self._ctx:
                self._lib.bpe_free(self._ctx)
        except Exception:
            pass

    def apply(self, words: Sequence[Sequence[int]]) -> list:
        if not words:
            return []
        flat = np.asarray(
            [v for w in words for v in w], dtype=np.int32)
        ends = np.cumsum([len(w) for w in words]).astype(np.int32)
        out = np.empty_like(flat)
        n = self._lib.bpe_apply(
            self._ctx,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(flat),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(ends),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out[:n].tolist()


def load_bpe_native(vocab: dict, merges) -> Optional[NativeBPE]:
    lib = _load_bpe_lib()
    if lib is None:
        return None
    lhs, rhs, mrg, rank = [], [], [], []
    for i, (l, r) in enumerate(merges):
        li, ri, mi = vocab.get(l), vocab.get(r), vocab.get(l + r)
        if li is None or ri is None or mi is None:
            continue
        lhs.append(li); rhs.append(ri); mrg.append(mi); rank.append(i)
    arr = lambda v: np.asarray(v, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int))
    lhs_a = np.asarray(lhs, np.int32)
    rhs_a = np.asarray(rhs, np.int32)
    mrg_a = np.asarray(mrg, np.int32)
    rank_a = np.asarray(rank, np.int32)
    ctx = lib.bpe_new(
        len(lhs),
        lhs_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rhs_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        mrg_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rank_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if not ctx:
        return None
    return NativeBPE(lib, ctx)
