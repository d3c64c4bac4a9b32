"""ctypes loader for the native data-prep library (dataprep.cc).

Compiles the C++ on first import (g++ -O3 -march=native -shared) into a
version-stamped .so next to the source; every entry point has a pure-numpy
fallback so the package works without a toolchain. Use `native_available()`
to check which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _HERE / "dataprep.cc"
    tag = hashlib.md5(src.read_bytes()).hexdigest()[:10]
    out = _HERE / f"_dataprep_{tag}.so"
    if out.exists():
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def _lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.patchify_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
            lib.unpatchify_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
            lib.rotate_patches_f32.argtypes = [f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
            lib.regular_graph_mask.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_uint64, u8p]
            lib.collate_pad_f32.argtypes = [f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, f32p]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def patchify(img: np.ndarray, ph: int, pw: int, ps: int) -> np.ndarray:
    """(ph·ps, pw·ps, C) float32 → (ph·pw, ps, ps, C); native or numpy."""
    img = np.ascontiguousarray(img, dtype=np.float32)
    c = img.shape[-1]
    lib = _lib()
    if lib is None:
        from ..data.patchify import patchify as np_patchify

        return np_patchify(img, ph, pw, ps)
    out = np.empty((ph * pw, ps, ps, c), dtype=np.float32)
    lib.patchify_f32(_fp(img), ph, pw, ps, c, _fp(out))
    return out


def unpatchify(patches: np.ndarray, ph: int, pw: int) -> np.ndarray:
    patches = np.ascontiguousarray(patches, dtype=np.float32)
    n, ps, _, c = patches.shape
    lib = _lib()
    if lib is None:
        from ..data.patchify import unpatchify as np_unpatchify

        return np_unpatchify(patches, ph, pw)
    out = np.empty((ph * ps, pw * ps, c), dtype=np.float32)
    lib.unpatchify_f32(_fp(patches), ph, pw, ps, c, _fp(out))
    return out


def rotate_patches(patches: np.ndarray, rot_k: np.ndarray) -> np.ndarray:
    patches = np.ascontiguousarray(patches, dtype=np.float32)
    lib = _lib()
    if lib is None:
        from ..data.patchify import rotate_patches as np_rot

        return np_rot(patches, rot_k)
    n, ps, _, c = patches.shape
    rk = np.ascontiguousarray(rot_k, dtype=np.int32)
    out = np.empty_like(patches)
    lib.rotate_patches_f32(
        _fp(patches), rk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, ps, c, _fp(out)
    )
    return out


def collate_pad(rows: list[np.ndarray], n_max: int) -> np.ndarray:
    """Scatter variable-length (n_i, …) float32 rows into (B, n_max, …) with
    zero padding (native collate_pad_f32; numpy fallback)."""
    b = len(rows)
    tail = rows[0].shape[1:]
    out = np.zeros((b, n_max, *tail), dtype=np.float32)
    lib = _lib()
    if lib is None:
        for i, r in enumerate(rows):
            out[i, : min(len(r), n_max)] = r[:n_max]
        return out
    src = np.ascontiguousarray(np.concatenate([r.reshape(len(r), -1) for r in rows], axis=0), dtype=np.float32)
    lens = np.asarray([len(r) for r in rows], dtype=np.int32)
    row_elems = int(np.prod(tail)) if tail else 1
    lib.collate_pad_f32(
        _fp(src), lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, n_max, row_elems, _fp(out),
    )
    return out


def regular_graph_mask(n: int, degree: int, seed: int) -> np.ndarray:
    """d-regular expander candidate as (n, n) bool mask (native PRNG)."""
    lib = _lib()
    if lib is None:
        from ..data.expander import _random_regular_edges

        rng = np.random.default_rng(seed)
        mask = np.zeros((n, n), dtype=bool)
        s, r = _random_regular_edges(n, degree, rng)
        mask[s, r] = True
        mask |= mask.T
        np.fill_diagonal(mask, True)
        return mask
    out = np.empty((n, n), dtype=np.uint8)
    lib.regular_graph_mask(n, degree, seed, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)
