"""ctypes bindings for the C++ host ops (native/hiast_host_ops.cc).

Auto-builds the shared library on first import (g++ is part of the
toolchain); every entry point has a numpy/cv2 fallback so the pipeline works
without a compiler.  ctypes calls release the GIL, so prefetch threads
overlap these with TPU steps.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libhiast_host_ops.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _stale() -> bool:
    """True when the .so predates the C++ source (make tracks this, but only
    if we invoke it — a prebuilt library from an older checkout may lack
    newer symbols entirely)."""
    try:
        src = os.path.join(_NATIVE_DIR, "hiast_host_ops.cc")
        return os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        return _get_lib_locked()


def _get_lib_locked():
    """Build+dlopen under _lib_lock: the dataset fetcher fans the first
    batch out over a thread pool, and two concurrent `make` runs truncating
    the same .so (or a CDLL of a half-written file) would crash startup
    whenever the source is newer than a prebuilt library."""
    global _lib
    if _lib is not None:  # lost the race to another thread — reuse its work
        return _lib or None
    if (not os.path.exists(_LIB_PATH) or _stale()) and not _build():
        if not os.path.exists(_LIB_PATH):
            _lib = False
            return None
        # build failed but an old .so exists: bind what it has, per-symbol
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    sigs = {
        "remap_u8": ([u8p, u8p, u8p, ctypes.c_int64], None),
        "nearest_resize_u8": ([u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2, None),
        "bilinear_resize_u8": ([u8p] + [ctypes.c_int] * 3 + [u8p] + [ctypes.c_int] * 2, None),
        "paste_hard_classes": ([u8p] * 6 + [ctypes.c_int64, ctypes.c_int], None),
        "crop_flip_resize_u8": ([u8p] + [ctypes.c_int] * 8 + [u8p] + [ctypes.c_int] * 2, None),
        "crop_flip_resize_nearest_u8": ([u8p] + [ctypes.c_int] * 7 + [u8p] + [ctypes.c_int] * 2, None),
        "encode_gray_png": ([u8p] + [ctypes.c_int] * 3 + [u8p, ctypes.c_int64], ctypes.c_int64),
        "decode_png": ([u8p, ctypes.c_int64, u8p, ctypes.c_int64], ctypes.c_int64),
        "png_header": ([u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int)], ctypes.c_int64),
    }
    # Per-symbol binding: a stale .so missing newer entry points must degrade
    # that op to its numpy/PIL fallback, not crash every native op.
    for name, (argtypes, restype) in sigs.items():
        try:
            fn = getattr(lib, name)
        except AttributeError:
            continue
        fn.argtypes = argtypes
        if restype is not None:
            fn.restype = restype
    _lib = lib
    return lib


def _sym(name: str):
    lib = get_lib()
    return getattr(lib, name, None) if lib is not None else None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def remap_u8(src: np.ndarray, lut: np.ndarray) -> np.ndarray:
    fn = _sym("remap_u8")
    src = np.ascontiguousarray(src, np.uint8)
    if fn is None:
        return lut[src]
    dst = np.empty_like(src)
    fn(_ptr(src), _ptr(np.ascontiguousarray(lut, np.uint8)), _ptr(dst), src.size)
    return dst


def paste_hard_classes(
    img: np.ndarray,
    lbl: np.ndarray,
    cp_mask: np.ndarray,
    donor_img: np.ndarray,
    donor_lbl: np.ndarray,
    hard_lut: np.ndarray,
) -> None:
    """In-place fused HPA paste (see native/hiast_host_ops.cc)."""
    fn = _sym("paste_hard_classes")
    if fn is None:
        mask = hard_lut.astype(bool)[donor_lbl]
        img[mask] = donor_img[mask]
        lbl[mask] = donor_lbl[mask]
        cp_mask[mask] = donor_lbl[mask]
        return
    h, w = lbl.shape
    fn(
        _ptr(img), _ptr(lbl), _ptr(cp_mask),
        _ptr(np.ascontiguousarray(donor_img, np.uint8)),
        _ptr(np.ascontiguousarray(donor_lbl, np.uint8)),
        _ptr(np.ascontiguousarray(hard_lut, np.uint8)),
        h * w, img.shape[2],
    )


def crop_flip_resize(
    img: np.ndarray,
    lbl: np.ndarray,
    y0: int,
    x0: int,
    ch: int,
    cw: int,
    flip: bool,
    oh: int,
    ow: int,
):
    """Fused crop+flip+resize for an (image, label) pair."""
    lib = get_lib()
    if lib is None or _sym("crop_flip_resize_u8") is None:
        import cv2

        ci = img[y0 : y0 + ch, x0 : x0 + cw]
        cl = lbl[y0 : y0 + ch, x0 : x0 + cw]
        if flip:
            ci, cl = ci[:, ::-1], cl[:, ::-1]
        oi = cv2.resize(ci, (ow, oh), interpolation=cv2.INTER_LINEAR)
        ol = cv2.resize(cl, (ow, oh), interpolation=cv2.INTER_NEAREST)
        return np.ascontiguousarray(oi), np.ascontiguousarray(ol)
    img = np.ascontiguousarray(img, np.uint8)
    lbl = np.ascontiguousarray(lbl, np.uint8)
    oi = np.empty((oh, ow, img.shape[2]), np.uint8)
    ol = np.empty((oh, ow), np.uint8)
    h, w = lbl.shape
    lib.crop_flip_resize_u8(_ptr(img), h, w, img.shape[2], y0, x0, ch, cw, int(flip), _ptr(oi), oh, ow)
    lib.crop_flip_resize_nearest_u8(_ptr(lbl), h, w, y0, x0, ch, cw, int(flip), _ptr(ol), oh, ow)
    return oi, ol


def decode_png(blob: bytes) -> np.ndarray | None:
    """8/16-bit gray/RGB/(+alpha) non-interlaced PNG decode via the C++ lib.

    Returns [H, W] or [H, W, C] uint8 (or uint16 for 16-bit files, e.g.
    SYNTHIA label PNGs), or None when unsupported (palette, interlaced) or
    the lib is unavailable — callers fall back to PIL/cv2.  Single inflate
    + one unfilter pass, no mode-conversion copies.
    """
    fn_h, fn_d = _sym("png_header"), _sym("decode_png")
    if fn_h is None or fn_d is None:
        return None
    buf = np.frombuffer(blob, np.uint8)
    info = (ctypes.c_int * 4)()
    if fn_h(_ptr(buf), buf.size, info) != 0:
        return None
    h, w, c, depth = info[0], info[1], info[2], info[3]
    # Sanity-bound the DECLARED header dims before allocating: a corrupt or
    # hostile IHDR can claim 2^31-scale dims (negative after the c_int cast)
    # — without the bound np.empty raises, or the C++ side's row-buffer
    # vector throws bad_alloc through the extern "C" boundary (terminate).
    # 2^26 pixels ≈ 8192x8192 covers every real dataset image many times.
    if not (0 < h and 0 < w and h * w <= (1 << 26) and c in (1, 2, 3, 4)
            and depth in (8, 16)):
        return None
    nbytes = h * w * c * (depth // 8)
    out = np.empty(nbytes, np.uint8)
    n = fn_d(_ptr(buf), buf.size, _ptr(out), out.size)
    if n != out.size:
        return None
    if depth == 16:  # PNG stores big-endian samples
        out = out.view(">u2").astype(np.uint16)
    return out.reshape(h, w) if c == 1 else out.reshape(h, w, c)


def decode_png_file(path: str) -> np.ndarray | None:
    """decode_png over a file path (None -> caller falls back to PIL)."""
    if not path.endswith(".png"):
        return None
    try:
        with open(path, "rb") as f:
            return decode_png(f.read())
    except OSError:
        return None


def encode_gray_png(arr: np.ndarray, level: int = 1) -> bytes | None:
    """8-bit grayscale PNG encode via the C++ lib (Up filter + zlib).

    Returns the encoded bytes, or None when the native lib is unavailable
    (callers fall back to PIL).  Level 1 (fastest) is the right trade for
    pseudo-label maps: the Up-filtered stream is mostly zeros.
    """
    fn = _sym("encode_gray_png")
    if fn is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    assert arr.ndim == 2, arr.shape
    h, w = arr.shape
    cap = (w + 1) * h + (((w + 1) * h) >> 10) + 4096  # > compressBound + chunks
    out = np.empty(cap, np.uint8)
    n = fn(_ptr(arr), h, w, level, _ptr(out), cap)
    if n <= 0:
        return None
    return out[:n].tobytes()
