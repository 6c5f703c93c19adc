"""ctypes bindings for the native C++ image pipeline (`native/image_loader.cpp`).

Builds the shared library on first use (g++, cached next to the source) and
exposes:

- `decode_to_tensor(bytes, (w, h))` -> (3, h, w) float32 in [-1, 1]: decode +
  bilinear scale-to-cover + crop + normalize in one native pass;
- `probe_size(bytes)` -> (w, h) without full decode (bucket selection);
- `NativeImageProcessor`: drop-in transform for the dataset layer that
  performs `var_center_crop`-style bucketing natively.

ctypes calls release the GIL, so the threaded prefetcher in `data/loader.py`
decodes in parallel — the role the reference fills with torch DataLoader
worker subprocesses. Falls back to PIL when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import random
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "image_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "_image_loader.so")


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        os.path.abspath(_SRC), "-o", os.path.abspath(_SO),
        "-ljpeg", "-lpng", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:  # lock-free fast path (hot: called
        return _LIB                        # per image by the decode threads)
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        so = _SO if os.path.exists(_SO) else _build()
        if so is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(os.path.abspath(so))
        lib.decode_to_tensor.restype = ctypes.c_int
        lib.decode_to_tensor.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.probe_size.restype = ctypes.c_int
        lib.probe_size.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def probe_size(data: bytes) -> Tuple[int, int]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.probe_size(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError("cannot probe image")
    return w.value, h.value


def decode_to_tensor(data: bytes, crop_size: Tuple[int, int],
                     crop_xy: Tuple[int, int] = (-1, -1)) -> np.ndarray:
    """bytes -> (3, crop_h, crop_w) float32 in [-1, 1]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    cw, ch = crop_size
    out = np.empty((3, ch, cw), np.float32)
    rc = lib.decode_to_tensor(
        data, len(data), cw, ch, crop_xy[0], crop_xy[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("cannot decode image")
    return out


class NativeImageProcessor:
    """Bucketed native decode transform: probe size, pick the bucket
    (top-k closest aspect, like `var_center_crop`), decode+crop+normalize in
    C++. PIL fallback keeps behavior identical when the toolchain is absent."""

    def __init__(self, crop_size_list: List[Tuple[int, int]], random_top_k: int = 4,
                 random_crop: bool = True):
        self.crop_size_list = crop_size_list
        self.random_top_k = random_top_k
        self.random_crop = random_crop

    def _pick_bucket(self, w: int, h: int) -> Tuple[int, int]:
        rem = sorted(
            ((min(cw / w, ch / h) / max(cw / w, ch / h), (cw, ch))
             for cw, ch in self.crop_size_list),
            reverse=True,
        )[: self.random_top_k]
        return random.choice(rem)[1]

    def __call__(self, path: str) -> Tuple[np.ndarray, Tuple[int, int]]:
        with open(path, "rb") as f:
            data = f.read()
        if native_available():
            w, h = probe_size(data)
            bucket = self._pick_bucket(w, h)
            cw, ch = bucket
            if self.random_crop:
                # random crop position like `imgproc.center_crop` (the
                # reference's crop augmentation); mirror the C++'s
                # scaled-dimension arithmetic (image_loader.cpp:147-149) so
                # the drawn origin spans exactly the valid range
                scale = max(cw / w, ch / h)
                sw = max(int(w * scale + 0.5), cw)
                sh = max(int(h * scale + 0.5), ch)
                crop_xy = (random.randint(0, sw - cw), random.randint(0, sh - ch))
            else:
                crop_xy = (-1, -1)  # center
            arr = decode_to_tensor(data, bucket, crop_xy)
            return arr, bucket
        # PIL fallback
        import io

        from PIL import Image

        from .imgproc import center_crop, to_latent_input

        img = Image.open(io.BytesIO(data)).convert("RGB")
        bucket = self._pick_bucket(*img.size)
        if self.random_crop:
            img = center_crop(img, bucket)  # random position (augmentation)
        else:
            cw, ch = bucket
            scale = max(cw / img.size[0], ch / img.size[1])
            img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                             resample=Image.BICUBIC)
            left = (img.size[0] - cw) // 2
            top = (img.size[1] - ch) // 2
            img = img.crop((left, top, left + cw, top + ch))
        return to_latent_input(img), img.size
