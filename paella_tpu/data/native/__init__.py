"""Native (C++) data-path kernels with on-demand compilation and Python fallback.

`get_native()` returns the compiled extension module or None. The extension is
built once with g++ (CPython C API + libjpeg, no pybind11) and cached next to
this file; any build/toolchain failure falls back to the PIL path silently.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading

_lock = threading.Lock()
_native = None
_tried = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "paella_native.cpp")
_SO = os.path.join(_HERE, f"paella_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        _SRC,
        "-ljpeg",
        "-o",
        _SO,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        sys.stderr.write(f"[paella_native] build failed:\n{proc.stderr[:2000]}\n")
        return False
    return True


def get_native():
    """The compiled extension module, or None if unavailable."""
    global _native, _tried
    with _lock:
        if _tried:
            return _native
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                if not _build():
                    return None
            spec = importlib.util.spec_from_file_location("paella_native", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _native = mod
        except Exception as e:  # toolchain/ABI issues -> fall back
            sys.stderr.write(f"[paella_native] load failed: {e}\n")
            _native = None
        return _native


def decode_jpeg(data: bytes):
    """JPEG bytes -> float32 RGB HWC in [0,1] via the native decoder, or None."""
    import numpy as np

    mod = get_native()
    if mod is None:
        return None
    try:
        h, w, rgb = mod.decode_jpeg_rgb(data)
    except ValueError:
        return None
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    return arr.astype(np.float32) / 255.0


def resize_bilinear(img_u8, out_h: int, out_w: int):
    """uint8 HWC RGB -> resized uint8 HWC via the native kernel, or None."""
    import numpy as np

    mod = get_native()
    if mod is None:
        return None
    h, w = img_u8.shape[:2]
    out = mod.resize_bilinear_u8(np.ascontiguousarray(img_u8).tobytes(), h, w, out_h, out_w)
    return np.frombuffer(out, np.uint8).reshape(out_h, out_w, 3)
