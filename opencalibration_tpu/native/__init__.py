"""Native (C++) runtime components with lazy g++ build + ctypes bindings.

The reference keeps its runtime native (C++ loaders, parsers, schedulers);
this package holds the TPU build's native pieces. Each library is compiled
on first use with the system toolchain and cached next to its source;
importers fall back to pure-Python implementations when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_libs = {}

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str, sources) -> str:
    out = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load_library(name: str, sources):
    """Build (if needed) and dlopen a native library; None on failure."""
    with _lock:
        if name in _libs:
            return _libs[name]
        try:
            path = _build(name, sources)
            lib = ctypes.CDLL(path)
        except Exception:
            lib = None
        _libs[name] = lib
        return lib


class ExifResult(ctypes.Structure):
    _fields_ = [
        ("has_exif", ctypes.c_int32),
        ("has_gps", ctypes.c_int32),
        ("has_altitude", ctypes.c_int32),
        ("has_relative_altitude", ctypes.c_int32),
        ("has_orientation", ctypes.c_int32),
        ("make", ctypes.c_char * 64),
        ("model", ctypes.c_char * 64),
        ("lens_model", ctypes.c_char * 64),
        ("datetime", ctypes.c_char * 32),
        ("width_px", ctypes.c_int32),
        ("height_px", ctypes.c_int32),
        ("focal_length_mm", ctypes.c_double),
        ("focal_length_35mm", ctypes.c_double),
        ("focal_plane_x_res", ctypes.c_double),
        ("focal_plane_unit", ctypes.c_int32),
        ("latitude", ctypes.c_double),
        ("longitude", ctypes.c_double),
        ("altitude", ctypes.c_double),
        ("dop", ctypes.c_double),
        ("relative_altitude", ctypes.c_double),
        ("gimbal_roll_deg", ctypes.c_double),
        ("gimbal_pitch_deg", ctypes.c_double),
        ("gimbal_yaw_deg", ctypes.c_double),
        ("rtk_std_lon", ctypes.c_double),
        ("rtk_std_lat", ctypes.c_double),
        ("rtk_std_hgt", ctypes.c_double),
    ]


def exif_library():
    lib = load_library("ocexif", ["exif_parser.cpp"])
    if lib is not None and not hasattr(lib, "_configured"):
        lib.oc_parse_exif.argtypes = [ctypes.c_char_p, ctypes.POINTER(ExifResult)]
        lib.oc_parse_exif.restype = ctypes.c_int
        lib._configured = True
    return lib


def parse_exif_native(path: str):
    """Parse EXIF/XMP with the native library; None if unavailable/failed."""
    lib = exif_library()
    if lib is None:
        return None
    res = ExifResult()
    rc = lib.oc_parse_exif(path.encode(), ctypes.byref(res))
    if rc != 0:
        return None
    return res
