"""ctypes bindings for the native IO library (native/io.cpp).

Provides fast binary PLY read/write and COLMAP points parsing. Falls back to
the pure-numpy implementations in models/ply.py when the shared library
cannot be built (the numpy path is the behavioral spec; outputs are
byte-identical)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from collections import OrderedDict
from typing import Optional

import numpy as np

_DTYPES = ["i1", "u1", "i2", "u2", "i4", "u4", "f4", "f8"]
_PLY_NAMES = {"i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
              "i4": "int", "u4": "uint", "f4": "float", "f8": "double"}

_lib = None
_lib_tried = False


def _find_lib() -> Optional[str]:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libreduced3dgs_io.so")


def get_lib():
    """Load (building on first use) the native library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = _find_lib()
    if path and not os.path.exists(path):
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True, capture_output=True,
                               timeout=120)
            except Exception:
                return None
    if not path or not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.r3dgs_ply_open.restype = ctypes.c_void_p
    lib.r3dgs_ply_open.argtypes = [ctypes.c_char_p]
    lib.r3dgs_ply_num_elements.argtypes = [ctypes.c_void_p]
    lib.r3dgs_ply_element_name.restype = ctypes.c_char_p
    lib.r3dgs_ply_element_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.r3dgs_ply_element_count.restype = ctypes.c_uint64
    lib.r3dgs_ply_element_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.r3dgs_ply_num_properties.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.r3dgs_ply_property_name.restype = ctypes.c_char_p
    lib.r3dgs_ply_property_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_int]
    lib.r3dgs_ply_property_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                             ctypes.c_int]
    lib.r3dgs_ply_element_rows.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_char_p]
    lib.r3dgs_ply_close.argtypes = [ctypes.c_void_p]
    lib.r3dgs_ply_write.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int]
    lib.r3dgs_colmap_points.restype = ctypes.c_int64
    lib.r3dgs_colmap_points.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def read_ply_native(path: str) -> Optional["OrderedDict[str, np.ndarray]"]:
    lib = get_lib()
    if lib is None:
        return None
    h = lib.r3dgs_ply_open(path.encode())
    if not h:
        return None
    try:
        out = OrderedDict()
        for i in range(lib.r3dgs_ply_num_elements(h)):
            name = lib.r3dgs_ply_element_name(h, i).decode()
            count = lib.r3dgs_ply_element_count(h, i)
            fields = []
            for j in range(lib.r3dgs_ply_num_properties(h, i)):
                pname = lib.r3dgs_ply_property_name(h, i, j).decode()
                dt = _DTYPES[lib.r3dgs_ply_property_dtype(h, i, j)]
                fields.append((pname, "<" + dt))
            dtype = np.dtype(fields)
            buf = np.empty(count, dtype=dtype)
            lib.r3dgs_ply_element_rows(
                h, i, buf.ctypes.data_as(ctypes.c_char_p))
            out[name] = buf
        return out
    finally:
        lib.r3dgs_ply_close(h)


def write_ply_native(path: str, elements) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    header = ["ply", "format binary_little_endian 1.0"]
    blobs = []
    for name, arr in elements.items():
        header.append(f"element {name} {len(arr)}")
        for field in arr.dtype.names:
            code = arr.dtype.fields[field][0].str.lstrip("<>|=")
            header.append(f"property {_PLY_NAMES[code]} {field}")
        blobs.append(np.ascontiguousarray(arr).tobytes())
    header.append("end_header\n")
    header_s = "\n".join(header).encode()
    n = len(blobs)
    bufs = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_uint64 * n)(*[len(b) for b in blobs])
    return lib.r3dgs_ply_write(path.encode(), header_s, bufs, sizes, n) == 0


def read_colmap_points_native(path: str):
    lib = get_lib()
    if lib is None:
        return None
    n = lib.r3dgs_colmap_points(path.encode(), None, None)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    got = lib.r3dgs_colmap_points(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p))
    if got != n:
        return None
    return xyz, rgb
