import os
import struct
from collections import OrderedDict

import numpy as np
import pytest

from reduced_3dgs_tpu.models import ply as plyio
from reduced_3dgs_tpu.models.native_io import (get_lib, read_colmap_points_native,
                                               read_ply_native,
                                               write_ply_native)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native IO library unavailable")


def _struct_arr():
    return plyio.fields_to_struct(
        {"x": np.arange(6, dtype=np.float32),
         "c": (np.arange(6) % 3).astype(np.uint8),
         "d": np.arange(6, dtype=np.float64) * 0.5},
        ["x", "c", "d"])


def test_native_roundtrip_matches_numpy(tmp_path):
    arr = _struct_arr()
    p_native = str(tmp_path / "n.ply")
    p_numpy = str(tmp_path / "p.ply")
    assert write_ply_native(p_native, OrderedDict(vertex=arr))

    # force the numpy writer by writing via module internals
    import reduced_3dgs_tpu.models.native_io as nio
    lib = nio._lib
    nio._lib = None
    nio._lib_tried = True
    try:
        plyio.write_ply(p_numpy, OrderedDict(vertex=arr))
    finally:
        nio._lib = lib
        nio._lib_tried = True
    assert open(p_native, "rb").read() == open(p_numpy, "rb").read()

    back_native = read_ply_native(p_native)
    np.testing.assert_array_equal(back_native["vertex"], arr)


def test_native_colmap_points(tmp_path):
    p = str(tmp_path / "points3D.bin")
    n = 5
    rng = np.random.RandomState(0)
    xyz = rng.randn(n, 3)
    rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<QdddBBBd", i, *xyz[i], *rgb[i], 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(b"\x00" * 16)
    out = read_colmap_points_native(p)
    assert out is not None
    np.testing.assert_allclose(out[0], xyz)
    np.testing.assert_array_equal(out[1], rgb)

    # parity with the pure-python parser
    from reduced_3dgs_tpu.dataset import colmap
    import reduced_3dgs_tpu.models.native_io as nio
    lib = nio._lib
    nio._lib = None
    try:
        xyz2, rgb2 = colmap.read_points3d_binary(p)
    finally:
        nio._lib = lib
    np.testing.assert_allclose(out[0], xyz2)
    np.testing.assert_array_equal(out[1], rgb2)
