"""Native C++ library equivalence + performance sanity."""

import time

import numpy as np
import pytest

from tpu3drec.mapping.btio import read_bt, write_bt
from tpu3drec.utils import native
from tpu3drec.utils.plyio import read_ply, write_ply

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@needs_native
class TestNativeBT:
    def test_keys_byte_identical_to_python(self, tmp_path, rng):
        keys = np.unique(rng.integers(-200, 200, size=(2000, 3)), axis=0).astype(np.int32)
        p_py = str(tmp_path / "py.bt")
        p_nat = str(tmp_path / "nat.bt")
        n_py = write_bt(p_py, keys, 0.1, backend="python")
        n_nat = native.bt_write_keys(p_nat, keys, 0.1)
        assert n_py == n_nat
        assert open(p_py, "rb").read() == open(p_nat, "rb").read()

    def test_points_entry_matches_voxel_set(self, tmp_path, rng):
        from baseline.reference_cpu import octree_insert_equiv

        pts = rng.uniform(-5, 5, size=(5000, 3)).astype(np.float32)
        p = str(tmp_path / "pts.bt")
        n = native.bt_write_points(p, pts, 0.25)
        assert n > 0
        keys, res = read_bt(p)
        # native voxelizes in f64 like the baseline
        ref = octree_insert_equiv(pts.astype(np.float64), 0.25)
        got = {tuple(k) for k in keys}
        assert len(got ^ ref) <= max(2, len(ref) // 200)

    def test_write_bt_auto_uses_native(self, tmp_path, rng):
        keys = rng.integers(-50, 50, size=(500, 3)).astype(np.int32)
        p = str(tmp_path / "auto.bt")
        n = write_bt(p, keys, 0.1)  # backend="auto"
        got, _ = read_bt(p)
        assert {tuple(k) for k in got} == {tuple(k) for k in np.unique(keys, axis=0)}

    def test_large_scale_speed(self, tmp_path, rng):
        """Reference-scale map (5.4M-point cap) must build in seconds."""
        pts = rng.uniform(-30, 30, size=(2_000_000, 3)).astype(np.float32)
        t0 = time.time()
        n = native.bt_write_points(str(tmp_path / "big.bt"), pts, 0.1)
        dt = time.time() - t0
        assert n > 0
        assert dt < 10.0  # seconds, vs minutes of per-point tree inserts


@needs_native
class TestNativePly:
    def test_ascii_matches_python_writer(self, tmp_path, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, size=(300, 3)).astype(np.uint8)
        p_nat = str(tmp_path / "nat.ply")
        write_ply(p_nat, pts, colors=rgb)  # auto -> native
        got, colors = read_ply(p_nat)
        np.testing.assert_allclose(got, pts, atol=1e-4)
        np.testing.assert_array_equal(colors, rgb)

    def test_no_rgb(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "n.ply")
        assert native.ply_write_ascii(p, pts)
        got, colors = read_ply(p)
        assert colors is None
        np.testing.assert_allclose(got, pts, atol=1e-4)
