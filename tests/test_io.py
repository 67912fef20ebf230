"""PLY / pose / depth IO contract tests."""

import numpy as np
import pytest
from PIL import Image

from tpu3drec.utils.plyio import write_ply, read_ply
from tpu3drec.utils.poseio import (
    PoseRecord,
    read_pose_txt,
    write_pose_txt,
    poses_to_arrays,
    read_T_txt,
    write_T_txt,
    read_ccam,
    read_colmap_images_txt,
)
from tpu3drec.utils.depthio import load_depth, load_depth_stack


class TestPly:
    def test_ascii_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "a.ply")
        write_ply(p, pts)
        got, colors = read_ply(p)
        assert colors is None
        np.testing.assert_allclose(got, pts, atol=1e-4)  # %.4f quantization

    def test_ascii_rgb_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, size=(50, 3)).astype(np.uint8)
        p = str(tmp_path / "c.ply")
        write_ply(p, pts, colors=rgb)
        got, colors = read_ply(p)
        np.testing.assert_allclose(got, pts, atol=1e-4)
        np.testing.assert_array_equal(colors, rgb)

    def test_binary_roundtrip(self, rng, tmp_path):
        pts = rng.normal(size=(77, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, size=(77, 3)).astype(np.uint8)
        p = str(tmp_path / "b.ply")
        write_ply(p, pts, colors=rgb, binary=True)
        got, colors = read_ply(p)
        np.testing.assert_array_equal(got, pts)  # binary is exact
        np.testing.assert_array_equal(colors, rgb)

    def test_header_meshlab_compatible(self, rng, tmp_path):
        p = str(tmp_path / "h.ply")
        write_ply(p, rng.normal(size=(3, 3)))
        lines = open(p).read().splitlines()
        assert lines[0] == "ply"
        assert lines[1] == "format ascii 1.0"
        assert "element vertex 3" in lines
        assert lines[-4] == "end_header" or "end_header" in lines


class TestPoseTxt:
    def test_roundtrip(self, tmp_path, rng):
        recs = [
            PoseRecord(i, rng.normal(size=3), rng.normal(size=4), f"{i}.png")
            for i in range(5)
        ]
        p = str(tmp_path / "poses.txt")
        write_pose_txt(p, recs)
        got = read_pose_txt(p)
        assert len(got) == 5
        for a, b in zip(recs, got):
            assert a.frame_id == b.frame_id
            assert a.image_name == b.image_name
            np.testing.assert_allclose(a.t, b.t)
            np.testing.assert_allclose(a.q_xyzw, b.q_xyzw)
        q, t = poses_to_arrays(got)
        assert q.shape == (5, 4) and t.shape == (5, 3)

    def test_reference_format_line(self, tmp_path):
        """Exact column layout from camera_to_world.py:149-158."""
        p = str(tmp_path / "ref.txt")
        with open(p, "w") as f:
            f.write("# header line\n")
            f.write("0, 1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0, 7.png\n")
        r = read_pose_txt(p)[0]
        np.testing.assert_allclose(r.t, [1, 2, 3])
        np.testing.assert_allclose(r.q_xyzw, [0, 0, 0, 1])
        assert r.image_name == "7.png"

    def test_T_txt(self, tmp_path, rng):
        T = np.eye(4)
        T[:3, 3] = [1, 2, 3]
        p = str(tmp_path / "T_data.txt")
        write_T_txt(p, T)
        np.testing.assert_allclose(read_T_txt(p), T)

    def test_ccam(self, tmp_path):
        p = str(tmp_path / "cam0.ccam")
        with open(p, "w") as f:
            f.write("# comment\n")
            f.write(" ".join(map(str, [0] * 6 + [1, 0, 0, 0] + [5, 6, 7] + [0, 0])) + "\n")
        poses = read_ccam(p)
        assert len(poses) == 1
        np.testing.assert_allclose(poses[0][0], [1, 0, 0, 0])
        np.testing.assert_allclose(poses[0][1], [5, 6, 7])

    def test_colmap_images_txt(self, tmp_path):
        p = str(tmp_path / "images.txt")
        with open(p, "w") as f:
            f.write("# images header\n")
            f.write("1 1.0 0.0 0.0 0.0 0.5 0.6 0.7 1 img1.png\n")
            f.write("100 200 -1\n")
        recs = read_colmap_images_txt(p)
        assert len(recs) == 1
        np.testing.assert_allclose(recs[0].q_xyzw, [0, 0, 0, 1])  # wxyz->xyzw
        np.testing.assert_allclose(recs[0].t, [0.5, 0.6, 0.7])


class TestDepth:
    def test_gray8(self, tmp_path, rng):
        arr = rng.integers(0, 255, size=(8, 10)).astype(np.uint8)
        p = str(tmp_path / "d.png")
        Image.fromarray(arr, mode="L").save(p)
        d = load_depth(p, mode="gray8")
        np.testing.assert_allclose(d, arr.astype(np.float32))

    def test_green8(self, tmp_path, rng):
        arr = rng.integers(0, 255, size=(8, 10, 3)).astype(np.uint8)
        p = str(tmp_path / "rgb.png")
        Image.fromarray(arr, mode="RGB").save(p)
        d = load_depth(p, mode="green8")
        np.testing.assert_allclose(d, arr[..., 1].astype(np.float32))

    def test_uint16_mm(self, tmp_path):
        arr = np.array([[1000, 2500]], dtype=np.uint16)
        p = str(tmp_path / "d16.png")
        Image.fromarray(arr.astype(np.int32), mode="I").save(p)
        d = load_depth(p, mode="uint16_mm")
        np.testing.assert_allclose(d, [[1.0, 2.5]])

    def test_npy_and_stack(self, tmp_path, rng):
        a = rng.uniform(size=(6, 7)).astype(np.float32)
        p = str(tmp_path / "d.npy")
        np.save(p, a)
        stack = load_depth_stack([p, p], mode="npy")
        assert stack.shape == (2, 6, 7)
        np.testing.assert_allclose(stack[0], a)

    def test_resize_nearest(self, tmp_path):
        arr = np.array([[0, 255], [255, 0]], dtype=np.uint8)
        p = str(tmp_path / "r.png")
        Image.fromarray(arr, mode="L").save(p)
        d = load_depth(p, mode="gray8", size=(4, 4))
        assert d.shape == (4, 4)
        assert set(np.unique(d)) <= {0.0, 255.0}
