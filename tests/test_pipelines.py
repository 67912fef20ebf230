"""End-to-end RGBD slice: disk inputs -> PLY/.bt, vs the reference-equivalent
CPU pipeline (the SURVEY.md 'minimum slice' acceptance test)."""

import os

import numpy as np
from PIL import Image

from baseline.reference_cpu import sequence_pipeline_equiv, octree_insert_equiv, icp_apply_equiv
from tpu3drec.mapping.btio import read_bt
from tpu3drec.pipelines import rgbd, icp_fusion
from tpu3drec.utils.config import RGBDPipelineConfig, CameraConfig, MapConfig, DepthDecodeConfig
from tpu3drec.utils.plyio import read_ply
from tpu3drec.utils.poseio import PoseRecord, write_pose_txt, write_T_txt


def _make_dataset(tmp_path, rng, F=3, h=24, w=32):
    depth_dir = tmp_path / "depth"
    os.makedirs(depth_dir)
    qs, ts = [], []
    records = []
    for f in range(F):
        arr = rng.integers(1, 255, size=(h, w)).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(depth_dir / f"{f}.png")
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        qs.append(q)
        ts.append(t)
        records.append(PoseRecord(f, t, q, f"{f}.png"))
    pose_file = tmp_path / "poses.txt"
    write_pose_txt(str(pose_file), records)
    return pose_file, depth_dir, np.array(qs), np.array(ts)


def test_rgbd_end_to_end(tmp_path, rng):
    h, w = 24, 32
    pose_file, depth_dir, qs, ts = _make_dataset(tmp_path, rng, F=3, h=h, w=w)
    cam = CameraConfig(fx=300.0, fy=310.0, cx=w / 2, cy=h / 2, width=w, height=h)
    cfg = RGBDPipelineConfig(
        camera=cam,
        depth=DepthDecodeConfig(mode="gray8"),
        map=MapConfig(voxel_res=0.5, min_depth=0.0),
        pose_file=str(pose_file),
        depth_dir=str(depth_dir),
        out_ply=str(tmp_path / "map.ply"),
        out_bt=str(tmp_path / "map.bt"),
    )
    res = rgbd.run(cfg)
    assert res.n_frames == 3
    assert res.n_points == 3 * h * w  # all depths >= 1 -> all valid

    # PLY content equals the reference-equivalent CPU pipeline
    depths = np.stack(
        [np.asarray(Image.open(depth_dir / f"{f}.png")) for f in range(3)]
    ).astype(np.float32)
    ref_pts = sequence_pipeline_equiv(
        depths, qs, ts, cam.fx, cam.fy, cam.cx, cam.cy
    )
    got_pts, _ = read_ply(str(tmp_path / "map.ply"))
    assert got_pts.shape == ref_pts.shape
    # ASCII %.4f quantization + fp32 vs fp64: compare at 2e-3 absolute
    np.testing.assert_allclose(got_pts, ref_pts, atol=2e-3)

    # .bt voxel set equals the reference octomap-insert semantics
    keys, res_read = read_bt(str(tmp_path / "map.bt"))
    assert res_read == 0.5
    ref_voxels = octree_insert_equiv(ref_pts, 0.5)
    got_voxels = {tuple(k) for k in keys}
    # boundary flooring in fp32 may flip a tiny fraction of voxels
    sym_diff = got_voxels ^ ref_voxels
    assert len(sym_diff) <= max(2, len(ref_voxels) // 100)


def test_rgbd_depth_masking(tmp_path, rng):
    h, w = 8, 8
    depths = np.zeros((1, h, w), dtype=np.float32)
    depths[0, :2, :] = 5.0
    q = np.array([[0.0, 0, 0, 1.0]])
    t = np.zeros((1, 3))
    cfg = RGBDPipelineConfig(
        camera=CameraConfig(fx=10, fy=10, cx=4, cy=4, width=w, height=h),
        map=MapConfig(min_depth=1e-3),
        out_ply=str(tmp_path / "m.ply"),
    )
    res = rgbd.run_arrays(depths, q, t, cfg, keep_points=True)
    assert res.n_points == 2 * w
    assert np.all(res.points[:, 2] == 5.0)


def test_icp_fusion_matches_reference(tmp_path, rng):
    a = rng.normal(size=(40, 3)).astype(np.float32)
    b = rng.normal(size=(30, 3)).astype(np.float32)
    # random rigid T with scale
    T = np.eye(4)
    T[:3, :3] = 1.3 * np.linalg.qr(rng.normal(size=(3, 3)))[0]
    T[:3, 3] = rng.normal(size=3)
    t_path = str(tmp_path / "T_data.txt")
    write_T_txt(t_path, T)
    out = str(tmp_path / "merged.ply")
    n = icp_fusion.run(a, b, t_path, out)
    assert n == 70
    got, _ = read_ply(out)
    ref_b = icp_apply_equiv(b.astype(np.float64), T)
    np.testing.assert_allclose(got[:40], a, atol=1e-4)
    np.testing.assert_allclose(got[40:], ref_b, atol=1e-3)


def test_rgbd_colored_cloud(tmp_path, rng):
    """rgb_dir attaches per-pixel colors to the fused PLY (the reference's
    genply_RGB capability, built with correct arity/imports)."""
    h, w = 16, 20
    pose_file, depth_dir, qs, ts = _make_dataset(tmp_path, rng, F=2, h=h, w=w)
    rgb_dir = tmp_path / "front"
    os.makedirs(rgb_dir)
    rgbs = []
    for f in range(2):
        arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(rgb_dir / f"{f}.png")
        rgbs.append(arr)
    cfg = RGBDPipelineConfig(
        camera=CameraConfig(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2, width=w, height=h),
        depth=DepthDecodeConfig(mode="gray8"),
        map=MapConfig(min_depth=0.0),
        pose_file=str(pose_file),
        depth_dir=str(depth_dir),
        rgb_dir=str(rgb_dir),
        out_ply=str(tmp_path / "colored.ply"),
    )
    res = rgbd.run(cfg)
    pts, colors = read_ply(str(tmp_path / "colored.ply"))
    assert colors is not None
    assert colors.shape == (res.n_points, 3)
    # colors ride in pixel order: first row of frame 0 matches
    np.testing.assert_array_equal(colors[:w], rgbs[0].reshape(-1, 3)[:w])
