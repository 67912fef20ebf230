"""Windowed-SfM KITTI driver on a synthetic long sequence + layout reader."""

import os

import numpy as np
import pytest
from PIL import Image

from tpu3drec.data.capture_sim import CaptureSim, SimScene, render_frame
from tpu3drec.data.kitti_odom import KittiOdometryDataset
from tpu3drec.pipelines.kitti import (
    KittiRunConfig,
    evaluate_sequence,
    run_windowed_sfm,
)
from tpu3drec.utils.config import CameraConfig
from tpu3drec.utils.trajectory_eval import write_kitti_poses


@pytest.fixture(scope="module")
def long_capture():
    rng = np.random.default_rng(11)
    scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                               extent=((-25, -6, 8), (40, 6, 60)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0, width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    poses = sim.fly(16, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
    frames = [render_frame(scene, R, t, cam) for R, t in poses]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
    gt_T = []
    for R, t in poses:
        T = np.eye(4)
        T[:3, :3] = R.T
        T[:3, 3] = -R.T @ t
        gt_T.append(T)
    return images, np.stack(gt_T), K


@pytest.mark.slow
def test_windowed_sfm_stitches_long_sequence(long_capture):
    images, gt_T, K = long_capture
    cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256)
    Ts, recs = run_windowed_sfm(images, K, cfg)
    assert len(recs) >= 2  # genuinely windowed
    metrics = evaluate_sequence(Ts, gt_T)
    assert metrics["coverage"] > 0.9
    # stitched trajectory within 5% of length (stitching compounds error)
    assert metrics["ate_rms"] < 0.05 * metrics["traj_len"], metrics


class TestKittiLayout:
    def test_reader(self, tmp_path, rng):
        seq = tmp_path / "sequences" / "00"
        os.makedirs(seq / "image_0")
        os.makedirs(tmp_path / "poses")
        for i in range(3):
            img = (rng.uniform(size=(40, 60)) * 255).astype(np.uint8)
            Image.fromarray(img, mode="L").save(seq / "image_0" / f"{i:06d}.png")
        with open(seq / "calib.txt", "w") as f:
            P = "7.0e+02 0 6.0e+02 0 0 7.0e+02 1.8e+02 0 0 0 1 0"
            for c in range(4):
                f.write(f"P{c}: {P}\n")
        Ts = np.tile(np.eye(4), (3, 1, 1))
        Ts[:, 0, 3] = np.arange(3)
        write_kitti_poses(str(tmp_path / "poses" / "00.txt"), Ts)

        ds = KittiOdometryDataset(str(tmp_path), "00")
        K = ds.calib()
        assert K[0, 0] == 700.0 and K[0, 2] == 600.0
        assert ds.num_frames() == 3
        imgs = ds.load_sequence()
        assert imgs.shape == (3, 40, 60)
        assert imgs.max() <= 1.0
        gt = ds.gt_poses()
        np.testing.assert_allclose(gt, Ts, atol=1e-8)


@pytest.mark.slow
def test_windowed_sfm_with_depth_priors_is_metric(long_capture):
    """Depth priors inside each window's BA make the stitched trajectory
    metric: length matches GT without any similarity-scale alignment."""
    from tpu3drec.data.capture_sim import SimScene, CaptureSim, render_frame
    from tpu3drec.utils.config import CameraConfig
    from tpu3drec.utils.trajectory_eval import trajectory_length

    images, gt_T, K = long_capture
    # re-render depths for the same fixture poses
    rng = np.random.default_rng(11)
    scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                               extent=((-25, -6, 8), (40, 6, 60)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0, width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    poses = sim.fly(16, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
    depths = np.stack([render_frame(scene, R, t, cam)[1] for R, t in poses])

    cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                         loop_closure=False)
    Ts, _ = run_windowed_sfm(images, K, cfg, depth_maps=depths)
    sel = [i for i, T in enumerate(Ts) if T is not None]
    assert len(sel) >= 14
    est_c = np.stack([Ts[i][:3, 3] for i in sel])
    gt_c = gt_T[sel][:, :3, 3]
    est_len = trajectory_length(est_c)
    gt_len = trajectory_length(gt_c)
    # stitched multi-window metric accuracy lands ~10-15% (each window
    # contributes its own prior-vs-geometry compromise and skipped frames
    # bend the polyline); the single-window case achieves <10%
    # (tests/test_northstar_e2e.py::test_depth_prior_sfm_is_metric).
    # An UNCONSTRAINED monocular trajectory has arbitrary scale, so this is
    # the meaningful bound.
    assert abs(est_len - gt_len) / gt_len < 0.2, (est_len, gt_len)


@pytest.mark.slow
def test_parallel_windows_match_sequential(long_capture):
    """Window-level pipeline parallelism (SURVEY §2.3 PP): reconstructing
    windows concurrently on round-robin devices must reproduce the
    sequential trajectory exactly (same seeds, same stitch order)."""
    images, gt_T, K = long_capture
    seq_cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                             loop_closure=False)
    par_cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                             loop_closure=False, parallel_windows=4)
    Ts_seq, recs_seq = run_windowed_sfm(images, K, seq_cfg)
    Ts_par, recs_par = run_windowed_sfm(images, K, par_cfg)
    assert len(recs_par) == len(recs_seq)
    for a, b in zip(Ts_seq, Ts_par):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestClosureRobustness:
    """Unit coverage for the round-2 relocalization robustness fixes
    (the big occluded-orbit fixture exercises them end-to-end)."""

    def test_two_anchor_stitch_refuses_coincident_centers(self):
        from tpu3drec.pipelines.kitti import _similarity_from_pose_pairs

        T = np.eye(4)
        # src has two distinct centers, dst centers coincide -> degenerate
        src = [T.copy(), T.copy()]
        src[1][:3, 3] = [1.0, 0.0, 0.0]
        dst = [T.copy(), T.copy()]
        assert _similarity_from_pose_pairs(src, dst) is None
        # and the symmetric case
        assert _similarity_from_pose_pairs(dst, src) is None
        # sane geometry still stitches
        dst2 = [T.copy(), T.copy()]
        dst2[1][:3, 3] = [2.0, 0.0, 0.0]
        s, R, t = _similarity_from_pose_pairs(src, dst2)
        assert abs(s - 2.0) < 1e-9

    def test_relocalize_prefers_distinct_partners(self):
        from tpu3drec.pipelines.kitti import KittiRunConfig, _relocalize
        from tpu3drec.sfm.loopclosure import LoopClosure

        def T_at(c):
            T = np.eye(4)
            T[:3, 3] = c
            return T

        # frames 0,1 localized; 8,9 not. Closures: (0,8) first, then
        # (0,9) and (1,9) — partner diversity must route 9 to partner 1
        # even though (0,9) comes first.
        Ts = [T_at([0, 0, 0]), T_at([3, 0, 0]), None, None, None,
              None, None, None, None, None]

        def cl(i, j):
            return LoopClosure(
                i=i, j=j, R_rel=np.eye(3),
                t_dir=np.array([0.0, 0.0, 1.0]), n_inliers=30,
                uv_i=np.zeros((1, 2), np.float32),
                uv_j=np.zeros((1, 2), np.float32))

        out = _relocalize(Ts, [cl(0, 8), cl(0, 9), cl(1, 9)],
                          KittiRunConfig())
        # 8 anchored at partner 0's center, 9 at partner 1's (monocular:
        # |t|=0 placement)
        np.testing.assert_allclose(out[8][:3, 3], [0, 0, 0], atol=1e-9)
        np.testing.assert_allclose(out[9][:3, 3], [3, 0, 0], atol=1e-9)

    def test_relocalize_reuses_partner_when_no_alternative(self):
        from tpu3drec.pipelines.kitti import KittiRunConfig, _relocalize
        from tpu3drec.sfm.loopclosure import LoopClosure

        T0 = np.eye(4)
        Ts = [T0, None, None]

        def cl(i, j):
            return LoopClosure(
                i=i, j=j, R_rel=np.eye(3),
                t_dir=np.array([0.0, 0.0, 1.0]), n_inliers=30,
                uv_i=np.zeros((1, 2), np.float32),
                uv_j=np.zeros((1, 2), np.float32))

        out = _relocalize(Ts, [cl(0, 1), cl(0, 2)], KittiRunConfig())
        assert out[1] is not None and out[2] is not None  # second pass
