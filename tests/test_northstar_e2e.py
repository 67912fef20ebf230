"""North-star end-to-end acceptance (BASELINE.json config 5 analogue):

simulated UAV capture -> full SfM (features, matching, two-view init, PnP,
triangulation, BA) -> metric scale recovery from depth via ICP -> dense
fusion -> trajectory ATE within bound. Everything here is the pipeline a
reference user would run with COLMAP + open3d + numpy scripts, in one pass.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.data.capture_sim import CaptureSim, SimScene, render_frame
from tpu3drec.pipelines.sfm_pipeline import (
    SfmPipelineConfig,
    apply_scale,
    metric_scale_from_depth,
    reconstruction_to_pose_records,
    run,
)
from tpu3drec.sfm.incremental import run_sfm
from tpu3drec.utils.config import CameraConfig
from tpu3drec.utils.trajectory_eval import ate, trajectory_length


@pytest.fixture(scope="module")
def captured():
    rng = np.random.default_rng(3)
    scene = SimScene.clustered(rng, n_landmarks=200, sats=4)
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0, width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    poses = sim.fly(8, step=np.array([0.6, 0.0, 0.4]), yaw_rate=0.012)
    frames = [render_frame(scene, R, t, cam) for R, t in poses]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    depths = np.stack([f[1] for f in frames])
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
    return images, depths, poses, K, cam


@pytest.fixture(scope="module")
def reconstruction(captured):
    images, depths, poses, K, cam = captured
    return run_sfm(images, K, max_keypoints=256, overlap=3, seed=0)


@pytest.mark.slow
def test_trajectory_within_ate_bound(captured, reconstruction):
    images, depths, poses, K, cam = captured
    rec = reconstruction
    frames = rec.registered_frames()
    assert len(frames) == len(poses), f"registered only {frames}"
    est = np.stack([-rec.poses[f][0].T @ rec.poses[f][1] for f in frames])
    gt = np.stack([-poses[f][0].T @ poses[f][1] for f in frames])
    err, _, _ = ate(est, gt)
    assert err < 0.02 * trajectory_length(gt), (
        f"ATE {err:.3f} over {trajectory_length(gt):.2f}m trajectory"
    )


@pytest.mark.slow
def test_metric_scale_recovery(captured, reconstruction):
    """Metric-scale recovery from depth (the reference's scale-correction
    capability, readme §2(2)). Note the tolerance: narrow-FOV
    forward-motion SfM has a weak structure-vs-baseline mode (median
    reprojection stays ~0.2px while depth scale and baseline scale disagree
    by tens of percent), so the recovered landmark-depth scale and the
    trajectory-implied scale are asserted to agree only coarsely — but
    applying it must strictly move the trajectory toward metric."""
    import copy

    images, depths, poses, K, cam = captured
    rec = copy.deepcopy(reconstruction)
    frames = rec.registered_frames()
    scale = metric_scale_from_depth(rec, depths, cam)
    est0 = np.stack([-rec.poses[f][0].T @ rec.poses[f][1] for f in frames])
    gt = np.stack([-poses[f][0].T @ poses[f][1] for f in frames])
    gt_len = trajectory_length(gt)
    err_before = abs(trajectory_length(est0) - gt_len)

    apply_scale(rec, scale)
    est = np.stack([-rec.poses[f][0].T @ rec.poses[f][1] for f in frames])
    est_len = trajectory_length(est)
    err_after = abs(est_len - gt_len)

    implied = gt_len / trajectory_length(est0)
    assert scale > 0
    assert abs(scale - implied) / implied < 0.4, (scale, implied)
    assert err_after < err_before  # strictly closer to metric


@pytest.mark.slow
def test_pose_export_contract(tmp_path, captured, reconstruction):
    """Exported poses must round-trip through the reference pose-txt parser
    and drive the RGBD fusion pipeline."""
    images, depths, poses, K, cam = captured
    rec = reconstruction
    records = reconstruction_to_pose_records(rec)
    from tpu3drec.utils.poseio import read_pose_txt, write_pose_txt

    p = str(tmp_path / "poses.txt")
    write_pose_txt(p, records)
    back = read_pose_txt(p)
    assert len(back) == len(rec.poses)

    # sparse cloud export
    from tpu3drec.utils.plyio import read_ply, write_ply

    pts = np.stack(list(rec.points.values()))
    write_ply(str(tmp_path / "sparse.ply"), pts)
    got, _ = read_ply(str(tmp_path / "sparse.ply"))
    assert got.shape[0] == len(rec.points)


@pytest.mark.slow
def test_depth_prior_sfm_is_metric(captured):
    """run_sfm with depth priors in BA: the trajectory comes out metric
    WITHOUT any post-hoc scale correction (the principled fix for the
    forward-motion weak mode — docs/design.md §7)."""
    images, depths, poses, K, cam = captured
    rec = run_sfm(images, K, max_keypoints=256, overlap=3, seed=0,
                  depth_maps=depths, depth_weight=2.0)
    frames = rec.registered_frames()
    assert len(frames) == len(poses)
    est = np.stack([-rec.poses[f][0].T @ rec.poses[f][1] for f in frames])
    gt = np.stack([-poses[f][0].T @ poses[f][1] for f in frames])
    est_len = trajectory_length(est)
    gt_len = trajectory_length(gt)
    assert abs(est_len - gt_len) / gt_len < 0.1, (est_len, gt_len)
    # and the shape is still good
    err, _, _ = ate(est, gt)
    assert err < 0.03 * gt_len
