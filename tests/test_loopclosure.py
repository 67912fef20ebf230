"""Loop-closure detection + closure-refined windowed SfM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drec.data.capture_sim import CaptureSim, SimScene, render_frame
from tpu3drec.sfm.features import detect_and_describe
from tpu3drec.sfm.loopclosure import detect_loop_closures, propose_candidates
from tpu3drec.utils.config import CameraConfig


@pytest.fixture(scope="module")
def loop_capture():
    """Camera circling a central scene for ~1.06 revolutions: frames 32, 33
    revisit the viewpoints of frames 0, 1 (32 frames per revolution keeps
    adjacent views ~11 deg apart — sequential matching needs overlap)."""
    rng = np.random.default_rng(5)
    scene = SimScene.clustered(rng, n_landmarks=250, sats=4,
                               extent=((-8, -5, -8), (8, 5, 8)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0,
                       width=256, height=192)
    r, F = 25.0, 34
    poses = []
    for k in range(F):
        th = 2 * np.pi * k / 32.0
        C = np.array([r * np.sin(th), 0.0, -r * np.cos(th)], np.float32)
        d = -C / np.linalg.norm(C)
        yaw = np.arctan2(d[0], d[2])
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        Rcw = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]], np.float32)
        R = Rcw.T
        poses.append((R, (-R @ C).astype(np.float32)))
    frames = [render_frame(scene, R, t, cam, max_depth=80.0) for R, t in poses]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)
    return images, poses, K


@pytest.mark.slow
def test_detects_revisit_pairs(loop_capture):
    images, poses, K = loop_capture
    det = jax.jit(jax.vmap(
        lambda im: detect_and_describe(im, max_keypoints=256, upright=True)))
    kps, descs = det(jnp.asarray(images))
    closures = detect_loop_closures(descs, kps.valid, np.asarray(kps.xy), K,
                                    min_gap=20, sim_threshold=0.8)
    pairs = {(c.i, c.j) for c in closures}
    # the true revisits (frame k+32 ~ frame k) must be found
    assert (0, 32) in pairs or (1, 33) in pairs, pairs
    for c in closures:
        assert c.n_inliers >= 15
        # revisit pairs share heading: relative rotation near identity
        if (c.i, c.j) in {(0, 32), (1, 33)}:
            np.testing.assert_allclose(c.R_rel, np.eye(3), atol=0.15)


@pytest.mark.slow
def test_candidate_proposal_ranks_revisits_first(loop_capture):
    images, poses, K = loop_capture
    det = jax.jit(jax.vmap(
        lambda im: detect_and_describe(im, max_keypoints=256, upright=True)))
    kps, descs = det(jnp.asarray(images))
    cands = propose_candidates(descs, kps.valid, min_gap=20, sim_threshold=0.8)
    top2 = {tuple(c) for c in cands[:2].tolist()}
    assert top2 & {(0, 32), (1, 33)}, cands[:5]


@pytest.mark.slow
def test_windowed_sfm_closure_detection_no_false_positives():
    """Pipeline with loop_closure=True on a loop-FREE forward sequence:
    detection must not inject false closure edges, and the trajectory
    quality must match the closure-off run.

    (The capability split: revisit *detection* + geometric verification is
    tested above on a real loop; closure-driven *graph correction* is
    tested in tests/test_posegraph.py's square-loop drift test;
    re-localization of unstitchable segments is tested below.)"""
    from tpu3drec.pipelines.kitti import (
        KittiRunConfig, evaluate_sequence, run_windowed_sfm,
    )

    rng = np.random.default_rng(11)
    scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                               extent=((-25, -6, 8), (40, 6, 60)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0,
                       width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    poses = sim.fly(16, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
    frames = [render_frame(scene, R, t, cam) for R, t in poses]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float32)
    gt_T = []
    for R, t in poses:
        T = np.eye(4)
        T[:3, :3] = R.T
        T[:3, 3] = -R.T @ t
        gt_T.append(T)
    gt_T = np.stack(gt_T)

    cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                         loop_closure=True, lc_min_gap=10)
    Ts, recs = run_windowed_sfm(images, K, cfg)
    m = evaluate_sequence(Ts, gt_T)
    assert m["coverage"] > 0.9
    assert m["ate_rms"] < 0.05 * m["traj_len"], m


@pytest.mark.slow
def test_relocalization_of_unstitchable_revisit():
    """A revisit segment the sequential stitcher cannot reach (viewpoint
    jump breaks sequential matching) must be anchored via its loop closure."""
    from tpu3drec.pipelines.kitti import KittiRunConfig, run_windowed_sfm

    rng = np.random.default_rng(11)
    scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                               extent=((-25, -6, 8), (40, 6, 60)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0,
                       width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    fwd = sim.fly(12, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
    frames = [render_frame(scene, R, t, cam) for R, t in fwd]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    # frames 12, 13 revisit the viewpoints of frames 0, 1 (teleport jump:
    # sequential matching 11 -> 12 cannot bridge it)
    images = np.concatenate([images, images[:2]], axis=0)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float32)

    cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                         loop_closure=True, lc_min_gap=10, lc_sim=0.8,
                         verbose=True)
    Ts, recs = run_windowed_sfm(images, K, cfg)
    # the revisit frames must be localized...
    assert Ts[12] is not None or Ts[13] is not None, "relocalization failed"
    for f, src in ((12, 0), (13, 1)):
        if Ts[f] is None or Ts[src] is None:
            continue
        # ... and placed at their revisit partner (zero-translation anchor)
        d = np.linalg.norm(Ts[f][:3, 3] - Ts[src][:3, 3])
        assert d < 0.5, (f, src, d)


@pytest.mark.slow
def test_relocalization_unlocks_disconnected_window():
    """A whole revisit ARC disconnected from the sequential chain: closures
    anchor two of its frames, which lets the stitcher place the rest of the
    window through its local geometry."""
    from tpu3drec.pipelines.kitti import KittiRunConfig, run_windowed_sfm

    rng = np.random.default_rng(11)
    scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                               extent=((-25, -6, 8), (40, 6, 60)))
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0,
                       width=256, height=192)
    sim = CaptureSim(scene, cam=cam)
    fwd = sim.fly(12, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
    frames = [render_frame(scene, R, t, cam) for R, t in fwd]
    images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0 for f in frames])
    # frames 12..19 replay frames 0..7: an 8-frame revisit arc with no
    # sequential connection to the first pass
    images = np.concatenate([images, images[:8]], axis=0)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float32)

    cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                         loop_closure=True, lc_min_gap=10, lc_sim=0.8,
                         verbose=True)
    Ts, recs = run_windowed_sfm(images, K, cfg)
    placed = [f for f in range(12, 20) if Ts[f] is not None]
    # without propagation only closure-anchored frames would be placed;
    # with it the whole arc should localize
    assert len(placed) >= 6, placed
    # each replay frame near its first-pass twin
    for f in placed:
        if Ts[f - 12] is None:
            continue
        d = np.linalg.norm(Ts[f][:3, 3] - Ts[f - 12][:3, 3])
        assert d < 1.0, (f, d)
