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


class TestMetricClosures:
    """Depth priors give closures a MEASURED translation magnitude
    (VERDICT round-1 item 5): closure edges stop inheriting the drifted
    estimate, and relocalization can place a revisit offset by metres at
    its true pose instead of snapping to the partner's center."""

    def _synthetic_closure(self, mag=5.0, n=60):
        from tpu3drec.sfm.loopclosure import LoopClosure

        rng = np.random.default_rng(2)
        K = np.array([[220.0, 0, 128.0], [0, 220.0, 96.0], [0, 0, 1]],
                     np.float32)
        H, W = 192, 256
        # points in cam_i coordinates, 8-25 m out
        X = np.stack([
            rng.uniform(-8, 8, n), rng.uniform(-5, 5, n), rng.uniform(8, 25, n)
        ], axis=1)
        th = 0.12
        R_rel = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float64)
        t_dir = np.array([0.6, 0.1, 0.79])
        t_dir = t_dir / np.linalg.norm(t_dir)
        Xj = X @ R_rel.T + mag * t_dir

        def proj(P):
            return np.stack([P[:, 0] / P[:, 2] * K[0, 0] + K[0, 2],
                             P[:, 1] / P[:, 2] * K[1, 1] + K[1, 2]], axis=1)

        uv_i, uv_j = proj(X), proj(Xj)
        inb = ((uv_i[:, 0] > 0) & (uv_i[:, 0] < W - 1) &
               (uv_i[:, 1] > 0) & (uv_i[:, 1] < H - 1) &
               (uv_j[:, 0] > 0) & (uv_j[:, 0] < W - 1) &
               (uv_j[:, 1] > 0) & (uv_j[:, 1] < H - 1) & (Xj[:, 2] > 0.5))
        X, uv_i, uv_j = X[inb], uv_i[inb], uv_j[inb]
        dm = np.zeros((H, W), np.float32)
        u = np.round(uv_i[:, 0]).astype(int)
        v = np.round(uv_i[:, 1]).astype(int)
        dm[v, u] = X[:, 2]
        c = LoopClosure(i=0, j=1, R_rel=R_rel.astype(np.float32),
                        t_dir=t_dir.astype(np.float32),
                        n_inliers=len(uv_i),
                        uv_i=uv_i.astype(np.float32),
                        uv_j=uv_j.astype(np.float32))
        return c, K, dm[None].repeat(2, axis=0), R_rel, t_dir, mag

    def test_metric_magnitude_from_depth(self):
        from tpu3drec.pipelines.kitti import closure_metric_magnitude

        c, K, dms, R_rel, t_dir, mag = self._synthetic_closure(mag=5.0)
        assert c.n_inliers > 25
        est = closure_metric_magnitude(c, K, dms)
        assert est is not None
        assert abs(est - mag) / mag < 0.03, est

    def test_relocalize_places_offset_revisit_at_true_pose(self):
        """The VERDICT done-criterion: a revisit offset by 5 m converges to
        the right pose (not the partner's center)."""
        from tpu3drec.pipelines.kitti import KittiRunConfig, _relocalize

        c, K, dms, R_rel, t_dir, mag = self._synthetic_closure(mag=5.0)
        # frame 0 localized at an arbitrary world pose; frame 1 unknown
        T0 = np.eye(4)
        ang = 0.4
        T0[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                               [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        T0[:3, 3] = [3.0, -1.0, 7.0]
        Ts = _relocalize([T0, None], [c], KittiRunConfig(), K=K,
                         depth_maps=dms)
        # ground truth: X_j = R_rel X_i + mag*t_dir  =>
        # cam_j -> cam_i map is [R_rel^T | -R_rel^T (mag t_dir)]
        T_rel = np.eye(4)
        T_rel[:3, :3] = R_rel.T
        T_rel[:3, 3] = -R_rel.T @ (mag * t_dir)
        T1_gt = T0 @ T_rel
        assert Ts[1] is not None
        err = np.linalg.norm(Ts[1][:3, 3] - T1_gt[:3, 3])
        assert err < 0.25, (err, Ts[1][:3, 3], T1_gt[:3, 3])
        # and it did NOT snap to the partner's center (the round-1 behavior)
        assert np.linalg.norm(Ts[1][:3, 3] - T0[:3, 3]) > 0.8 * mag

    @pytest.mark.slow
    def test_windowed_pipeline_metric_offset_revisit(self):
        """End-to-end: a teleport revisit 5 m short of its first-pass twin,
        with depth priors — the relocalized frame lands near its TRUE
        position, a trailing-edge case zero-translation anchoring got
        wrong by construction."""
        from tpu3drec.pipelines.kitti import KittiRunConfig, run_windowed_sfm

        rng = np.random.default_rng(11)
        scene = SimScene.clustered(rng, n_landmarks=420, sats=4,
                                   extent=((-25, -6, 8), (40, 6, 60)))
        cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0,
                           width=256, height=192)
        sim = CaptureSim(scene, cam=cam)
        fwd = sim.fly(12, step=np.array([0.55, 0.0, 0.35]), yaw_rate=0.01)
        # frame 12 = frame 8's viewpoint (5.2 m behind frame 0's twin along
        # the path... i.e. a revisit of the frame-0 view offset by metres)
        offset = np.array([2.8, 0.0, 1.9], np.float32)  # ~3.4 m offset
        R0, t0 = fwd[0]
        C0 = -R0.T @ t0
        C_re = C0 + offset
        re_pose = (R0, (-R0 @ C_re).astype(np.float32))
        poses = fwd + [re_pose]
        frames = [render_frame(scene, R, t, cam) for R, t in poses]
        images = np.stack([f[0].mean(-1).astype(np.float32) / 255.0
                           for f in frames])
        depths = np.stack([f[1] for f in frames])
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                     np.float32)

        cfg = KittiRunConfig(window=8, stride=4, max_keypoints=256,
                             loop_closure=True, lc_min_gap=10, lc_sim=0.8,
                             verbose=True)
        Ts, _ = run_windowed_sfm(images, K, cfg, depth_maps=depths)
        assert Ts[12] is not None, "offset revisit not relocalized"
        # with depth priors the trajectory is metric and frame 0 anchors the
        # world frame: compare in the GT frame via the first-pass alignment
        gt_T = []
        for R, t in poses:
            T = np.eye(4)
            T[:3, :3] = R.T
            T[:3, 3] = -R.T @ t
            gt_T.append(T)
        sel = [f for f in range(12) if Ts[f] is not None]
        est_c = np.stack([Ts[f][:3, 3] for f in sel])
        gt_c = np.stack([gt_T[f][:3, 3] for f in sel])
        from tpu3drec.utils.trajectory_eval import ate
        _, _, simT = ate(est_c, gt_c)
        s, R_a, t_a = simT
        c12 = s * R_a @ Ts[12][:3, 3] + t_a
        err = np.linalg.norm(c12 - gt_T[12][:3, 3])
        # zero-translation anchoring would err by ~|offset| (3.4 m)
        assert err < 0.45 * np.linalg.norm(offset), (err, c12)


@pytest.mark.slow
def test_vlad_more_discriminative_than_mean_pool(loop_capture):
    """VERDICT r1 weak-item 2: mean-pooled SIFT retrieval is
    under-discriminative. VLAD must separate true revisits from unrelated
    views by a wider margin than mean pooling (margin = revisit similarity
    minus the best non-revisit similarity at the same frame gap)."""
    from tpu3drec.sfm.loopclosure import (
        fit_codebook, global_descriptors, vlad_descriptors)

    images, poses, K = loop_capture
    det = jax.jit(jax.vmap(
        lambda im: detect_and_describe(im, max_keypoints=256, upright=True)))
    kps, descs = det(jnp.asarray(images))

    def margin(g):
        S = np.asarray(jnp.einsum("id,jd->ij", g, g))
        F = S.shape[0]
        ii, jj = np.triu_indices(F, k=20)
        sims = S[ii, jj]
        revisit = {(0, 32), (1, 33)}
        is_rev = np.array([(a, b) in revisit for a, b in zip(ii, jj)])
        return sims[is_rev].min() - sims[~is_rev].max()

    g_mean = global_descriptors(descs, kps.valid)
    cb = fit_codebook(descs, kps.valid)
    g_vlad = vlad_descriptors(descs, kps.valid, cb)
    m_mean, m_vlad = margin(g_mean), margin(g_vlad)
    assert m_vlad > m_mean, (m_vlad, m_mean)
    assert m_vlad > 0.05  # revisits clearly separated


@pytest.mark.slow
def test_vlad_proposal_finds_revisits(loop_capture):
    images, poses, K = loop_capture
    det = jax.jit(jax.vmap(
        lambda im: detect_and_describe(im, max_keypoints=256, upright=True)))
    kps, descs = det(jnp.asarray(images))
    cands = propose_candidates(descs, kps.valid, min_gap=20, method="vlad")
    top2 = {tuple(c) for c in cands[:2].tolist()}
    assert top2 & {(0, 32), (1, 33)}, cands[:5]
