"""Wide-baseline matching regression (VERDICT r1 item 1).

Round 1's single-octave front end collapsed above ~15 deg viewpoint change
on inward-looking circles (ROUND_NOTES r1). This pins the multi-octave
pyramid's yield on that exact scenario — an occlusion-heavy textured arena
orbited by inward-looking cameras — with GT-depth-verified matches, at 20
and 30 degrees, and asserts the pyramid beats the single-octave stack.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.data.capture_sim import PlanarScene, orbit_poses
from tpu3drec.utils.config import CameraConfig
from tpu3drec.sfm.features import detect_and_describe
from tpu3drec.sfm.matching import match_descriptors

CAM = CameraConfig(fx=220.0, fy=220.0, cx=160.0, cy=120.0, width=320, height=240)
CENTER = np.array([0.0, 0.0, 20.0])


@pytest.fixture(scope="module")
def arena_frames():
    rng = np.random.default_rng(7)
    scene = PlanarScene.arena(rng, n_boxes=10)
    out = {}
    for deg in (0, 20, 30):
        (R, t), = orbit_poses(1, CENTER, 16.0, start_deg=deg, span_deg=0)
        rgb, depth = scene.render(R, t, CAM)
        gray = np.asarray(rgb.mean(-1) / 255.0, np.float32)
        out[deg] = (R, t, gray, depth)
    return out


def _verified_matches(frames, deg, **feat_kw):
    """Match frame 0 vs frame at `deg`; count matches consistent with the
    known geometry via the GT depth of frame 0 (reprojection < 4px)."""
    R0, t0, g0, d0 = frames[0]
    R1, t1, g1, _ = frames[deg]
    k0, dd0 = detect_and_describe(jnp.asarray(g0), max_keypoints=1024, **feat_kw)
    k1, dd1 = detect_and_describe(jnp.asarray(g1), max_keypoints=1024, **feat_kw)
    m = match_descriptors(dd0, dd1, k0.valid, k1.valid)
    v = np.asarray(m.valid)
    ia, ib = np.asarray(m.idx_a)[v], np.asarray(m.idx_b)[v]
    if len(ia) == 0:
        return 0, 0
    xa = np.asarray(k0.xy)[ia]
    xb = np.asarray(k1.xy)[ib]
    u = np.clip(xa[:, 0].round().astype(int), 0, CAM.width - 1)
    vv = np.clip(xa[:, 1].round().astype(int), 0, CAM.height - 1)
    z = d0[vv, u]
    ok = z > 0.1
    pc = np.stack([(xa[:, 0] - CAM.cx) / CAM.fx * z,
                   (xa[:, 1] - CAM.cy) / CAM.fy * z, z], -1)
    pw = (pc - t0) @ R0
    pb = pw @ R1.T + t1
    ub = pb[:, 0] / pb[:, 2] * CAM.fx + CAM.cx
    vb = pb[:, 1] / pb[:, 2] * CAM.fy + CAM.cy
    err = np.hypot(ub - xb[:, 0], vb - xb[:, 1])
    return len(ia), int((ok & (err < 4.0)).sum())


def test_pyramid_yield_at_20deg(arena_frames):
    n, good = _verified_matches(arena_frames, 20, num_octaves=3, upright=True)
    assert good >= 8, f"pyramid 20deg verified matches collapsed: {good} (of {n})"


def test_pyramid_yield_at_30deg(arena_frames):
    n, good = _verified_matches(arena_frames, 30, num_octaves=3, upright=True)
    # enough for RANSAC two-view/PnP consensus (>= 5-point minimal sets)
    assert good >= 5, f"pyramid 30deg verified matches collapsed: {good} (of {n})"


def test_pyramid_beats_single_octave(arena_frames):
    _, good_pyr = _verified_matches(arena_frames, 20, num_octaves=3, upright=True)
    _, good_old = _verified_matches(arena_frames, 20, num_octaves=1, upright=True)
    assert good_pyr > good_old, (
        f"pyramid ({good_pyr}) must beat single octave ({good_old}) at 20deg")


def test_twoview_support_at_wide_baseline(arena_frames):
    """The 20-deg pair must give the two-view RANSAC stage real support:
    >= 10 epipolar inliers, and the GT relative pose must itself explain
    most of them (match-set quality). Exact pose recovery from E alone is
    NOT asserted — the arena is ground-plane dominant and E estimation is
    degenerate on planar scenes (COLMAP falls back to a homography model
    there; noted as future work in ROUND_NOTES)."""
    import jax

    from tpu3drec.sfm.twoview import (
        estimate_relative_pose, normalize_points, sampson_error,
    )

    R0, t0, g0, d0 = arena_frames[0]
    R1, t1, g1, _ = arena_frames[20]
    k0, dd0 = detect_and_describe(jnp.asarray(g0), max_keypoints=1024,
                                  num_octaves=3, upright=True)
    k1, dd1 = detect_and_describe(jnp.asarray(g1), max_keypoints=1024,
                                  num_octaves=3, upright=True)
    m = match_descriptors(dd0, dd1, k0.valid, k1.valid)
    K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1]], np.float32)
    uv1 = jnp.asarray(k0.xy)  # match_descriptors emits one row per A keypoint
    uv2 = jnp.asarray(np.asarray(k1.xy)[np.asarray(m.idx_b)])
    tv = estimate_relative_pose(uv1, uv2, m.valid, jnp.asarray(K),
                                jax.random.PRNGKey(0), inlier_px=2.0,
                                num_hypotheses=2048)
    assert int(tv.n_inliers) >= 10, f"only {int(tv.n_inliers)} epipolar inliers"

    # GT essential matrix must explain the accepted matches
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    tx = np.array([[0, -t_rel[2], t_rel[1]],
                   [t_rel[2], 0, -t_rel[0]],
                   [-t_rel[1], t_rel[0], 0]])
    E_gt = tx @ R_rel
    x1 = normalize_points(uv1, jnp.asarray(K))
    x2 = normalize_points(uv2, jnp.asarray(K))
    err = np.asarray(sampson_error(jnp.asarray(E_gt, dtype=jnp.float32), x1, x2))
    gt_consistent = (err < (2.0 / K[0, 0]) ** 2) & np.asarray(m.valid)
    assert gt_consistent.sum() >= 8, (
        f"only {gt_consistent.sum()} matches consistent with GT epipolar geometry")
