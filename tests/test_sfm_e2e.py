"""End-to-end incremental SfM on a synthetic rendered scene.

Renders Gaussian blobs at known 3D positions from a moving camera, runs the
full pipeline (detect -> match -> init -> PnP -> triangulate -> BA), and
checks the recovered trajectory against ground truth after similarity
alignment (scale is unobservable — ATE methodology)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.sfm.incremental import run_sfm, build_tracks
from tpu3drec.sfm.icp import umeyama

H, W = 120, 160
K = np.array([[140.0, 0, W / 2], [0, 140.0, H / 2], [0, 0, 1]], np.float32)


def _render(X, R, t, amps=None, sats=None):
    """Splat Gaussian blobs of the 3D points X into the camera (R, t).

    Each landmark carries satellite dots at fixed 3D offsets with its own
    amplitudes, giving every keypoint a distinct, view-consistent local
    appearance (identical dots would be unmatchable by descriptor)."""
    n = X.shape[0]
    if amps is None:
        amps = np.ones((n, 1))
    if sats is None:
        sats = np.zeros((n, 0, 3))
    pts = [X]
    weights = [amps[:, 0]]
    for s in range(sats.shape[1]):
        pts.append(X + sats[:, s])
        weights.append(amps[:, s + 1])
    P = np.concatenate(pts)
    A = np.concatenate(weights)
    Xc = P @ R.T + t
    vis = Xc[:, 2] > 0.5
    uv = Xc[:, :2] / Xc[:, 2:3]
    uv = uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for m in np.where(vis)[0]:
        x, y = uv[m]
        if -5 < x < W + 5 and -5 < y < H + 5:
            img += A[m] * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 1.8 ** 2))
    return np.clip(img, 0, 1)


def _camera_center(R, t):
    return -R.T @ t


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    # well-separated blobs on a rough plane band in front of the cameras
    gx, gz = np.meshgrid(np.linspace(-4, 6, 9), np.linspace(8, 16, 6))
    X = np.stack([gx.ravel(), np.zeros(gx.size), gz.ravel()], -1)
    X += rng.uniform(-0.45, 0.45, size=X.shape)
    X[:, 1] = rng.uniform(-2.0, 2.0, size=X.shape[0])
    n = X.shape[0]
    # unique constellation per landmark: 3 satellites, random amp/offset
    amps = rng.uniform(0.4, 1.0, size=(n, 4))
    sats = rng.uniform(-0.35, 0.35, size=(n, 3, 3))
    F = 6
    poses = []
    for f in range(F):
        yaw = 0.03 * f
        R = ScipyR.from_rotvec([0, yaw, 0]).as_matrix().astype(np.float32)
        C = np.array([0.5 * f, 0.05 * f, 0.3 * f], np.float32)  # camera center
        t = (-R @ C).astype(np.float32)
        poses.append((R, t))
    images = np.stack([_render(X, R, t, amps, sats) for R, t in poses])
    return images, poses, X


def test_sfm_end_to_end_trajectory(scene):
    images, gt_poses, X = scene
    rec = run_sfm(images, K, max_keypoints=128, overlap=3, seed=0)
    frames = rec.registered_frames()
    assert len(frames) >= 5, f"only registered {frames}"
    assert len(rec.points) >= 20

    # ATE after similarity (Umeyama) alignment of camera centers
    est = np.stack([_camera_center(*rec.poses[f]) for f in frames])
    gt = np.stack([_camera_center(*gt_poses[f]) for f in frames])
    s, R, t = umeyama(jnp.asarray(est), jnp.asarray(gt), jnp.ones(len(frames)))
    aligned = float(s) * est @ np.asarray(R).T + np.asarray(t)
    ate = np.sqrt(((aligned - gt) ** 2).sum(-1).mean())
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert ate < 0.05 * traj_len, f"ATE {ate:.3f} vs traj {traj_len:.3f}"


def test_build_tracks_chains_and_conflicts():
    # chain 0-1-2 on kp 5->7->9 plus a conflicting pair
    m = {
        (0, 1): (np.array([5]), np.array([7])),
        (1, 2): (np.array([7]), np.array([9])),
        (0, 2): (np.array([5]), np.array([9])),  # consistent closure
    }
    tracks = build_tracks(m)
    assert len(tracks) == 1
    t = list(tracks.values())[0]
    assert t == {0: 5, 1: 7, 2: 9}

    # conflicting: frame 2 seen at two kps in one track -> frame 2's
    # observations are dropped, the consistent 0-1 core survives
    m2 = {
        (0, 1): (np.array([5]), np.array([7])),
        (1, 2): (np.array([7]), np.array([9])),
        (0, 2): (np.array([5]), np.array([8])),
    }
    tracks2 = build_tracks(m2)
    assert len(tracks2) == 1
    assert list(tracks2.values())[0] == {0: 5, 1: 7}

    # a track that is ONLY conflict (both members in one frame) still dies
    m3 = {(0, 1): (np.array([5]), np.array([7])),
          (0, 2): (np.array([6]), np.array([7]))}
    # members: (0,5),(1,7),(0,6),(2,7)? -- single group via (1,7)/(2,7)? no:
    # (0,5)-(1,7) and (0,6)-(2,7) are separate groups; craft a direct case:
    m3 = {(0, 1): (np.array([5, 6]), np.array([7, 7]))}
    # kp7 in frame 1 matched from two frame-0 kps -> one group, frames [0,0,1]
    # -> both frame-0 obs dropped -> only frame-1 left -> track dies
    assert len(build_tracks(m3)) == 0
