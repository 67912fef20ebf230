"""Trajectory evaluation: ATE / RPE + KITTI odometry pose IO.

The north-star acceptance metric (BASELINE.json: "KITTI odometry seq 00-10
reconstructed within reference ATE"). The reference evaluates accuracy only
by eyeballing CloudCompare diffs (`ref/readme.md:54`, SURVEY.md §4); here
the standard numeric protocol: absolute trajectory error after Umeyama
(similarity) alignment, and relative pose error over fixed-frame deltas.
"""

from __future__ import annotations

import numpy as np


def read_kitti_poses(path: str) -> np.ndarray:
    """KITTI odometry ground-truth format: rows of 12 floats = 3x4 [R|t]
    (cam->world). Returns (F, 4, 4)."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    F = data.shape[0]
    T = np.tile(np.eye(4), (F, 1, 1))
    T[:, :3, :4] = data
    return T


def write_kitti_poses(path: str, Ts: np.ndarray) -> None:
    np.savetxt(path, np.asarray(Ts)[:, :3, :].reshape(len(Ts), 12), fmt="%.9e")


def camera_centers_w2c(Rs: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """world->cam (R, t) stacks -> camera centers (F, 3)."""
    return -np.einsum("fji,fj->fi", Rs, ts)


def ate(
    est_centers: np.ndarray,  # (F, 3)
    gt_centers: np.ndarray,   # (F, 3)
    with_scale: bool = True,
):
    """RMS absolute trajectory error after similarity (Umeyama) alignment.
    Returns (ate_rms, aligned_est, (s, R, t))."""
    import jax.numpy as jnp

    from tpu3drec.sfm.icp import umeyama

    w = np.ones(len(est_centers))
    s, R, t = umeyama(jnp.asarray(est_centers, dtype=jnp.float32),
                      jnp.asarray(gt_centers, dtype=jnp.float32),
                      jnp.asarray(w, dtype=jnp.float32),
                      with_scale=with_scale)
    s, R, t = float(s), np.asarray(R), np.asarray(t)
    aligned = s * est_centers @ R.T + t
    err = np.sqrt(((aligned - gt_centers) ** 2).sum(-1).mean())
    return err, aligned, (s, R, t)


def rpe(
    est_T: np.ndarray,  # (F, 4, 4) cam->world
    gt_T: np.ndarray,   # (F, 4, 4)
    delta: int = 1,
):
    """Relative pose error over frame deltas: returns (trans_rmse,
    rot_rmse_rad)."""
    t_errs, r_errs = [], []
    for i in range(len(est_T) - delta):
        de = np.linalg.inv(est_T[i]) @ est_T[i + delta]
        dg = np.linalg.inv(gt_T[i]) @ gt_T[i + delta]
        e = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(e[:3, 3]))
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        r_errs.append(np.arccos(cos))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(
        np.sqrt(np.mean(np.square(r_errs)))
    )


def trajectory_length(centers: np.ndarray) -> float:
    return float(np.linalg.norm(np.diff(centers, axis=0), axis=1).sum())
