"""Reference-equivalent CPU implementations, for correctness + self-baselining.

The reference publishes no absolute performance numbers (BASELINE.md), so the
build self-baselines: these functions reproduce the reference's per-pixel
Python-loop semantics (`ref/transfer/pixel_to_camera.py:24-44`,
`ref/transfer/camera_to_world.py:86-105`, `ref/other_tools/transfer_T_icp.py:71-97`)
faithfully — same math, same loop structure, same scipy conventions — and are
(a) the ground truth our fused TPU kernels are verified against and (b) the
denominator in every `vs_baseline` speedup we report.

Deliberately slow: do not "optimize" these.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as ScipyR


def gentxtcord_equiv(depth: np.ndarray, fx: float, fy: float, cx: float, cy: float) -> np.ndarray:
    """Per-pixel unprojection with an explicit double loop, exactly the
    reference's `gentxtcord` (`ref/transfer/pixel_to_camera.py:24-44`) minus
    the txt-file write. Returns (H*W, 3) in row-major pixel order."""
    h, w = depth.shape
    out = np.empty((h * w, 3), dtype=np.float64)
    k = 0
    for j in range(h):
        for i in range(w):
            Z = depth[j, i]
            out[k, 0] = (i - cx) / fx * Z
            out[k, 1] = (j - cy) / fy * Z
            out[k, 2] = Z
            k += 1
    return out


def world_transform_equiv(pts_cam: np.ndarray, q_xyzw: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Per-point world transform, the reference's `get_pointdata` math
    (`ref/transfer/camera_to_world.py:86-105`): R = from_quat(q)^-1 applied
    to (p - t), one point at a time."""
    r_inv = np.linalg.inv(ScipyR.from_quat(q_xyzw).as_matrix())
    out = np.empty_like(pts_cam, dtype=np.float64)
    for k in range(pts_cam.shape[0]):
        out[k] = r_inv @ (pts_cam[k] - t)
    return out


def sequence_pipeline_equiv(
    depths: np.ndarray, qs_xyzw: np.ndarray, ts: np.ndarray,
    fx: float, fy: float, cx: float, cy: float,
) -> np.ndarray:
    """Whole-sequence reference path (`ref/transfer/camera_to_world.py:138-174`):
    per frame unproject then transform, concatenated. (F, H, W) -> (F*H*W, 3)."""
    clouds = []
    for f in range(depths.shape[0]):
        cam_pts = gentxtcord_equiv(depths[f], fx, fy, cx, cy)
        clouds.append(world_transform_equiv(cam_pts, qs_xyzw[f], ts[f]))
    return np.concatenate(clouds, axis=0)


def icp_apply_equiv(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Homogeneous 4x4 application, one point at a time — the reference's
    `local_world` with flag=True (`ref/other_tools/transfer_T_icp.py:71-97`)."""
    out = np.empty_like(pts, dtype=np.float64)
    for k in range(pts.shape[0]):
        p = np.array([pts[k, 0], pts[k, 1], pts[k, 2], 1.0])
        out[k] = (T @ p)[:3]
    return out


def octree_insert_equiv(points: np.ndarray, res: float) -> set:
    """Voxel-set semantics of the reference's octomap insert loop
    (`ref/octomap/txt_transfer_octomap.py:16-36`): updateNode(p, True) per
    point = the set of touched voxels keyed by floor(p/res)."""
    keys = np.floor(points / res).astype(np.int64)
    return {tuple(k) for k in keys}
