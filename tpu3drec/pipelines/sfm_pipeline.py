"""Full SfM pipeline — reference configuration 5: image sequence ->
incremental SfM (features, matching, triangulation, BA) -> poses +
sparse cloud, optional ICP metric-scale correction and dense fusion.

One callable replacing the reference's COLMAP-GUI-plus-scripts workflow:
export format matches the pose-txt contract `camera_to_world.py:149-158`
reads, so downstream reference-style tooling keeps working.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from tpu3drec.core.quaternion import matrix_to_quat_wxyz, quat_xyzw_from_wxyz
from tpu3drec.sfm.icp import icp
from tpu3drec.sfm.incremental import Reconstruction, run_sfm
from tpu3drec.utils.config import RGBDPipelineConfig
from tpu3drec.utils.plyio import write_ply
from tpu3drec.utils.poseio import PoseRecord, write_pose_txt


@dataclass
class SfmPipelineConfig:
    max_keypoints: int = 512
    overlap: int = 3
    ba_every: int = 3
    out_poses: str = ""     # pose txt (reference contract) if set
    out_sparse_ply: str = ""
    seed: int = 0
    verbose: bool = False


def reconstruction_to_pose_records(rec: Reconstruction,
                                   image_names=None) -> list[PoseRecord]:
    """world->cam (R, t) -> the comma-separated xyzw pose rows the reference
    consumes (`camera_to_world.py:149-158`)."""
    records = []
    for f in rec.registered_frames():
        R, t = rec.poses[f]
        q_wxyz = np.asarray(matrix_to_quat_wxyz(jnp.asarray(R)))
        q_xyzw = np.asarray(quat_xyzw_from_wxyz(jnp.asarray(q_wxyz)))
        name = image_names[f] if image_names else f"{f}.png"
        records.append(PoseRecord(f, np.asarray(t, np.float64), q_xyzw, name))
    return records


def metric_scale_from_depth(
    rec: Reconstruction,
    depth_maps: np.ndarray,    # (F, H, W) metric depth (GT or stereo)
    cam_cfg,
    frame: int | None = None,
    icp_iters: int = 50,
) -> float:
    """Recover the metric scale SfM can't observe by ICP-aligning one
    frame's SfM landmark cloud onto its metric depth unprojection — the
    reference's scale-correction concept (readme §2(2), `ref/readme.md:24-25`)
    without the manual open3d step."""
    from tpu3drec.core.unproject import depth_to_camera_points

    frames = rec.registered_frames()
    frame = frame if frame is not None else frames[len(frames) // 2]
    R, t = rec.poses[frame]
    pts_sfm = []
    for tid, X in rec.points.items():
        if frame in rec.tracks.get(tid, {}):
            pts_sfm.append(R @ X + t)  # camera-frame SfM points
    if len(pts_sfm) < 10:
        raise ValueError("not enough landmarks in the scale frame")
    pts_sfm = np.asarray(pts_sfm, np.float32)
    cam = cam_cfg.to_camera() if hasattr(cam_cfg, "to_camera") else cam_cfg
    dm = depth_maps[frames.index(frame)]
    metric = np.asarray(
        depth_to_camera_points(jnp.asarray(dm), cam)
    ).reshape(-1, 3)
    metric = metric[dm.reshape(-1) > 1e-3]
    # subsample the dense cloud for the NN search
    if metric.shape[0] > 20000:
        metric = metric[:: metric.shape[0] // 20000]
    res = icp(jnp.asarray(pts_sfm), jnp.asarray(metric), iters=icp_iters,
              with_scale=True)
    return float(res.scale)


def apply_scale(rec: Reconstruction, scale: float) -> None:
    """Rescale the reconstruction in place (translations + landmarks)."""
    for f, (R, t) in rec.poses.items():
        rec.poses[f] = (R, t * scale)
    for tid in rec.points:
        rec.points[tid] = rec.points[tid] * scale


def run(
    images: np.ndarray,       # (F, H, W) grayscale float [0,1]
    K: np.ndarray,
    cfg: SfmPipelineConfig = None,
    image_names=None,
    depth_maps: np.ndarray | None = None,   # enables metric scaling
    cam_cfg=None,
) -> Reconstruction:
    cfg = cfg or SfmPipelineConfig()
    rec = run_sfm(
        images, K,
        max_keypoints=cfg.max_keypoints, overlap=cfg.overlap,
        ba_every=cfg.ba_every, seed=cfg.seed, verbose=cfg.verbose,
    )
    if depth_maps is not None and cam_cfg is not None:
        scale = metric_scale_from_depth(rec, depth_maps, cam_cfg)
        apply_scale(rec, scale)
    if cfg.out_poses:
        write_pose_txt(cfg.out_poses, reconstruction_to_pose_records(rec, image_names))
    if cfg.out_sparse_ply and rec.points:
        write_ply(cfg.out_sparse_ply, np.stack(list(rec.points.values())))
    return rec
