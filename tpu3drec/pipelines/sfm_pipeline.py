"""Full SfM pipeline — reference configuration 5: image sequence ->
incremental SfM (features, matching, triangulation, BA) -> poses +
sparse cloud, optional ICP metric-scale correction and dense fusion.

One callable replacing the reference's COLMAP-GUI-plus-scripts workflow:
export format matches the pose-txt contract `camera_to_world.py:149-158`
reads, so downstream reference-style tooling keeps working.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from tpu3drec.core.quaternion import matrix_to_quat_wxyz, quat_xyzw_from_wxyz
from tpu3drec.sfm.incremental import Reconstruction, run_sfm
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
) -> float:
    """Recover the metric scale SfM can't observe — the reference's
    scale-correction concept (readme §2(2), `ref/readme.md:24-25`) without
    the manual open3d step. Landmarks and the depth map share the camera
    frame, so the rotation is known: scale = robust median over landmarks of
    depth(u, v) / z_sfm at their projections, aggregated over all registered
    frames with valid depth. (The general unknown-correspondence two-cloud
    case keeps the similarity-ICP path: `tpu3drec/sfm/icp.py`.)"""
    cam = cam_cfg.to_camera() if hasattr(cam_cfg, "to_camera") else cam_cfg
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    frames = rec.registered_frames()
    use_frames = [frame] if frame is not None else frames
    ratios = []
    for f in use_frames:
        R, t = rec.poses[f]
        # depth_maps is indexed by absolute frame id (run_sfm's contract, as
        # in incremental.py) — NOT by position among registered frames, which
        # silently mismatches once any frame fails to register.
        dm = depth_maps[f]
        H, W = dm.shape
        for tid, X in rec.points.items():
            if f not in rec.tracks.get(tid, {}):
                continue
            Xc = R @ X + t
            if Xc[2] <= 1e-6:
                continue
            u = int(round(Xc[0] / Xc[2] * fx + cx))
            v = int(round(Xc[1] / Xc[2] * fy + cy))
            if 0 <= u < W and 0 <= v < H and dm[v, u] > 1e-3:
                ratios.append(dm[v, u] / Xc[2])
    if len(ratios) < 10:
        raise ValueError(f"only {len(ratios)} landmark-depth pairs for scaling")
    return float(np.median(ratios))


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
