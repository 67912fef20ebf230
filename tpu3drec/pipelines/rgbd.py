"""RGBD mapping pipeline — reference configuration 1.

Depth PNGs + given (COLMAP-convention) poses -> fused world-frame point
cloud -> PLY (+ optional .bt octree). This single call replaces the
reference chain `camera_to_world.get_file_name` -> per-frame Python loops ->
txt round-trips -> `genply` -> `ply_transfer_octomap`
(`ref/transfer/camera_to_world.py:138-174`, `ref/octomap/ply_transfer_octomap.py`).

Dataflow: host decodes depth PNGs into one (F, H, W) stack -> device runs
fused unprojection over the sharded frame axis -> device voxel-dedups for
the octree -> host writes PLY/.bt. The only host<->device transfers are the
input stack (down) and the final point/key buffers (up).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.core.quaternion import quat_xyzw_to_matrix
from tpu3drec.core.unproject import fuse_depth_maps
from tpu3drec.mapping.btio import write_bt
from tpu3drec.mapping.voxel import voxelize, unique_voxels
from tpu3drec.utils.config import RGBDPipelineConfig
from tpu3drec.utils.depthio import load_depth_stack
from tpu3drec.utils.plyio import write_ply
from tpu3drec.utils.poseio import poses_to_arrays, read_pose_txt


@dataclass
class RGBDResult:
    n_frames: int
    n_points: int
    n_voxels: int
    seconds: float
    points: np.ndarray | None = None


def cam_to_world_arrays(q_xyzw: np.ndarray, t: np.ndarray):
    """COLMAP world->cam rows -> (F,3,3) cam->world R and (F,3) t."""
    R_w2c = np.asarray(quat_xyzw_to_matrix(jnp.asarray(q_xyzw, dtype=jnp.float32)))
    R = np.swapaxes(R_w2c, -1, -2)
    tc2w = -np.einsum("fij,fj->fi", R, np.asarray(t, dtype=np.float32))
    return R.astype(np.float32), tc2w.astype(np.float32)


def fuse_arrays(
    depths: np.ndarray,
    q_xyzw: np.ndarray,
    t: np.ndarray,
    cfg: RGBDPipelineConfig,
):
    """Core fusion: (F,H,W) depths + COLMAP pose rows -> world points +
    validity, on device."""
    Rs, ts = cam_to_world_arrays(q_xyzw, t)
    cam = cfg.camera
    pts, valid = fuse_depth_maps(
        jnp.asarray(depths),
        jnp.asarray(Rs),
        jnp.asarray(ts),
        cam.fx, cam.fy, cam.cx, cam.cy,
        min_depth=cfg.map.min_depth,
        max_depth=cfg.map.max_depth,
    )
    return pts, valid


def run(cfg: RGBDPipelineConfig) -> RGBDResult:
    """Execute the pipeline from on-disk inputs, per the reference contract.

    Multi-host: when `jax.distributed` is live (CLI --distributed), each
    process decodes and fuses only its contiguous frame shard and the
    artifact writers merge per-host parts into the single deliverable —
    frame decode, unprojection, and dedup all scale with host count."""
    t0 = time.time()
    records = read_pose_txt(cfg.pose_file)
    if jax.process_count() > 1:
        from tpu3drec.parallel.multihost import process_slice

        records = records[process_slice(len(records))]
    depth_paths = [os.path.join(cfg.depth_dir, r.image_name) for r in records]
    depths = load_depth_stack(
        depth_paths,
        mode=cfg.depth.mode,
        scale=cfg.depth.scale,
        size=(cfg.camera.width, cfg.camera.height),
    )
    colors = None
    if cfg.rgb_dir:
        from tpu3drec.utils.depthio import load_image_rgb

        size = (cfg.camera.width, cfg.camera.height)
        frames = []
        for r in records:
            stem = os.path.splitext(r.image_name)[0]
            for ext in (".jpg", ".png", os.path.splitext(r.image_name)[1]):
                path = os.path.join(cfg.rgb_dir, stem + ext)
                if os.path.exists(path):
                    frames.append(load_image_rgb(path, size=size))
                    break
            else:
                raise FileNotFoundError(
                    f"no RGB frame for {r.image_name} in {cfg.rgb_dir}")
        colors = np.stack(frames)
    q, t = poses_to_arrays(records)
    result = run_arrays(depths, q, t, cfg, colors=colors)
    result.seconds = time.time() - t0
    return result


def run_arrays(
    depths: np.ndarray, q_xyzw: np.ndarray, t: np.ndarray, cfg: RGBDPipelineConfig,
    keep_points: bool = False,
    colors: np.ndarray | None = None,  # (F, H, W, 3) uint8 per-pixel colors
) -> RGBDResult:
    """Pipeline on in-memory arrays (the testable core)."""
    t0 = time.time()
    pts, valid = fuse_arrays(depths, q_xyzw, t, cfg)

    multihost = jax.process_count() > 1

    n_voxels = 0
    if cfg.out_bt:
        keys = voxelize(pts, cfg.map.voxel_res)
        skeys, mask, count = unique_voxels(keys, valid)
        skeys_h = np.asarray(skeys)
        mask_h = np.asarray(mask)
        n_voxels = int(count)
        if multihost:
            from tpu3drec.parallel.multihost import write_bt_sharded

            n = write_bt_sharded(cfg.out_bt, skeys_h[mask_h],
                                 cfg.map.voxel_res)
            if n >= 0:
                n_voxels = n  # process 0: post-union global count
        else:
            write_bt(cfg.out_bt, skeys_h[mask_h], cfg.map.voxel_res)

    pts_h = np.asarray(pts)
    valid_h = np.asarray(valid)
    cloud = pts_h[valid_h]
    cloud_rgb = None
    if colors is not None:
        cloud_rgb = colors.reshape(-1, 3)[valid_h]
    if cfg.map.max_points and cloud.shape[0] > cfg.map.max_points:
        cloud = cloud[: cfg.map.max_points]
        if cloud_rgb is not None:
            cloud_rgb = cloud_rgb[: cfg.map.max_points]
    if cfg.out_ply:
        if multihost:
            from tpu3drec.parallel.multihost import write_ply_sharded

            write_ply_sharded(cfg.out_ply, cloud, colors=cloud_rgb,
                              binary=cfg.map.ply_binary)
        else:
            write_ply(cfg.out_ply, cloud, colors=cloud_rgb,
                      binary=cfg.map.ply_binary)

    return RGBDResult(
        n_frames=int(depths.shape[0]),
        n_points=int(cloud.shape[0]),
        n_voxels=n_voxels,
        seconds=time.time() - t0,
        points=cloud if keep_points else None,
    )
