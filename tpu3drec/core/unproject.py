"""Fused pixel->camera->world unprojection.

The TPU-native replacement for the reference's per-pixel Python double loops
(`ref/transfer/pixel_to_camera.py:34-43` — 307k iterations per frame — and
`ref/transfer/camera_to_world.py:67-105`, which additionally round-trips
every point through two ASCII files). Here the whole sequence is one fused
XLA computation: a (F, H, W) depth stack plus (F,) camera->world poses map to
an (F*H*W, 3) world-point buffer in a single jit, vmapped over frames, with
no host round-trips.

These are deliberately plain-jnp (not Pallas): the math is pure elementwise
FMA that XLA already fuses into a single HBM-bandwidth-bound kernel; a
hand-written kernel could not beat it (see docs/design notes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpu3drec.core.camera import PinholeCamera
from tpu3drec.core.se3 import SE3


def _pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(H, W) u and v coordinate planes. broadcasted_iota keeps TPU happy."""
    u = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    v = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    return u, v


def depth_to_camera_points(
    depth: jnp.ndarray, cam: PinholeCamera
) -> jnp.ndarray:
    """Depth map (H, W) -> camera-frame points (H, W, 3).

    Vectorized form of `ref/transfer/pixel_to_camera.py:34-43`:
    X=(u-cx)/fx*Z, Y=(v-cy)/fy*Z, Z=depth.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    u, v = _pixel_grid(h, w, depth.dtype)
    X = (u - cam.cx) / cam.fx * depth
    Y = (v - cam.cy) / cam.fy * depth
    return jnp.stack([X, Y, depth], axis=-1)


def camera_to_world_points(pts_cam: jnp.ndarray, cam_to_world: SE3) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> world frame.

    Equivalent to the reference's ``p_w = R^{-1}(p_c - t)`` with (R, t) the
    COLMAP world->cam pose (`ref/transfer/camera_to_world.py:86-105`), but
    expressed with a pre-inverted cam->world SE3 so the per-point work is one
    3x3 matmul + add.
    """
    return (
        jnp.einsum("...ij,...j->...i", cam_to_world.R, pts_cam, precision="highest")
        + jnp.broadcast_to(cam_to_world.t, pts_cam.shape)
    )


def depth_to_world_points(
    depth: jnp.ndarray, cam: PinholeCamera, cam_to_world: SE3
) -> jnp.ndarray:
    """Fused unproject + world transform for one frame: (H, W) -> (H, W, 3).

    Algebraically R @ [X,Y,Z] + t expanded per-axis so XLA fuses the whole
    thing into one elementwise pass over the depth plane (no (HW, 3) x (3, 3)
    matmul materialization).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    u, v = _pixel_grid(h, w, depth.dtype)
    X = (u - cam.cx) / cam.fx * depth
    Y = (v - cam.cy) / cam.fy * depth
    R, t = cam_to_world.R, cam_to_world.t
    wx = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * depth + t[0]
    wy = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * depth + t[1]
    wz = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * depth + t[2]
    return jnp.stack([wx, wy, wz], axis=-1)


@partial(jax.jit, static_argnames=("min_depth", "max_depth"))
def fuse_depth_maps(
    depths: jnp.ndarray,  # (F, H, W)
    Rs: jnp.ndarray,  # (F, 3, 3) camera->world rotations
    ts: jnp.ndarray,  # (F, 3) camera->world translations
    fx, fy, cx, cy,
    min_depth: float = 0.0,
    max_depth: float = float("inf"),
):
    """Whole-sequence fusion: (F, H, W) depths + per-frame cam->world poses
    -> (F*H*W, 3) world points + (F*H*W,) validity mask.

    This one call replaces the reference's entire `get_file_name` driver loop
    (`ref/transfer/camera_to_world.py:138-174`). Points with depth outside
    (min_depth, max_depth) are masked (the reference keeps zero-depth points;
    pass defaults for bit-compatible behavior).
    """
    F, H, W = depths.shape
    cam = PinholeCamera(fx, fy, cx, cy, W, H)

    def one_frame(depth, R, t):
        return depth_to_world_points(depth, cam, SE3(R, t))

    pts = jax.vmap(one_frame)(depths, Rs, ts)  # (F, H, W, 3)
    valid = (depths > min_depth) & (depths < max_depth)
    return pts.reshape(-1, 3), valid.reshape(-1)
