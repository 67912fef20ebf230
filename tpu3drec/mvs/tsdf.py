"""Voxel-centric TSDF fusion of depth maps — the scene2pset analogue.

MVE's scene2pset merges per-view depth maps into one point set; the modern
(and TPU-native) equivalent is a truncated signed distance field: every
depth map is integrated into a regular voxel grid, and the fused surface is
the zero crossing (extracted by `mvs/marching.py`).

The TPU formulation is VOXEL-centric, not point-centric: each voxel center
projects into the camera and GATHERS the depth it lands on. Point-centric
integration (unproject pixels, scatter into voxels) needs scatter-add —
serialized on TPU and non-deterministic in float; the gather form is one
elementwise pass + one point gather per voxel, embarrassingly parallel
along every grid axis. The grid's leading (x) axis shards trivially over a
device mesh for city-scale volumes (each device owns a slab; marching
cubes later needs a one-plane halo, nothing else).

Weights follow KinectFusion-style running averages with truncation at
+-trunc; voxels more than `trunc` BEHIND the observed surface are occluded
space and receive no update (the standard visibility rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TsdfGrid:
    """Regular TSDF grid. `tsdf` in [-1, 1] (units of `trunc`), `weight`
    is the accumulated observation count."""
    origin: np.ndarray          # (3,) world coords of voxel (0,0,0) center
    res: float                  # voxel edge length [m]
    trunc: float                # truncation band [m]
    tsdf: jnp.ndarray           # (X, Y, Z) float32, init +1 (empty)
    weight: jnp.ndarray         # (X, Y, Z) float32, init 0

    @staticmethod
    def allocate(origin, dims, res: float, trunc: float | None = None):
        trunc = trunc if trunc is not None else 3.0 * res
        X, Y, Z = dims
        return TsdfGrid(
            origin=np.asarray(origin, np.float32),
            res=float(res), trunc=float(trunc),
            tsdf=jnp.ones((X, Y, Z), jnp.float32),
            weight=jnp.zeros((X, Y, Z), jnp.float32),
        )

    @staticmethod
    def around_points(points: np.ndarray, res: float, pad: float = 0.5,
                      max_dim: int = 512):
        """Allocate a grid bounding `points` (N,3) with `pad` metres slack."""
        lo = np.asarray(points).min(0) - pad
        hi = np.asarray(points).max(0) + pad
        dims = np.minimum(np.ceil((hi - lo) / res).astype(int) + 1, max_dim)
        return TsdfGrid.allocate(lo, tuple(int(d) for d in dims), res)


@partial(jax.jit, static_argnames=("max_weight",))
def _integrate(tsdf, weight, centers, depth, K, R, t, trunc,
               max_weight: float = 64.0):
    """One depth map into the grid. centers: (X, Y, Z, 3) world coords."""
    H, W = depth.shape
    p_cam = jnp.einsum("ij,xyzj->xyzi", R, centers) + t
    z = p_cam[..., 2]
    uv = jnp.einsum("ij,xyzj->xyzi", K, p_cam)
    x = uv[..., 0] / jnp.where(jnp.abs(uv[..., 2]) < 1e-9, 1e-9, uv[..., 2])
    y = uv[..., 1] / jnp.where(jnp.abs(uv[..., 2]) < 1e-9, 1e-9, uv[..., 2])
    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
    d_obs = depth[yi, xi]                                    # one point gather
    inb = (z > 1e-6) & (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1) \
        & (d_obs > 0)
    sdf = d_obs - z                                          # + in front
    upd = inb & (sdf > -trunc)                               # skip occluded
    s = jnp.clip(sdf / trunc, -1.0, 1.0)
    w_new = jnp.where(upd, 1.0, 0.0)
    w_tot = weight + w_new
    fused = jnp.where(w_tot > 0, (tsdf * weight + s * w_new) / jnp.maximum(
        w_tot, 1e-9), tsdf)
    return fused, jnp.minimum(w_tot, max_weight)


def voxel_centers(grid: TsdfGrid) -> jnp.ndarray:
    X, Y, Z = grid.tsdf.shape
    ix = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 2)
    o = jnp.asarray(grid.origin)
    return jnp.stack([o[0] + ix * grid.res,
                      o[1] + iy * grid.res,
                      o[2] + iz * grid.res], axis=-1)


def integrate_depth_maps(grid: TsdfGrid, depths, K, Rs, ts,
                         masks=None) -> TsdfGrid:
    """Fuse (F, H, W) depth maps (world->cam poses Rs/ts) into the grid.

    One jit: `lax.scan` over frames carrying (tsdf, weight). The voxel-
    center tensor is built INSIDE the jit from origin/res so GSPMD
    propagates the grid's sharding into it — a grid `device_put` with its
    x-axis sharded over the mesh integrates as independent per-device
    slabs with zero collectives (depth maps are replicated; each device
    gathers from its own copy). `masks` (F, H, W) bool optionally zeroes
    out unvalidated pixels (the geometric_consistency output).
    """
    depths = jnp.asarray(depths, jnp.float32)
    if masks is not None:
        depths = jnp.where(jnp.asarray(masks), depths, 0.0)
    K = jnp.asarray(K, jnp.float32)
    Rs = jnp.asarray(Rs, jnp.float32)
    ts = jnp.asarray(ts, jnp.float32)
    trunc = jnp.float32(grid.trunc)
    origin = jnp.asarray(grid.origin, jnp.float32)
    res = jnp.float32(grid.res)

    @jax.jit
    def run(tsdf, weight):
        X, Y, Z = tsdf.shape
        ix = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 0)
        iy = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 1)
        iz = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 2)
        centers = jnp.stack([origin[0] + ix * res,
                             origin[1] + iy * res,
                             origin[2] + iz * res], axis=-1)

        def step(carry, frame):
            tsdf, weight = carry
            d, R, t = frame
            return _integrate(tsdf, weight, centers, d, K, R, t, trunc), None

        (tsdf, weight), _ = jax.lax.scan(step, (tsdf, weight),
                                         (depths, Rs, ts))
        return tsdf, weight

    tsdf, weight = run(grid.tsdf, grid.weight)
    return TsdfGrid(grid.origin, grid.res, grid.trunc, tsdf, weight)
