"""Dense MVS pipeline: posed images -> depth maps -> TSDF -> mesh.

The MVE alternative pipeline (`ref/software_record/mve使用指南.docx`:
makescene -> sfmrecon -> dmrecon -> scene2pset -> fssrecon -> meshclean)
as one driver. Poses come from this repo's SfM (`sfm/incremental.py` — the
sfmrecon stage) or ground truth; this module runs the dense half:

1. per-view plane-sweep ZNCC depth     (dmrecon,   `mvs/plane_sweep.py`)
2. cross-view geometric consistency    (scene2pset confidence filter)
3. TSDF fusion of validated depths     (scene2pset, `mvs/tsdf.py`)
4. marching-tetrahedra mesh extraction (fssrecon,  `mvs/marching.py`)
5. floater/degenerate cleanup          (meshclean, `mvs/meshclean.py`)

CLI: `tpu3drec mvs --images DIR --poses poses.txt --fx .. --out mesh.ply`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class MvsConfig:
    n_src: int = 4             # source views per reference view
    n_planes: int = 96         # depth hypotheses (inverse-depth spaced)
    window: int = 5            # ZNCC window (see plane_sweep.py on slant)
    d_min: float = 1.0
    d_max: float = 80.0
    min_zncc: float = 0.5      # photo-consistency acceptance
    rel_err: float = 0.02      # cross-view depth agreement (relative)
    min_consistent: int = 2    # views that must agree
    voxel_res: float = 0.0     # 0 = auto: median scene depth / 100
    max_grid_dim: int = 384
    min_component_frac: float = 0.02
    depth_stride: int = 1      # subsample factor for grid bounds estimate
    verbose: bool = False


def select_source_views(Rs: np.ndarray, ts: np.ndarray, ref: int,
                        n_src: int, min_baseline: float = 1e-3):
    """Nearest cameras by center distance, excluding near-zero baselines
    (no parallax -> no depth signal). Centers C = -R^T t."""
    C = np.einsum("fij,fi->fj", Rs, -ts)  # R^T t with (f,i,j) rows
    d = np.linalg.norm(C - C[ref], axis=1)
    order = np.argsort(d)
    picked = [int(i) for i in order
              if i != ref and d[i] > min_baseline][:n_src]
    return picked


def run_mvs(images: np.ndarray, K: np.ndarray, Rs: np.ndarray,
            ts: np.ndarray, cfg: MvsConfig = None):
    """images: (F, H, W) grayscale float [0,1]; Rs/ts: world->cam.

    Returns dict with per-view depths/masks, fused points, mesh
    (verts, faces), and stage timings.
    """
    import jax.numpy as jnp

    from tpu3drec.mvs.marching import marching_tetrahedra, weld_mesh
    from tpu3drec.mvs.meshclean import clean_mesh
    from tpu3drec.mvs.plane_sweep import (geometric_consistency,
                                          plane_sweep_depth)
    from tpu3drec.mvs.tsdf import TsdfGrid, integrate_depth_maps

    cfg = cfg or MvsConfig()
    F, H, W = images.shape
    n_src = min(cfg.n_src, F - 1)
    t0 = time.time()

    imgs_j = jnp.asarray(images, jnp.float32)
    K_j = jnp.asarray(K, jnp.float32)
    Rs_j = jnp.asarray(Rs, jnp.float32)
    ts_j = jnp.asarray(ts, jnp.float32)

    depths = np.zeros((F, H, W), np.float32)
    znccs = np.zeros((F, H, W), np.float32)
    for f in range(F):
        src = select_source_views(Rs, ts, f, n_src)
        if len(src) < 1:
            continue
        src_idx = jnp.asarray(src)
        d, z, nv = plane_sweep_depth(
            imgs_j[f], imgs_j[src_idx], K_j, Rs_j[f], ts_j[f],
            Rs_j[src_idx], ts_j[src_idx], cfg.d_min, cfg.d_max,
            n_planes=cfg.n_planes, window=cfg.window)
        dn = np.asarray(d).copy()
        zn = np.asarray(z)
        dn[zn < cfg.min_zncc] = 0.0
        depths[f] = dn
        znccs[f] = zn
        if cfg.verbose:
            cov = float((dn > 0).mean())
            print(f"[mvs] view {f}: {len(src)} sources, "
                  f"{cov:.0%} confident", flush=True)
    t_sweep = time.time() - t0

    t0 = time.time()
    masks = geometric_consistency(depths, K, Rs, ts, rel_err=cfg.rel_err,
                                  min_consistent=min(cfg.min_consistent,
                                                     max(F - 1, 1)))
    t_consist = time.time() - t0

    # fused validated point set (the scene2pset deliverable) — also the
    # grid-bounds estimate
    from tpu3drec.core.unproject import fuse_depth_maps

    t0 = time.time()
    d_masked = np.where(masks, depths, 0.0)
    Rs_c2w = np.transpose(Rs, (0, 2, 1))
    ts_c2w = -np.einsum("fij,fj->fi", Rs_c2w, ts)
    pts, valid = fuse_depth_maps(
        jnp.asarray(d_masked[:, ::cfg.depth_stride, ::cfg.depth_stride]),
        jnp.asarray(Rs_c2w, jnp.float32), jnp.asarray(ts_c2w, jnp.float32),
        float(K[0, 0]) / cfg.depth_stride, float(K[1, 1]) / cfg.depth_stride,
        float(K[0, 2]) / cfg.depth_stride, float(K[1, 2]) / cfg.depth_stride,
        min_depth=1e-6)
    pts = np.asarray(pts)[np.asarray(valid)]
    if pts.shape[0] == 0:
        return {"depths": depths, "masks": masks, "points": pts,
                "verts": np.zeros((0, 3), np.float32),
                "faces": np.zeros((0, 3), np.int32),
                "timings": {"sweep_s": t_sweep, "consist_s": t_consist}}

    res = cfg.voxel_res
    if res <= 0:
        med_d = float(np.median(depths[depths > 0]))
        res = max(med_d / 100.0, 1e-3)
    grid = TsdfGrid.around_points(pts, res, pad=4 * res,
                                  max_dim=cfg.max_grid_dim)
    grid = integrate_depth_maps(grid, d_masked, K, Rs, ts)
    t_fuse = time.time() - t0

    t0 = time.time()
    soup = marching_tetrahedra(grid.tsdf, grid.weight, grid.origin,
                               grid.res)
    verts, faces = weld_mesh(soup, tol=grid.res * 1e-3)
    verts, faces = clean_mesh(verts, faces,
                              min_component_frac=cfg.min_component_frac)
    t_mesh = time.time() - t0
    if cfg.verbose:
        print(f"[mvs] grid {grid.tsdf.shape} res {res:.3f}: "
              f"{verts.shape[0]} verts, {faces.shape[0]} faces "
              f"(sweep {t_sweep:.1f}s, consist {t_consist:.1f}s, "
              f"fuse {t_fuse:.1f}s, mesh {t_mesh:.1f}s)", flush=True)
    return {"depths": depths, "masks": masks, "zncc": znccs,
            "points": pts, "verts": verts, "faces": faces, "grid": grid,
            "timings": {"sweep_s": t_sweep, "consist_s": t_consist,
                        "fuse_s": t_fuse, "mesh_s": t_mesh}}
