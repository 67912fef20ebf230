"""Hardware benchmark for the dense-MVS kernels (VERDICT r4 item 5b).

Measures, with the slope-method timing discipline the relay requires
(utils/profiling.time_device_loop):

* plane-sweep ZNCC depth: ms/view at 480x640, 96 planes, 4 source views
  (the dmrecon-analogue hot kernel — homography warps + windowed ZNCC,
  `mvs/plane_sweep.py`)
* TSDF integration: ms/frame into a 256^3-class grid
  (`mvs/tsdf.py::integrate_depth_maps`)
* marching tetrahedra emission: ms per 100k active cells
  (`mvs/marching.py::_emit_triangles` — the device part; host compaction
  is counted separately and printed for context)

Usage:  python tools/mvs_bench.py [--platform cpu] [--small]
Emits one JSON line per kernel; append to docs/benchmarks.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_plane_sweep(H, W, n_planes, n_src):
    import jax
    import jax.numpy as jnp

    from tpu3drec.mvs.plane_sweep import plane_sweep_depth
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    K = jnp.asarray([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                    jnp.float32)
    ref = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
    srcs = jnp.asarray(rng.uniform(size=(n_src, H, W)).astype(np.float32))
    R_ref = jnp.eye(3)
    t_ref = jnp.zeros(3)
    Rs = jnp.broadcast_to(jnp.eye(3), (n_src, 3, 3))
    ts = jnp.asarray(rng.normal(0, 0.3, (n_src, 3)).astype(np.float32))

    def body(i, carry):
        c, acc = carry
        r = jnp.roll(ref, i + 1, axis=1) * (1.0 + c * 0)
        d, z, nv = plane_sweep_depth(r, srcs, K, R_ref, t_ref, Rs, ts,
                                     1.0, 80.0, n_planes=n_planes)
        return c, acc + d.sum()

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1.0 + 0.03 * s), jnp.float32(0)),
        iters=(1, 4))
    return dt * 1e3  # ms/view


def bench_tsdf(grid_dim, H, W, frames):
    import jax
    import jax.numpy as jnp

    from tpu3drec.mvs.tsdf import TsdfGrid, integrate_depth_maps
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(1)
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                 np.float32)
    depths = jnp.asarray(
        rng.uniform(2.0, 30.0, (frames, H, W)).astype(np.float32))
    Rs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                          (frames, 3, 3))
    ts = jnp.asarray(rng.normal(0, 0.5, (frames, 3)).astype(np.float32))
    grid0 = TsdfGrid.allocate((-15.0, -15.0, 0.0),
                              (grid_dim, grid_dim, grid_dim), 30.0 / grid_dim)

    def body(i, carry):
        c, t, w = carry
        d = jnp.roll(depths, i + 1, axis=2) * (1.0 + c * 0)
        g = integrate_depth_maps(
            TsdfGrid(grid0.origin, grid0.res, grid0.trunc, t, w),
            d, K, Rs, ts)
        return c, g.tsdf, g.weight

    dt = time_device_loop(
        body,
        lambda s: (jnp.float32(1.0 + 0.03 * s),
                   jnp.ones((grid_dim,) * 3, jnp.float32),
                   jnp.zeros((grid_dim,) * 3, jnp.float32)),
        iters=(1, 4))
    return dt / frames * 1e3  # ms/frame


def bench_marching(n_cells, grid_dim):
    import jax
    import jax.numpy as jnp

    from tpu3drec.mvs.marching import _emit_triangles
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(2)
    xs = np.linspace(-1.5, 1.5, grid_dim, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = jnp.asarray(np.sqrt(X**2 + Y**2 + Z**2) - 1.0)
    cells = jnp.asarray(
        rng.integers(0, grid_dim - 1, (n_cells, 3)).astype(np.int32))
    origin = jnp.asarray([-1.5, -1.5, -1.5], jnp.float32)
    res = jnp.float32(xs[1] - xs[0])

    def body(i, carry):
        c, acc = carry
        s = jnp.roll(sdf, i + 1, axis=2) * (1.0 + c * 0)
        verts, valid = _emit_triangles(cells, s, origin, res,
                                       jnp.float32(0.0))
        return c, acc + verts.sum()

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1.0 + 0.03 * s), jnp.float32(0)),
        iters=(2, 8))
    return dt / n_cells * 1e5 * 1e3  # ms per 100k cells


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--small", action="store_true",
                   help="reduced shapes (CPU-tractable smoke)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpu3drec_xla"))
    plat = jax.devices()[0].platform

    if args.small:
        sweep = bench_plane_sweep(192, 256, 48, 4)
        tsdf = bench_tsdf(96, 120, 160, 4)
        march = bench_marching(4096, 64)
        shapes = {"sweep": "192x256x48p/4src", "tsdf": "96^3, 4x120x160",
                  "march": "4096 cells of 64^3"}
    else:
        sweep = bench_plane_sweep(480, 640, 96, 4)
        tsdf = bench_tsdf(256, 480, 640, 4)
        march = bench_marching(131072, 256)
        shapes = {"sweep": "480x640x96p/4src", "tsdf": "256^3, 4x480x640",
                  "march": "131072 cells of 256^3"}
    print(json.dumps({
        "platform": plat,
        "plane_sweep_ms_per_view": round(sweep, 2),
        "tsdf_integrate_ms_per_frame": round(tsdf, 2),
        "marching_ms_per_100k_cells": round(march, 2),
        "shapes": shapes,
    }))


if __name__ == "__main__":
    main()
