"""Round-2 re-measurement of every docs/benchmarks.md entry whose round-1
number was taken with sub-bf16 perturbation chains (invalidated by the
bf16-content-hash memoization finding, design.md §6).

Every workload here is timed with `time_device_loop` (slope method): the
workload runs as a lax.fori_loop inside one jit at two lengths, in-loop
jnp.roll variation defeats loop-invariant hoisting, per-call >=1% salting
defeats the dispatch cache, and the relay's noisy 35-80 ms per-dispatch
overhead cancels in the slope.

Usage: python tools/remeasure_r2.py [name ...]   (default: all)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def bench_unproject():
    """Fused unprojection alone, 8 x 480 x 640."""
    import jax.numpy as jnp

    from tpu3drec.core.unproject import fuse_depth_maps
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(0.1, 50.0, (8, 480, 640)).astype(np.float32))
    qs = rng.normal(size=(8, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    from tpu3drec.pipelines.rgbd import cam_to_world_arrays

    Rs, ts = cam_to_world_arrays(
        qs.astype(np.float32), rng.normal(size=(8, 3)).astype(np.float32))
    Rs, ts = jnp.asarray(Rs), jnp.asarray(ts)

    def body(i, carry):
        c, acc = carry
        dd = jnp.roll(d, i + 1, axis=1) * (1.0 + c * 0)
        pts, valid = fuse_depth_maps(
            dd, Rs, ts, 600.391, 600.079, 320.0, 240.0, min_depth=1e-3)
        return c, acc + pts.sum()

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
        iters=(2, 12))
    return {"name": "unproject_8x480x640", "ms": round(dt * 1e3, 3)}


def bench_voxel_dedup():
    """Voxel dedup (2.4M keys)."""
    import jax.numpy as jnp

    from tpu3drec.mapping.voxel import unique_voxels
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(-500, 500, (2_457_600, 3), np.int32))
    valid = jnp.ones(keys.shape[0], bool)

    def body(i, carry):
        c, acc = carry
        k = jnp.roll(keys, i + 1, axis=0) + (c * 0).astype(jnp.int32)
        _, mask, count = unique_voxels(k, valid)
        return c, acc + count.astype(jnp.float32)

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
        iters=(2, 10))
    return {"name": "voxel_dedup_2.4M", "ms": round(dt * 1e3, 3)}


def bench_icp_nn():
    """ICP NN search 65k x 65k: XLA blocked scan vs Pallas kernel."""
    import jax.numpy as jnp

    from tpu3drec.sfm.icp import _nearest_neighbors_scan
    from tpu3drec.ops.icp_nn import nearest_neighbors_pallas
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(65536, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(65536, 3)).astype(np.float32))

    out = {}
    # the scan explicitly: production nearest_neighbors now dispatches to
    # the Pallas kernel on TPU (round 3), so the public name would compare
    # the kernel against itself
    for label, fn in (("xla", _nearest_neighbors_scan),
                      ("pallas", nearest_neighbors_pallas)):
        def body(i, carry, fn=fn):
            c, acc = carry
            qq = jnp.roll(q, i + 1, axis=0) * (1.0 + c * 0)
            idx, d2 = fn(qq, r)
            return c, acc + d2.sum()

        dt = time_device_loop(
            body, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
            iters=(1, 5))
        out[label + "_ms"] = round(dt * 1e3, 2)
    return {"name": "icp_nn_65k_x_65k", **out}


def bench_matcher_p24():
    """Batched matcher at the round-1 table size (P=24, K=4096, D=128):
    Pallas kernel vs XLA formulation."""
    import jax.numpy as jnp

    from tpu3drec.sfm.matching import match_pairs
    from tpu3drec.utils.profiling import time_device_loop

    P, K, D = 24, 4096, 128
    rng = np.random.default_rng(1)
    descs = rng.normal(size=(P + 1, K, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
    descs_d = jnp.asarray(descs)
    valid = jnp.ones((P + 1, K), bool)
    pairs = jnp.asarray([[i, i + 1] for i in range(P)], jnp.int32)

    out = {}
    for label, use_pallas in (("pallas", True), ("xla", False)):
        def body(i, carry, up=use_pallas):
            c, acc = carry
            d = jnp.roll(descs_d, i * 13 + 1, axis=1) * (1.0 + c * 0)
            m = match_pairs(d, valid, pairs, use_pallas=up)
            return c, acc + m.score.sum().astype(jnp.float32)

        iters = (2, 10) if use_pallas else (1, 3)
        dt = time_device_loop(
            body, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
            iters=iters)
        out[label + "_ms"] = round(dt * 1e3, 2)
    return {"name": "matcher_P24_K4096", **out}


def bench_features():
    """Feature detect+describe, 8 frames @ 384x1280, K=1024."""
    import jax
    import jax.numpy as jnp

    from tpu3drec.sfm.features import detect_and_describe_pyramid
    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(8, 384, 1280)).astype(np.float32))
    fn = jax.vmap(lambda im: detect_and_describe_pyramid(im, max_keypoints=1024))

    def body2(i, carry):
        c, acc = carry
        im = jnp.roll(imgs, i + 1, axis=1) * (1.0 + c * 0)
        res = fn(im)
        leaves = jax.tree_util.tree_leaves(res)
        acc2 = acc
        for leaf in leaves:
            acc2 = acc2 + jnp.sum(leaf).astype(jnp.float32)
        return c, acc2

    dt = time_device_loop(
        body2, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
        iters=(1, 4))
    return {"name": "features_8x384x1280_K1024",
            "ms_per_8frame_batch": round(dt * 1e3, 2)}


BENCHES = {
    "unproject": bench_unproject,
    "voxel_dedup": bench_voxel_dedup,
    "icp_nn": bench_icp_nn,
    "matcher_p24": bench_matcher_p24,
    "features": bench_features,
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tpu3drec_dev")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    names = sys.argv[1:] or list(BENCHES)
    for n in names:
        try:
            print(json.dumps(BENCHES[n]()))
        except Exception as e:
            print(json.dumps({"name": n, "error": repr(e)}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
