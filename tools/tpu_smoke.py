"""Hardware smoke for the compiled-kernel paths CI cannot exercise.

The CPU test suite runs every Pallas kernel in interpret mode
(`interpret = backend != "tpu"`), so the COMPILED Mosaic behavior is only
ever seen on real hardware (VERDICT r1 weak-item 9). This script runs the
compiled kernels on the live chip and checks them against their XLA
formulations; the verify skill runs it every round.

Checks (each prints ok/FAIL, exit code = number of failures):
  matcher    compiled Pallas matcher == XLA top-2 on random + Kb-tiled sizes
  ba_blocks  Pallas BA block assembly drives manifold-GN to convergence
  fusion     unprojection+dedup voxel count matches the CPU reference
  btio       native .bt writer byte-identical to python on random keys
  mission    closed-loop mission rollout compiles and lands

Usage: python tools/tpu_smoke.py [check ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root (for `tools.*`)

import numpy as np


def check_matcher() -> bool:
    import jax
    import jax.numpy as jnp

    from tpu3drec.ops.matcher import TILE_B, topk2_scores

    assert jax.default_backend() == "tpu", "not on TPU hardware"
    rng = np.random.default_rng(0)
    ok = True
    for Ka, Kb, D in ((512, 1024, 128), (256, 2 * TILE_B + 300, 64)):
        a = rng.normal(size=(Ka, D)).astype(np.float32)
        b = rng.normal(size=(Kb, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        valid = np.ones(Kb, bool)
        valid[rng.random(Kb) < 0.1] = False
        best, top2 = topk2_scores(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid),
            interpret=False)
        scores = a @ b.T
        scores[:, ~valid] = -np.inf
        good = np.array_equal(np.asarray(best), scores.argmax(1))
        srt = np.sort(scores, axis=1)
        good &= np.allclose(np.asarray(top2)[:, 0], srt[:, -1], atol=2e-5)
        good &= np.allclose(np.asarray(top2)[:, 1], srt[:, -2], atol=2e-5)
        ok &= bool(good)
    return ok


def check_ba_blocks() -> bool:
    import jax

    from tpu3drec.sfm.ba import ba_solve
    from tools.ba_scale_bench import make_problem

    prob, floor = make_problem(8, 512, 4096)
    res = ba_solve(prob, max_lm_iters=15, cg_iters=15,
                   use_pallas_blocks=True)
    jax.block_until_ready(res.cam_params)
    return float(res.final_cost) <= 2.0 * floor


def check_fusion() -> bool:
    import jax.numpy as jnp

    from baseline.reference_cpu import gentxtcord_equiv
    from tpu3drec.core.camera import PinholeCamera
    from tpu3drec.core.unproject import depth_to_camera_points

    rng = np.random.default_rng(1)
    depth = rng.uniform(0.2, 40.0, (120, 160)).astype(np.float32)
    cam = PinholeCamera(fx=269.5, fy=269.5, cx=79.5, cy=59.5,
                        width=160, height=120)
    got = np.asarray(depth_to_camera_points(jnp.asarray(depth), cam))
    want = gentxtcord_equiv(depth, 269.5, 269.5, 79.5, 59.5)
    return np.allclose(got.reshape(-1, 3), want, atol=1e-3)


def check_btio() -> bool:
    import tempfile

    from tpu3drec.mapping.btio import write_bt
    from tpu3drec.utils import native

    if not native.available():
        print("  (native lib unavailable — skipping)")
        return True
    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(-200, 200, (5000, 3)).astype(np.int32),
                     axis=0)
    with tempfile.TemporaryDirectory() as d:
        write_bt(d + "/py.bt", keys, 0.25, backend="python")
        native.bt_write_keys(d + "/cc.bt", keys, 0.25)
        return open(d + "/py.bt", "rb").read() == \
            open(d + "/cc.bt", "rb").read()


def check_mission() -> bool:
    from tpu3drec.pipelines.cli import main

    return main(["mission-sim", "--steps", "1200"]) == 0


CHECKS = {
    "matcher": check_matcher,
    "ba_blocks": check_ba_blocks,
    "fusion": check_fusion,
    "btio": check_btio,
    "mission": check_mission,
}


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tpu3drec_dev")
    names = sys.argv[1:] or list(CHECKS)
    failures = 0
    for n in names:
        try:
            good = CHECKS[n]()
        except Exception as e:
            good = False
            print(f"{n}: EXCEPTION {e!r}")
        print(f"{n}: {'ok' if good else 'FAIL'}")
        failures += 0 if good else 1
    return failures


if __name__ == "__main__":
    sys.exit(main())
