"""COLMAP-scale bundle-adjustment benchmark (VERDICT r1 item 8).

The reference outsources BA to COLMAP, whose typical window is hundreds of
cameras and tens of thousands of landmarks. This harness sizes `ba_solve`
at that scale — default 200 cams / 50k landmarks / 200k observations — on
whatever backend is active (the real TPU when run normally) and reports
wall-time per LM iteration plus convergence, writing one JSON line per
problem size.

Problem sizes are pad-bucketed (powers-of-two observation counts) so the
incremental pipeline can reuse compiled executables across windows; this
harness measures the buckets themselves.

Usage:
  python tools/ba_scale_bench.py             # full ladder up to 200/50k/200k
  python tools/ba_scale_bench.py --quick     # smallest bucket only (smoke)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_problem(F, L, O, noise_px=1.0, perturb=0.01, seed=0):
    """Consistent synthetic BA problem: observations are projections of a
    coherent camera path over a landmark cloud plus pixel noise, and the
    initial estimate is the GT perturbed — so LM does real accepted
    iterations, like a drifted SfM window, not reject-thrashing."""
    import jax.numpy as jnp

    from tpu3drec.sfm.ba import BAProblem, residuals

    rng = np.random.default_rng(seed)
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], jnp.float32)
    cam_params = rng.normal(0, 0.05, (F, 6)).astype(np.float32)
    cam_params[:, 5] += np.linspace(0, 10, F)  # forward path
    points = rng.uniform([-8, -8, 12], [8, 8, 60], (L, 3)).astype(np.float32)
    cam_idx = rng.integers(0, F, O).astype(np.int32)
    pt_idx = rng.integers(0, L, O).astype(np.int32)
    clean = BAProblem(
        cam_params=jnp.asarray(cam_params), points=jnp.asarray(points),
        cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
        uv=jnp.zeros((O, 2), jnp.float32), weight=jnp.ones(O, jnp.float32),
        K=K,
    )
    # np.array (copy): np.asarray of a device array is a read-only view
    uv = np.array(residuals(clean))  # uv=0 => residual = projection
    uv += rng.normal(0, noise_px, uv.shape).astype(np.float32)
    prob = clean._replace(
        uv=jnp.asarray(uv),
        cam_params=jnp.asarray(
            cam_params + rng.normal(0, perturb, (F, 6)).astype(np.float32)),
        points=jnp.asarray(
            points + rng.normal(0, 5 * perturb, (L, 3)).astype(np.float32)),
    )
    # cost at the GT parameters = the irreducible noise floor: with real
    # observation noise, a correct solver converges TO this, not to zero.
    # Same Huber-on-pixel-norm convention as sfm/ba.py::cost_of (huber 2px)
    noise = uv - np.array(residuals(clean))
    n = np.linalg.norm(noise, axis=1)
    hub = np.where(n <= 2.0, 0.5 * n ** 2, 2.0 * (n - 1.0))
    floor = float(np.sum(hub))
    return prob, floor


def run_one(F, L, O, max_lm_iters=15, cg_iters=15):
    import jax

    from tpu3drec.sfm.ba import ba_solve

    prob, floor = make_problem(F, L, O)
    # compile + first solve (also the convergence record)
    t0 = time.perf_counter()
    res = ba_solve(prob, max_lm_iters=max_lm_iters, cg_iters=cg_iters)
    jax.block_until_ready(res.cam_params)
    compile_plus_first = time.perf_counter() - t0

    # per-LM-iter time via the two-budget slope (design.md §6: bf16-visible
    # salting per call, relay overhead cancels in the difference)
    def timed(n, salt):
        p = prob._replace(
            cam_params=prob.cam_params * jnp.float32(1.0 + 0.003 * salt))
        r = ba_solve(p, max_lm_iters=n, cg_iters=cg_iters)
        jax.block_until_ready(r.cam_params)  # compile + first
        p = prob._replace(
            cam_params=prob.cam_params * jnp.float32(1.0 + 0.003 * (salt + 1)))
        t0 = time.perf_counter()
        r = ba_solve(p, max_lm_iters=n, cg_iters=cg_iters)
        jax.block_until_ready(r.cam_params)
        return time.perf_counter() - t0, int(r.n_iters)

    t_lo, it_lo = timed(3, 1)
    t_hi, it_hi = timed(max_lm_iters, 3)
    it = max(it_hi - it_lo, 1)
    return {
        "F": F, "L": L, "O": O,
        "lm_iters_run": int(res.n_iters),
        "ms_per_lm_iter": round((t_hi - t_lo) / it * 1e3, 1),
        "solve_s": round(t_hi, 2),
        "compile_plus_first_s": round(compile_plus_first, 1),
        "cost_reduction": round(
            float(res.initial_cost / max(float(res.final_cost), 1e-12)), 1),
        "final_vs_noise_floor": round(float(res.final_cost) / floor, 3),
        "converged": bool(float(res.final_cost) <= 1.5 * floor),
        "backend": jax.default_backend(),
    }


import jax.numpy as jnp  # noqa: E402  (after docstring for lazy jax init)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smallest bucket only (smoke test)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path.home()
                          / ".cache" / "tpu3drec_xla"))

    # pad-bucket ladder: the incremental pipeline rounds its windows up to
    # one of these, so each compiled executable is reused across windows
    ladder = [(16, 4096, 2 ** 14), (64, 8192, 2 ** 16), (200, 50_000, 2 ** 18)]
    if args.quick:
        ladder = ladder[:1]
    for F, L, O in ladder:
        r = run_one(F, L, O)
        print(json.dumps(r))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
