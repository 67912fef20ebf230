"""Multi-device scaling harness (north star: >=80% efficiency at 2 hosts).

Measures the DP training step at increasing device counts over the mesh
`data` axis and reports scaling efficiency. On a real pod slice run as-is
(jax.distributed initializes from the TPU environment); for methodology
validation without hardware, force emulated devices:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py

NOTE: emulated CPU devices share physical cores, so emulated "efficiency"
is a lower bound on real-ICI behavior — the harness exists so pod runs are
one command.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def measure(device_counts=None, H=96, W=320, per_device_batch=2):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu3drec.models.training import TrainConfig, init_state, make_train_step
    from tpu3drec.parallel.mesh import make_mesh
    from tpu3drec.utils.profiling import time_chained

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    rng = np.random.default_rng(0)
    results = []
    for nd in device_counts:
        mesh = make_mesh(data=nd, space=1, model=1,
                         devices=jax.devices()[:nd])
        B = per_device_batch * nd
        cfg = TrainConfig(height=H, width=W, batch_size=B)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, 100)
        step = make_train_step(model, tx, cfg)
        sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        batch = {
            k: jax.device_put(
                rng.uniform(size=(B, H, W, 3)).astype(np.float32), sharding
            )
            for k in ("target", "prev", "next")
        }
        state = jax.device_put(state, repl)
        key = jax.random.PRNGKey(0)

        def one(s):
            s2, _, _ = step(s, batch, key)
            return s2

        dt = time_chained(one, state, iters=8, warmup=2)
        results.append({
            "devices": nd,
            "global_batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "examples_per_s": round(B / dt, 1),
        })
    base = results[0]["examples_per_s"]
    for r in results:
        r["efficiency"] = round(
            r["examples_per_s"] / (base * r["devices"]), 3
        )
    return results


def measure_ba_landmark_sharded(device_counts=None, F=32, L_per_dev=4096,
                                obs_per_lm=6):
    """Weak-scaling of the landmark-sharded BA (parallel/ba_sharded.py):
    the landmark count grows with the device count (L = L_per_dev * N)
    while per-device landmark state stays constant — the regime the
    replicated-landmark solver cannot enter (its V-blocks are O(L) on
    EVERY device). Reports ms/solve and weak-scaling efficiency."""
    import jax
    import jax.numpy as jnp

    from tpu3drec.parallel.ba_sharded import ba_solve_landmark_sharded
    from tpu3drec.parallel.mesh import make_mesh
    from tpu3drec.sfm.ba import BAProblem
    from tpu3drec.utils.profiling import time_chained

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                    jnp.float32)
    results = []
    for nd in device_counts:
        rng = np.random.default_rng(3)
        mesh = make_mesh(data=1, space=nd, model=1,
                         devices=jax.devices()[:nd])
        L = L_per_dev * nd
        O = obs_per_lm * L
        cams = rng.normal(0, 0.05, (F, 6)).astype(np.float32)
        cams[:, 5] += np.linspace(0, 5, F)
        pts = rng.uniform([-5, -5, 8], [5, 5, 30], (L, 3)).astype(np.float32)
        prob = BAProblem(
            cam_params=jnp.asarray(cams), points=jnp.asarray(pts),
            cam_idx=jnp.asarray(rng.integers(0, F, O).astype(np.int32)),
            pt_idx=jnp.asarray(
                (np.arange(O) % L).astype(np.int32)),  # balanced shards
            uv=jnp.asarray(
                rng.uniform(0, 500, (O, 2)).astype(np.float32)),
            weight=jnp.ones(O, jnp.float32), K=K,
        )

        import time as _t

        t0 = _t.perf_counter()
        res = ba_solve_landmark_sharded(prob, mesh, axis="space",
                                        max_lm_iters=4, cg_iters=8)
        jax.block_until_ready(res.final_cost)
        compile_s = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        res = ba_solve_landmark_sharded(prob, mesh, axis="space",
                                        max_lm_iters=4, cg_iters=8)
        jax.block_until_ready(res.final_cost)
        dt = _t.perf_counter() - t0
        results.append({
            "devices": nd, "landmarks": L, "obs": O,
            "ms_per_solve": round(dt * 1e3, 1),
            "compile_s": round(compile_s, 1),
        })
    base_ms = results[0]["ms_per_solve"]
    for r in results:  # weak scaling: ideal = flat ms as L grows with N
        r["weak_efficiency"] = round(base_ms / r["ms_per_solve"], 3)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ba":
        for r in measure_ba_landmark_sharded():
            print(json.dumps(r))
        sys.exit(0)
    for r in measure():
        print(json.dumps(r))
    sys.exit(0)
