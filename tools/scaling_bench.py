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


if __name__ == "__main__":
    for r in measure():
        print(json.dumps(r))
    sys.exit(0)
