"""Round-3 hardware measurements: the quad-pack gather wins + the ICP-NN
kernel verdict (VERDICT r2 items 2, 4, 9).

Run on the real chip as soon as the relay recovers (the round-2 wedge
persisted into round 3; tools/relay_probe.py watches it):

  timeout 560 python tools/remeasure_r3.py            # all
  timeout 560 python tools/remeasure_r3.py train_step # one

All timings use the slope method (`time_device_loop`) — the only
instrument that survives the relay's bf16-content-hash dispatch
memoization (docs/design.md §6). One JSON line per measurement.

What each entry decides:
  train_step  — did quad-packed warps cut the 144 ms step >=2x (item 2)?
  features    — did quad-packed descriptor gathers reach <50 ms/frame
                at 384x1280/K=1024 (item 4)?
  icp_nn      — XLA blocked scan vs Pallas kernel vs the VPU roofline
                floor: either the kernel beats 35.4 ms or the XLA path is
                certified near the bound and the kernel retires (item 9).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.remeasure_r2 import (  # noqa: E402
    bench_features,
    bench_icp_nn,
    bench_matcher_p24,
    bench_unproject,
)


def bench_train_step():
    """Monodepth train step, B4 @ 192x640 f32 (the round-2 144 ms row).
    Round 3 quad-packs the 8 photometric warps (ops/quadpack.py): one
    point gather per bilinear sample instead of four."""
    import jax
    import jax.numpy as jnp

    from tpu3drec.models.training import (
        TrainConfig, init_state, make_train_step)
    from tpu3drec.utils.profiling import time_device_loop

    H, W, B = 192, 640, 4
    rng = np.random.default_rng(0)
    cfg = TrainConfig(height=H, width=W, batch_size=B)
    model, state, tx = init_state(jax.random.PRNGKey(0), cfg, 100)
    step = make_train_step(model, tx, cfg)
    batch = {
        k: jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
        for k in ("target", "prev", "next")
    }
    key = jax.random.PRNGKey(0)

    def body(i, carry):
        c, s = carry
        b = {k: jnp.roll(v, i * 7 + 1, axis=2) * (1.0 + c * 0)
             for k, v in batch.items()}
        s2, _, _ = step(s, b, key)
        return c, s2

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1 + 0.03 * s), state), iters=(2, 10))
    return {
        "name": "train_step_B4_192x640_f32",
        "ms_per_step": round(dt * 1e3, 2),
        "examples_per_s": round(B / dt, 1),
        "r2_baseline_ms": 144.0,
        "speedup_vs_r2": round(0.144 / dt, 2),
    }


def bench_icp_nn_roofline():
    """ICP NN 65k x 65k with the analytic floor.

    The blocked-scan formulation computes, per (qi, rj) pair, a 3-term
    squared distance (~9 VPU flops incl. the running min/argmin select).
    At N=M=65536 that is ~38.7 G pair-ops; against the v5e VPU f32 peak
    (ChipSpec in utils/profiling: ~19.8 TFLOP/s vector+matrix fp32 is MXU
    — the VPU elementwise peak is ~3.9 Tops/s f32 at 8x128x4 ALUs x
    940 MHz) the floor is ~10 ms. HBM traffic is negligible (the 4.2 G
    distance entries never materialize). A measured XLA time within ~3x
    of the floor means the scan is near the practical bound (select
    chains serialize on the VPU) and the slower Pallas kernel retires.
    """
    out = bench_icp_nn()
    N = 65536
    pair_ops = 9.0 * N * N
    vpu_ops_per_s = 3.9e12
    floor_ms = pair_ops / vpu_ops_per_s * 1e3
    out["floor_ms_vpu"] = round(floor_ms, 1)
    xla = out.get("xla_ms")
    if xla:
        out["xla_x_of_floor"] = round(xla / floor_ms, 2)
        out["verdict"] = (
            "xla_near_bound_retire_pallas" if xla <= 3.5 * floor_ms
            else "headroom_remains")
    return out


BENCHES = {
    "train_step": bench_train_step,
    "features": bench_features,
    "icp_nn": bench_icp_nn_roofline,
    "matcher_p24": bench_matcher_p24,
    "unproject": bench_unproject,
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
