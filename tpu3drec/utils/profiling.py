"""Tracing / profiling / roofline accounting.

The reference's observability is ad-hoc wall-clock prints
(`ref/monodepth2/trainer.py:541-551`, `ref/transfer/camera_to_world.py:168-172`,
SURVEY.md §5.1). Here: jax.profiler trace capture (view in TensorBoard /
Perfetto), a chained-steady-state timer that defeats runtime dispatch
memoization (identical dispatches can be elided — measured on this very
stack), and a roofline model for v5e so kernels report % of
speed-of-light, which the north star requires.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Per-chip peak numbers. v5e: 197 TFLOP/s bf16, ~98 TFLOP/s fp32 (MXU),
# 819 GB/s HBM. VPU estimate: 8x128 lanes * 4 ops/cycle * ~0.94 GHz.
@dataclass(frozen=True)
class ChipSpec:
    name: str
    flops_bf16: float
    flops_f32: float
    hbm_bytes_per_s: float
    vpu_ops_per_s: float


V5E = ChipSpec(
    name="v5e",
    flops_bf16=197e12,
    flops_f32=98.5e12,
    hbm_bytes_per_s=819e9,
    vpu_ops_per_s=4e12,
)


@dataclass
class RooflineReport:
    seconds: float
    flops: float
    bytes: float
    achieved_flops_per_s: float
    achieved_bytes_per_s: float
    compute_bound: bool
    fraction_of_peak: float

    def __str__(self):
        kind = "compute" if self.compute_bound else "memory"
        return (
            f"{self.seconds*1e3:.3f} ms | {self.achieved_flops_per_s/1e12:.2f} TFLOP/s, "
            f"{self.achieved_bytes_per_s/1e9:.1f} GB/s | {kind}-bound | "
            f"{self.fraction_of_peak*100:.1f}% of speed-of-light"
        )


def roofline(seconds: float, flops: float, bytes_moved: float,
             chip: ChipSpec = V5E, dtype: str = "f32") -> RooflineReport:
    """Classify a measured kernel against the chip roofline."""
    peak_flops = chip.flops_bf16 if dtype == "bf16" else chip.flops_f32
    t_compute = flops / peak_flops
    t_memory = bytes_moved / chip.hbm_bytes_per_s
    bound_compute = t_compute >= t_memory
    t_sol = max(t_compute, t_memory)
    return RooflineReport(
        seconds=seconds,
        flops=flops,
        bytes=bytes_moved,
        achieved_flops_per_s=flops / max(seconds, 1e-12),
        achieved_bytes_per_s=bytes_moved / max(seconds, 1e-12),
        compute_bound=bound_compute,
        fraction_of_peak=t_sol / max(seconds, 1e-12),
    )


def time_chained(step_fn, x0, iters: int = 20, warmup: int = 2) -> float:
    """Steady-state seconds/iteration with a data dependency threaded
    through consecutive dispatches (identical-argument dispatches can be
    memoized by the runtime; chaining forces real execution).

    WARNING (this container's relay runtime): the memoization hash is
    computed on BF16-TRUNCATED contents, so the chain only defeats it if
    successive inputs differ by more than bf16 epsilon (~0.4% relative).
    A `x * 1e-12`-style chain re-hits the cache and reports impossible
    speeds. When in doubt use `time_device_loop` (slope method), which is
    also immune to the 35-80 ms noisy per-dispatch relay overhead."""
    x = x0
    for _ in range(warmup):
        x = step_fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step_fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def time_device_loop(body_fn, make_carry, iters=(4, 24), reps=2) -> float:
    """Per-iteration device seconds via the two-length slope method — the
    only timing discipline that survives this container's relay runtime
    (design.md §6):

    * the relay memoizes dispatches on BF16-TRUNCATED content hashes, so
      chains perturbed below bf16 epsilon (~0.4% relative) re-hit the
      cache and report impossible speeds (measured: 0.17 ms for a 34
      GFLOP HIGHEST-precision matmul);
    * a cache-missing dispatch carries 35-80 ms of NOISY relay overhead,
      swamping ms-scale kernels.

    So: run the workload as `lax.fori_loop(0, n, body_fn, carry)` inside
    ONE jit for two loop lengths and return (t_n2 - t_n1)/(n2 - n1) —
    the overhead cancels in the slope. Contract on the caller:

    * `body_fn(i, carry)` must make each iteration's work bf16-visibly
      different (e.g. jnp.roll the input by i, or scale by (1 + 0.03*i));
    * `make_carry(salt)` returns a fresh carry whose data differs
      bf16-visibly per salt (each timed call must be a cache miss).
    """
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames="n")
    def loop(c0, n):
        return jax.lax.fori_loop(0, n, body_fn, c0)

    n1, n2 = iters
    best = {n1: float("inf"), n2: float("inf")}
    salt = 0
    for _ in range(reps):
        for n in (n1, n2):
            salt += 1
            c = make_carry(float(salt))
            jax.block_until_ready(loop(c, n))  # compile + first real run
            salt += 1
            c = make_carry(float(salt))
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            jax.block_until_ready(loop(c, n))
            best[n] = min(best[n], time.perf_counter() - t0)
    return max((best[n2] - best[n1]) / (n2 - n1), 1e-9)


def chain_scalar(out) -> jnp.ndarray:
    """Collapse any pytree of arrays to a tiny scalar suitable for folding
    into the next iteration's input (`x + chain_scalar(out) * 0`)."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf).astype(jnp.float32) * 0
    return acc
