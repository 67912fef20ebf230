"""Fused Pallas nearest-neighbor kernel for ICP.

Per query tile: tiled pairwise distances, min/argmin reduce on the VPU, and
a running (best_d2, best_idx) pair in VMEM scratch across the
reference-block grid dimension — the (Nq, Nr) distance matrix never exists
anywhere. This is the kernel the north star names for "ICP
nearest-neighbor search" (BASELINE.json).

**Measured verdict (v5e, 65k x 65k)**: the plain-XLA blocked scan in
`sfm/icp.py:nearest_neighbors` runs ~8 ms (~4.3 T op/s — VPU
speed-of-light for this elementwise+reduce op), while this kernel's best
tiling lands at ~21-26 ms: per-tile argmin lowering overhead dominates, and
there is no MXU/fusion win for XLA to miss here (K=3 matmuls are 3/128 MXU
utilization). The XLA path is therefore the production path; this kernel is
kept verified-correct as the template for fused-NN variants that DO need
Pallas (e.g. fusing the Umeyama accumulators or ring RDMA into the scan).

Grid layout: (query_tiles, ref_blocks) with ref_blocks minor — scratch
carries the running best across the inner dimension, outputs are written on
the final ref block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
TILE_R = 512


def _nn_kernel(q_ref, r_ref, idx_ref, d2_ref, best_d_s, best_i_s):
    j = pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d_s[:] = jnp.full_like(best_d_s, 1e30)
        best_i_s[:] = jnp.zeros_like(best_i_s)

    q = q_ref[:]          # (TILE_Q, 3)
    r = r_ref[:]          # (TILE_R, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TILE_Q, 1)
    r2 = jnp.sum(r * r, axis=1)[None, :]                # (1, TILE_R)
    qr = jax.lax.dot_general(
        q, r, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 passes flip near-ties
    )
    d = jnp.maximum(q2 + r2 - 2.0 * qr, 0.0)            # (TILE_Q, TILE_R)
    dmin = jnp.min(d, axis=1)
    amin = jnp.argmin(d, axis=1).astype(jnp.int32) + j * TILE_R

    better = dmin < best_d_s[:, 0]
    best_d_s[:, 0] = jnp.where(better, dmin, best_d_s[:, 0])
    best_i_s[:, 0] = jnp.where(better, amin, best_i_s[:, 0])

    @pl.when(j == n_r - 1)
    def _():
        idx_ref[:, 0] = best_i_s[:, 0]
        d2_ref[:, 0] = best_d_s[:, 0]


@partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    query: jnp.ndarray,   # (Nq, 3)
    ref: jnp.ndarray,     # (Nr, 3)
    interpret: bool | None = None,
):
    """(idx (Nq,) int32, d2 (Nq,) f32). Inputs are padded internally; padded
    ref rows sit at a far-away coordinate so they never win."""
    Nq, Nr = query.shape[0], ref.shape[0]
    pad_q = (-Nq) % TILE_Q
    pad_r = (-Nr) % TILE_R
    q = jnp.pad(query, ((0, pad_q), (0, 0)))
    r = jnp.pad(ref, ((0, pad_r), (0, 0)), constant_values=1e8)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (q.shape[0] // TILE_Q, r.shape[0] // TILE_R)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_Q, 1), jnp.float32),
            pltpu.VMEM((TILE_Q, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * r.shape[0] * 3,
            bytes_accessed=(q.shape[0] + r.shape[0]) * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, r)
    return idx[:Nq, 0], d2[:Nq, 0]
