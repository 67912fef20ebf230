"""Fused Pallas nearest-neighbor kernel for ICP.

Per query tile: pairwise squared distances by VPU broadcast, min/argmin
reduce, and a running (best_d2, best_idx) pair in VMEM scratch across the
reference-block grid dimension — the (Nq, Nr) distance matrix never exists
anywhere. This is the kernel the north star names for "ICP
nearest-neighbor search" (BASELINE.json).

Formulation (round 3 rewrite): the first version kept xyz on the LANE
dimension ((TILE, 3) operands — 3 of 128 lanes live) and pushed the cross
term through a K=3 HIGHEST-precision MXU matmul (3/128 utilization, 6
passes); per-tile `argmin` lowering added more. Measured 55 ms at
65k x 65k vs 36.5 ms for the plain-XLA blocked scan (tools/remeasure_r3).
This version computes d = (qx-rx)^2 + (qy-ry)^2 + (qz-rz)^2 directly on
full (TILE_Q, TILE_R) registers — queries broadcast from sublanes,
references from lanes (the ref tile ships pre-transposed as (3, TILE_R)) —
6 VPU ops/pair, no MXU, no matmul-identity clamp; argmin is a where+iota
min (2 more passes). All ops run at full lane width.

Direct subtraction is also numerically better than the |q|^2+|r|^2-2qr
identity (no catastrophic cancellation near ties), so no precision pin is
needed.

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
TILE_R = 1024


def _nn_kernel(q_ref, rt_ref, idx_ref, d2_ref, best_d_s, best_i_s):
    j = pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d_s[:] = jnp.full_like(best_d_s, 1e30)
        best_i_s[:] = jnp.zeros_like(best_i_s)

    q = q_ref[:]          # (TILE_Q, 3): queries on sublanes
    rt = rt_ref[:]        # (3, TILE_R): references on lanes
    dx = q[:, 0:1] - rt[0:1, :]   # (TILE_Q, TILE_R) broadcasts
    dy = q[:, 1:2] - rt[1:2, :]
    dz = q[:, 2:3] - rt[2:3, :]
    d = dx * dx + dy * dy + dz * dz

    dmin = jnp.min(d, axis=1, keepdims=True)             # (TILE_Q, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    # first-match argmin (ties resolve to the smallest index, like
    # np.argmin): min over iota where the tile min is attained
    amin = jnp.min(jnp.where(d == dmin, ii, TILE_R), axis=1, keepdims=True)
    amin = amin + j * TILE_R

    better = dmin < best_d_s[:, 0:1]
    best_d_s[:, 0:1] = jnp.where(better, dmin, best_d_s[:, 0:1])
    best_i_s[:, 0:1] = jnp.where(better, amin, best_i_s[:, 0:1])

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
    rt = jnp.pad(ref, ((0, pad_r), (0, 0)), constant_values=1e8).T
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (q.shape[0] // TILE_Q, rt.shape[1] // TILE_R)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_R), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
            flops=9 * q.shape[0] * rt.shape[1],
            bytes_accessed=(q.shape[0] + rt.shape[1]) * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, rt)
    return idx[:Nq, 0], d2[:Nq, 0]
