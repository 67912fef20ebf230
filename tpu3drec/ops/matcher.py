"""Fused Pallas descriptor-matcher kernel.

Computes, for each query descriptor, the best match index and top-2
similarity scores against a reference set — without materializing the
(Ka, Kb) score matrix in HBM. Each grid step loads one query tile into
VMEM, runs a (TILE_A, D) x (D, Kb) matmul on the MXU, and reduces top-2 +
argmax on the VPU; the score tile lives and dies in VMEM.

This is the kernel the north-star names for feature matching
(BASELINE.json: "tiled descriptor matcher"); `sfm/matching.py` wraps it
with the mutual-NN + ratio-test logic and a plain-XLA reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 128


def _matcher_kernel(a_ref, b_ref, validb_ref, best_ref, top2_ref):
    a = a_ref[:]                       # (TILE_A, D)
    b = b_ref[:]                       # (Kb, D)
    s = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 passes flip near-ties
    )                                   # (TILE_A, Kb)
    neg = jnp.float32(-3.0)            # similarities are in [-1, 1]
    s = jnp.where(validb_ref[:][None, :] != 0, s, neg)
    s1 = jnp.max(s, axis=1)
    i1 = jnp.argmax(s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s_wo = jnp.where(cols == i1[:, None], neg, s)
    s2 = jnp.max(s_wo, axis=1)
    best_ref[:, 0] = i1.astype(jnp.int32)
    top2_ref[:, 0] = s1
    top2_ref[:, 1] = s2


@partial(jax.jit, static_argnames=("interpret",))
def topk2_scores(
    desc_a: jnp.ndarray,   # (Ka, D)
    desc_b: jnp.ndarray,   # (Kb, D)
    valid_b: jnp.ndarray,  # (Kb,) bool
    interpret: bool | None = None,
):
    """Per-query best-match index + top-2 scores. Ka must be padded to a
    TILE_A multiple by the caller (sfm front end emits power-of-two K)."""
    Ka, D = desc_a.shape
    Kb = desc_b.shape[0]
    if Ka % TILE_A:
        pad = TILE_A - Ka % TILE_A
        desc_a = jnp.pad(desc_a, ((0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tiles = desc_a.shape[0] // TILE_A

    best, top2 = pl.pallas_call(
        _matcher_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_A, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kb, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kb,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((desc_a.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((desc_a.shape[0], 2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * desc_a.shape[0] * Kb * D,
            bytes_accessed=(desc_a.shape[0] * D + Kb * D) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(desc_a, desc_b, valid_b.astype(jnp.int32))
    return best[:Ka, 0], top2[:Ka]


def _matcher_kernel_batched(a_ref, b_ref, validb_ref, out_ref):
    # identical math to _matcher_kernel; refs carry a leading pair dim of 1.
    # Output is a (1, 8, TILE_A) f32 plane buffer: row 0 = best index (exact
    # as float for Kb < 2^24), row 1 = s1, row 2 = s2 — trailing dims of
    # size 1/2 would be lane-padded 128x by the (8, 128) tiling.
    a = a_ref[0]
    b = b_ref[0]
    s = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    neg = jnp.float32(-3.0)
    s = jnp.where(validb_ref[0, 0, :][None, :] != 0, s, neg)
    s1 = jnp.max(s, axis=1)
    i1 = jnp.argmax(s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s_wo = jnp.where(cols == i1[:, None], neg, s)
    s2 = jnp.max(s_wo, axis=1)
    out_ref[0, 0, :] = i1.astype(jnp.float32)
    out_ref[0, 1, :] = s1
    out_ref[0, 2, :] = s2


@partial(jax.jit, static_argnames=("interpret",))
def topk2_scores_batched(
    desc_a: jnp.ndarray,   # (P, Ka, D) query sets per pair
    desc_b: jnp.ndarray,   # (P, Kb, D) reference sets per pair
    valid_b: jnp.ndarray,  # (P, Kb) bool
    interpret: bool | None = None,
):
    """Many-pair matcher: one grid dimension per pair — unlike the XLA
    formulation, the (P, Ka, Kb) score tensor never exists in HBM, so the
    sequence-matching fan-out (P ~ frames x overlap) scales to large K."""
    P, Ka, D = desc_a.shape
    Kb = desc_b.shape[1]
    pad = (-Ka) % TILE_A
    if pad:
        desc_a = jnp.pad(desc_a, ((0, 0), (0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_tiles = desc_a.shape[1] // TILE_A

    out = pl.pallas_call(
        _matcher_kernel_batched,
        grid=(P, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_A, D), lambda p, i: (p, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kb, D), lambda p, i: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Kb), lambda p, i: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_A), lambda p, i: (p, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, 8, desc_a.shape[1]), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * desc_a.shape[1] * Kb * D,
            bytes_accessed=P * (desc_a.shape[1] * D + Kb * D) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        desc_a, desc_b,
        jnp.broadcast_to(
            valid_b.astype(jnp.int32)[:, None, :], (P, 8, Kb)
        ),
    )
    best = out[:, 0, :Ka].astype(jnp.int32)
    top2 = jnp.stack([out[:, 1, :Ka], out[:, 2, :Ka]], axis=-1)
    return best, top2
