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
