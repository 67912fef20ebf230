"""Fused Pallas descriptor-matcher kernel.

Computes, for each query descriptor, the best match index and top-2
similarity scores against a reference set — without materializing the
(Ka, Kb) score matrix in HBM. The grid tiles BOTH sides: each step loads a
(TILE_A, D) query tile and a (TILE_B, D) reference tile into VMEM, runs the
matmul on the MXU, reduces top-2 + argmax on the VPU, and merges the tile's
result into a running top-2 kept in the (revisited) output block. Tiling
the reference side bounds VMEM regardless of Kb — K=16k+ descriptor sets
(VERDICT r1 item 10) stream through in 2 MB tiles instead of blowing the
~16 MB budget with an (Ka, Kb) score plane plus an 8 MB descriptor block.

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
TILE_B = 2048  # max reference-side tile: (2048, 128) f32 descriptors = 1 MB,
               # (128, 2048) score plane = 1 MB — VMEM-safe at any Kb


def _tile_b_for(Kb: int) -> int:
    """Reference tile size: whole set when small (one grid step, no merge
    overhead), TILE_B stream when large (bounded VMEM)."""
    if Kb >= TILE_B:
        return TILE_B
    return max(128, -(-Kb // 128) * 128)  # round up to the 128-lane tile


def _tile_top2(a, b, validb):
    """One (TILE_A, D) x (D, TILE_B) tile's best index + top-2 scores."""
    s = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 passes flip near-ties
    )                                   # (TILE_A, TILE_B)
    neg = jnp.float32(-3.0)            # similarities are in [-1, 1]
    s = jnp.where(validb[None, :] != 0, s, neg)
    s1 = jnp.max(s, axis=1)
    i1 = jnp.argmax(s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s_wo = jnp.where(cols == i1[:, None], neg, s)
    s2 = jnp.max(s_wo, axis=1)
    return i1, s1, s2


def _merge_top2(prev_i1, prev_s1, prev_s2, i1, s1, s2):
    """Merge two disjoint candidate sets' (argmax, top-2): the union's best
    is the larger s1; its runner-up is the best of everything else."""
    better = s1 > prev_s1
    m_i1 = jnp.where(better, i1, prev_i1)
    m_s1 = jnp.maximum(s1, prev_s1)
    m_s2 = jnp.maximum(jnp.minimum(s1, prev_s1), jnp.maximum(s2, prev_s2))
    return m_i1, m_s1, m_s2


def _matcher_kernel(tile_b, a_ref, b_ref, validb_ref, out_ref):
    """Output is an (8, TILE_A) f32 plane buffer: row 0 = best index (exact
    as float for Kb < 2^24), row 1 = s1, row 2 = s2 — trailing dims of
    size 1/2 would be lane-padded 128x by the (8, 128) tiling. The block is
    revisited across the Kb-tile grid dim and carries the running top-2."""
    j = pl.program_id(1)
    i1, s1, s2 = _tile_top2(a_ref[:], b_ref[:], validb_ref[0, :])
    i1 = i1 + j * tile_b  # global reference index

    @pl.when(j == 0)
    def _init():
        out_ref[0, :] = i1.astype(jnp.float32)
        out_ref[1, :] = s1
        out_ref[2, :] = s2

    @pl.when(j > 0)
    def _merge():
        m_i1, m_s1, m_s2 = _merge_top2(
            out_ref[0, :].astype(jnp.int32), out_ref[1, :], out_ref[2, :],
            i1, s1, s2,
        )
        out_ref[0, :] = m_i1.astype(jnp.float32)
        out_ref[1, :] = m_s1
        out_ref[2, :] = m_s2


def _pad_b(desc_b, valid_b, tile_b):
    Kb = desc_b.shape[-2]
    pad = (-Kb) % tile_b
    if pad:
        width = [(0, 0)] * (desc_b.ndim - 2) + [(0, pad), (0, 0)]
        desc_b = jnp.pad(desc_b, width)
        valid_b = jnp.pad(valid_b, [(0, 0)] * (valid_b.ndim - 1) + [(0, pad)])
    return desc_b, valid_b


@partial(jax.jit, static_argnames=("interpret",))
def topk2_scores(
    desc_a: jnp.ndarray,   # (Ka, D)
    desc_b: jnp.ndarray,   # (Kb, D)
    valid_b: jnp.ndarray,  # (Kb,) bool
    interpret: bool | None = None,
):
    """Per-query best-match index + top-2 scores. Ka must be padded to a
    TILE_A multiple by the caller (sfm front end emits power-of-two K);
    Kb is padded to a TILE_B multiple here (padding marked invalid)."""
    Ka, D = desc_a.shape
    if Ka % TILE_A:
        pad = TILE_A - Ka % TILE_A
        desc_a = jnp.pad(desc_a, ((0, pad), (0, 0)))
    tile_b = _tile_b_for(desc_b.shape[0])
    desc_b, valid_b = _pad_b(desc_b, valid_b, tile_b)
    Kb = desc_b.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_a = desc_a.shape[0] // TILE_A
    n_b = Kb // tile_b

    out = pl.pallas_call(
        partial(_matcher_kernel, tile_b),
        grid=(n_a, n_b),
        in_specs=[
            pl.BlockSpec((TILE_A, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_b), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_A), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, desc_a.shape[0]), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * desc_a.shape[0] * Kb * D,
            bytes_accessed=(desc_a.shape[0] * D * n_b + Kb * D) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        desc_a, desc_b,
        jnp.broadcast_to(valid_b.astype(jnp.int32)[None, :], (8, Kb)),
    )
    return out[0, :Ka].astype(jnp.int32), out[1:3, :Ka].T


def _matcher_kernel_batched(tile_b, a_ref, b_ref, validb_ref, out_ref):
    # identical math to _matcher_kernel; refs carry a leading pair dim of 1
    j = pl.program_id(2)
    i1, s1, s2 = _tile_top2(a_ref[0], b_ref[0], validb_ref[0, 0, :])
    i1 = i1 + j * tile_b

    @pl.when(j == 0)
    def _init():
        out_ref[0, 0, :] = i1.astype(jnp.float32)
        out_ref[0, 1, :] = s1
        out_ref[0, 2, :] = s2

    @pl.when(j > 0)
    def _merge():
        m_i1, m_s1, m_s2 = _merge_top2(
            out_ref[0, 0, :].astype(jnp.int32), out_ref[0, 1, :],
            out_ref[0, 2, :], i1, s1, s2,
        )
        out_ref[0, 0, :] = m_i1.astype(jnp.float32)
        out_ref[0, 1, :] = m_s1
        out_ref[0, 2, :] = m_s2


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
    pad = (-Ka) % TILE_A
    if pad:
        desc_a = jnp.pad(desc_a, ((0, 0), (0, pad), (0, 0)))
    tile_b = _tile_b_for(desc_b.shape[1])
    desc_b, valid_b = _pad_b(desc_b, valid_b, tile_b)
    Kb = desc_b.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_a = desc_a.shape[1] // TILE_A
    n_b = Kb // tile_b

    out = pl.pallas_call(
        partial(_matcher_kernel_batched, tile_b),
        grid=(P, n_a, n_b),
        in_specs=[
            pl.BlockSpec((1, TILE_A, D), lambda p, i, j: (p, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, D), lambda p, i, j: (p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_b), lambda p, i, j: (p, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_A), lambda p, i, j: (p, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, 8, desc_a.shape[1]), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * desc_a.shape[1] * Kb * D,
            bytes_accessed=P * (desc_a.shape[1] * D * n_b + Kb * D) * 4,
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
