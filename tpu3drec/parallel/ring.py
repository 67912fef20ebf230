"""Ring collectives over sharded point buffers.

The TPU-native analogue of sequence parallelism for this workload
(SURVEY.md §5.7): the long axis is points-per-cloud / map blocks, sharded
over the mesh `space` axis. Nearest-neighbor search for ICP runs as a ring:
each step every device searches its resident reference shard, then
`ppermute`s the shard to its ring neighbor — after D steps every query saw
every reference point, with per-step compute overlapping the ICI transfer
and peak memory 1/D of the full cloud.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu3drec.sfm.icp import pairwise_sqdist


def ring_nearest_neighbors(
    query: jnp.ndarray,   # (Nq, 3) sharded over `axis`
    ref: jnp.ndarray,     # (Nr, 3) sharded over `axis`
    mesh: Mesh,
    axis: str = "space",
):
    """Global NN search with both clouds sharded: returns (idx (Nq,) into the
    global ref array, d2 (Nq,)), sharded like query."""
    D = mesh.shape[axis]
    perm = [(j, (j + 1) % D) for j in range(D)]

    def local_fn(q, r):
        # q (nq,3) local queries; r (nr,3) local ref shard
        nq = q.shape[0]
        nr = r.shape[0]
        my = jax.lax.axis_index(axis)

        def step(carry, k):
            best_d, best_i, r_cur = carry
            # r_cur originated on device (my - k) mod D
            src = (my - k) % D
            d = pairwise_sqdist(q, r_cur)
            dmin = jnp.min(d, axis=1)
            amin = jnp.argmin(d, axis=1).astype(jnp.int32) + src * nr
            take = dmin < best_d
            best_d = jnp.where(take, dmin, best_d)
            best_i = jnp.where(take, amin, best_i)
            r_next = jax.lax.ppermute(r_cur, axis, perm)
            return (best_d, best_i, r_next), None

        # mark the fresh carries as device-varying (new shard_map typing)
        init = (
            jax.lax.pvary(jnp.full((nq,), jnp.inf, q.dtype), axis),
            jax.lax.pvary(jnp.zeros((nq,), jnp.int32), axis),
            r,
        )
        (best_d, best_i, _), _ = jax.lax.scan(
            step, init, jnp.arange(D), length=D
        )
        return best_i, best_d

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return fn(query, ref)


def sharded_voxel_count(
    keys: jnp.ndarray,    # (N, 3) int32 voxel keys, sharded over `axis`
    valid: jnp.ndarray,   # (N,) bool
    mesh: Mesh,
    axis: str = "space",
):
    """Global unique-voxel count with the point buffer sharded: each device
    dedups its shard, shards exchange their unique key sets via all_gather,
    and cross-shard duplicates are discounted on the lowest-index owner.
    Demonstrates the hierarchical-dedup pattern the octree fusion uses."""
    from tpu3drec.mapping.voxel import _pack_keys

    def local_fn(k, v):
        hi, lo = _pack_keys(k)
        inval = ~v[:, 0]
        hi = jnp.where(inval, jnp.uint32(0xFFFFFFFF), hi)
        lo = jnp.where(inval, jnp.uint32(0xFFFFFFFF), lo)
        shi, slo, sval = jax.lax.sort((hi, lo, v[:, 0]), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
        )
        mask = first & sval
        # gather every shard's (packed) unique sets and de-duplicate across
        # shards: a key counts for this shard only if no lower-ranked shard
        # also has it
        my = jax.lax.axis_index(axis)
        sentinel = jnp.uint32(0xFFFFFFFF)
        all_hi = jax.lax.all_gather(jnp.where(mask, shi, sentinel), axis)
        all_lo = jax.lax.all_gather(jnp.where(mask, slo, sentinel), axis)
        mine_hi = jnp.where(mask, shi, sentinel)
        mine_lo = jnp.where(mask, slo, sentinel)

        def owned_elsewhere(shard_idx, acc):
            dup = (mine_hi[:, None] == all_hi[shard_idx][None, :]) & (
                mine_lo[:, None] == all_lo[shard_idx][None, :]
            )
            has = jnp.any(dup, axis=1) & (shard_idx < my) & mask
            return acc | has

        stolen = jax.lax.fori_loop(
            0, all_hi.shape[0], owned_elsewhere, jnp.zeros_like(mask)
        )
        count = jnp.sum(mask & ~stolen, dtype=jnp.int32)
        return jax.lax.psum(count, axis)[None]

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    return fn(keys, valid[:, None])[0]
