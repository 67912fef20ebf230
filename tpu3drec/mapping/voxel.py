"""Device-side voxelization and dedup.

TPU-native replacement for octomap's per-point C++ ``updateNode`` insertion
loop (`ref/octomap/txt_transfer_octomap.py:16-36`,
`ref/octomap/ply_transfer_octomap.py:16-40` — millions of serial tree
inserts, hard-capped at 5.4M points). Here the map update is data-parallel:
points -> integer voxel keys -> sort -> first-occurrence mask, all inside one
jit with static shapes; only the final compaction (boolean gather) runs on
host where dynamic shapes are free.

Key convention matches octomap depth-16 trees: ``k = floor(p / res)`` stored
signed; the writer adds the 2^15 offset (``tree_max_val``) when emitting
``.bt`` (see `mapping/btio.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# octomap key offset for depth-16 trees: coordToKey adds tree_max_val = 2^15.
KEY_OFFSET = 1 << 15


@partial(jax.jit, static_argnames=())
def voxelize(points: jnp.ndarray, res: jnp.ndarray | float) -> jnp.ndarray:
    """World points (N, 3) -> signed int32 voxel keys (N, 3): floor(p/res)."""
    return jnp.floor(points / res).astype(jnp.int32)


def _pack_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int32 keys (16-bit range after offset) -> one uint32-pair sort
    key packed as (hi, lo) to avoid int64 (disabled by default in JAX)."""
    k = (keys + KEY_OFFSET).astype(jnp.uint32)  # 16 bits each
    hi = k[:, 2]  # z
    lo = (k[:, 1] << 16) | k[:, 0]  # y | x
    return hi, lo


@jax.jit
def unique_voxels(keys: jnp.ndarray, valid: jnp.ndarray):
    """Sort voxel keys and flag first occurrences.

    Args:
      keys: (N, 3) int32 voxel keys.
      valid: (N,) bool; invalid entries sort to the end and are masked out.

    Returns:
      sorted_keys: (N, 3) int32, valid-unique keys first (static shape).
      unique_mask: (N,) bool, True at the first occurrence of each valid key.
      count: () int32 number of unique valid voxels.

    This is the static-shape idiom for ``jnp.unique`` (whose output size is
    data-dependent and so unusable under jit): downstream code either keeps
    the mask or compacts on host.
    """
    hi, lo = _pack_keys(keys)
    # Invalid points get the maximal key so they sort last.
    inval = ~valid
    hi = jnp.where(inval, jnp.uint32(0xFFFFFFFF), hi)
    lo = jnp.where(inval, jnp.uint32(0xFFFFFFFF), lo)
    # Single lax.sort; the sort keys ARE the packed voxel keys, so the
    # original columns are decoded from (shi, slo) afterwards instead of
    # riding as payload operands — 3 sorted operands instead of 6 (sort
    # cost scales with operand bytes), and no permutation-gathers anywhere
    # (gathers are the slow path on TPU).
    shi, slo, svalid = jax.lax.sort((hi, lo, valid), num_keys=2)
    off = jnp.int32(KEY_OFFSET)
    skeys = jnp.stack(
        [
            (slo & jnp.uint32(0xFFFF)).astype(jnp.int32) - off,
            (slo >> 16).astype(jnp.int32) - off,
            shi.astype(jnp.int32) - off,
        ],
        axis=-1,
    )
    first = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
        ]
    )
    unique_mask = first & svalid
    return skeys, unique_mask, jnp.sum(unique_mask, dtype=jnp.int32)


def voxel_centers(keys: jnp.ndarray, res) -> jnp.ndarray:
    """Voxel keys -> center coordinates: (k + 0.5) * res (octomap keyToCoord
    semantics modulo the offset handled at write time)."""
    return (keys.astype(jnp.float32) + 0.5) * res


def dedup_voxels_host(points: np.ndarray, res: float, valid: np.ndarray | None = None) -> np.ndarray:
    """Full pipeline -> compact (M, 3) int32 unique voxel keys on host.

    Device does voxelize+sort+mask; host does the single boolean gather.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    if valid is None:
        valid = jnp.ones((points.shape[0],), dtype=bool)
    else:
        valid = jnp.asarray(valid)
    keys = voxelize(points, res)
    skeys, mask, _ = unique_voxels(keys, valid)
    skeys, mask = np.asarray(skeys), np.asarray(mask)
    return skeys[mask]
