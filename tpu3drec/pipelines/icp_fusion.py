"""ICP scale-corrected cloud fusion — reference configuration 2.

Applies a 4x4 metric-scale-correction transform T (historically produced by
an offline open3d ICP run, consumed from ``T_data.txt``) to cloud B and
merges it with cloud A — the behavior of `ref/other_tools/transfer_T_icp.py:99-110`.
Unlike the reference this accepts T from our own in-graph ICP
(`tpu3drec/sfm/icp.py`) as well as from file, and applies it on device in one
batched op instead of a per-point Python loop
(`ref/other_tools/transfer_T_icp.py:71-97`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.core.se3 import SE3, se3_apply
from tpu3drec.utils.plyio import write_ply
from tpu3drec.utils.poseio import read_T_txt


@jax.jit
def apply_T(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 4x4 applied to (N, 3) points on device."""
    return se3_apply(SE3.from_matrix(T), points)


def fuse_with_T(
    cloud_a: np.ndarray, cloud_b: np.ndarray, T: np.ndarray
) -> np.ndarray:
    """Cloud A verbatim + T-transformed cloud B, merged (reference flag
    semantics: flag=False leaves A fixed, flag=True applies T to B)."""
    b = np.asarray(apply_T(jnp.asarray(cloud_b, dtype=jnp.float32),
                           jnp.asarray(T, dtype=jnp.float32)))
    return np.concatenate([np.asarray(cloud_a, dtype=np.float32), b], axis=0)


def run(cloud_a: np.ndarray, cloud_b: np.ndarray, t_path: str, out_ply: str) -> int:
    """File-level driver matching `transfer_T_icp.py:99-110`."""
    T = read_T_txt(t_path)
    merged = fuse_with_T(cloud_a, cloud_b, T)
    write_ply(out_ply, merged)
    return merged.shape[0]
