"""Loop-closure detection: the vocab-tree capability, TPU-style.

The reference's COLMAP workflow runs "sequential matching + loop detection
with vocab tree" (`ref/software_record/colmap使用.docx` §2.3, SURVEY.md C3).
Here detection is two batched device dispatches instead of a tree:

1. **Candidate proposal**: one global-descriptor per frame (L2-normalized
   mean of its local descriptors) -> the full (F, F) cosine-similarity
   matrix is a single matmul; pairs above a similarity threshold with
   |i - j| >= min_gap become candidates.
2. **Geometric verification**: all candidate pairs matched in one batched
   matcher dispatch (Pallas kernel on TPU); pairs with enough mutual-NN
   matches get a two-view relative pose (batched RANSAC); enough inliers =
   a confirmed closure.

The confirmed (i, j, R_rel, t_dir, n_inliers) closures feed pose-graph
edges (`pipelines/kitti.py` scales t_dir by the current estimate — bearing
and rotation are measured, monocular magnitude is not).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.sfm.matching import match_pairs
from tpu3drec.sfm.twoview import estimate_relative_pose


class LoopClosure(NamedTuple):
    i: int
    j: int
    R_rel: np.ndarray   # (3,3) frame_i -> frame_j camera rotation
    t_dir: np.ndarray   # (3,) unit translation direction (scale unknown)
    n_inliers: int
    uv_i: np.ndarray    # (M,2) inlier pixel coords in frame i — kept so
    uv_j: np.ndarray    # (M,2) downstream consumers can triangulate and,
                        # with metric depth, recover the translation
                        # MAGNITUDE (pipelines/kitti.py metric closures)


def global_descriptors(descs: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """(F, K, D) local descriptors -> (F, D) L2-normalized mean pooling."""
    w = valids.astype(descs.dtype)[..., None]
    g = jnp.sum(descs * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


def propose_candidates(
    descs: jnp.ndarray, valids: jnp.ndarray,
    min_gap: int = 10, sim_threshold: float = 0.85, max_candidates: int = 64,
) -> np.ndarray:
    """(P, 2) candidate frame pairs by global-descriptor similarity."""
    g = global_descriptors(descs, valids)
    S = np.asarray(g @ g.T)
    F = S.shape[0]
    ii, jj = np.triu_indices(F, k=min_gap)
    sims = S[ii, jj]
    order = np.argsort(-sims)
    keep = order[sims[order] >= sim_threshold][:max_candidates]
    return np.stack([ii[keep], jj[keep]], axis=1).astype(np.int32)


def detect_loop_closures(
    descs: jnp.ndarray,       # (F, K, D)
    valids: jnp.ndarray,      # (F, K)
    keypoints: np.ndarray,    # (F, K, 2)
    K_mat: np.ndarray,
    min_gap: int = 10,
    sim_threshold: float = 0.85,
    min_matches: int = 20,
    min_inliers: int = 15,
    ratio: float = 0.85,
    seed: int = 0,
) -> list[LoopClosure]:
    """Full detection pipeline; returns geometrically verified closures."""
    cands = propose_candidates(descs, valids, min_gap=min_gap,
                               sim_threshold=sim_threshold)
    if len(cands) == 0:
        return []
    m = match_pairs(descs, valids, jnp.asarray(cands), ratio=ratio)
    m_valid = np.asarray(m.valid)
    m_ia = np.asarray(m.idx_a)
    m_ib = np.asarray(m.idx_b)

    closures = []
    rngs = jax.random.split(jax.random.PRNGKey(seed), len(cands))
    Kj = jnp.asarray(K_mat)
    Kp = descs.shape[1]
    for p, (i, j) in enumerate(cands):
        sel = m_valid[p]
        if sel.sum() < min_matches:
            continue
        uv1 = np.zeros((Kp, 2), np.float32)
        uv2 = np.zeros((Kp, 2), np.float32)
        vm = np.zeros(Kp, bool)
        n = int(sel.sum())
        uv1[:n] = keypoints[i][m_ia[p][sel]]
        uv2[:n] = keypoints[j][m_ib[p][sel]]
        vm[:n] = True
        tv = estimate_relative_pose(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(vm), Kj, rngs[p]
        )
        if int(tv.n_inliers) >= min_inliers:
            inl = np.asarray(tv.inliers) & vm
            closures.append(LoopClosure(
                i=int(i), j=int(j),
                R_rel=np.asarray(tv.R), t_dir=np.asarray(tv.t),
                n_inliers=int(tv.n_inliers),
                uv_i=uv1[inl].copy(), uv_j=uv2[inl].copy(),
            ))
    return closures
