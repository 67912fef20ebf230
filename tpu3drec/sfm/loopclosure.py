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

from functools import partial
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
    """(F, K, D) local descriptors -> (F, D) L2-normalized mean pooling.
    Baseline retrieval descriptor; `vlad_descriptors` is the production
    one (mean pooling washes out word-level structure on repeated
    real-world texture — VERDICT r1 weak-item 2)."""
    w = valids.astype(descs.dtype)[..., None]
    g = jnp.sum(descs * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("n_words", "iters"))
def fit_codebook(
    descs: jnp.ndarray, valids: jnp.ndarray,
    n_words: int = 32, iters: int = 10, seed: int = 0,
) -> jnp.ndarray:
    """K-means visual vocabulary from the sequence's own descriptors —
    the vocab-tree stage of the reference workflow
    (`ref/software_record/colmap使用.docx` §2.3) as Lloyd iterations of
    two matmuls (assign = argmax similarity on the MXU, update = one-hot
    matmul), no external vocabulary file. Returns (V, D) centroids."""
    F, K, D = descs.shape
    X = descs.reshape(F * K, D)
    w = valids.reshape(F * K).astype(descs.dtype)
    # seed centroids from a strided sample of valid-ish rows
    idx = (jnp.arange(n_words) * (F * K // n_words)).astype(jnp.int32)
    C0 = X[idx]

    def step(C, _):
        sim = jax.lax.dot_general(
            X, C, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)        # (N, V)
        assign = jnp.argmax(sim, axis=1)
        onehot = (assign[:, None] ==
                  jnp.arange(n_words)[None]).astype(descs.dtype) * w[:, None]
        sums = jax.lax.dot_general(
            onehot, X, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)        # (V, D)
        counts = jnp.sum(onehot, axis=0)[:, None]
        Cn = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), C)
        Cn = Cn / jnp.maximum(
            jnp.linalg.norm(Cn, axis=1, keepdims=True), 1e-12)
        return Cn, None

    C, _ = jax.lax.scan(step, C0, None, length=iters)
    return C


@jax.jit
def vlad_descriptors(
    descs: jnp.ndarray, valids: jnp.ndarray, codebook: jnp.ndarray,
) -> jnp.ndarray:
    """(F, K, D) -> (F, V*D) VLAD global descriptors (Jegou et al. 2010):
    per visual word, the sum of residuals of the descriptors assigned to
    it, with intra-word L2 + signed-sqrt power normalization. Assignment
    and accumulation are both matmuls — no scatters. Far more
    discriminative than mean pooling on repeated structure: two frames
    must agree on WHICH words they see AND where the descriptors sit
    within each word's cell."""
    V, D = codebook.shape

    def one(d, v):
        w = v.astype(d.dtype)
        sim = jax.lax.dot_general(
            d, codebook, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)        # (K, V)
        assign = jnp.argmax(sim, axis=1)
        onehot = (assign[:, None] ==
                  jnp.arange(V)[None]).astype(d.dtype) * w[:, None]  # (K,V)
        # residual sums: sum_k onehot[k,v] * (d[k] - c[v])
        sums = jax.lax.dot_general(
            onehot, d, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)        # (V, D)
        counts = jnp.sum(onehot, axis=0)[:, None]
        vlad = sums - counts * codebook
        # intra-normalization (Arandjelovic & Zisserman 2013) kills
        # burstiness; then signed sqrt + global L2
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=1, keepdims=True), 1e-12)
        flat = vlad.reshape(-1)
        flat = jnp.sign(flat) * jnp.sqrt(jnp.abs(flat))
        return flat / jnp.maximum(jnp.linalg.norm(flat), 1e-12)

    return jax.vmap(one)(descs, valids)


def propose_candidates(
    descs: jnp.ndarray, valids: jnp.ndarray,
    min_gap: int = 10, sim_threshold: float = 0.85, max_candidates: int = 64,
    method: str = "mean", vlad_threshold: float = 0.35, n_words: int = 32,
    per_frame: int = 3,
) -> np.ndarray:
    """(P, 2) candidate frame pairs by global-descriptor similarity.

    method="mean" (default): L2-normalized mean pooling — the behavior the
    windowed-pipeline accuracy bounds are calibrated against.
    method="vlad": sequence-local k-means vocabulary + VLAD with
    intra-norm/power-norm — measurably wider revisit-vs-unrelated margins
    (tests), recommended for repeated-structure scenes; its cosines of
    unrelated views sit near 0 so `vlad_threshold` is much lower than the
    mean-pool gate. Not yet the pipeline default: on one occluded-orbit
    fixture its (better-separated) candidate ranking surfaces different
    verified closures, and the monocular relocalization of a
    split-sequence tail is anchor-set-sensitive (ROUND_NOTES round 2).

    Selection is PER-QUERY (COLMAP vocab-tree matching style: every image
    retrieves its own top partners): each frame contributes its best
    `per_frame` above-threshold partners, then the union is ranked by
    similarity and capped at `max_candidates`. A global top-P cut lets a
    cluster of mutually-similar mid-sequence views crowd out the
    weaker-but-true revisit pairs of OTHER frames (measured on the
    occluded orbit: the end-of-loop closures fell off the cap —
    redundant revisit edges are what lets the pose graph distribute the
    loop error)."""
    if method == "vlad":
        cb = fit_codebook(descs, valids, n_words=n_words)
        g = vlad_descriptors(descs, valids, cb)
        thresh = vlad_threshold
    else:
        g = global_descriptors(descs, valids)
        thresh = sim_threshold
    S = np.asarray(jnp.einsum("id,jd->ij", g, g,
                              precision=jax.lax.Precision.HIGHEST))
    F = S.shape[0]
    # mask the |i-j| < min_gap band, keep i < j
    mask = np.triu(np.ones((F, F), bool), k=min_gap)
    S_m = np.where(mask, S, -np.inf)
    cand = set()
    k = min(per_frame, F)
    # per-query winners in BOTH directions (a frame is query for partners
    # ahead of it via rows, behind it via columns)
    for A in (S_m, S_m.T):
        top = np.argpartition(-A, kth=k - 1, axis=1)[:, :k]
        for i in range(F):
            for j in top[i]:
                s = A[i, j]
                if s >= thresh:
                    cand.add((min(i, int(j)), max(i, int(j)), float(s)))
    if not cand:
        return np.zeros((0, 2), np.int32)
    ranked = sorted(cand, key=lambda x: -x[2])[:max_candidates]
    return np.asarray([(i, j) for i, j, _ in ranked], np.int32)


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
    method: str = "mean",
    vlad_threshold: float = 0.35,
) -> list[LoopClosure]:
    """Full detection pipeline; returns geometrically verified closures."""
    cands = propose_candidates(descs, valids, min_gap=min_gap,
                               sim_threshold=sim_threshold, method=method,
                               vlad_threshold=vlad_threshold)
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
