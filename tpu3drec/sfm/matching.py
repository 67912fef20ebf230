"""Descriptor matching: mutual nearest neighbors + Lowe ratio test.

TPU-native replacement for COLMAP's sequential matcher (reference workflow
`ref/software_record/colmap使用.docx` §2.3: sequential matching + vocab-tree
loop detection). The score matrix is one (K, K) matmul on the MXU; top-2 and
mutual checks are static-shape reductions, so the whole matcher vmaps over
image pairs and shards over the `data` mesh axis. A fused Pallas kernel for
the large-K regime (no K x K HBM materialization) lives in
`tpu3drec/ops/matcher.py`; this module is the reference implementation and
dispatch point.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    idx_a: jnp.ndarray   # (M,) indices into A's keypoints
    idx_b: jnp.ndarray   # (M,) indices into B's keypoints
    score: jnp.ndarray   # (M,) similarity of accepted match
    valid: jnp.ndarray   # (M,) bool


@partial(jax.jit, static_argnames=("ratio", "use_pallas"))
def match_descriptors(
    desc_a: jnp.ndarray,   # (Ka, D) L2-normalized
    desc_b: jnp.ndarray,   # (Kb, D)
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    ratio: float = 0.8,
    use_pallas: bool = False,
) -> Matches:
    """Mutual-NN matches with ratio test; one row per A keypoint (static
    shape), invalid rows masked. Similarity = dot product (descriptors are
    unit-norm, so argmax similarity == argmin L2 distance)."""
    if valid_a is None:
        valid_a = jnp.ones(desc_a.shape[0], dtype=bool)
    if valid_b is None:
        valid_b = jnp.ones(desc_b.shape[0], dtype=bool)

    if use_pallas:
        from tpu3drec.ops.matcher import topk2_scores

        best_b, top2 = topk2_scores(desc_a, desc_b, valid_b)
        best_a_of_b, _ = topk2_scores(desc_b, desc_a, valid_a)
        s1 = top2[:, 0]
        s2 = top2[:, 1]
    else:
        # precision="highest": preferred_element_type only sets accumulation
        # dtype; without HIGHEST the bf16 input passes flip top-k/argmax
        # match results on TPU (docs/design.md §6.2).
        scores = jnp.dot(desc_a, desc_b.T, precision="highest",
                         preferred_element_type=jnp.float32)
        scores = jnp.where(valid_b[None, :], scores, -jnp.inf)
        top2, top2_idx = jax.lax.top_k(scores, 2)
        best_b = top2_idx[:, 0]
        s1, s2 = top2[:, 0], top2[:, 1]
        scores_t = jnp.where(valid_a[None, :], scores.T, -jnp.inf)
        best_a_of_b = jnp.argmax(scores_t, axis=1)

    mutual = best_a_of_b[best_b] == jnp.arange(desc_a.shape[0])
    # ratio test in distance space: d^2 = 2 - 2s for unit vectors
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s2, 0.0))
    ratio_ok = d1 < ratio * d2
    ok = mutual & ratio_ok & valid_a & jnp.isfinite(s1)
    return Matches(
        idx_a=jnp.arange(desc_a.shape[0], dtype=jnp.int32),
        idx_b=best_b.astype(jnp.int32),
        score=jnp.where(ok, s1, 0.0),
        valid=ok,
    )


def match_pairs(descs: jnp.ndarray, valids: jnp.ndarray, pairs: jnp.ndarray,
                ratio: float = 0.8, use_pallas: bool | None = None) -> Matches:
    """Batched matching over image pairs: descs (F, K, D), pairs (P, 2)
    index rows -> one big device dispatch for a whole sequence.

    On TPU the fused Pallas kernel is the default: the XLA formulation
    materializes a (P, K, K) score tensor in HBM (1.6 GB at P=24, K=4096 —
    measured 218 ms vs 7 ms for the kernel); off-TPU the vmapped XLA path
    runs."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _match_pairs_pallas(descs, valids, pairs, ratio)

    def one(pair):
        i, j = pair[0], pair[1]
        return match_descriptors(descs[i], descs[j], valids[i], valids[j], ratio=ratio)

    return jax.vmap(one)(pairs)


@partial(jax.jit, static_argnames=("ratio",))
def _match_pairs_pallas(descs, valids, pairs, ratio: float) -> Matches:
    from tpu3drec.ops.matcher import topk2_scores_batched

    K = descs.shape[1]
    A = descs[pairs[:, 0]]
    B = descs[pairs[:, 1]]
    vA = valids[pairs[:, 0]]
    vB = valids[pairs[:, 1]]
    best_b, top2 = topk2_scores_batched(A, B, vB)
    best_a_of_b, _ = topk2_scores_batched(B, A, vA)
    s1 = top2[..., 0]
    s2 = top2[..., 1]
    mutual = (
        jnp.take_along_axis(best_a_of_b, best_b, axis=1)
        == jnp.arange(K)[None, :]
    )
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s2, 0.0))
    ok = mutual & (d1 < ratio * d2) & vA & (s1 > -2.0)
    return Matches(
        idx_a=jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], best_b.shape),
        idx_b=best_b.astype(jnp.int32),
        score=jnp.where(ok, s1, 0.0),
        valid=ok,
    )


@partial(jax.jit, static_argnames=("band_px", "ratio", "min_sim"))
def guided_match_pairs(
    descs: jnp.ndarray,   # (F, K, D) L2-normalized
    valids: jnp.ndarray,  # (F, K)
    xy: jnp.ndarray,      # (F, K, 2) pixel coords
    pairs: jnp.ndarray,   # (P, 2)
    Es: jnp.ndarray,      # (P, 3, 3) essential matrices (x2^T E x1 = 0,
                          # normalized coords — estimate_relative_pose's)
    K_mat: jnp.ndarray,   # (3, 3) intrinsics
    band_px: float = 3.0,
    ratio: float = 0.9,
    min_sim: float = 0.95,
) -> Matches:
    """COLMAP-style guided matching: re-match each verified pair with its
    epipolar constraint (`ref/software_record/colmap使用.docx` §2.3's
    guided matching stage). Candidates outside the Sampson band are masked
    out of the score matrix BEFORE mutual-NN + ratio, so the ratio test
    only competes hypotheses that are geometrically possible — on
    low-texture / repetitive scenes this recovers the matches the global
    ratio test rejects (measured: 40 -> 100+ matches/pair in the
    city-block dead zones that broke 500-frame stitching).

    ``min_sim`` is load-bearing for precision: banding removes the global
    competition that the ratio test relies on, so an occluded keypoint
    happily takes whatever lies on its epipolar line. Measured on the
    occluded-orbit arena (GT-checked, 78 pairs): guided precision by
    cosine-similarity bin is 0.21 @ [0.80,0.85), 0.38 @ [0.85,0.90),
    0.57 @ [0.90,0.95), 0.87 @ [0.95,1.0] vs 0.935 for RANSAC inliers.
    The floor keeps only the last bin; wrong matches below it merge
    unrelated tracks, which the duplicate-frame filter then prunes —
    the round-3 coverage-collapse mechanism.

    All pairs batch in one dispatch: scores are (P, K, K) MXU matmuls, the
    Sampson field is a broadcast quadratic around them."""
    fx = K_mat[0, 0]
    fy = K_mat[1, 1]
    thresh = (band_px / fx) ** 2

    def norm_h(uv):
        x = (uv[..., 0] - K_mat[0, 2]) / fx
        y = (uv[..., 1] - K_mat[1, 2]) / fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def one(pair, E):
        i, j = pair[0], pair[1]
        da, db = descs[i], descs[j]
        va, vb = valids[i], valids[j]
        h1 = norm_h(xy[i])   # (K, 3)
        h2 = norm_h(xy[j])
        # Sampson field over all (a, b): numer = (h2_b^T E h1_a)^2
        l2 = h1 @ E.T        # (K, 3): epipolar line of a in image 2
        l1 = h2 @ E          # (K, 3): epipolar line of b in image 1
        numer = (l2 @ h2.T) ** 2                      # (Ka, Kb)
        denom = (l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None] + \
                (l1[:, 0] ** 2 + l1[:, 1] ** 2)[None, :]
        samp = numer / jnp.maximum(denom, 1e-12)
        in_band = samp < thresh

        scores = jnp.dot(da, db.T, precision="highest",
                         preferred_element_type=jnp.float32)
        scores = jnp.where(in_band & vb[None, :], scores, -jnp.inf)
        top2, top2_idx = jax.lax.top_k(scores, 2)
        best_b = top2_idx[:, 0]
        s1, s2 = top2[:, 0], top2[:, 1]
        best_a_of_b = jnp.argmax(
            jnp.where(va[None, :], scores.T, -jnp.inf), axis=1)
        mutual = best_a_of_b[best_b] == jnp.arange(da.shape[0])
        d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
        d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s2, 0.0))
        # a single in-band candidate has s2 = -inf -> d2 = 2 (max distance
        # for unit vectors): the ratio test passes automatically, which is
        # the point — along the epipolar line there is nothing to confuse
        # it with
        ratio_ok = d1 < ratio * jnp.minimum(d2, 2.0)
        ok = mutual & ratio_ok & va & jnp.isfinite(s1) & (s1 >= min_sim)
        return Matches(
            idx_a=jnp.arange(da.shape[0], dtype=jnp.int32),
            idx_b=best_b.astype(jnp.int32),
            score=jnp.where(ok, s1, 0.0),
            valid=ok,
        )

    return jax.vmap(one)(pairs, Es)


def sequential_pairs(n_frames: int, overlap: int = 3) -> jnp.ndarray:
    """COLMAP sequential-matching pair list: each frame vs the next
    `overlap` frames (the reference's matching mode, colmap使用.docx §2.3)."""
    pairs = [
        (i, j)
        for i in range(n_frames)
        for j in range(i + 1, min(i + 1 + overlap, n_frames))
    ]
    return jnp.asarray(pairs, dtype=jnp.int32)
