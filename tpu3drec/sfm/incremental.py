"""Incremental SfM driver: the COLMAP-replacement reconstruction loop.

Replaces the reference's manual COLMAP GUI workflow (SURVEY.md C3;
`ref/software_record/colmap使用.docx`: SIFT extract -> sequential match ->
incremental reconstruction -> export txt) with one callable. Architecture
per SURVEY.md §7 "hard parts": the outer view-registration loop is host
Python (inherently sequential, tiny), while every numeric stage inside is
a batched device dispatch — detection/description over all frames at once,
all pair matches in one vmap, RANSAC hypothesis batches, BA with
observation arrays.

Track building uses a host union-find over keypoint matches (dynamic
structure, negligible cost next to device work).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.core.se3 import axis_angle_to_matrix, matrix_to_axis_angle
from tpu3drec.sfm.ba import BAProblem, ba_solve
from tpu3drec.sfm.features import detect_and_describe
from tpu3drec.sfm.matching import (
    guided_match_pairs,
    match_pairs,
    sequential_pairs,
)
from tpu3drec.sfm.pnp import pnp_ransac
from tpu3drec.sfm.triangulate import (
    reprojection_errors_np,
    triangulate_two_view_np,
)
from tpu3drec.sfm.twoview import estimate_relative_pose


@dataclass
class Reconstruction:
    """Host-side reconstruction state."""

    K: np.ndarray
    poses: dict = field(default_factory=dict)      # frame -> (R, t) world->cam
    points: dict = field(default_factory=dict)     # track id -> (3,) world
    tracks: dict = field(default_factory=dict)     # track id -> {frame: kp_idx}
    keypoints: np.ndarray | None = None            # (F, Kp, 2)
    scale_anchor: int = 1                          # frame whose translation fixes scale

    def registered_frames(self):
        return sorted(self.poses.keys())

    def cameras_as_params(self):
        frames = self.registered_frames()
        out = np.zeros((len(frames), 6), np.float32)
        for i, f in enumerate(frames):
            R, t = self.poses[f]
            out[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
            out[i, 3:] = t
        return frames, out


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(pair_matches: dict) -> dict:
    """{(i, j): (idx_a, idx_b)} keypoint matches -> {track: {frame: kp}}.
    Tracks with conflicting observations (two kps of one frame) are dropped."""
    uf = _UnionFind()
    for (i, j), (ia, ib) in pair_matches.items():
        for a, b in zip(ia, ib):
            uf.union((i, int(a)), (j, int(b)))
    groups = {}
    for node in list(uf.parent):
        groups.setdefault(uf.find(node), []).append(node)
    tracks = {}
    tid = 0
    for members in groups.values():
        if len(members) < 2:
            continue
        frames = [f for f, _ in members]
        if len(set(frames)) != len(frames):
            # same-frame conflict: drop only the conflicting frames'
            # observations, not the whole track (dropping whole tracks
            # preferentially destroys the strongest features — any residual
            # cross-octave duplicate of a good feature lands here)
            from collections import Counter

            counts = Counter(frames)
            members = [(f, k) for f, k in members if counts[f] == 1]
            if len(members) < 2:
                continue
        tracks[tid] = {f: k for f, k in members}
        tid += 1
    return tracks


def _median_triangulation_angle_deg(K, R, t, uv1, uv2) -> float:
    """Median ray-intersection angle (degrees) of the two-view
    triangulations of (uv1, uv2) under pose (R, t) with unit baseline —
    COLMAP's init-pair parallax criterion (colmap使用.docx §2.4,
    `init_min_tri_angle`). Points behind either camera are excluded."""
    if len(uv1) == 0:
        return 0.0
    K = np.asarray(K, np.float64)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, np.reshape(t, (3, 1))])
    X = np.asarray(triangulate_two_view_np(P1, P2, uv1, uv2), np.float64)
    Xc2 = X @ np.asarray(R, np.float64).T + np.asarray(t, np.float64)
    ok = (X[:, 2] > 1e-6) & (Xc2[:, 2] > 1e-6)
    if ok.sum() < 4:
        return 0.0
    d1 = X[ok]
    d2 = X[ok] - (-np.asarray(R, np.float64).T @ np.asarray(t, np.float64))
    cos = np.sum(d1 * d2, axis=1) / np.maximum(
        np.linalg.norm(d1, axis=1) * np.linalg.norm(d2, axis=1), 1e-12)
    ang = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    return float(np.median(ang))


def run_sfm(
    images: np.ndarray,          # (F, H, W) grayscale float [0,1]
    K: np.ndarray,
    max_keypoints: int = 512,
    overlap: int = 3,
    ba_every: int = 3,
    min_track_len: int = 2,
    seed: int = 0,
    upright: bool = True,
    ratio: float = 0.85,
    depth_maps: np.ndarray | None = None,  # (F,H,W) metric depth: BA gets
                                           # per-obs depth priors -> metric
                                           # reconstruction (0 = no return)
    depth_weight: float = 2.0,
    guided_min_inliers: int = 40,  # pairs with fewer RANSAC inliers than
                                   # this get the guided epipolar-band
                                   # harvest; well-matched pairs keep pure
                                   # inliers (see §2c comment)
    min_parallax_deg: float = 4.0,  # init-pair median triangulation angle
                                    # gate (COLMAP init_min_tri_angle
                                    # analogue; see §3 comment)
    features=None,  # optional precomputed (Keypoints, descs) for the same
                    # frames — the windowed driver detects the WHOLE
                    # sequence once and slices per window (overlapping
                    # windows + loop closure otherwise re-detect every
                    # shared frame ~2.5x)
    verbose: bool = False,
) -> Reconstruction:
    """Full incremental reconstruction of a sequential image set."""
    F = images.shape[0]
    if F < 2:
        raise ValueError(f"incremental SfM needs >= 2 frames, got {F}")
    rngs = jax.random.split(jax.random.PRNGKey(seed), F + 8)
    rec = Reconstruction(K=np.asarray(K, np.float32))

    # 1. detection + description, batched over frames
    if features is not None:
        kps, descs = features
        # precomputed features arrive as host arrays; the matcher indexes
        # them with traced pair ids, which requires device arrays
        kps = jax.tree_util.tree_map(jnp.asarray, kps)
        descs = jnp.asarray(descs)
    else:
        detect_batch = jax.vmap(
            lambda im: detect_and_describe(im, max_keypoints=max_keypoints, upright=upright)
        )
        kps, descs = detect_batch(jnp.asarray(images, dtype=jnp.float32))
    xy = np.asarray(kps.xy)          # (F, Kp, 2)
    valid = np.asarray(kps.valid)
    rec.keypoints = xy

    # 2. sequential matching — all pairs in one batched device dispatch
    # (fused Pallas matcher on TPU, vmapped XLA elsewhere)
    pairs = np.asarray(sequential_pairs(F, overlap=overlap))
    m = match_pairs(descs, kps.valid, jnp.asarray(pairs), ratio=ratio)

    # 2b. geometric verification (COLMAP's per-pair epipolar RANSAC stage,
    # colmap使用.docx §2.3): descriptor matches at ~80% precision corrupt the
    # union-find tracks; keeping only essential-matrix inliers lifts track
    # precision to ~99%. One vmapped dispatch over all pairs.
    uv_a = jnp.take_along_axis(
        jnp.asarray(xy)[pairs[:, 0]], m.idx_a[..., None], axis=1)
    uv_b = jnp.take_along_axis(
        jnp.asarray(xy)[pairs[:, 1]], m.idx_b[..., None], axis=1)
    tv_rngs = jax.random.split(rngs[F + 1], len(pairs))
    tv = jax.vmap(
        lambda a, b, v, r: estimate_relative_pose(a, b, v, jnp.asarray(rec.K), r,
                                                  inlier_px=1.5)
        # 1.5px, not looser: a 3px epipolar gate admits enough
        # near-epipolar mismatches that LO-RANSAC locks onto wrong-basin
        # solutions on low-parallax pairs (measured: 30 deg rotation error
        # at 3px vs 1.6 deg at 1.5px on the arena orbit), and the
        # "verified" match set then poisons track building
    )(uv_a, uv_b, m.valid, tv_rngs)
    geo_valid = np.asarray(m.valid & tv.inliers)
    geo_n = np.asarray(tv.n_inliers)

    # 2c. guided matching (COLMAP §2.3): for STARVED verified pairs only,
    # re-match with the epipolar band from the RANSAC essential matrix. On
    # low-texture stretches the global ratio test keeps only ~40
    # matches/pair and track building starves (windows register 1-2 frames,
    # 500-frame city-block coverage collapsed to ~30%); banding the score
    # matrix first recovers the rest. The starvation gate is load-bearing:
    # harvesting guided matches on EVERY verified pair (round-3 buzzer
    # merge) floods well-matched pairs with band-limited ratio-0.9 matches
    # whose wrong half merges distinct landmarks in the union-find — on the
    # occluded orbit coverage collapsed 1.0 -> 0.54 and the long-sequence
    # ATE blew its 5% bound. COLMAP's own guided stage improves recall
    # WITHOUT hurting precision precisely because its tracks are re-verified
    # downstream; ours gates at the source instead: only pairs too starved
    # to stitch (inliers < guided_min_inliers) take the recall/precision
    # trade, and for them it is strictly better than window fragmentation.
    starved = [p for p in range(len(pairs))
               if 0 < int(geo_n[p]) < guided_min_inliers]
    if starved:
        # pad to the next power of two: the jitted kernel specializes on the
        # pair count, and windowed drivers call this once per window —
        # bucketing bounds recompiles at log2(P) shapes
        n_pad = 1 << (len(starved) - 1).bit_length()
        sp = np.asarray(starved + [starved[0]] * (n_pad - len(starved)))
        guided = guided_match_pairs(descs, kps.valid, jnp.asarray(xy),
                                    jnp.asarray(pairs[sp]), tv.E[sp],
                                    jnp.asarray(rec.K))
        g_ib = {int(p): np.asarray(guided.idx_b[q])
                for q, p in enumerate(starved)}
        g_valid = {int(p): np.asarray(guided.valid[q])
                   for q, p in enumerate(starved)}
    else:
        g_ib, g_valid = {}, {}

    m_valid = np.asarray(m.valid)
    m_ia = np.asarray(m.idx_a)
    m_ib = np.asarray(m.idx_b)
    pair_matches = {}
    for p, (i, j) in enumerate(pairs):
        # verified pairs contribute epipolar inliers (+ guided harvest when
        # starved); pairs where verification itself failed (degenerate/no
        # geometry) are dropped like COLMAP drops unverified image pairs
        if int(geo_n[p]) >= 12:
            sel = geo_valid[p]
        elif int(m_valid[p].sum()) >= 8 and int(geo_n[p]) >= 8:
            sel = geo_valid[p]
        else:
            continue
        # merge: guided matches first, RANSAC inliers overwrite on conflict
        # (a RANSAC inlier passed BOTH the global ratio test and the gate)
        a_to_b = {}
        if p in g_valid:
            a_to_b = {int(a): int(b)
                      for a, b in zip(np.nonzero(g_valid[p])[0],
                                      g_ib[p][g_valid[p]])}
        for a, b in zip(m_ia[p][sel], m_ib[p][sel]):
            a_to_b[int(a)] = int(b)
        ia = np.fromiter(a_to_b.keys(), np.int64, len(a_to_b))
        ib = np.fromiter(a_to_b.values(), np.int64, len(a_to_b))
        pair_matches[(int(i), int(j))] = (ia, ib)

    tracks = build_tracks(pair_matches)
    rec.tracks = tracks
    if verbose:
        print(f"[sfm] {len(tracks)} tracks from {len(pair_matches)} pairs")

    # 3. two-view initialization: best-supported pair (0, k) by inlier
    # count AMONG pairs with sufficient median triangulation angle
    # (COLMAP's two-criterion init scoring, colmap使用.docx §2.4: inliers
    # AND parallax). Both criteria are load-bearing, each against a
    # different failure mode:
    # * widest-first alone is a trap on wide-baseline video: the widest
    #   pair has the FEWEST (and dirtiest) matches, and a near-degenerate
    #   estimate with 50% "inliers" of a wrong-basin solution poisons every
    #   later frame (measured on the orbit arena: gap-3 init at 17/32
    #   inliers gave a near-identity rotation; gap-2 with 51 inliers is
    #   sub-2-degree);
    # * inliers alone is a trap on dense video: the NEAREST pair has the
    #   most matches and wins, but its baseline triangulates garbage
    #   landmarks (measured on the 500-frame city block, 0.87 m/frame:
    #   (0,1)-seeded windows reject every later PnP — 0/88 inliers even at
    #   6 px — and the sequence collapsed to 32% coverage).
    # The search walks k ASCENDING and stops at the first pair clearing
    # `min_parallax_deg`: parallax grows with the gap while match count
    # shrinks, so the first qualifying k is also the best-supported one.
    # Gaps beyond `overlap` have no direct matches — their correspondences
    # come from the transitive tracks (a track seen in both frame 0 and
    # frame k IS a (0, k) correspondence). If no pair qualifies, the
    # best-supported sub-parallax pair is the fallback (a low-parallax
    # seed beats no seed — the pre-BA + ladder may still recover it).
    def _corr_0k(k):
        if (0, k) in pair_matches:
            return pair_matches[(0, k)]
        ia, ib = [], []
        for obs in tracks.values():
            if 0 in obs and k in obs:
                ia.append(obs[0])
                ib.append(obs[k])
        return np.asarray(ia, np.int64), np.asarray(ib, np.int64)

    init_pair = None
    fallback_pair = None
    fallback_score = 0
    for k in range(1, F):
        ia, ib = _corr_0k(k)
        if len(ia) < 16:
            if k > overlap:
                break  # track support only thins with wider gaps
            continue
        uv1 = np.zeros((max_keypoints, 2), np.float32)
        uv2 = np.zeros((max_keypoints, 2), np.float32)
        vmask = np.zeros(max_keypoints, bool)
        uv1[: len(ia)] = xy[0, ia]
        uv2[: len(ib)] = xy[k, ib]
        vmask[: len(ia)] = True
        tv = estimate_relative_pose(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(vmask),
            jnp.asarray(rec.K), rngs[0],
        )
        n_inl = int(tv.n_inliers)
        if n_inl < max(12, int(0.5 * len(ia))):
            continue
        R_, t_ = np.asarray(tv.R), np.asarray(tv.t)
        med_ang = _median_triangulation_angle_deg(
            rec.K, R_, t_,
            xy[0, ia][np.asarray(tv.inliers)[: len(ia)]],
            xy[k, ib][np.asarray(tv.inliers)[: len(ia)]])
        if med_ang >= min_parallax_deg:
            init_pair = (k, R_, t_)
            break
        if n_inl > fallback_score:
            fallback_score = n_inl
            fallback_pair = (k, R_, t_)
    if init_pair is None:
        init_pair = fallback_pair
    if init_pair is None:
        raise ValueError("no pair with enough matches to initialize")
    k, R1, t1 = init_pair
    rec.poses[0] = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    rec.poses[k] = (R1, t1.astype(np.float32))
    rec.scale_anchor = k

    _triangulate_new(rec, tracks, xy, min_track_len)
    if depth_maps is not None:
        # the two-view seed has unit baseline but the depth priors are
        # metric (often 10-100x off): pre-scale the seed so the first BA
        # starts inside the priors' basin instead of needing a 30x jump
        ratios = []
        for f in (0, k):
            R, t = rec.poses[f]
            dm = depth_maps[f]
            Hd, Wd = dm.shape
            for tid, X in rec.points.items():
                if f not in tracks.get(tid, {}):
                    continue
                Xc = R @ X + t
                if Xc[2] <= 1e-6:
                    continue
                u = int(round(Xc[0] / Xc[2] * rec.K[0, 0] + rec.K[0, 2]))
                v = int(round(Xc[1] / Xc[2] * rec.K[1, 1] + rec.K[1, 2]))
                if 0 <= u < Wd and 0 <= v < Hd and dm[v, u] > 1e-3:
                    ratios.append(dm[v, u] / Xc[2])
        if len(ratios) >= 5:
            s0 = float(np.median(ratios))
            for f, (R, t) in rec.poses.items():
                rec.poses[f] = (R, t * s0)
            for tid in rec.points:
                rec.points[tid] = rec.points[tid] * s0
        # with the seed in metric units, mint depth-anchored landmarks for
        # every seed-frame track (RGB-D path — see _depth_anchor_points)
        for f in (0, k):
            _depth_anchor_points(rec, tracks, xy, depth_maps, f)
    # polish the seed before growing (COLMAP-style). The seed BA runs
    # WITHOUT depth priors: a narrow two-view seed (20-ish landmarks) under
    # strong priors can collapse (measured: frame-0 windows registered only
    # 2 frames); the pre-scale above already puts the seed in the metric
    # basin and later BAs (better conditioned) apply the priors
    _run_ba(rec, tracks, xy, None, depth_weight)
    if verbose:
        print(f"[sfm] init pair (0, {k}): {len(rec.points)} landmarks")

    # 4. incremental registration; two passes so frames that lacked
    # landmarks on the first visit get a second chance after BA
    def _gather_2d3d(f):
        X2d, X3d = [], []
        for tid, obs in tracks.items():
            if tid in rec.points and f in obs:
                X3d.append(rec.points[tid])
                X2d.append(xy[f, obs[f]])
        return X3d, X2d

    def _try_pnp(f, X3d, X2d):
        """Registration ladder: 3px gate at 30% consensus, then a 6px gate
        at 60% consensus. Frontier landmarks triangulated from short
        baselines carry depth noise that projects to >3px in a new view
        even under the TRUE pose (measured on the occluded orbit: median
        4.5px under GT — the hard 3px gate split the window into two
        islands only loop closure could rejoin, while a 6px PnP on
        BA-polished landmarks lands 0.4 deg / 109-of-110 from GT). COLMAP
        registers at abs_pose max_error 12px for the same reason; the
        looser gate demands a much STRONGER consensus so wrong-basin poses
        stay rejected."""
        n = len(X3d)
        cap = max(64, 1 << (n - 1).bit_length())
        Xp = np.zeros((cap, 3), np.float32)
        up = np.zeros((cap, 2), np.float32)
        vm = np.zeros(cap, bool)
        Xp[:n] = np.asarray(X3d)
        up[:n] = np.asarray(X2d)
        vm[:n] = True
        # fold the per-frame ATTEMPT index into the key: the BA-retry path
        # re-dispatches this frame's PnP with bf16-close (BA-polished)
        # inputs, and without a distinct input the memoizing relay replays
        # the pre-BA rejection (utils/relayguard.py). A deterministic
        # counter (not a global one) keeps run_sfm bit-reproducible across
        # runs and across parallel_windows scheduling.
        attempt = pnp_attempts.get(f, 0)
        pnp_attempts[f] = attempt + 1
        res = pnp_ransac(
            jnp.asarray(Xp), jnp.asarray(up), jnp.asarray(vm),
            jnp.asarray(rec.K), jax.random.fold_in(rngs[f], attempt),
        )
        n_inl = int(res.n_inliers)
        if n_inl >= max(8, int(0.3 * n)):
            return res, n_inl, False
        res2 = pnp_ransac(
            jnp.asarray(Xp), jnp.asarray(up), jnp.asarray(vm),
            jnp.asarray(rec.K),
            jax.random.fold_in(rngs[F + 2 + (f % 6)], attempt),
            inlier_px=6.0,
        )
        n2 = int(res2.n_inliers)
        if n2 >= max(12, int(0.6 * n)):
            return res2, n2, True
        if verbose:
            print(f"[sfm] frame {f}: PnP rejected "
                  f"({n_inl}/{n} at 3px, {n2}/{n} at 6px)")
        return None, n_inl, False

    ba_retry_done: set = set()
    pnp_attempts: dict = {}
    for _pass in range(2):
        for f in range(F):
            if f in rec.poses:
                continue
            X3d, X2d = _gather_2d3d(f)
            if len(X3d) < 8:
                if verbose:
                    print(f"[sfm] frame {f}: only {len(X3d)} 2D-3D, skipping")
                continue
            res, n_inl, loose = _try_pnp(f, X3d, X2d)
            if res is None and len(X3d) >= 30 and f not in ba_retry_done:
                # the ladder measured its GT-consistency on BA-POLISHED
                # landmarks; raw frontier points can be 2-3x noisier. One
                # polish + retriangulate + retry per frame.
                ba_retry_done.add(f)
                _run_ba(rec, tracks, xy, depth_maps, depth_weight)
                X3d, X2d = _gather_2d3d(f)
                if len(X3d) >= 8:
                    res, n_inl, loose = _try_pnp(f, X3d, X2d)
                    if res is not None and verbose:
                        print(f"[sfm] frame {f}: registered after BA retry")
            if res is None:
                continue
            rec.poses[f] = (np.asarray(res.R), np.asarray(res.t))
            if depth_maps is not None:
                _depth_anchor_points(rec, tracks, xy, depth_maps, f)
            _triangulate_new(rec, tracks, xy, min_track_len)

            # a loose-gate acceptance leans on BA to pull landmark depths
            # to the new multi-view consensus immediately
            if loose or (len(rec.poses) % ba_every == 0):
                _run_ba(rec, tracks, xy, depth_maps, depth_weight)
            if verbose:
                print(f"[sfm] frame {f}: {n_inl}/{len(X3d)} PnP inliers, "
                      f"{len(rec.points)} landmarks")

    _run_ba(rec, tracks, xy, depth_maps, depth_weight)
    return rec


def _filter_observations(rec: Reconstruction, tracks, xy,
                         max_err_px: float = 4.0) -> int:
    """COLMAP's observation-filter step: drop track observations whose
    reprojection error against the current model exceeds ``max_err_px``,
    and landmarks left with <2 observations. Without this, mismatched
    observations (the ~10-20%% the ratio test lets through) accumulate as
    the map grows and dilute later PnP consensus below the acceptance
    threshold (measured: frame-7 inliers fell to 1/326 on the occluded
    urban sim before filtering; full registration after)."""
    removed = 0
    dead = []
    for tid in list(rec.points.keys()):
        X = rec.points[tid]
        obs = tracks.get(tid, {})
        bad = []
        for f, k in obs.items():
            if f not in rec.poses:
                continue
            R, t = rec.poses[f]
            Xc = R @ X + t
            if Xc[2] <= 1e-6:
                bad.append(f)
                continue
            u = Xc[0] / Xc[2] * rec.K[0, 0] + rec.K[0, 2]
            v = Xc[1] / Xc[2] * rec.K[1, 1] + rec.K[1, 2]
            kp = xy[f, k]
            if (u - kp[0]) ** 2 + (v - kp[1]) ** 2 > max_err_px ** 2:
                bad.append(f)
        for f in bad:
            del obs[f]
            removed += 1
        if len(obs) < 2:
            dead.append(tid)
    for tid in dead:
        del rec.points[tid]
    return removed


def _depth_anchor_points(rec: Reconstruction, tracks, xy, depth_maps,
                         f: int) -> int:
    """Anchor new landmarks for frame ``f``'s tracks directly from its
    metric depth map: X = R^T (z K^-1 [u v 1] - t).

    The RGB-D registration path (the reference's own configuration — its
    pipeline unprojects learned/RGB-D depth, `ref/readme.md` §2(1)): when a
    keypoint carries valid metric depth, its landmark needs no two-view
    triangulation at all. This is what keeps corner windows alive on dense
    video — rotation-dominant corner pairs give DLT almost no parallax
    (measured on the 500-frame city block: corner windows registered 3/12
    with 2-6 px PnP consensus collapse), while a depth-anchored landmark is
    exactly as good as the sensor. Every frame registration immediately
    mints landmarks for ALL its tracks, so the NEXT frame has full 2D-3D
    support regardless of yaw rate. Dropout pixels (z <= 0) fall through
    to DLT triangulation (`_triangulate_new`)."""
    R, t = rec.poses[f]
    dm = depth_maps[f]
    Hd, Wd = dm.shape
    K = rec.K
    n_new = 0
    for tid, obs in tracks.items():
        if tid in rec.points or f not in obs:
            continue
        u, v = xy[f, obs[f]]
        ui, vi = int(round(u)), int(round(v))
        if not (0 <= ui < Wd and 0 <= vi < Hd):
            continue
        z = float(dm[vi, ui])
        if z <= 1e-3:
            continue
        Xc = np.array([(u - K[0, 2]) / K[0, 0] * z,
                       (v - K[1, 2]) / K[1, 1] * z, z], np.float32)
        rec.points[tid] = (R.T @ (Xc - t)).astype(np.float32)
        n_new += 1
    return n_new


def _triangulate_new(rec: Reconstruction, tracks, xy, min_track_len):
    """Triangulate tracks seen in >=2 registered frames, batched."""
    todo = []
    for tid, obs in tracks.items():
        if tid in rec.points:
            continue
        reg = sorted(f for f in obs if f in rec.poses)
        if len(reg) >= max(2, min_track_len):
            # widest-baseline registered pair (insertion order is union-find
            # order — unsorted it can pick an adjacent tiny-baseline pair)
            f1, f2 = reg[0], reg[-1]
            todo.append((tid, f1, f2, obs[f1], obs[f2]))
    if not todo:
        return
    # group by frame pair for batched dispatch
    by_pair = {}
    for tid, f1, f2, k1, k2 in todo:
        by_pair.setdefault((f1, f2), []).append((tid, k1, k2))
    # host-numpy path: per-pair group sizes differ EVERY call, so device
    # dispatches here compile a fresh executable per unique N — the compile
    # storm that crashed 500-frame runs (see triangulate_two_view_np)
    K = np.asarray(rec.K)
    for (f1, f2), items in by_pair.items():
        R1, t1 = rec.poses[f1]
        R2, t2 = rec.poses[f2]
        P1 = K @ np.concatenate([R1, t1[:, None]], axis=1)
        P2 = K @ np.concatenate([R2, t2[:, None]], axis=1)
        u1 = np.stack([xy[f1, k1] for _, k1, _ in items])
        u2 = np.stack([xy[f2, k2] for _, _, k2 in items])
        Xn = triangulate_two_view_np(P1, P2, u1, u2)
        # cheirality + reprojection sanity
        e1 = reprojection_errors_np(Xn, R1, t1, K, u1)
        e2 = reprojection_errors_np(Xn, R2, t2, K, u2)
        z1 = (Xn @ R1.T + t1)[:, 2]
        z2 = (Xn @ R2.T + t2)[:, 2]
        ok = (e1 < 4.0) & (e2 < 4.0) & (z1 > 0) & (z2 > 0)
        for m, (tid, _, _) in enumerate(items):
            if ok[m]:
                rec.points[tid] = Xn[m].astype(np.float32)


def _run_ba(rec: Reconstruction, tracks, xy, depth_maps=None, depth_weight=2.0):
    """Global BA over all registered frames + landmarks (static-padded).
    With depth_maps, each observation carries the metric depth at its
    keypoint pixel as a prior row (sfm/ba.py) — the reconstruction comes
    out metric instead of up-to-scale."""
    frames, cam_params = rec.cameras_as_params()
    fidx = {f: i for i, f in enumerate(frames)}
    tids = [t for t in rec.points]
    tidx = {t: i for i, t in enumerate(tids)}
    cam_i, pt_i, uvs, dvals = [], [], [], []
    for t in tids:
        for f, k in tracks[t].items():
            if f in fidx:
                cam_i.append(fidx[f])
                pt_i.append(tidx[t])
                uvs.append(xy[f, k])
                if depth_maps is not None:
                    u, v = xy[f, k]
                    ui, vi = int(round(u)), int(round(v))
                    H, W = depth_maps[f].shape
                    dvals.append(
                        float(depth_maps[f][vi, ui])
                        if 0 <= ui < W and 0 <= vi < H else 0.0
                    )
    if len(cam_i) < 10 or len(frames) < 2:
        return
    O = len(cam_i)
    cap = 1 << (O - 1).bit_length()
    cam_idx = np.zeros(cap, np.int32)
    pt_idx = np.zeros(cap, np.int32)
    uv = np.zeros((cap, 2), np.float32)
    w = np.zeros(cap, np.float32)
    cam_idx[:O] = cam_i
    pt_idx[:O] = pt_i
    uv[:O] = np.asarray(uvs)
    w[:O] = 1.0
    points = np.stack([rec.points[t] for t in tids]).astype(np.float32)

    # pad the CAMERA and LANDMARK axes to buckets too: every distinct
    # (F, L) pair otherwise compiles a fresh ba_solve — 67 multi-second
    # compiles over a 160-frame windowed run, and the accumulated XLA:CPU
    # code sections crash LLVM on 500-frame sequences. Padded cameras
    # replicate the last real pose, padded landmarks sit at the last real
    # point; neither has observations (weight-0 rows point at index 0), so
    # their gradients are zero and LM damping keeps them fixed.
    F, L = len(frames), len(tids)
    F_pad = max(4, 1 << (F - 1).bit_length())
    L_pad = max(64, 1 << (L - 1).bit_length())
    cam_params = np.concatenate(
        [cam_params, np.repeat(cam_params[-1:], F_pad - F, axis=0)])
    points = np.concatenate(
        [points, np.repeat(points[-1:], L_pad - L, axis=0)])

    depth = None
    if depth_maps is not None:
        depth = np.zeros(cap, np.float32)
        depth[:O] = np.asarray(dvals, np.float32)
        depth = jnp.asarray(depth)

    prob = BAProblem(
        cam_params=jnp.asarray(cam_params),
        points=jnp.asarray(points),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv),
        weight=jnp.asarray(w),
        K=jnp.asarray(rec.K),
        depth=depth,
        depth_weight=depth_weight,
    )
    # gauge: freeze the first frame (6-dof global SE3). Without depth the
    # scale is also free: pin ONE translation component of the scale anchor
    # (largest magnitude — pins scale without constraining the direction BA
    # may still need to correct). With depth priors the scale is observable
    # and must stay free.
    mask = np.ones((F_pad, 6), np.float32)
    mask[0] = 0.0
    mask[F:] = 0.0  # padded cameras frozen outright
    if depth_maps is None:
        anchor = rec.scale_anchor if rec.scale_anchor in fidx else frames[min(1, len(frames) - 1)]
        t_anchor = cam_params[fidx[anchor], 3:]
        mask[fidx[anchor], 3 + int(np.argmax(np.abs(t_anchor)))] = 0.0
    from tpu3drec.utils.relayguard import dispatch_salt

    # salt: successive _run_ba calls differ by sub-bf16 refinements, and
    # the memoizing relay would replay the previous solve (relayguard.py)
    res = ba_solve(prob, max_lm_iters=10, cg_iters=15,
                   fix_cam_mask=jnp.asarray(mask), salt=dispatch_salt())
    new_cams = np.asarray(res.cam_params)
    new_pts = np.asarray(res.points)
    for i, f in enumerate(frames):
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(new_cams[i, :3])))
        rec.poses[f] = (R.astype(np.float32), new_cams[i, 3:].astype(np.float32))
    for t, i in tidx.items():
        rec.points[t] = new_pts[i]
    # COLMAP's post-BA cycle: filter outlier observations against the
    # refined model, then re-triangulate tracks that lost their point
    _filter_observations(rec, tracks, xy)
    _triangulate_new(rec, tracks, xy, min_track_len=2)
