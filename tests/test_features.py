"""Feature detection / description / matching tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.sfm.features import (
    gaussian_blur,
    detect_keypoints,
    describe_keypoints,
    detect_and_describe,
)
from tpu3drec.sfm.matching import (
    match_descriptors,
    match_pairs,
    sequential_pairs,
)
from tpu3drec.ops.matcher import topk2_scores


def _dots_image(rng, h=96, w=128, n=20, seed_pts=None):
    """Gaussian blobs on a dark background: unambiguous corners.

    Blobs are jittered grid points so they stay well-separated (overlapping
    blobs would legitimately merge into one detection)."""
    img = np.zeros((h, w), np.float32)
    if seed_pts is not None:
        pts = seed_pts
    else:
        gx, gy = np.meshgrid(np.linspace(20, w - 20, 5), np.linspace(20, h - 20, 4))
        grid = np.stack([gx.ravel(), gy.ravel()], -1)
        grid += rng.uniform(-4, 4, size=grid.shape)
        pts = grid[rng.permutation(len(grid))[:n]]
    yy, xx = np.mgrid[0:h, 0:w]
    for (x, y) in pts:
        img += np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 2.0 ** 2))
    return np.clip(img, 0, 1), np.asarray(pts)


class TestDetect:
    def test_gaussian_blur_preserves_mean(self, rng):
        img = rng.uniform(size=(32, 40)).astype(np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(img), 1.5))
        # reflect padding is not exactly mean-preserving; 0.5% is enough
        np.testing.assert_allclose(out.mean(), img.mean(), rtol=5e-3)
        assert out.std() < img.std()

    def test_detects_blob_centers(self, rng):
        img, pts = _dots_image(rng, n=12)
        kps = detect_keypoints(jnp.asarray(img), max_keypoints=64)
        found = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(found) >= 10
        # every planted blob should have a detection within 2px
        d = np.linalg.norm(pts[:, None] - found[None], axis=-1).min(1)
        assert (d < 2.0).mean() > 0.8

    def test_static_output_shapes(self, rng):
        img, _ = _dots_image(rng, n=3)
        kps = detect_keypoints(jnp.asarray(img), max_keypoints=256)
        assert kps.xy.shape == (256, 2)
        assert kps.valid.shape == (256,)
        assert int(np.asarray(kps.valid).sum()) < 256  # padding marked invalid


class TestDescribe:
    def test_descriptor_norm_and_shape(self, rng):
        img, _ = _dots_image(rng)
        kps, desc = detect_and_describe(jnp.asarray(img), max_keypoints=64)
        desc = np.asarray(desc)
        assert desc.shape == (64, 128)
        norms = np.linalg.norm(desc, axis=1)
        valid = np.asarray(kps.valid)
        np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)
        assert (norms[~valid] == 0).all()

    def test_descriptor_shift_invariant_match(self, rng):
        """The same scene shifted: descriptors must match across images."""
        img_a, pts = _dots_image(rng, n=15)
        shift = 6
        img_b = np.roll(img_a, shift, axis=1)
        kps_a, desc_a = detect_and_describe(jnp.asarray(img_a), max_keypoints=64)
        kps_b, desc_b = detect_and_describe(jnp.asarray(img_b), max_keypoints=64)
        m = match_descriptors(desc_a, desc_b, kps_a.valid, kps_b.valid)
        ia = np.asarray(m.idx_a)[np.asarray(m.valid)]
        ib = np.asarray(m.idx_b)[np.asarray(m.valid)]
        assert len(ia) >= 8
        # matched keypoints should differ by the known shift
        dx = np.asarray(kps_b.xy)[ib, 0] - np.asarray(kps_a.xy)[ia, 0]
        interior = np.asarray(kps_a.xy)[ia, 0] < (img_a.shape[1] - shift - 10)
        frac_ok = (np.abs(dx[interior] - shift) < 1.5).mean()
        assert frac_ok > 0.8


class TestPyramid:
    def test_detects_two_octave_scales(self, rng):
        """Small (sigma 2) AND large (sigma 8) blobs must both be found —
        a sigma-8 blob is invisible to the single-octave stack (DoG range
        1.6-3.2) and only appears octaves up (VERDICT r1 item 2)."""
        from tpu3drec.sfm.features import detect_and_describe_pyramid

        h, w = 192, 256
        img = np.zeros((h, w), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        small = [(40, 40), (200, 40), (120, 150)]
        large = [(60, 120), (190, 150)]
        for (x, y) in small:
            img += np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 2.0 ** 2))
        for (x, y) in large:
            img += 0.8 * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 8.0 ** 2))
        img = np.clip(img, 0, 1)
        kps, _ = detect_and_describe_pyramid(jnp.asarray(img), max_keypoints=64,
                                             num_octaves=3)
        xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
        sc = np.asarray(kps.scale)[np.asarray(kps.valid)]
        for (x, y) in small:
            d = np.linalg.norm(xy - [x, y], axis=1)
            assert d.min() < 2.5, f"small blob at {(x, y)} missed"
            assert sc[d.argmin()] < 4.0
        for (x, y) in large:
            d = np.linalg.norm(xy - [x, y], axis=1)
            assert d.min() < 4.0, f"large blob at {(x, y)} missed"
            assert sc[d.argmin()] > 4.0, "large blob not detected octaves up"

    def test_match_across_2x_scale_change(self, rng):
        """Same scene at 2x zoom: pyramid descriptors must still match
        (scale covariance across octaves). Textured scene — symmetric
        blobs would give identical descriptors and die in the ratio test."""
        from scipy.ndimage import gaussian_filter
        from tpu3drec.sfm.features import detect_and_describe_pyramid

        h, w = 128, 160
        img_a = gaussian_filter(rng.normal(size=(h, w)), 2.0)
        img_a = ((img_a - img_a.min()) / np.ptp(img_a)).astype(np.float32)
        # 2x zoom-in on the central crop (nearest-free: bilinear via repeat+avg)
        from PIL import Image
        crop = img_a[h // 4: 3 * h // 4, w // 4: 3 * w // 4]
        img_b = np.asarray(
            Image.fromarray((crop * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR), np.float32) / 255.0
        ka, da = detect_and_describe_pyramid(jnp.asarray(img_a), max_keypoints=128)
        kb, db = detect_and_describe_pyramid(jnp.asarray(img_b), max_keypoints=128)
        m = match_descriptors(da, db, ka.valid, kb.valid)
        v = np.asarray(m.valid)
        ia, ib = np.asarray(m.idx_a)[v], np.asarray(m.idx_b)[v]
        # verify matched pairs obey the known similarity: b = (a - c0) * 2
        xa = np.asarray(ka.xy)[ia]
        xb = np.asarray(kb.xy)[ib]
        pred = (xa - [w // 4, h // 4]) * 2.0
        in_crop = ((xa[:, 0] > w // 4) & (xa[:, 0] < 3 * w // 4 - 1)
                   & (xa[:, 1] > h // 4) & (xa[:, 1] < 3 * h // 4 - 1))
        err = np.linalg.norm(pred - xb, axis=1)
        good = (err[in_crop] < 4.0)
        assert in_crop.sum() >= 3, f"only {in_crop.sum()} in-crop matches"
        assert good.mean() > 0.6, f"scale-change match accuracy {good.mean()}"

    def test_match_under_inplane_rotation(self, rng):
        """Oriented descriptors must survive a 30-degree in-plane rotation
        (the wide-baseline failure mode: upright-only descriptors die here)."""
        from scipy.ndimage import gaussian_filter, rotate as ndrotate
        from tpu3drec.sfm.features import detect_and_describe_pyramid

        img_a = gaussian_filter(rng.normal(size=(128, 128)), 2.0)
        img_a = ((img_a - img_a.min()) / np.ptp(img_a)).astype(np.float32)
        ang = 30.0
        img_b = ndrotate(img_a, ang, reshape=False, order=1)
        ka, da = detect_and_describe_pyramid(jnp.asarray(img_a), max_keypoints=64,
                                             upright=False)
        kb, db = detect_and_describe_pyramid(jnp.asarray(img_b), max_keypoints=64,
                                             upright=False)
        m = match_descriptors(da, db, ka.valid, kb.valid)
        v = np.asarray(m.valid)
        ia, ib = np.asarray(m.idx_a)[v], np.asarray(m.idx_b)[v]
        # fit the in-plane rotation about the image center from the matches
        # (Procrustes); it must be ~30 deg and explain the correspondences
        c = (128 - 1) / 2.0
        xa = np.asarray(ka.xy)[ia] - c
        xb = np.asarray(kb.xy)[ib] - c
        interior = (np.linalg.norm(xa, axis=1) < 50) & (np.linalg.norm(xb, axis=1) < 50)
        assert interior.sum() >= 5, f"only {interior.sum()} interior matches"
        A, B = xa[interior], xb[interior]
        U, _, Vt = np.linalg.svd(B.T @ A)
        R = U @ np.diag([1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
        fitted = np.rad2deg(np.arctan2(R[1, 0], R[0, 0]))
        assert abs(abs(fitted) - ang) < 3.0, f"fitted rotation {fitted} deg"
        err = np.linalg.norm(A @ R.T - B, axis=1)
        assert (err < 3.0).mean() > 0.6, f"rotation-match inlier frac {(err < 3.0).mean()}"


class TestMatcher:
    def test_exact_self_match(self, rng):
        d = rng.normal(size=(40, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        m = match_descriptors(jnp.asarray(d), jnp.asarray(d), ratio=0.99)
        v = np.asarray(m.valid)
        assert v.all()
        np.testing.assert_array_equal(np.asarray(m.idx_b), np.arange(40))

    def test_ratio_test_rejects_ambiguous(self, rng):
        base = rng.normal(size=(1, 16)).astype(np.float32)
        # two nearly identical refs -> ambiguous -> rejected
        refs = np.concatenate([base + 1e-4, base - 1e-4, rng.normal(size=(5, 16))])
        refs /= np.linalg.norm(refs, axis=1, keepdims=True)
        q = base / np.linalg.norm(base)
        m = match_descriptors(jnp.asarray(q), jnp.asarray(refs), ratio=0.8)
        assert not bool(np.asarray(m.valid)[0])

    def test_pallas_kernel_matches_xla(self, rng):
        Ka, Kb, D = 128, 200, 32
        a = rng.normal(size=(Ka, D)).astype(np.float32)
        b = rng.normal(size=(Kb, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        valid_b = np.ones(Kb, bool)
        valid_b[170:] = False
        best, top2 = topk2_scores(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid_b))
        scores = a @ b.T
        scores[:, ~valid_b] = -np.inf
        np.testing.assert_array_equal(np.asarray(best), scores.argmax(1))
        ref_sorted = np.sort(scores, axis=1)
        np.testing.assert_allclose(np.asarray(top2)[:, 0], ref_sorted[:, -1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(top2)[:, 1], ref_sorted[:, -2], atol=1e-5)

    def test_pallas_path_same_matches(self, rng):
        Ka, Kb, D = 128, 128, 32
        a = rng.normal(size=(Ka, D)).astype(np.float32)
        b = a[rng.permutation(Kb)] + 0.01 * rng.normal(size=(Kb, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        m_ref = match_descriptors(jnp.asarray(a), jnp.asarray(b))
        m_pal = match_descriptors(jnp.asarray(a), jnp.asarray(b), use_pallas=True)
        np.testing.assert_array_equal(np.asarray(m_ref.valid), np.asarray(m_pal.valid))
        v = np.asarray(m_ref.valid)
        np.testing.assert_array_equal(np.asarray(m_ref.idx_b)[v], np.asarray(m_pal.idx_b)[v])

    def test_batched_pairs(self, rng):
        F, K, D = 4, 32, 16
        descs = rng.normal(size=(F, K, D)).astype(np.float32)
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        valids = np.ones((F, K), bool)
        pairs = sequential_pairs(F, overlap=2)
        assert pairs.shape == (5, 2)
        m = match_pairs(jnp.asarray(descs), jnp.asarray(valids), pairs)
        assert m.idx_a.shape == (5, K)


class TestBatchedPallasMatcher:
    def test_batched_pallas_equals_xla_path(self, rng):
        from tpu3drec.sfm.matching import match_pairs, sequential_pairs
        import jax.numpy as jnp

        F, K, D = 4, 128, 32
        descs = rng.normal(size=(F, K, D)).astype(np.float32)
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        valids = np.ones((F, K), bool)
        valids[:, 100:] = False
        pairs = sequential_pairs(F, overlap=2)
        m_x = match_pairs(jnp.asarray(descs), jnp.asarray(valids), pairs,
                          use_pallas=False)
        m_p = match_pairs(jnp.asarray(descs), jnp.asarray(valids), pairs,
                          use_pallas=True)  # interpret mode on CPU
        np.testing.assert_array_equal(np.asarray(m_x.valid), np.asarray(m_p.valid))
        v = np.asarray(m_x.valid)
        np.testing.assert_array_equal(np.asarray(m_x.idx_b)[v], np.asarray(m_p.idx_b)[v])


class TestKbTiledMatcher:
    """Reference-side (Kb) tiling: K=16k descriptor sets stream through
    bounded VMEM tiles with a running top-2 merge (VERDICT r1 item 10).
    The merge path must be bit-equal to the untiled formulation."""

    def test_large_kb_matches_xla_reference(self, rng):
        from tpu3drec.ops.matcher import TILE_B, topk2_scores

        Ka, Kb, D = 256, 2 * TILE_B + 300, 32  # 3 tiles, last one ragged
        a = rng.normal(size=(Ka, D)).astype(np.float32)
        b = rng.normal(size=(Kb, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        valid_b = np.ones(Kb, bool)
        valid_b[rng.random(Kb) < 0.1] = False
        best, top2 = topk2_scores(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(valid_b))
        scores = a @ b.T
        scores[:, ~valid_b] = -np.inf
        np.testing.assert_array_equal(np.asarray(best), scores.argmax(1))
        ref_sorted = np.sort(scores, axis=1)
        np.testing.assert_allclose(np.asarray(top2)[:, 0], ref_sorted[:, -1],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(top2)[:, 1], ref_sorted[:, -2],
                                   atol=1e-5)

    def test_large_kb_batched(self, rng):
        from tpu3drec.ops.matcher import TILE_B, topk2_scores_batched

        P, Ka, Kb, D = 2, 128, TILE_B + 64, 16
        a = rng.normal(size=(P, Ka, D)).astype(np.float32)
        b = rng.normal(size=(P, Kb, D)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        valid_b = np.ones((P, Kb), bool)
        valid_b[0, -100:] = False
        best, top2 = topk2_scores_batched(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(valid_b))
        for p in range(P):
            scores = a[p] @ b[p].T
            scores[:, ~valid_b[p]] = -np.inf
            np.testing.assert_array_equal(np.asarray(best)[p],
                                          scores.argmax(1))
            ref_sorted = np.sort(scores, axis=1)
            np.testing.assert_allclose(np.asarray(top2)[p, :, 0],
                                       ref_sorted[:, -1], atol=1e-5)
            np.testing.assert_allclose(np.asarray(top2)[p, :, 1],
                                       ref_sorted[:, -2], atol=1e-5)


class TestDenseOrientation:
    def test_dense_matches_gather_form(self, rng):
        """The dense separable-conv orientation (1 gather row/kp) must agree
        with the quad-packed gather form (85 rows/kp) on interior keypoints
        — same Gaussian window, same histogram, same peak interpolation."""
        import jax
        import jax.numpy as jnp

        from tpu3drec.sfm.features import (
            _dominant_orientation,
            _dominant_orientation_dense,
            gaussian_blur,
        )

        H, W, S = 96, 128, 3
        img = rng.uniform(size=(H, W)).astype(np.float32)
        G = jnp.stack([gaussian_blur(jnp.asarray(img), s)
                       for s in (1.0, 1.6, 2.2)])
        gx = (jnp.roll(G, -1, 2) - jnp.roll(G, 1, 2)) * 0.5
        gy = (jnp.roll(G, -1, 1) - jnp.roll(G, 1, 1)) * 0.5
        mag = jnp.sqrt(gx * gx + gy * gy)
        ori = jnp.arctan2(gy, gx)

        K = 64
        s_idx = jnp.asarray(rng.integers(0, S, K), jnp.int32)
        x_idx = jnp.asarray(rng.integers(12, W - 12, K), jnp.int32)
        y_idx = jnp.asarray(rng.integers(12, H - 12, K), jnp.int32)

        a_ref = np.asarray(_dominant_orientation(mag, ori, s_idx, x_idx, y_idx))
        a_new = np.asarray(
            _dominant_orientation_dense(mag, ori, s_idx, x_idx, y_idx))
        # circular difference in degrees
        d = np.degrees(np.angle(np.exp(1j * (a_new - a_ref))))
        assert np.median(np.abs(d)) < 1.0, np.median(np.abs(d))
        assert (np.abs(d) < 5.0).mean() > 0.9, (np.abs(d) < 5.0).mean()
