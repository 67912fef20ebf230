"""Depth model + loss + training-step tests (tiny shapes, CPU devices)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drec.models import (
    ResNetEncoder,
    DepthDecoder,
    PoseNet,
    MonodepthModel,
    disp_to_depth,
    MonodepthLossConfig,
    monodepth_loss,
)
from tpu3drec.models.monodepth import (
    bilinear_sample,
    warp_frame,
    ssim,
    reprojection_loss,
    transformation_from_parameters,
)
from tpu3drec.models.metrics import depth_metrics

H, W = 64, 96  # divisible by 32 for the 5-level pyramid


class TestEncoderDecoder:
    def test_encoder_pyramid_shapes(self):
        enc = ResNetEncoder(depth=18)
        x = jnp.zeros((2, H, W, 3))
        vars_ = enc.init(jax.random.PRNGKey(0), x)
        feats = enc.apply(vars_, x)
        assert [f.shape for f in feats] == [
            (2, H // 2, W // 2, 64),
            (2, H // 4, W // 4, 64),
            (2, H // 8, W // 8, 128),
            (2, H // 16, W // 16, 256),
            (2, H // 32, W // 32, 512),
        ]

    def test_decoder_scales(self):
        enc = ResNetEncoder(depth=18)
        dec = DepthDecoder(num_ch_enc=enc.num_ch_enc)
        x = jnp.zeros((1, H, W, 3))
        ev = enc.init(jax.random.PRNGKey(0), x)
        feats = enc.apply(ev, x)
        dv = dec.init(jax.random.PRNGKey(1), feats)
        disps = dec.apply(dv, feats)
        assert set(disps.keys()) == {0, 1, 2, 3}
        assert disps[0].shape == (1, H, W, 1)
        assert disps[3].shape == (1, H // 8, W // 8, 1)
        for d in disps.values():
            dn = np.asarray(d)
            assert (dn > 0).all() and (dn < 1).all()  # sigmoid range

    def test_pose_net_output(self):
        pn = PoseNet()
        a = jnp.zeros((2, H, W, 3))
        v = pn.init(jax.random.PRNGKey(0), a, a)
        aa, t = pn.apply(v, a, a)
        assert aa.shape == (2, 3) and t.shape == (2, 3)
        # 0.01 scaling keeps initial predictions near identity
        assert np.abs(np.asarray(aa)).max() < 0.5


class TestDepthMath:
    def test_disp_to_depth_range(self):
        sd, d = disp_to_depth(jnp.array([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(d), [100.0, 0.1], rtol=1e-5)

    def test_transformation_invert_roundtrip(self, rng):
        aa = jnp.asarray(rng.normal(size=(4, 3)) * 0.3)
        t = jnp.asarray(rng.normal(size=(4, 3)))
        T = transformation_from_parameters(aa, t)
        Ti = transformation_from_parameters(aa, t, invert=True)
        eye = np.einsum("nij,njk->nik", np.asarray(T), np.asarray(Ti))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)


class TestWarp:
    def test_bilinear_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(8, 10, 3)).astype(np.float32))
        x = jnp.tile(jnp.arange(10, dtype=jnp.float32), (8, 1))
        y = jnp.tile(jnp.arange(8, dtype=jnp.float32)[:, None], (1, 10))
        out = bilinear_sample(img, x, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_bilinear_halfpixel(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
        out = bilinear_sample(img, jnp.full((1, 1), 0.5), jnp.zeros((1, 1)))
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 0.5)

    def test_warp_identity_pose_exact(self, rng):
        """Identity cam_T_cam must reproduce the source exactly (interior)."""
        src = jnp.asarray(rng.uniform(size=(1, 16, 20, 3)).astype(np.float32))
        depth = jnp.full((1, 16, 20), 5.0)
        T = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
        out = warp_frame(src, depth, T, 20.0, 20.0, 10.0, 8.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-5)

    def test_warp_translation_shifts(self):
        """A +x camera translation shifts sampling by fx*tx/Z pixels."""
        src = np.zeros((1, 8, 16, 1), np.float32)
        src[0, :, 8, 0] = 1.0
        depth = jnp.full((1, 8, 16), 2.0)
        T = np.eye(4)[None].copy()
        T[0, 0, 3] = 1.0  # 1m along +x; shift = fx*1/2 = 2px
        out = warp_frame(jnp.asarray(src), depth, jnp.asarray(T), 4.0, 4.0, 8.0, 4.0)
        got = np.asarray(out)[0, 4]
        assert got[6, 0] > 0.9  # the stripe appears 2px to the left
        assert got[8, 0] < 0.1


class TestLosses:
    def test_ssim_identical_zero(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)).astype(np.float32))
        assert float(jnp.max(ssim(x, x))) < 1e-5

    def test_reprojection_loss_ordering(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)).astype(np.float32))
        noisy = x + 0.3 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        l_same = float(jnp.mean(reprojection_loss(x, x)))
        l_diff = float(jnp.mean(reprojection_loss(noisy, x)))
        assert l_same < 1e-5 < l_diff

    def test_monodepth_loss_runs_and_grads(self, rng):
        N, h, w = 1, 32, 32
        cfg = MonodepthLossConfig(scales=(0, 1), fx=30.0, fy=30.0, cx=16.0, cy=16.0)
        target = jnp.asarray(rng.uniform(size=(N, h, w, 3)).astype(np.float32))
        prev = jnp.asarray(rng.uniform(size=(N, h, w, 3)).astype(np.float32))
        nxt = jnp.asarray(rng.uniform(size=(N, h, w, 3)).astype(np.float32))
        T = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))

        def loss_of(raw):
            disps = {0: jax.nn.sigmoid(raw), 1: jax.nn.sigmoid(raw[:, ::2, ::2])}
            l, _ = monodepth_loss(disps, [T, T], target, [prev, nxt], cfg)
            return l

        raw = jnp.zeros((N, h, w, 1))
        l, g = jax.value_and_grad(loss_of)(raw)
        assert np.isfinite(float(l))
        assert np.isfinite(np.asarray(g)).all()


class TestMetrics:
    def test_perfect_prediction(self, rng):
        gt = jnp.asarray(rng.uniform(1.0, 10.0, size=(2, 8, 8)).astype(np.float32))
        m = depth_metrics(gt, gt)
        assert float(m["abs_rel"]) < 1e-6
        assert float(m["a1"]) == 1.0
        assert float(m["rmse"]) < 1e-3

    def test_median_scaling_invariance(self, rng):
        """Scaled predictions score identically — median scaling removes scale."""
        gt = jnp.asarray(rng.uniform(1.0, 10.0, size=(1, 8, 8)).astype(np.float32))
        pred = gt * 1.07
        m1 = depth_metrics(pred, gt)
        m2 = depth_metrics(pred * 5.0, gt)
        np.testing.assert_allclose(float(m1["abs_rel"]), float(m2["abs_rel"]), atol=1e-6)

    def test_invalid_pixels_ignored(self, rng):
        gt = np.full((1, 8, 8), 5.0, np.float32)
        gt[0, 0, :] = 0.0  # invalid
        pred = np.full((1, 8, 8), 5.0, np.float32)
        pred[0, 0, :] = 999.0  # wrong only where invalid
        m = depth_metrics(jnp.asarray(pred), jnp.asarray(gt))
        assert float(m["abs_rel"]) < 1e-6


class TestTrainStep:
    @pytest.mark.slow
    def test_train_step_decreases_loss(self, rng):
        from tpu3drec.models.training import TrainConfig, init_state, make_train_step

        cfg = TrainConfig(height=H, width=W, learning_rate=1e-4)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=10)
        step = make_train_step(model, tx, cfg)
        batch = {
            "target": jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32)),
            "prev": jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32)),
            "next": jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32)),
        }
        losses = []
        for i in range(3):
            state, loss, aux = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert int(state.step) == 3

    @pytest.mark.slow
    def test_train_step_gt_pose(self, rng):
        from tpu3drec.models.training import TrainConfig, init_state, make_train_step

        cfg = TrainConfig(height=H, width=W, use_gt_pose=True)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=10)
        step = make_train_step(model, tx, cfg)
        batch = {
            "target": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "prev": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "next": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "gt_axisangle": jnp.asarray(rng.normal(size=(1, 2, 3)).astype(np.float32) * 0.1),
            "gt_translation": jnp.asarray(rng.normal(size=(1, 2, 3)).astype(np.float32)),
        }
        state, loss, aux = step(state, batch, None)
        assert np.isfinite(float(loss))


class TestStereoFrame:
    """Mono+stereo self-supervision: the "s" frame with the constant
    known-baseline transform (`ref/monodepth2/mono_dataset.py:203-209`)
    anchors METRIC scale — the temporal-only photometric loss cannot
    (depth*s with translation*s is a no-op)."""

    B = 0.5      # exaggerated baseline for strong test-scale gradients
    CAM = None   # set lazily (scipy import in capture_sim)

    @classmethod
    def _stereo_setup(cls):
        from tpu3drec.data.capture_sim import PlanarScene
        from tpu3drec.utils.config import CameraConfig

        srng = np.random.default_rng(3)
        scene = PlanarScene.room(srng, n_clutter=4)
        cam = CameraConfig(fx=80.0, fy=80.0, cx=47.5, cy=31.5,
                           width=96, height=64)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.0, 0.0, 4.0], np.float32)   # cam at z=-4, looking +z
        left, depth = scene.render(R, t, cam)
        right, _ = scene.render(R, t - np.array([cls.B, 0, 0], np.float32), cam)
        # temporal partner: small sideways motion
        dt = np.array([0.25, 0.0, 0.0], np.float32)
        prev, _ = scene.render(R, t - dt, cam)
        assert (depth > 0).all()   # closed room: every ray hits geometry
        return cam, left, right, prev, depth, dt

    @staticmethod
    def _disp_sig_from_depth(depth, min_depth=0.1, max_depth=100.0):
        """Invert disp_to_depth: sigmoid-disparity encoding a given depth."""
        min_disp, max_disp = 1.0 / max_depth, 1.0 / min_depth
        return (1.0 / depth - min_disp) / (max_disp - min_disp)

    def _loss_at_scale(self, s, cam, left, right, prev, depth, dt):
        """monodepth_loss at depth = s*GT with the temporal translation
        jointly scaled by s (what a pose net co-adapting with depth does)."""
        cfg = MonodepthLossConfig(scales=(0,), automask=False,
                                  fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        d = jnp.asarray(self._disp_sig_from_depth(s * depth))[None, ..., None]
        tgt = jnp.asarray(left, jnp.float32)[None] / 255.0
        # temporal target->source: X_src = X_tgt + (t_src - t_tgt) (R = I)
        T_prev = jnp.eye(4)[None].at[:, :3, 3].set(jnp.asarray(-dt) * s)
        # stereo: constant, NOT scaled (the known 0.5 m baseline)
        T_s = jnp.eye(4)[None].at[:, 0, 3].set(-self.B)
        src_prev = jnp.asarray(prev, jnp.float32)[None] / 255.0
        src_s = jnp.asarray(right, jnp.float32)[None] / 255.0
        mono, _ = monodepth_loss({0: d}, [T_prev], tgt, [src_prev], cfg)
        both, _ = monodepth_loss({0: d}, [T_prev, T_s], tgt, [src_prev, src_s], cfg)
        return float(mono), float(both)

    def test_stereo_term_anchors_scale(self):
        """Temporal-only loss is flat across joint (depth, translation)
        scaling; adding the stereo frame puts the minimum at s=1."""
        setup = self._stereo_setup()
        scales = [0.5, 0.75, 1.0, 1.5, 2.0]
        mono_l, both_l = zip(*[self._loss_at_scale(s, *setup) for s in scales])
        # temporal-only: scale-ambiguous (variation well under the stereo
        # term's; bilinear resampling keeps it from being exactly flat)
        assert (max(mono_l) - min(mono_l)) < 0.2 * (max(both_l) - min(both_l))
        # mono+stereo: global minimum at the metric scale
        assert int(np.argmin(both_l)) == scales.index(1.0)

    def test_stereo_training_resolves_metric_scale(self):
        """Gradient descent on the mono+stereo loss over a scale parameter
        converges to metric (median predicted depth ~ GT median WITHOUT
        median scaling) — the VERDICT item-4 done criterion in its
        well-conditioned 1-D form."""
        import optax

        cam, left, right, prev, depth, dt = self._stereo_setup()
        cfg = MonodepthLossConfig(scales=(0,), automask=False,
                                  fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy)
        tgt = jnp.asarray(left, jnp.float32)[None] / 255.0
        src_s = jnp.asarray(right, jnp.float32)[None] / 255.0
        src_p = jnp.asarray(prev, jnp.float32)[None] / 255.0
        gt_depth = jnp.asarray(depth)

        def loss_fn(log_s):
            s = jnp.exp(log_s)
            d = self._disp_sig_from_depth(s * gt_depth)[None, ..., None]
            T_prev = jnp.eye(4)[None].at[:, :3, 3].set(jnp.asarray(-dt) * s)
            T_s = jnp.eye(4)[None].at[:, 0, 3].set(-self.B)
            loss, _ = monodepth_loss({0: d}, [T_prev, T_s], tgt,
                                     [src_p, src_s], cfg)
            return loss

        grad_fn = jax.jit(jax.grad(loss_fn))
        gt_median = float(jnp.median(gt_depth))
        # photometric gradients are local (~1px): start within the basin
        # from both sides (real training gets the same effect from the
        # multi-scale pyramid, cfg.scales=(0,1,2,3))
        for s0 in (0.85, 1.2):
            tx = optax.adam(0.03)
            log_s = jnp.asarray(np.log(s0), jnp.float32)
            opt = tx.init(log_s)
            for _ in range(60):
                g = grad_fn(log_s)
                up, opt = tx.update(g, opt)
                log_s = optax.apply_updates(log_s, up)
            s = float(jnp.exp(log_s))
            pred_median = s * gt_median
            assert abs(pred_median / gt_median - 1.0) < 0.05, (s0, s)

    @pytest.mark.slow
    def test_train_step_stereo(self, rng):
        from tpu3drec.models.training import TrainConfig, init_state, make_train_step

        cfg = TrainConfig(height=H, width=W, use_stereo=True)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=10)
        step = make_train_step(model, tx, cfg)
        batch = {
            "target": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "prev": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "next": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "stereo": jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32)),
            "stereo_sign": jnp.asarray([-1.0], jnp.float32),
        }
        state, loss, aux = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        assert int(state.step) == 1

    def test_loader_attaches_stereo_frame(self):
        from tpu3drec.data.datasets import SequenceSpec
        from tpu3drec.data.loader import TripletLoader

        class StereoDS:
            def load_color(self, folder, idx, size=None):
                r = np.random.default_rng(idx)
                return (r.uniform(size=(16, 24, 3)) * 255).astype(np.uint8)

            def load_stereo_color(self, folder, idx, size=None):
                r = np.random.default_rng(1000 + idx)
                return (r.uniform(size=(16, 24, 3)) * 255).astype(np.uint8)

        specs = [SequenceSpec("x", i) for i in (1, 2, 3, 4)]
        loader = TripletLoader(StereoDS(), specs, batch_size=2, height=16,
                               width=24, augment=False, with_stereo=True,
                               prefetch=0)
        b = next(iter(loader))
        assert b["stereo"].shape == (2, 16, 24, 3)
        # no augmentation -> no flips -> left-target sign is always -1
        np.testing.assert_array_equal(b["stereo_sign"], [-1.0, -1.0])
        # flipping flips the sign with the images (baseline_sign contract)
        loader_aug = TripletLoader(StereoDS(), specs, batch_size=4, height=16,
                                   width=24, augment=True, with_stereo=True,
                                   seed=5, prefetch=0)
        ba = next(iter(loader_aug))
        assert set(np.unique(ba["stereo_sign"])) <= {-1.0, 1.0}


@pytest.mark.slow
def test_training_convergence_smoke(tmp_path):
    """Short version of tools/train_convergence.py (VERDICT r2 missing-item
    1): self-supervised training on a textured sim must DRIVE the depth
    metrics — loss down, post-training abs_rel beats the untrained net —
    with a real orbax checkpoint+resume mid-run."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.train_convergence import run

    s = run(steps=60, height=64, width=96, batch=2,
            out_dir=str(tmp_path / "conv"), n_frames=24, eval_every=30)
    assert s["loss_last100"] < s["loss_first100"], s
    # 60 tiny-res steps: direction must be right (the committed
    # docs/convergence artifact pins the full-run magnitudes)
    assert s["final"]["abs_rel"] < 0.9 * s["init"]["abs_rel"], s
    assert s["final"]["a1"] > s["init"]["a1"], s
    # curve artifact exists and is valid JSONL
    lines = (tmp_path / "conv" / "curve.jsonl").read_text().splitlines()
    assert len(lines) >= 61
    json.loads(lines[-1])
