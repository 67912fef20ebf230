"""PSMNet-class stereo net + dataset/loader tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from tpu3drec.data.datasets import (
    InteriorNetDataset,
    AirSimCaptureDataset,
    SequenceSpec,
    read_split_file,
    write_split_files,
)
from tpu3drec.data.loader import TripletLoader, apply_color_jitter, color_jitter_params
from tpu3drec.models.psmnet import (
    PSMNet,
    build_cost_volume,
    disparity_to_depth,
    smooth_l1_loss,
)


class TestCostVolume:
    def test_alignment(self, rng):
        """cost[d] at pixel x must pair left(x) with right(x-d)."""
        N, H, W, C = 1, 4, 8, 3
        fl = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        fr = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        cv = build_cost_volume(fl, fr, 3)
        assert cv.shape == (N, 3, H, W, 2 * C)
        np.testing.assert_allclose(cv[0, 0, :, :, C:], fr[0])
        np.testing.assert_allclose(cv[0, 2, :, 2:, C:], fr[0, :, :-2, :])
        np.testing.assert_allclose(cv[0, 2, :, :2, C:], 0.0)

    def test_disparity_to_depth(self):
        d = disparity_to_depth(jnp.asarray([10.0, 20.0]), fx=500.0, baseline=0.1)
        np.testing.assert_allclose(np.asarray(d), [5.0, 2.5])


class TestPSMNet:
    def test_forward_shape_and_range(self, rng):
        H, W = 32, 64
        model = PSMNet(max_disp=16, feat_ch=8)
        l = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), l, r)
        disp = model.apply(v, l, r)
        assert disp.shape == (1, H, W)
        dn = np.asarray(disp)
        assert (dn >= 0).all() and (dn <= 16).all()

    @pytest.mark.slow
    def test_training_reduces_loss(self, rng):
        """Random-dot stereogram with constant disparity: loss must drop."""
        H, W, D = 32, 64, 8
        base = rng.uniform(size=(H, W + D, 3)).astype(np.float32)
        left = base[:, D:, :][None]
        right = base[:, :-D if D else None, :][None]  # shifted by D
        gt = np.full((1, H, W), float(D), np.float32)
        mask = np.ones_like(gt)
        model = PSMNet(max_disp=16, feat_ch=8)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(left), jnp.asarray(right),
                       train=True)
        params, bstats = v["params"], v["batch_stats"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, bstats, opt):
            def loss_fn(p):
                disp, new_state = model.apply(
                    {"params": p, "batch_stats": bstats},
                    jnp.asarray(left), jnp.asarray(right), train=True,
                    mutable=["batch_stats"],
                )
                return smooth_l1_loss(disp, jnp.asarray(gt), jnp.asarray(mask)), new_state

            (l, new_state), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), new_state["batch_stats"], opt, l

        losses = []
        for _ in range(8):
            params, bstats, opt, l = step(params, bstats, opt)
            losses.append(float(l))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestDatasets:
    def _make_interiornet(self, tmp_path, rng, n=5):
        scene = tmp_path / "scene1"
        os.makedirs(scene / "jpg")
        os.makedirs(scene / "depth")
        for i in range(n):
            img = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(scene / "jpg" / f"{i}.jpg")
            d = (rng.uniform(500, 5000, size=(48, 64))).astype(np.int32)
            Image.fromarray(d, mode="I").save(scene / "depth" / f"{i}.png")
        with open(scene / "cam0.ccam", "w") as f:
            f.write("# header\n")
            for i in range(n):
                q = [1, 0, 0, 0]
                t = [0.1 * i, 0, 0]
                f.write(" ".join(map(str, [0] * 6 + q + t + [0, 0])) + "\n")
        return str(tmp_path), "scene1"

    def test_interiornet_reader(self, tmp_path, rng):
        root, scene = self._make_interiornet(tmp_path, rng)
        ds = InteriorNetDataset(root)
        img = ds.load_color(scene, 0, size=(64, 48))
        assert img.shape == (48, 64, 3)
        d = ds.load_gt_depth(scene, 1)
        assert d.shape == (480, 640)  # NEAREST-resized to full res
        aa, t = ds.gt_relative_pose(scene, 2)
        assert aa.shape == (2, 3) and t.shape == (2, 3)
        np.testing.assert_allclose(aa, 0.0, atol=1e-6)  # identity rotations
        np.testing.assert_allclose(t[0], [0.1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(t[1], [0.3, 0, 0], atol=1e-6)

    def test_split_files_roundtrip(self, tmp_path):
        train, val = write_split_files(str(tmp_path), "sceneA", range(100))
        tr = read_split_file(train)
        va = read_split_file(val)
        assert len(tr) + len(va) == 100
        assert tr[0].folder == "sceneA" and tr[0].frame_index == 0

    def test_airsim_capture_layout(self, tmp_path, rng):
        os.makedirs(tmp_path / "front")
        os.makedirs(tmp_path / "depth")
        for i in (0, 1, 5):
            img = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "front" / f"{i}.jpg")
            Image.fromarray(img).save(tmp_path / "depth" / f"{i}.jpg")
        ds = AirSimCaptureDataset(str(tmp_path))
        assert ds.frame_ids() == [0, 1, 5]
        assert ds.load_color(1).shape == (24, 32, 3)
        assert ds.load_depth(5).shape == (24, 32)

    def test_triplet_loader_batches(self, tmp_path, rng):
        root, scene = self._make_interiornet(tmp_path, rng, n=6)
        ds = InteriorNetDataset(root)
        specs = [SequenceSpec(scene, i) for i in (1, 2, 3, 4)]
        loader = TripletLoader(ds, specs, batch_size=2, height=48, width=64,
                               augment=True, with_gt_pose=True, seed=0)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["target"].shape == (2, 48, 64, 3)
        assert b["prev"].shape == (2, 48, 64, 3)
        assert b["gt_axisangle"].shape == (2, 2, 3)
        assert b["target"].dtype == np.float32
        assert 0.0 <= b["target"].min() and b["target"].max() <= 1.0

    def test_color_jitter_identity_params(self, rng):
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        p = {"brightness": 1.0, "contrast": 1.0, "saturation": 1.0, "hue": 0.0}
        np.testing.assert_allclose(apply_color_jitter(img, p), img, atol=1e-6)


class TestLoaderResilience:
    def test_corrupt_samples_skipped(self):
        from tpu3drec.data.datasets import SequenceSpec
        from tpu3drec.data.loader import TripletLoader

        class FlakyDS:
            def load_color(self, folder, idx, size=None):
                if idx in (3, 4, 5):  # frame 4's whole triplet is bad
                    raise OSError("corrupt file")
                r = np.random.default_rng(idx)
                return (r.uniform(size=(16, 24, 3)) * 255).astype(np.uint8)

        specs = [SequenceSpec("x", i) for i in (1, 2, 4, 7, 8, 9)]
        loader = TripletLoader(FlakyDS(), specs, batch_size=2, height=16,
                               width=24, augment=False, prefetch=0)
        batches = list(loader)
        # specs 2 (needs frame 3) and 4 (frames 3,4,5) are unreadable ->
        # 4 good samples -> 2 full batches, 2 skips
        assert len(batches) == 2
        assert loader.skipped == 2
        for b in batches:
            assert b["target"].shape == (2, 16, 24, 3)
