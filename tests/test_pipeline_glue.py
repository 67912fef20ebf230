"""Checkpointing, monocular/stereo pipeline glue, CLI smoke tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tpu3drec.models.training import TrainConfig, init_state, make_train_step
from tpu3drec.utils.checkpoint import CheckpointManager, restore_partial

H, W = 32, 64


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path, rng):
        cfg = TrainConfig(height=H, width=W)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, 10)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_frequency=1)
        mgr.save_config(cfg)
        mgr.save(3, state)
        assert mgr.latest_step() == 3
        # fresh template with different rng -> different params
        _, template, _ = init_state(jax.random.PRNGKey(7), cfg, 10)
        restored = mgr.restore(template)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert os.path.exists(tmp_path / "ckpt" / "opt.json")
        mgr.close()

    def test_maybe_save_frequency(self, tmp_path):
        cfg = TrainConfig(height=H, width=W)
        _, state, _ = init_state(jax.random.PRNGKey(0), cfg, 10)
        mgr = CheckpointManager(str(tmp_path / "c"), save_frequency=5)
        assert not mgr.maybe_save(0, state)   # epoch 1
        assert mgr.maybe_save(4, state)       # epoch 5
        mgr.close()

    def test_restore_partial_merge(self):
        params = {"a": np.zeros(3), "b": {"c": np.zeros(2)}}
        loaded = {"a": np.ones(3), "b": {"d": np.ones(5)}}
        merged = restore_partial(params, loaded)
        np.testing.assert_array_equal(merged["a"], 1.0)
        np.testing.assert_array_equal(merged["b"]["c"], 0.0)
        assert "d" not in merged["b"]


class TestMonocularPipeline:
    @pytest.mark.slow
    def test_short_training_run(self, tmp_path, rng):
        from tpu3drec.data.datasets import SequenceSpec
        from tpu3drec.pipelines.monocular import MonocularRunConfig, train, infer_depth_maps

        class FakeDS:
            def load_color(self, folder, idx, size=None):
                r = np.random.default_rng(idx)
                return (r.uniform(size=(H, W, 3)) * 255).astype(np.uint8)

        from tpu3drec.data.loader import TripletLoader

        specs = [SequenceSpec("x", i) for i in range(1, 5)]
        loader = TripletLoader(FakeDS(), specs, batch_size=2, height=H, width=W,
                               augment=False, prefetch=0)
        cfg = MonocularRunConfig(
            train=TrainConfig(height=H, width=W, num_epochs=1, batch_size=2),
            log_dir=str(tmp_path / "run"),
            log_every=1, val_every=1000, max_steps=2,
        )
        model, state = train(cfg, loader)
        assert int(state.step) >= 2
        assert os.path.exists(tmp_path / "run" / "train.jsonl")
        lines = open(tmp_path / "run" / "train.jsonl").read().strip().splitlines()
        assert len(lines) >= 1 and "loss" in json.loads(lines[0])

        depths = infer_depth_maps(model, state, np.zeros((3, H, W, 3), np.float32),
                                  cfg.train, batch=2)
        assert depths.shape == (3, H, W)
        assert (depths > 0).all()


class TestStereoPipeline:
    def test_run_produces_map(self, tmp_path, rng):
        from tpu3drec.pipelines.stereo import StereoPipelineConfig, run
        from tpu3drec.utils.config import RGBDPipelineConfig, CameraConfig, MapConfig

        F = 2
        lefts = rng.uniform(size=(F, H, W, 3)).astype(np.float32)
        rights = rng.uniform(size=(F, H, W, 3)).astype(np.float32)
        q = np.tile([0, 0, 0, 1.0], (F, 1)).astype(np.float32)
        t = np.zeros((F, 3), np.float32)
        cfg = StereoPipelineConfig(
            rgbd=RGBDPipelineConfig(
                camera=CameraConfig(fx=100, fy=100, cx=W / 2, cy=H / 2,
                                    width=W, height=H),
                map=MapConfig(voxel_res=0.5),
                out_ply=str(tmp_path / "stereo.ply"),
                out_bt=str(tmp_path / "stereo.bt"),
            ),
            max_disp=16, feat_ch=8, batch=2,
        )
        res = run(cfg, lefts, rights, q, t)
        assert res.n_frames == F
        assert os.path.exists(tmp_path / "stereo.ply")
        assert os.path.exists(tmp_path / "stereo.bt")


class TestCLI:
    def test_ply2bt_roundtrip(self, tmp_path, rng):
        from tpu3drec.pipelines.cli import main
        from tpu3drec.utils.plyio import write_ply
        from tpu3drec.mapping.btio import read_bt

        pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
        ply = str(tmp_path / "in.ply")
        write_ply(ply, pts)
        out = str(tmp_path / "out.bt")
        main(["ply2bt", ply, "--res", "0.25", "--out", out])
        keys, res = read_bt(out)
        assert res == 0.25 and keys.shape[0] > 100

    def test_icp_fuse_cli(self, tmp_path, rng):
        from tpu3drec.pipelines.cli import main
        from tpu3drec.utils.plyio import write_ply, read_ply
        from tpu3drec.utils.poseio import write_T_txt

        a = rng.normal(size=(20, 3)).astype(np.float32)
        b = rng.normal(size=(30, 3)).astype(np.float32)
        write_ply(str(tmp_path / "a.ply"), a)
        write_ply(str(tmp_path / "b.ply"), b)
        write_T_txt(str(tmp_path / "T.txt"), np.eye(4))
        main(["icp-fuse", str(tmp_path / "a.ply"), str(tmp_path / "b.ply"),
              "--T", str(tmp_path / "T.txt"), "--out", str(tmp_path / "m.ply")])
        merged, _ = read_ply(str(tmp_path / "m.ply"))
        assert merged.shape[0] == 50


class TestTrainMonoCLI:
    @pytest.mark.slow
    def test_train_mono_from_disk(self, tmp_path, rng):
        """CLI train-mono on an InteriorNet-layout dataset (config 4 from
        disk, the reference's Trainer.train() entry)."""
        from PIL import Image

        from tpu3drec.data.datasets import write_split_files
        from tpu3drec.pipelines.cli import main

        scene = tmp_path / "scene1"
        os.makedirs(scene / "jpg")
        os.makedirs(scene / "depth")
        for i in range(6):
            img = (rng.uniform(size=(32, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(scene / "jpg" / f"{i}.jpg")
        with open(scene / "cam0.ccam", "w") as f:
            f.write("# header\n")
            for i in range(6):
                f.write(" ".join(map(str, [0] * 6 + [1, 0, 0, 0, 0.1 * i, 0, 0, 0, 0])) + "\n")
        write_split_files(str(tmp_path / "splits"), "scene1", range(1, 5),
                          train_frac=1.0)
        main([
            "train-mono", "--data-path", str(tmp_path),
            "--split-train", str(tmp_path / "splits" / "train_files.txt"),
            "--height", "32", "--width", "64", "--batch-size", "2",
            "--epochs", "1", "--use-gt-pose",
            "--log-dir", str(tmp_path / "run"),
        ])
        assert os.path.exists(tmp_path / "run" / "train.jsonl")
        assert os.path.exists(tmp_path / "run" / "ckpt")
