"""PSMNet training-path tests (VERDICT r1 item 3: the net and the loss
existed but nothing trained — `ref/readme.md:21-22` names PSMNet as a
first-class depth source)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drec.data.capture_sim import PlanarScene, render_stereo_pairs
from tpu3drec.models.psmnet_training import (
    StereoTrainConfig,
    init_stereo_state,
    iterate_stereo_batches,
    make_stereo_eval,
    make_stereo_train_step,
)
from tpu3drec.utils.config import CameraConfig


def _sim_pairs(n=6, H=48, W=96, seed=3):
    rng = np.random.default_rng(seed)
    scene = PlanarScene.urban(rng, n_boxes=8, extent=25.0)
    cam = CameraConfig(fx=0.9 * W, fy=0.9 * W, cx=(W - 1) / 2, cy=(H - 1) / 2,
                      width=W, height=H)
    from scipy.spatial.transform import Rotation as ScipyR

    poses = []
    for f in range(n):
        R = ScipyR.from_rotvec([0, 0.03 * f, 0]).as_matrix().astype(np.float32)
        C = np.array([0.5 * f, -1.0, 0.9 * f], np.float32)
        poses.append((R, (-R @ C).astype(np.float32)))
    return render_stereo_pairs(scene, poses, cam, baseline=0.3)


class TestStereoSim:
    def test_disparity_geometry(self):
        """GT disparity must actually map left pixels onto right pixels:
        warp right by the disparity and the photometric error must beat
        the unwarped pair by a wide margin."""
        lefts, rights, disp, mask = _sim_pairs(n=2)
        l, r, d, m = lefts[0], rights[0], disp[0], mask[0]
        H, W = d.shape
        xx = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
        src = np.clip(np.round(xx - d).astype(np.int32), 0, W - 1)
        warped = np.take_along_axis(r, src[..., None].repeat(3, -1), axis=1)
        m3 = m[..., None]
        err_warp = np.abs(warped - l)[m3.repeat(3, -1) > 0].mean()
        err_raw = np.abs(r - l)[m3.repeat(3, -1) > 0].mean()
        assert err_warp < 0.5 * err_raw, (err_warp, err_raw)

    def test_mask_excludes_offframe(self):
        lefts, rights, disp, mask = _sim_pairs(n=1)
        xx = np.arange(disp.shape[2], dtype=np.float32)[None, None, :]
        assert ((xx - disp) >= 0)[mask > 0].all()


@pytest.mark.slow
class TestStereoTraining:
    def test_20_steps_reduce_loss_and_beat_random_init(self, tmp_path):
        """VERDICT item 3 acceptance: a short training run must (a) reduce
        the smooth-L1 loss and (b) produce lower end-point-error than the
        random-init weights the round-1 stereo pipeline ran on."""
        lefts, rights, disp, mask = _sim_pairs(n=6, H=48, W=96)
        cfg = StereoTrainConfig(learning_rate=1e-3, num_epochs=1,
                                batch_size=2, height=48, width=96,
                                max_disp=32, feat_ch=8)
        model, state, tx = init_stereo_state(jax.random.PRNGKey(0), cfg)
        step_fn = make_stereo_train_step(model, tx)
        eval_fn = make_stereo_eval(model)

        hold = (jnp.asarray(lefts[:2]), jnp.asarray(rights[:2]),
                jnp.asarray(disp[:2]), jnp.asarray(mask[:2]))
        _, epe0 = eval_fn(state.params, state.batch_stats, *hold)

        losses = []
        rng = np.random.default_rng(0)
        for _ in range(10):  # 10 passes x 3 batches = 30 steps
            for batch in iterate_stereo_batches(lefts, rights, disp, mask, 2,
                                                rng):
                state, loss = step_fn(state, batch)
                losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert int(state.step) >= 20
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

        _, epe1 = eval_fn(state.params, state.batch_stats, *hold)
        assert float(epe1) < float(epe0), (float(epe0), float(epe1))

    def test_pipeline_train_checkpoint_roundtrip(self, tmp_path):
        """pipelines.stereo.train writes a checkpoint that load_trained
        restores bit-identically."""
        from tpu3drec.pipelines.stereo import load_trained, train

        lefts, rights, disp, mask = _sim_pairs(n=4, H=32, W=64)
        cfg = StereoTrainConfig(learning_rate=1e-3, num_epochs=2,
                                batch_size=2, height=32, width=64,
                                max_disp=16, feat_ch=8)
        model, state, last = train(cfg, lefts, rights, disp, mask,
                                   log_dir=str(tmp_path / "run"),
                                   log_every=100, resume=False)
        assert np.isfinite(last)
        model2, variables = load_trained(str(tmp_path / "run"), cfg)
        p0 = jax.tree_util.tree_leaves(state.params)
        p1 = jax.tree_util.tree_leaves(variables["params"])
        for a, b in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_stereo_convergence_smoke(tmp_path):
    """Short tools/stereo_convergence.py run: supervised PSMNet training
    must drive loss and end-point-error down vs the untrained net."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.stereo_convergence import run

    s = run(steps=30, height=48, width=96, batch=2,
            out_dir=str(tmp_path / "st"), max_disp=16, n_frames=8,
            eval_every=15)
    assert s["loss_last"] < 0.5 * s["loss_first"], s
    assert s["final_epe_px"] < s["init_epe_px"], s
