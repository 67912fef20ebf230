"""Stereo pipeline — reference configuration 3: stereo RGB -> PSMNet-class
disparity -> depth -> fused point cloud + octomap export.

The stereo path the reference documents but ships no code for
(`ref/readme.md:5,29`; SURVEY.md C7). Depth from disparity uses the
reference's 0.1m stereo baseline convention (`mono_dataset.py:203-209`)
unless overridden.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.models.psmnet import PSMNet, disparity_to_depth
from tpu3drec.pipelines import rgbd
from tpu3drec.utils.config import RGBDPipelineConfig


@dataclass
class StereoPipelineConfig:
    rgbd: RGBDPipelineConfig = field(default_factory=RGBDPipelineConfig)
    baseline_m: float = 0.1
    max_disp: int = 64
    feat_ch: int = 32
    batch: int = 4


def train(
    cfg,                          # StereoTrainConfig
    lefts: np.ndarray,            # (F,H,W,3) float [0,1]
    rights: np.ndarray,
    gt_disp: np.ndarray,          # (F,H,W) pixels
    mask: np.ndarray,             # (F,H,W) validity
    log_dir: str = "runs/stereo",
    log_every: int = 10,
    resume: bool = True,
    seed: int = 0,
):
    """Supervised PSMNet training (smooth-L1 on GT disparity,
    `models/psmnet.py:146`), the training side the reference documents but
    never ships (`ref/readme.md:21-22`). Jitted DP step, orbax checkpoints,
    JSONL metrics — same loop skeleton as `pipelines/monocular.train`."""
    from tpu3drec.models.psmnet_training import (
        init_stereo_state,
        iterate_stereo_batches,
        make_stereo_train_step,
    )
    from tpu3drec.utils.checkpoint import CheckpointManager
    from tpu3drec.utils.metrics_logger import MetricsLogger, ThroughputMeter

    model, state, tx = init_stereo_state(jax.random.PRNGKey(seed), cfg)
    ckpt = CheckpointManager(log_dir + "/ckpt", save_frequency=5)
    ckpt.save_config(cfg)
    if resume:
        state = ckpt.restore(state)
    step_fn = make_stereo_train_step(model, tx)
    logger = MetricsLogger(log_dir, "train")
    steps_per_epoch = max(lefts.shape[0] // cfg.batch_size, 1)
    meter = ThroughputMeter(cfg.num_epochs * steps_per_epoch, cfg.batch_size)
    rng = np.random.default_rng(seed)

    step = int(state.step)
    last_loss = float("nan")
    for epoch in range(cfg.num_epochs):
        for batch in iterate_stereo_batches(lefts, rights, gt_disp, mask,
                                            cfg.batch_size, rng):
            state, loss = step_fn(state, batch)
            step += 1
            last_loss = float(loss)
            if step % log_every == 0:
                scalars = {"loss": last_loss}
                scalars.update(meter.report(step))
                logger.log(step, scalars, echo=True)
        ckpt.maybe_save(epoch, state)
    ckpt.save(step, state)
    logger.close()
    return model, state, last_loss


def infer_disparity(model: PSMNet, variables, lefts: np.ndarray,
                    rights: np.ndarray, batch: int = 4) -> np.ndarray:
    """(F,H,W,3) pairs -> (F,H,W) disparity, batched dispatches."""
    fwd = jax.jit(lambda l, r: model.apply(variables, l, r, train=False))
    out = []
    for i in range(0, lefts.shape[0], batch):
        l = lefts[i : i + batch]
        r = rights[i : i + batch]
        pad = batch - l.shape[0]
        if pad:
            z = np.zeros((pad,) + l.shape[1:], l.dtype)
            l = np.concatenate([l, z])
            r = np.concatenate([r, z])
        d = np.asarray(fwd(jnp.asarray(l), jnp.asarray(r)))
        out.append(d[: batch - pad] if pad else d)
    return np.concatenate(out)


def load_trained(log_dir: str, cfg):
    """Restore trained PSMNet variables from a `train()` checkpoint dir.
    Returns (model, variables) ready for `run(..., variables=...)`."""
    from tpu3drec.models.psmnet_training import init_stereo_state
    from tpu3drec.utils.checkpoint import CheckpointManager

    model, state, _ = init_stereo_state(jax.random.PRNGKey(0), cfg)
    state = CheckpointManager(log_dir + "/ckpt").restore(state)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def run(
    cfg: StereoPipelineConfig,
    lefts: np.ndarray,            # (F,H,W,3) float [0,1]
    rights: np.ndarray,
    q_xyzw: np.ndarray,           # (F,4) COLMAP-convention poses
    t: np.ndarray,                # (F,3)
    variables=None,               # trained PSMNet variables (or None: init)
    keep_points: bool = False,
):
    """Stereo frames + poses -> map artifacts (PLY/.bt per cfg.rgbd)."""
    model = PSMNet(max_disp=cfg.max_disp, feat_ch=cfg.feat_ch)
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1,) + lefts.shape[1:3] + (3,)),
            jnp.zeros((1,) + lefts.shape[1:3] + (3,)),
        )
    disp = infer_disparity(model, variables, lefts, rights, batch=cfg.batch)
    depth = np.asarray(
        disparity_to_depth(jnp.asarray(disp), cfg.rgbd.camera.fx, cfg.baseline_m)
    )
    return rgbd.run_arrays(depth, q_xyzw, t, cfg.rgbd, keep_points=keep_points)
