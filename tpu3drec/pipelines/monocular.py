"""Monocular pipeline — reference configuration 4: self-supervised depth
training + inference + full depth->pose->fusion mapping.

The one-process equivalent of the reference chain: `Trainer.train()`
(`ref/monodepth2/trainer.py:183-227`) -> depth PNG export -> COLMAP poses ->
`camera_to_world` fusion. Training runs the jitted SPMD step from
`models/training.py` (DP over the mesh `data` axis), validation mirrors
`Trainer.val()` (one held-out batch per log step + depth metrics,
`trainer.py:330-349,508-539`), checkpoints via orbax.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.data.loader import TripletLoader
from tpu3drec.models.metrics import depth_metrics
from tpu3drec.models.training import (
    TrainConfig,
    init_state,
    make_eval_depth,
    make_train_step,
)
from tpu3drec.utils.checkpoint import CheckpointManager
from tpu3drec.utils.metrics_logger import MetricsLogger, ThroughputMeter


@dataclass
class MonocularRunConfig:
    train: TrainConfig = field(default_factory=TrainConfig)
    log_dir: str = "runs/monocular"
    log_every: int = 25        # reference alternates 250/2000 (`trainer.py:214-218`)
    val_every: int = 100
    max_steps: int = 0         # 0 = epochs * len(loader)


def train(
    cfg: MonocularRunConfig,
    train_loader: TripletLoader,
    val_loader: TripletLoader | None = None,
    resume: bool = True,
):
    """Epoch loop faithful to `run_epoch` (`trainer.py:194-227`)."""
    tcfg = cfg.train
    steps_per_epoch = max(len(train_loader), 1)
    model, state, tx = init_state(jax.random.PRNGKey(0), tcfg, steps_per_epoch)
    ckpt = CheckpointManager(cfg.log_dir + "/ckpt",
                             save_frequency=5)
    ckpt.save_config(tcfg)
    if resume:
        state = ckpt.restore(state)
    step_fn = make_train_step(model, tx, tcfg)
    eval_fn = make_eval_depth(model, tcfg)
    logger = MetricsLogger(cfg.log_dir, "train")
    val_logger = MetricsLogger(cfg.log_dir, "val")
    meter = ThroughputMeter(tcfg.num_epochs * steps_per_epoch, tcfg.batch_size)

    step = int(state.step)
    rng = jax.random.PRNGKey(step)
    val_iter = iter(val_loader) if val_loader is not None else None
    for epoch in range(tcfg.num_epochs):
        for batch in train_loader:
            rng, sub = jax.random.split(rng)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, loss, aux = step_fn(state, jb, sub)
            step += 1
            if step % cfg.log_every == 0:
                scalars = {"loss": float(loss)}
                scalars.update(meter.report(step))
                logger.log(step, scalars, echo=True)
            if val_iter is not None and step % cfg.val_every == 0:
                # one val batch per log step, reference `val()` semantics
                try:
                    vb = next(val_iter)
                except StopIteration:
                    val_iter = iter(val_loader)
                    vb = next(val_iter)
                depth = eval_fn(state.params, state.batch_stats,
                                jnp.asarray(vb["target"]))
                scalars = {}
                if "gt_depth" in vb:
                    m = depth_metrics(depth, jnp.asarray(vb["gt_depth"]))
                    scalars.update({k: float(v) for k, v in m.items()})
                val_logger.log(step, scalars)
            if cfg.max_steps and step >= cfg.max_steps:
                break
        ckpt.maybe_save(epoch, state)
        if cfg.max_steps and step >= cfg.max_steps:
            break
    ckpt.save(step, state)
    logger.close()
    val_logger.close()
    return model, state


def infer_depth_maps(model, state, images: np.ndarray, cfg: TrainConfig,
                     batch: int = 8) -> np.ndarray:
    """RGB (F,H,W,3) uint8/float -> metric-ish depth (F,H,W) float32,
    batched device dispatches."""
    eval_fn = make_eval_depth(model, cfg)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    out = []
    for i in range(0, images.shape[0], batch):
        chunk = images[i : i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        d = np.asarray(eval_fn(state.params, state.batch_stats, jnp.asarray(chunk)))
        out.append(d[: batch - pad] if pad else d)
    return np.concatenate(out, axis=0)
