"""PSMNet training — supervised smooth-L1 on GT disparity, jitted DP step.

The reference names PSMNet as one of its two depth sources
(`ref/readme.md:21-22,29`) but ships no training code; this is the
TPU-native training loop for `models/psmnet.py`: one jitted step
(forward, smooth-L1 loss over valid-disparity pixels, backward, Adam
update). Data parallelism follows the monodepth recipe
(`models/training.py`): the batch's leading axis carries a `data`-axis
sharding and XLA inserts the gradient all-reduce over ICI; BatchNorm
statistics reduce over the global batch the same way.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from tpu3drec.models.psmnet import PSMNet, smooth_l1_loss
from tpu3drec.models.training import TrainState


@dataclass
class StereoTrainConfig:
    learning_rate: float = 1e-3     # PSMNet's published Adam lr
    num_epochs: int = 10
    batch_size: int = 4
    height: int = 256
    width: int = 512
    max_disp: int = 64
    feat_ch: int = 32
    compute_dtype: str = "float32"  # "bfloat16": convs on the bf16 MXU path


def init_stereo_state(rng, cfg: StereoTrainConfig):
    """Build model + TrainState + optimizer for stereo training."""
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
    model = PSMNet(max_disp=cfg.max_disp, feat_ch=cfg.feat_ch, dtype=dtype)
    dummy = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = optax.adam(cfg.learning_rate)
    return model, TrainState(params, batch_stats, tx.init(params), jnp.int32(0)), tx


def make_stereo_train_step(model: PSMNet, tx):
    """Jitted SPMD step: batch dict with "left"/"right" (N,H,W,3 float in
    [0,1]), "disp" (N,H,W) GT disparity in pixels, "mask" (N,H,W) validity.
    Loss math in f32 regardless of conv compute dtype."""

    @jax.jit
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            disp, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"], batch["right"], train=True,
                mutable=["batch_stats"],
            )
            loss = smooth_l1_loss(disp.astype(jnp.float32),
                                  batch["disp"], batch["mask"])
            return loss, new_state["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), loss

    return train_step


def make_stereo_eval(model: PSMNet):
    """Jitted eval: returns (disparity, end-point-error over valid pixels)."""

    @jax.jit
    def eval_fn(params, batch_stats, left, right, gt_disp, mask):
        disp = model.apply({"params": params, "batch_stats": batch_stats},
                           left, right, train=False)
        err = jnp.abs(disp.astype(jnp.float32) - gt_disp) * mask
        epe = jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)
        return disp, epe

    return eval_fn


def iterate_stereo_batches(lefts, rights, disps, masks, batch_size: int,
                           rng=None):
    """Yield full batches from in-memory stereo arrays (shuffled when an
    ``rng`` is given). Host-side; the arrays stay numpy until dispatch."""
    import numpy as np

    n = lefts.shape[0]
    order = rng.permutation(n) if rng is not None else np.arange(n)
    for i in range(0, n - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        yield {
            "left": jnp.asarray(lefts[idx]),
            "right": jnp.asarray(rights[idx]),
            "disp": jnp.asarray(disps[idx]),
            "mask": jnp.asarray(masks[idx]),
        }
