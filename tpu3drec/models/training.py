"""Monodepth training step — pjit data-parallel over the mesh `data` axis.

Replicates the reference training loop semantics (`ref/monodepth2/trainer.py:
183-261`): Adam @ 1e-5 with a x0.1 step decay after 15 epochs
(`trainer.py:102-104`, `options.py:95-107`), photometric+smoothness loss,
pose from the pose net or from GT (`use_GTpose`, `trainer.py:267-274`).

TPU-first: one jitted step (forward, loss, backward, update); the batch's
leading axis carries a `data`-axis sharding so XLA inserts the gradient
all-reduce over ICI; BatchNorm batch statistics reduce over the global
(sharded) batch the same way.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from tpu3drec.models.monodepth import (
    MonodepthLossConfig,
    MonodepthModel,
    monodepth_loss,
    transformation_from_parameters,
)


@dataclass
class TrainConfig:
    learning_rate: float = 1e-5        # --learning_rate default
    scheduler_step_epochs: int = 15    # --scheduler_step_size
    scheduler_gamma: float = 0.1
    num_epochs: int = 20               # --num_epochs
    batch_size: int = 1                # reference default (options.py:91-94)
    height: int = 480
    width: int = 640
    use_gt_pose: bool = False          # --use_GTpose
    # mono+stereo self-supervision: adds the reference's "s" frame with a
    # constant known-baseline transform (`ref/monodepth2/mono_dataset.py:
    # 203-209`), which anchors METRIC scale — the temporal-only loss is
    # scale-ambiguous (depth*s, translation*s is a loss no-op), but the
    # stereo T's 0.1 m is fixed, so only metric depth warps the stereo
    # frame correctly.
    use_stereo: bool = False
    stereo_baseline: float = 0.1       # metres (`mono_dataset.py:206-208`)
    depth_layers: int = 18
    compute_dtype: str = "float32"     # "bfloat16" puts convs on the bf16 MXU path
    loss: MonodepthLossConfig = None

    def __post_init__(self):
        if self.loss is None:
            self.loss = MonodepthLossConfig(
                fx=0.9375 * self.width, fy=1.25 * self.height,
                cx=0.5 * self.width, cy=0.5 * self.height,
            )


class TrainState:
    """Minimal train state pytree: params + batch_stats + opt state + step."""

    def __init__(self, params, batch_stats, opt_state, step):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.step = step

    def tree_flatten(self):
        return (self.params, self.batch_stats, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam with the reference's StepLR schedule."""
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.learning_rate,
        boundaries_and_scales={
            cfg.scheduler_step_epochs * steps_per_epoch: cfg.scheduler_gamma
        },
    )
    return optax.adam(schedule)


def init_state(rng, cfg: TrainConfig, steps_per_epoch: int = 1000):
    import jax.numpy as _jnp

    dtype = {"float32": _jnp.float32, "bfloat16": _jnp.bfloat16}[cfg.compute_dtype]
    model = MonodepthModel(depth_layers=cfg.depth_layers, dtype=dtype)
    dummy = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    variables = model.init(rng, dummy, [dummy, dummy], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    return model, TrainState(params, batch_stats, tx.init(params), jnp.int32(0)), tx


def _forward_loss(params, batch_stats, model, batch, cfg: TrainConfig, rng):
    """Loss for one batch: frames NHWC float in [0,1].

    batch keys: "target", "prev", "next"; with use_gt_pose also
    "gt_axisangle" (N,2,3) and "gt_translation" (N,2,3) rows ordered
    [prev, next] like the reference's inputs["axisangle"]
    (`interior_dataset.py:125-130`); with use_stereo also "stereo"
    (N,H,W,3) and "stereo_sign" (N,) in {-1,+1} (flip-dependent baseline
    sign, `mono_dataset.py:203-209`).
    """
    target, prev, nxt = batch["target"], batch["prev"], batch["next"]
    variables = {"params": params, "batch_stats": batch_stats}

    (disps, pose_prev, pose_next), new_model_state = model.apply(
        variables, target, prev, nxt, with_pose=not cfg.use_gt_pose,
        method=MonodepthModel.forward_train, mutable=["batch_stats"],
    )
    # loss math in f32 regardless of the conv compute dtype
    disps = {k: v.astype(jnp.float32) for k, v in disps.items()}
    if pose_prev is not None:
        pose_prev = tuple(p.astype(jnp.float32) for p in pose_prev)
        pose_next = tuple(p.astype(jnp.float32) for p in pose_next)

    if cfg.use_gt_pose:
        # GT path (`trainer.py:267-274`): no inversion, rows [prev, next]
        T_prev = transformation_from_parameters(
            batch["gt_axisangle"][:, 0], batch["gt_translation"][:, 0]
        )
        T_next = transformation_from_parameters(
            batch["gt_axisangle"][:, 1], batch["gt_translation"][:, 1]
        )
    else:
        # invert for the negative frame id (`trainer.py:300-302`)
        T_prev = transformation_from_parameters(*pose_prev, invert=True)
        T_next = transformation_from_parameters(*pose_next, invert=False)

    frame_Ts = [T_prev, T_next]
    sources = [prev, nxt]
    if cfg.use_stereo:
        # constant stereo transform: identity R, baseline along x with the
        # per-sample flip sign (`mono_dataset.py:203-209`). Pose net never
        # sees the "s" frame (reference excludes it, `trainer.py:283-289`).
        N = target.shape[0]
        T_s = jnp.tile(jnp.eye(4, dtype=target.dtype)[None], (N, 1, 1))
        T_s = T_s.at[:, 0, 3].set(
            batch["stereo_sign"].astype(target.dtype) * cfg.stereo_baseline
        )
        frame_Ts.append(T_s)
        sources.append(batch["stereo"])

    noise = None
    if rng is not None:
        # the reference's randn*1e-5 automask tiebreak (`trainer.py:475-478`)
        noise = (
            jax.random.normal(
                rng, (len(sources),) + target.shape[:-1], dtype=target.dtype
            )
            * 1e-5
        )
    loss, aux = monodepth_loss(
        disps, frame_Ts, target, sources, cfg.loss,
        identity_noise=noise,
    )
    return loss, (aux, new_model_state["batch_stats"])


def make_train_step(model, tx, cfg: TrainConfig):
    """Build the jitted SPMD training step. Shard batch leading axis over
    `data`; params/opt state replicated (the nets are small — DP only, per
    SURVEY.md §2.3's strategy table)."""

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (loss, (aux, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, model, batch, cfg, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt_state, state.step + 1)
        return new_state, loss, aux

    return train_step


def make_eval_depth(model, cfg: TrainConfig):
    """Jitted depth inference: RGB (N,H,W,3) -> depth (N,H,W)."""

    @jax.jit
    def eval_depth(params, batch_stats, images):
        disps = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False, method=MonodepthModel.depth,
        )
        from tpu3drec.models.monodepth import disp_to_depth

        disp0 = disps[0]
        N, h, w, _ = disp0.shape
        disp_full = jax.image.resize(
            disp0, (N, cfg.height, cfg.width, 1), method="bilinear"
        )
        _, depth = disp_to_depth(disp_full[..., 0], cfg.loss.min_depth, cfg.loss.max_depth)
        return depth

    return eval_depth
