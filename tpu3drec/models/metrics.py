"""Depth evaluation metrics.

The seven standard metrics the reference computes (`ref/monodepth2/
trainer.py:508-539` via upstream `compute_depth_errors`): abs_rel, sq_rel,
rmse, rmse_log, a1/a2/a3, with per-image median scaling against GT and a
[min, max] depth clamp. The Eigen/Garg crop is off, matching the
reference's InteriorNet setting (`trainer.py:522-528` — deliberately
disabled there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_depth_errors(pred: jnp.ndarray, gt: jnp.ndarray):
    """Per-element metric terms; reduce under the caller's mask."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    return {
        "a1": (thresh < 1.25).astype(jnp.float32),
        "a2": (thresh < 1.25 ** 2).astype(jnp.float32),
        "a3": (thresh < 1.25 ** 3).astype(jnp.float32),
        "abs_rel": jnp.abs(gt - pred) / gt,
        "sq_rel": (gt - pred) ** 2 / gt,
        "rmse_term": (gt - pred) ** 2,
        "rmse_log_term": (jnp.log(gt) - jnp.log(pred)) ** 2,
    }


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries, static-shape (sorts invalids to +inf)."""
    n = jnp.sum(mask)
    vals = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(vals.reshape(-1))
    idx = jnp.maximum(n // 2, 0)
    return s[jnp.clip(idx, 0, s.shape[0] - 1)]


@jax.jit
def depth_metrics(
    pred: jnp.ndarray,  # (N,H,W) predicted depth
    gt: jnp.ndarray,    # (N,H,W) ground-truth depth (0 = invalid)
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
):
    """Batch depth metrics with per-image median scaling
    (`trainer.py:530-539`): pred *= median(gt)/median(pred) over the valid
    mask, then clamp to [min_depth, max_depth]."""

    def per_image(p, g):
        mask = g > min_depth
        med_g = _masked_median(g, mask)
        med_p = _masked_median(p, mask)
        p = p * med_g / jnp.maximum(med_p, 1e-12)
        p = jnp.clip(p, min_depth, max_depth)
        g_safe = jnp.where(mask, g, 1.0)
        p_safe = jnp.where(mask, p, 1.0)
        terms = compute_depth_errors(p_safe, g_safe)
        n = jnp.maximum(jnp.sum(mask), 1)
        out = {}
        for k in ("a1", "a2", "a3", "abs_rel", "sq_rel"):
            out[k] = jnp.sum(jnp.where(mask, terms[k], 0.0)) / n
        out["rmse"] = jnp.sqrt(jnp.sum(jnp.where(mask, terms["rmse_term"], 0.0)) / n)
        out["rmse_log"] = jnp.sqrt(
            jnp.sum(jnp.where(mask, terms["rmse_log_term"], 0.0)) / n
        )
        return out

    per = jax.vmap(per_image)(pred, gt)
    return {k: jnp.mean(v) for k, v in per.items()}
