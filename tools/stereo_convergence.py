"""PSMNet supervised-convergence run on rendered stereo pairs.

The stereo counterpart of tools/train_convergence.py (reference names
PSMNet as its second depth source, `ref/readme.md:21-22,29`, but ships no
training code): render rectified stereo pairs with GT disparity from the
textured sim (`data/capture_sim.render_stereo_pairs`), train the PSMNet
cost-volume net with the jitted smooth-L1 DP step, and log end-point
error vs the untrained net to a JSONL curve.

Usage:
  python tools/stereo_convergence.py --steps 400 --height 96 --width 160 \
      --out runs/stereo_convergence [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(height: int, width: int, n_frames: int = 32,
                 baseline: float = 0.3, seed: int = 9):
    from scipy.spatial.transform import Rotation as ScipyR

    from tpu3drec.data.capture_sim import PlanarScene, render_stereo_pairs
    from tpu3drec.utils.config import CameraConfig

    rng = np.random.default_rng(seed)
    scene = PlanarScene.urban(rng, n_boxes=12, extent=30.0)
    cam = CameraConfig(fx=0.9 * width, fy=1.2 * height,
                       cx=0.5 * width, cy=0.5 * height,
                       width=width, height=height)
    poses = []
    for f in range(n_frames):
        yaw = 0.02 * np.sin(0.3 * f)
        R = ScipyR.from_rotvec([0, yaw, 0]).as_matrix().astype(np.float32)
        C = np.array([0.4 * f - 6.0, -1.2, 0.5 * f + 2.0], np.float32)
        poses.append((R, (-R @ C).astype(np.float32)))
    return render_stereo_pairs(scene, poses, cam, baseline=baseline)


def run(steps: int, height: int, width: int, batch: int, out_dir: str,
        max_disp: int = 32, n_frames: int = 32, eval_every: int = 50,
        seed: int = 0):
    import jax
    import jax.numpy as jnp

    from tpu3drec.models.psmnet_training import (
        StereoTrainConfig, init_stereo_state, iterate_stereo_batches,
        make_stereo_eval, make_stereo_train_step)

    os.makedirs(out_dir, exist_ok=True)
    lefts, rights, disps, masks = make_dataset(height, width, n_frames)
    # clamp supervision into the model's disparity range
    masks = masks * (disps < max_disp - 1)

    cfg = StereoTrainConfig(height=height, width=width, batch_size=batch,
                            max_disp=max_disp, feat_ch=16)
    model, state, tx = init_stereo_state(jax.random.PRNGKey(seed), cfg)
    step = make_stereo_train_step(model, tx)
    eval_fn = make_stereo_eval(model)

    ev = slice(0, min(4, n_frames))

    def epe_of(st):
        _, epe = eval_fn(st.params, st.batch_stats,
                         jnp.asarray(lefts[ev]), jnp.asarray(rights[ev]),
                         jnp.asarray(disps[ev]), jnp.asarray(masks[ev]))
        return round(float(epe), 4)

    init_epe = epe_of(state)
    curve = open(os.path.join(out_dir, "curve.jsonl"), "w")
    curve.write(json.dumps({"step": 0, "epe": init_epe}) + "\n")
    rng = np.random.default_rng(seed)
    t0 = time.time()
    losses = []
    it = 0
    while it < steps:
        for b in iterate_stereo_batches(lefts, rights, disps, masks,
                                        batch, rng):
            state, loss = step(state, b)
            it += 1
            losses.append(float(loss))
            rec = {"step": it, "loss": round(float(loss), 4)}
            if it % eval_every == 0 or it == steps:
                rec["epe"] = epe_of(state)
                rec["wall_s"] = round(time.time() - t0, 1)
            curve.write(json.dumps(rec) + "\n")
            curve.flush()
            if it >= steps:
                break
    curve.close()
    final_epe = epe_of(state)
    w = max(min(50, steps // 4), 1)
    summary = {
        "steps": steps, "height": height, "width": width, "batch": batch,
        "max_disp": max_disp,
        "loss_first": round(float(np.mean(losses[:w])), 4),
        "loss_last": round(float(np.mean(losses[-w:])), 4),
        "init_epe_px": init_epe, "final_epe_px": final_epe,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max-disp", type=int, default=32)
    p.add_argument("--out", default="runs/stereo_convergence")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpu3drec_xla"))
    print(json.dumps(run(args.steps, args.height, args.width, args.batch,
                         args.out, max_disp=args.max_disp), indent=1))


if __name__ == "__main__":
    main()
