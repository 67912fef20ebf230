"""Stage-level on-device profile of the feature front end (VERDICT r2
item 4 follow-up): where do the 73.7 ms/frame go?

Times cumulative prefixes of detect_and_describe_pyramid's stage chain so
stage costs are the deltas (each prefix is its own jitted fori_loop via
time_device_loop, so XLA cannot dead-code-eliminate earlier stages — each
prefix's outputs are summed into the carry):

  blur      pyramid bases + Gaussian stacks + DoG (all octaves)
  extrema   + 26-neighbor extrema mask + edge test + score
  topk      + per-octave lax.top_k + subpixel refine
  orient    + dominant-orientation histograms (the 17x17 window gathers)
  desc      + descriptors (the quad-packed 16x16 patch gathers) + NMS
            == the full pipeline

Usage: timeout 900 python -u tools/feat_profile.py [stage ...]
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _stage_fn(stage: str):
    import jax
    import jax.numpy as jnp

    from tpu3drec.sfm import features as F

    num_octaves, num_scales, sigma0, threshold, K = 3, 5, 1.6, 0.006, 1024

    def run(img):
        Hf, Wf = img.shape
        base = jax.image.resize(img, (2 * Hf, 2 * Wf), "bilinear")
        base = F.gaussian_blur(base, max(sigma0 ** 2 - 1.0, 0.25) ** 0.5)
        octaves = [-1] + list(range(num_octaves))
        outs = []
        for o in octaves:
            H, W = base.shape
            if min(H, W) < 32:
                break
            k_o = max(K >> max(o, 0), 64)
            G, D, sigmas = F.dog_stack_from_base(
                base, num_scales=num_scales, sigma0=sigma0)
            if stage == "blur":
                outs.append(jnp.sum(D) + jnp.sum(G))
                base = G[num_scales - 2][::2, ::2]
                continue
            ext = F._local_extrema(D, threshold) & F._edge_response_ok(D)
            score = jnp.where(ext, jnp.abs(D), -jnp.inf)
            if stage == "extrema":
                outs.append(jnp.sum(jnp.where(ext, score, 0.0)))
                base = G[num_scales - 2][::2, ::2]
                continue
            flat = score.reshape(-1)
            vals, idx = jax.lax.approx_max_k(flat, k_o, recall_target=0.95)
            s_idx = idx // (H * W)
            y_idx = (idx % (H * W)) // W
            x_idx = idx % W
            valid = jnp.isfinite(vals)

            def refine(s, y, x, D=D):
                c = D[s, y, x]
                gx = 0.5 * (D[s, y, x + 1] - D[s, y, x - 1])
                gy = 0.5 * (D[s, y + 1, x] - D[s, y - 1, x])
                hxx = D[s, y, x + 1] + D[s, y, x - 1] - 2 * c
                hyy = D[s, y + 1, x] + D[s, y - 1, x] - 2 * c
                hxy = 0.25 * (
                    D[s, y + 1, x + 1] - D[s, y + 1, x - 1]
                    - D[s, y - 1, x + 1] + D[s, y - 1, x - 1])
                det = hxx * hyy - hxy * hxy
                det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                ox = -(hyy * gx - hxy * gy) / det
                oy = -(-hxy * gx + hxx * gy) / det
                return jnp.clip(jnp.stack([ox, oy]), -0.5, 0.5)

            y_c = jnp.clip(y_idx, 1, H - 2)
            x_c = jnp.clip(x_idx, 1, W - 2)
            offsets = jax.vmap(refine)(s_idx, y_c, x_c)
            xy_oct = jnp.stack([x_idx, y_idx], -1).astype(jnp.float32) + offsets
            if stage == "topk":
                outs.append(jnp.sum(xy_oct) + jnp.sum(vals * valid))
                base = G[num_scales - 2][::2, ::2]
                continue
            gxs = (jnp.roll(G, -1, 2) - jnp.roll(G, 1, 2)) * 0.5
            gys = (jnp.roll(G, -1, 1) - jnp.roll(G, 1, 1)) * 0.5
            mag = jnp.sqrt(gxs * gxs + gys * gys)
            ori = jnp.arctan2(gys, gxs)
            if stage == "orient_dense":
                # measured-and-rejected dense-conv form (see
                # features._dominant_orientation_dense): 69.4 vs 26.1
                # ms/frame cumulative on hardware, round 4
                angle = F._dominant_orientation_dense(mag, ori, s_idx + 1,
                                                      x_idx, y_idx)
            else:
                angle = F._dominant_orientation(mag, ori, s_idx + 1, x_idx,
                                                y_idx)
            if stage in ("orient", "orient_dense"):
                outs.append(jnp.sum(angle) + jnp.sum(xy_oct))
                base = G[num_scales - 2][::2, ::2]
                continue
            raise ValueError(stage)
        return sum(outs)

    if stage in ("desc", "desc_upright"):
        def run(img, _up=(stage == "desc_upright")):  # noqa: F811
            # threshold/sigma0 stay Python defaults (non-static jit args
            # would be traced and break the concrete max() inside)
            kps, desc = F.detect_and_describe_pyramid(
                img, max_keypoints=K, num_octaves=num_octaves,
                num_scales=num_scales, upright=_up)
            total = jnp.sum(desc) + jnp.sum(kps.xy) + jnp.sum(kps.score)
            return total
        import jax.numpy as jnp  # noqa: F401
    return run


def bench_stage(stage: str):
    import jax
    import jax.numpy as jnp

    from tpu3drec.utils.profiling import time_device_loop

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(8, 384, 1280)).astype(np.float32))
    fn = jax.vmap(_stage_fn(stage))

    def body(i, carry):
        c, acc = carry
        im = jnp.roll(imgs, i + 1, axis=1) * (1.0 + c * 0)
        return c, acc + jnp.sum(fn(im)).astype(jnp.float32)

    dt = time_device_loop(
        body, lambda s: (jnp.float32(1 + 0.03 * s), jnp.float32(0)),
        iters=(1, 4))
    return {"stage": stage, "ms_per_8frame_batch": round(dt * 1e3, 2),
            "ms_per_frame": round(dt * 1e3 / 8, 2)}


STAGES = ["blur", "extrema", "topk", "orient", "desc"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tpu3drec_dev")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for s in sys.argv[1:] or STAGES:
        try:
            print(json.dumps(bench_stage(s)))
        except Exception as e:  # keep going; a wedge kills the subprocess
            print(json.dumps({"stage": s, "error": repr(e)}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
