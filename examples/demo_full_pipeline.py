"""End-to-end demo: all five reference configurations on synthetic data.

Runs in ~2-4 minutes on CPU (`JAX_PLATFORMS=cpu python examples/
demo_full_pipeline.py /tmp/demo`), faster on TPU. Generates a simulated UAV
capture, then exercises:

  1. RGBD fusion            (depth + poses -> PLY/.bt)
  2. ICP scale correction   (device ICP -> T_data.txt -> fused clouds)
  3. stereo                 (PSMNet-class disparity -> depth -> map)
  4. monocular              (few training steps + inference -> fused map)
  5. full SfM               (images -> poses + sparse cloud + metric scale)
"""

import os
import sys

import numpy as np


def main(out_dir: str = "/tmp/tpu3drec_demo"):
    import jax

    try:  # tunneled-TPU compiles are slow and variable; cache them
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tpu3drec_xla"))
    except Exception:
        pass
    import jax.numpy as jnp

    from tpu3drec.data.capture_sim import CaptureSim, SimScene, render_frame
    from tpu3drec.utils.config import (
        CameraConfig, DepthDecodeConfig, MapConfig, RGBDPipelineConfig,
    )

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    cam = CameraConfig(fx=220.0, fy=220.0, cx=128.0, cy=96.0, width=256, height=192)
    scene = SimScene.clustered(rng, n_landmarks=250, sats=4)
    sim = CaptureSim(scene, cam=cam)
    poses = sim.fly(6, step=np.array([0.5, 0.0, 0.3]), yaw_rate=0.01)
    print("[demo] rendering + writing capture layout ...")
    records = sim.capture(out_dir, poses)
    frames = [render_frame(scene, R, t, cam) for R, t in poses]
    rgbs = np.stack([f[0] for f in frames]).astype(np.float32) / 255.0
    depths = np.stack([f[1] for f in frames])
    grays = rgbs.mean(-1)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32)

    # ---- 1. RGBD fusion --------------------------------------------------
    from tpu3drec.pipelines import rgbd

    cfg = RGBDPipelineConfig(
        camera=cam, depth=DepthDecodeConfig(mode="uint16_mm"),
        map=MapConfig(voxel_res=0.5, min_depth=0.1, max_depth=55.0),
        pose_file=os.path.join(out_dir, "poses.txt"),
        depth_dir=os.path.join(out_dir, "depth"),
        out_ply=os.path.join(out_dir, "map_rgbd.ply"),
        out_bt=os.path.join(out_dir, "map_rgbd.bt"),
    )
    res = rgbd.run(cfg)
    print(f"[1 rgbd] {res.n_points} points, {res.n_voxels} voxels "
          f"-> map_rgbd.ply / .bt")

    # ---- 5. full SfM (needed by 2) --------------------------------------
    from tpu3drec.pipelines.sfm_pipeline import SfmPipelineConfig, run as run_sfm_pipe

    rec = run_sfm_pipe(
        grays, K,
        SfmPipelineConfig(
            max_keypoints=256,
            out_poses=os.path.join(out_dir, "sfm_poses.txt"),
            out_sparse_ply=os.path.join(out_dir, "sparse.ply"),
        ),
        depth_maps=depths, cam_cfg=cam,  # metric scale from depth
    )
    print(f"[5 sfm] {len(rec.poses)}/{len(poses)} frames registered, "
          f"{len(rec.points)} landmarks, metric-scaled -> sfm_poses.txt")

    # ---- 2. ICP scale correction ----------------------------------------
    from tpu3drec.pipelines.icp_fusion import fuse_with_T
    from tpu3drec.sfm.icp import icp_scale_correction
    from tpu3drec.utils.poseio import write_T_txt
    from tpu3drec.utils.plyio import write_ply

    sparse = np.stack(list(rec.points.values())).astype(np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] *= 0.8
    T_true[:3, 3] = [0.3, -0.1, 0.2]
    cloud_b = (sparse - T_true[:3, 3]) @ np.linalg.inv(T_true[:3, :3]).T
    T = np.asarray(icp_scale_correction(jnp.asarray(sparse), jnp.asarray(cloud_b),
                                        iters=60))
    write_T_txt(os.path.join(out_dir, "T_data.txt"), T)
    merged = fuse_with_T(sparse, cloud_b, T)
    write_ply(os.path.join(out_dir, "merged_icp.ply"), merged)
    print(f"[2 icp] recovered scale {np.linalg.det(T[:3, :3]) ** (1/3):.3f} "
          f"(true 0.8) -> T_data.txt, merged_icp.ply")

    # ---- 3. stereo -------------------------------------------------------
    from tpu3drec.pipelines.stereo import StereoPipelineConfig, run as run_stereo

    scfg = StereoPipelineConfig(
        rgbd=RGBDPipelineConfig(
            camera=cam, map=MapConfig(voxel_res=1.0),
            out_ply=os.path.join(out_dir, "map_stereo.ply"),
        ),
        max_disp=16, feat_ch=8, batch=2,
    )
    from tpu3drec.utils.poseio import poses_to_arrays

    q, t = poses_to_arrays(records)
    sres = run_stereo(scfg, rgbs[:2], rgbs[:2], q[:2], t[:2])
    print(f"[3 stereo] (untrained net) {sres.n_points} points -> map_stereo.ply")

    # ---- 4. monocular ----------------------------------------------------
    from tpu3drec.data.datasets import SequenceSpec
    from tpu3drec.data.loader import TripletLoader
    from tpu3drec.models.training import TrainConfig
    from tpu3drec.pipelines.monocular import (
        MonocularRunConfig, infer_depth_maps, train,
    )

    class ArrayDS:
        def load_color(self, folder, idx, size=None):
            return (rgbs[idx] * 255).astype(np.uint8)

    loader = TripletLoader(ArrayDS(), [SequenceSpec("s", i) for i in (1, 2, 3, 4)],
                           batch_size=2, height=cam.height, width=cam.width,
                           augment=False, prefetch=0)
    mcfg = MonocularRunConfig(
        train=TrainConfig(height=cam.height, width=cam.width, num_epochs=1,
                          batch_size=2, learning_rate=1e-4),
        log_dir=os.path.join(out_dir, "mono_run"), log_every=1, max_steps=3,
    )
    model, state = train(mcfg, loader)
    pred = infer_depth_maps(model, state, rgbs, mcfg.train, batch=2)
    print(f"[4 mono] trained {int(state.step)} steps, inferred depth "
          f"{pred.shape}, range [{pred.min():.1f}, {pred.max():.1f}]m")

    print(f"\nartifacts in {out_dir}:")
    for f in sorted(os.listdir(out_dir)):
        print("  ", f)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu3drec_demo")
