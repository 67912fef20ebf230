"""Command-line interface: every reference entry point as a subcommand.

Replaces the reference's edit-the-source workflow (`ref/readme.md:76-90`
instructs users to modify paths/intrinsics in place) with flags + JSON
configs:

  tpu3drec rgbd       depth PNGs + pose txt -> world PLY/.bt
                      (= `transfer/camera_to_world.py` + octomap scripts)
  tpu3drec icp-fuse   two point txt/ply + T_data.txt -> merged PLY
                      (= `other_tools/transfer_T_icp.py`)
  tpu3drec icp        estimate the scale-correcting 4x4 T between two
                      clouds on device (replaces the offline open3d step)
  tpu3drec sfm        image dir -> poses txt + sparse PLY (= COLMAP)
  tpu3drec train-mono monodepth training (= `monodepth2/trainer.py`)
  tpu3drec ply2bt     PLY -> octomap .bt (= `octomap/ply_transfer_octomap.py`)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np


def _cmd_rgbd(args):
    from tpu3drec.pipelines import rgbd
    from tpu3drec.utils.config import RGBDPipelineConfig, from_dict

    if args.config:
        with open(args.config) as f:
            cfg = from_dict(RGBDPipelineConfig, json.load(f))
    else:
        cfg = RGBDPipelineConfig()
    if args.poses:
        cfg.pose_file = args.poses
    if args.depth_dir:
        cfg.depth_dir = args.depth_dir
    if args.rgb_dir:
        cfg.rgb_dir = args.rgb_dir
    if args.out_ply:
        cfg.out_ply = args.out_ply
    if args.out_bt:
        cfg.out_bt = args.out_bt
    res = rgbd.run(cfg)
    print(f"fused {res.n_frames} frames -> {res.n_points} points, "
          f"{res.n_voxels} voxels in {res.seconds:.2f}s")


def _cmd_icp_fuse(args):
    from tpu3drec.pipelines import icp_fusion
    from tpu3drec.utils.plyio import read_ply

    a, _ = read_ply(args.cloud_a)
    b, _ = read_ply(args.cloud_b)
    n = icp_fusion.run(a, b, args.T, args.out)
    print(f"merged {n} points -> {args.out}")


def _cmd_icp(args):
    import jax.numpy as jnp

    from tpu3drec.sfm.icp import icp_scale_correction
    from tpu3drec.utils.plyio import read_ply
    from tpu3drec.utils.poseio import write_T_txt

    a, _ = read_ply(args.cloud_a)
    b, _ = read_ply(args.cloud_b)
    T = np.asarray(icp_scale_correction(jnp.asarray(a), jnp.asarray(b),
                                        iters=args.iters))
    write_T_txt(args.out, T)
    print(f"T ->\n{T}")


def _cmd_sfm(args):
    from PIL import Image

    from tpu3drec.pipelines.sfm_pipeline import SfmPipelineConfig, run

    paths = sorted(glob.glob(os.path.join(args.images, "*")))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("L"), np.float32) / 255.0 for p in paths
    ])
    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]],
                 np.float32)
    cfg = SfmPipelineConfig(
        max_keypoints=args.max_keypoints, out_poses=args.out_poses,
        out_sparse_ply=args.out_ply, verbose=True,
    )
    rec = run(imgs, K, cfg, image_names=[os.path.basename(p) for p in paths])
    print(f"registered {len(rec.poses)}/{len(paths)} frames, "
          f"{len(rec.points)} landmarks")


def _cmd_train_mono(args):
    from tpu3drec.data.datasets import (
        InteriorNetDataset,
        KittiRawDataset,
        read_split_file,
    )
    from tpu3drec.data.loader import TripletLoader
    from tpu3drec.models.training import TrainConfig
    from tpu3drec.pipelines.monocular import MonocularRunConfig, train

    tcfg = TrainConfig(
        height=args.height, width=args.width, batch_size=args.batch_size,
        learning_rate=args.lr, num_epochs=args.epochs,
        use_gt_pose=args.use_gt_pose, use_stereo=args.use_stereo,
    )
    # --use-stereo needs a side-partner frame: KITTI raw layout has one
    # (image_02/image_03); InteriorNet is monocular-only
    ds = (KittiRawDataset(args.data_path) if args.use_stereo
          else InteriorNetDataset(args.data_path))
    train_specs = read_split_file(args.split_train)
    val_specs = read_split_file(args.split_val) if args.split_val else []
    tl = TripletLoader(ds, train_specs, batch_size=args.batch_size,
                       height=args.height, width=args.width,
                       with_gt_pose=args.use_gt_pose,
                       with_stereo=args.use_stereo)
    vl = TripletLoader(ds, val_specs, batch_size=args.batch_size,
                       height=args.height, width=args.width, augment=False,
                       with_gt_depth=True) if val_specs else None
    cfg = MonocularRunConfig(train=tcfg, log_dir=args.log_dir)
    train(cfg, tl, vl)


def _cmd_train_stereo(args):
    """PSMNet supervised training (`ref/readme.md:21-22` names PSMNet as a
    depth source; training side is ours). Data: either --data DIR with
    left/N.png right/N.png disp/N.npy, or --sim N to ray-cast N stereo
    pairs from the occluded urban scene."""
    from tpu3drec.models.psmnet_training import StereoTrainConfig
    from tpu3drec.pipelines.stereo import train

    if args.sim:
        from scipy.spatial.transform import Rotation as ScipyR

        from tpu3drec.data.capture_sim import PlanarScene, render_stereo_pairs
        from tpu3drec.utils.config import CameraConfig

        rng = np.random.default_rng(args.seed)
        scene = PlanarScene.urban(rng, n_boxes=12, extent=35.0)
        cam = CameraConfig(fx=args.width * 0.9, fy=args.width * 0.9,
                           cx=(args.width - 1) / 2, cy=(args.height - 1) / 2,
                           width=args.width, height=args.height)
        poses = []
        for f in range(args.sim):
            R = ScipyR.from_rotvec([0, 0.02 * f, 0]).as_matrix().astype(np.float32)
            C = np.array([0.4 * f, -1.2, 0.8 * f], np.float32)
            poses.append((R, (-R @ C).astype(np.float32)))
        lefts, rights, disp, mask = render_stereo_pairs(
            scene, poses, cam, baseline=args.baseline)
    else:
        from PIL import Image

        ls = sorted(glob.glob(os.path.join(args.data, "left", "*")))
        lefts, rights, disp, mask = [], [], [], []
        for lp in ls:
            name = os.path.splitext(os.path.basename(lp))[0]
            rp = glob.glob(os.path.join(args.data, "right", name + ".*"))[0]
            dp = os.path.join(args.data, "disp", name + ".npy")
            lefts.append(np.asarray(Image.open(lp), np.float32)[..., :3] / 255.0)
            rights.append(np.asarray(Image.open(rp), np.float32)[..., :3] / 255.0)
            d = np.load(dp).astype(np.float32)
            disp.append(d)
            mask.append((d > 0).astype(np.float32))
        lefts, rights = np.stack(lefts), np.stack(rights)
        disp, mask = np.stack(disp), np.stack(mask)

    cfg = StereoTrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs,
        batch_size=args.batch_size, height=lefts.shape[1],
        width=lefts.shape[2], max_disp=args.max_disp,
    )
    _, state, last = train(cfg, lefts, rights, disp, mask,
                           log_dir=args.log_dir, seed=args.seed)
    print(f"trained {int(state.step)} steps, final loss {last:.4f} "
          f"-> {args.log_dir}/ckpt")


def _cmd_kitti_eval(args):
    from tpu3drec.data.kitti_odom import KittiOdometryDataset
    from tpu3drec.pipelines.kitti import (
        KittiRunConfig, evaluate_sequence, run_windowed_sfm,
    )

    ds = KittiOdometryDataset(args.root, args.sequence)
    n = args.frames or ds.num_frames()
    print(f"loading {n} frames of sequence {args.sequence} ...")
    if args.width and not args.height:
        # default --height from the native aspect ratio so a lone --width
        # neither resizes to (width, 0) nor distorts the image
        h0, w0 = ds.load_gray(args.start).shape[:2]
        args.height = max(1, round(h0 * args.width / w0))
    images = ds.load_sequence(start=args.start, count=n,
                              size=(args.width, args.height) if args.width else None)
    K = ds.calib()
    if args.width:
        h0, w0 = ds.load_gray(args.start).shape[:2]
        K = K.copy()
        K[0] *= args.width / w0   # fx, cx scale with width
        K[1] *= args.height / h0  # fy, cy scale with height
    cfg = KittiRunConfig(window=args.window, stride=args.stride,
                         max_keypoints=args.max_keypoints, verbose=True,
                         parallel_windows=args.parallel_windows)
    Ts, recs = run_windowed_sfm(images, K, cfg)
    gt = ds.gt_poses()[args.start:args.start + n]
    m = evaluate_sequence(Ts, gt)
    print({k: round(float(v), 4) for k, v in m.items()})


def _cmd_occupancy(args):
    """Full occupancy mapping (occupied + carved free space) from the same
    depth+poses contract as `rgbd` — the octomap capability the reference
    never used (its inserts were occupied-only)."""
    import jax.numpy as jnp

    from tpu3drec.core.quaternion import quat_xyzw_to_matrix
    from tpu3drec.core.unproject import depth_to_world_points
    from tpu3drec.core.camera import PinholeCamera
    from tpu3drec.core.se3 import SE3
    from tpu3drec.mapping.occupancy import OccupancyMap
    from tpu3drec.utils.config import RGBDPipelineConfig, from_dict
    from tpu3drec.utils.depthio import load_depth
    from tpu3drec.utils.poseio import read_pose_txt

    if args.config:
        with open(args.config) as f:
            cfg = from_dict(RGBDPipelineConfig, json.load(f))
    else:
        cfg = RGBDPipelineConfig()
    records = read_pose_txt(args.poses)
    cam = cfg.camera.to_camera()
    m = OccupancyMap(res=args.res, max_samples=args.max_samples)
    for r in records:
        depth = load_depth(
            os.path.join(args.depth_dir, r.image_name),
            mode=cfg.depth.mode, scale=cfg.depth.scale,
            size=(cfg.camera.width, cfg.camera.height),
        )
        Rw2c = np.asarray(quat_xyzw_to_matrix(jnp.asarray(r.q_xyzw, dtype=jnp.float32)))
        Rc2w = Rw2c.T
        tc2w = -Rc2w @ np.asarray(r.t, np.float32)
        pts = np.asarray(depth_to_world_points(
            jnp.asarray(depth), cam, SE3(jnp.asarray(Rc2w), jnp.asarray(tc2w))
        )).reshape(-1, 3)
        valid = (depth.reshape(-1) > cfg.map.min_depth) & (
            depth.reshape(-1) < args.max_range)
        m.insert_scan(tc2w, pts, valid)
        print(f"frame {r.frame_id}: {len(m.keys)} voxels "
              f"({len(m.occupied_keys())} occ / {len(m.free_keys())} free)")
    n = m.write_bt(args.out)
    print(f"wrote {args.out}: {n} nodes")


def _cmd_serve(args):
    import json as _json

    from tpu3drec.data.stream import FrameStreamServer, stream_fuse
    from tpu3drec.utils.config import RGBDPipelineConfig, from_dict

    if args.config:
        with open(args.config) as f:
            cfg = from_dict(RGBDPipelineConfig, _json.load(f))
    else:
        cfg = RGBDPipelineConfig()
    if args.out_ply:
        cfg.out_ply = args.out_ply
    if args.out_bt:
        cfg.out_bt = args.out_bt
    server = FrameStreamServer(port=args.port)
    print(f"listening on port {server.port}", flush=True)
    res = stream_fuse(server, cfg, batch=args.batch, verbose=True)
    print(f"stream done: {res.n_frames} frames -> {res.n_points} points, "
          f"{res.n_voxels} voxels")


def _cmd_ply2bt(args):
    from tpu3drec.mapping.btio import write_bt
    from tpu3drec.mapping.voxel import dedup_voxels_host
    from tpu3drec.utils.plyio import read_ply

    pts, _ = read_ply(args.ply)
    if args.max_points and pts.shape[0] > args.max_points:
        pts = pts[: args.max_points]  # reference caps at 5.4M points
    keys = dedup_voxels_host(pts, args.res)
    n = write_bt(args.out, keys, args.res)
    print(f"{pts.shape[0]} points -> {keys.shape[0]} voxels, {n} nodes -> {args.out}")


def _cmd_mission_sim(args):
    """Closed-loop autonomous mission in a simulated world: the reference
    client's flight loop (`ref/airsim/main.cpp:1633-3974`) as ONE compiled
    lax.scan program — takeoff, waypoints, ring-gate servoing, dash,
    ArUco-scan sweep, pad search, landing."""
    import jax.numpy as jnp
    import numpy as np

    from tpu3drec.autonomy.mission import (
        MissionConfig, Observation, Phase, mission_rollout)

    cfg = MissionConfig(
        waypoints=jnp.asarray([[2.0, 0.0, 4.0], [6.0, 0.0, 4.0]],
                              jnp.float32),
        gate_waypoint=jnp.asarray([False, True]),
        task_ids=jnp.asarray([3, 8], jnp.int32),
        image_center=jnp.asarray([160.0, 120.0], jnp.float32),
        cruise_alt=args.cruise_alt, scan_ticks=10, pass_ticks=15,
        servo_gain=(0.02, 0.0, 0.005),
    )
    gate = jnp.asarray([9.0, 0.6, 4.4], jnp.float32)
    pad = jnp.asarray([13.0, 0.5, 0.0], jnp.float32)
    f, c0 = 200.0, cfg.image_center

    def observe(pos):
        rel = gate - pos
        depth = jnp.maximum(rel[0], 0.3)
        relp = pad - pos
        alt = jnp.maximum(pos[2] - pad[2], 0.3)
        visible = (rel[0] > 0.5) & (jnp.abs(rel[1]) < 4.0) \
            & (jnp.abs(rel[2]) < 4.0)
        return Observation(
            ring_px=jnp.stack([c0[0] - f * rel[1] / depth,
                               c0[1] - f * rel[2] / depth]),
            ring_score=jnp.where(visible, 0.9, 0.01),
            blob_px=jnp.stack([c0[0] - f * relp[1] / alt,
                               c0[1] - f * relp[0] / alt]),
            blob_found=(jnp.abs(relp[0]) < 2.0) & (jnp.abs(relp[1]) < 2.0),
            altitude=pos[2], position=pos,
            marker_ids=jnp.full((2,), -1, jnp.int32),
        )

    state, traj, phases = mission_rollout(
        cfg, observe, n_steps=args.steps, start=jnp.zeros(3), dt=0.1)
    phases = np.asarray(phases)
    traj = np.asarray(traj)
    prev = -1
    for i, ph in enumerate(phases):
        if ph != prev:
            print(f"t={i * 0.1:6.1f}s  {Phase(int(ph)).name:13s} "
                  f"pos={np.round(traj[i], 2)}")
            prev = ph
    print(f"final: {Phase(int(state.phase)).name} at "
          f"{np.round(traj[-1], 2)}")
    if args.out_traj:
        np.savetxt(args.out_traj, traj, fmt="%.4f")
        print(f"trajectory -> {args.out_traj}")
    return 0 if int(state.phase) == int(Phase.LANDED) else 1


def _cmd_mvs(args):
    """Dense MVS: posed images -> per-view depth -> TSDF -> cleaned mesh
    (the MVE alternative pipeline, `ref/software_record/mve使用指南.docx`)."""
    from PIL import Image
    from scipy.spatial.transform import Rotation as ScipyR

    from tpu3drec.pipelines.mvs import MvsConfig, run_mvs
    from tpu3drec.utils.plyio import write_ply, write_ply_mesh
    from tpu3drec.utils.poseio import read_pose_txt

    paths = sorted(glob.glob(os.path.join(args.images, "*")))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
        for p in paths])
    records = read_pose_txt(args.poses)
    by_name = {r.image_name: r for r in records}
    Rs, ts = [], []
    for p in paths:
        r = by_name.get(os.path.basename(p), None)
        if r is None:
            raise SystemExit(f"no pose for image {os.path.basename(p)}")
        Rs.append(ScipyR.from_quat(r.q_xyzw).as_matrix())
        ts.append(r.t)
    Rs = np.stack(Rs).astype(np.float32)
    ts = np.stack(ts).astype(np.float32)
    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]],
                 np.float32)
    cfg = MvsConfig(n_src=args.n_src, n_planes=args.n_planes,
                    d_min=args.d_min, d_max=args.d_max,
                    voxel_res=args.voxel_res, verbose=True)
    out = run_mvs(imgs, K, Rs, ts, cfg)
    write_ply_mesh(args.out, out["verts"], out["faces"])
    print(f"mesh: {out['verts'].shape[0]} verts, "
          f"{out['faces'].shape[0]} faces -> {args.out}")
    if args.out_points:
        write_ply(args.out_points, out["points"])
        print(f"point set: {out['points'].shape[0]} -> {args.out_points}")


def main(argv=None):
    # persistent compile cache: remote-compile latency on tunneled TPUs is
    # highly variable (measured 2s-180s for identical programs) — repeat CLI
    # invocations must not pay it twice
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tpu3drec_xla"))
    except Exception:
        pass

    p = argparse.ArgumentParser(prog="tpu3drec")
    # platform override: the TPU relay in this class of deployment can
    # wedge with no user-side reset (docs/design.md §6); --platform cpu
    # keeps every pipeline drivable. Must be applied before first device
    # use — env vars are too late because a sitecustomize pre-imports jax.
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"),
                   help="force the jax platform (e.g. cpu when no device)")
    # multi-host runtime (SURVEY §5.8): on a TPU pod slice --distributed
    # alone discovers the topology; elsewhere pass the coordinator triple.
    # Every process runs the same command; sharded writers emit one
    # coherent artifact set (parallel/multihost.py).
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed (multi-host pod run)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (non-TPU clusters)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("rgbd", help="depth + poses -> fused map")
    q.add_argument("--config")
    q.add_argument("--poses")
    q.add_argument("--depth-dir", dest="depth_dir")
    q.add_argument("--rgb-dir", dest="rgb_dir", help="color the cloud from RGB frames")
    q.add_argument("--out-ply", dest="out_ply")
    q.add_argument("--out-bt", dest="out_bt")
    q.set_defaults(fn=_cmd_rgbd)

    q = sub.add_parser("icp-fuse", help="merge cloud B via T_data.txt")
    q.add_argument("cloud_a")
    q.add_argument("cloud_b")
    q.add_argument("--T", required=True)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=_cmd_icp_fuse)

    q = sub.add_parser("icp", help="estimate scale-correcting T on device")
    q.add_argument("cloud_a")
    q.add_argument("cloud_b")
    q.add_argument("--iters", type=int, default=50)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=_cmd_icp)

    q = sub.add_parser("sfm", help="images -> poses + sparse cloud")
    q.add_argument("images")
    q.add_argument("--fx", type=float, default=600.391)
    q.add_argument("--fy", type=float, default=600.079)
    q.add_argument("--cx", type=float, default=320.0)
    q.add_argument("--cy", type=float, default=240.0)
    q.add_argument("--max-keypoints", dest="max_keypoints", type=int, default=512)
    q.add_argument("--out-poses", dest="out_poses", default="poses.txt")
    q.add_argument("--out-ply", dest="out_ply", default="sparse.ply")
    q.set_defaults(fn=_cmd_sfm)

    q = sub.add_parser("train-mono", help="monodepth training")
    q.add_argument("--data-path", dest="data_path", required=True)
    q.add_argument("--split-train", dest="split_train", required=True)
    q.add_argument("--split-val", dest="split_val", default="")
    q.add_argument("--height", type=int, default=480)
    q.add_argument("--width", type=int, default=640)
    q.add_argument("--batch-size", dest="batch_size", type=int, default=1)
    q.add_argument("--lr", type=float, default=1e-5)
    q.add_argument("--epochs", type=int, default=20)
    q.add_argument("--use-gt-pose", dest="use_gt_pose", action="store_true")
    q.add_argument("--use-stereo", dest="use_stereo", action="store_true",
                   help="mono+stereo self-supervision: adds the 's' frame "
                        "with the 0.1m-baseline constant transform "
                        "(metric scale; KITTI raw layout)")
    q.add_argument("--log-dir", dest="log_dir", default="runs/monocular")
    q.set_defaults(fn=_cmd_train_mono)

    q = sub.add_parser("train-stereo", help="PSMNet supervised training")
    q.add_argument("--data", default="", help="dir with left/ right/ disp/")
    q.add_argument("--sim", type=int, default=0,
                   help="ray-cast N synthetic stereo pairs instead of --data")
    q.add_argument("--height", type=int, default=192)
    q.add_argument("--width", type=int, default=320)
    q.add_argument("--baseline", type=float, default=0.1)
    q.add_argument("--max-disp", dest="max_disp", type=int, default=64)
    q.add_argument("--batch-size", dest="batch_size", type=int, default=2)
    q.add_argument("--lr", type=float, default=1e-3)
    q.add_argument("--epochs", type=int, default=10)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--log-dir", dest="log_dir", default="runs/stereo")
    q.set_defaults(fn=_cmd_train_stereo)

    q = sub.add_parser("occupancy", help="depth+poses -> log-odds occupancy .bt (with free space)")
    q.add_argument("--config")
    q.add_argument("--poses", required=True)
    q.add_argument("--depth-dir", dest="depth_dir", required=True)
    q.add_argument("--res", type=float, default=0.1)
    q.add_argument("--max-range", dest="max_range", type=float, default=50.0)
    q.add_argument("--max-samples", dest="max_samples", type=int, default=128)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=_cmd_occupancy)

    q = sub.add_parser("kitti-eval", help="windowed SfM + ATE on a KITTI sequence")
    q.add_argument("root", help="KITTI odometry root (sequences/, poses/)")
    q.add_argument("--sequence", default="00")
    q.add_argument("--start", type=int, default=0)
    q.add_argument("--frames", type=int, default=0)
    q.add_argument("--width", type=int, default=0, help="downscale width (0=native)")
    q.add_argument("--height", type=int, default=0)
    q.add_argument("--window", type=int, default=12)
    q.add_argument("--stride", type=int, default=7)
    q.add_argument("--max-keypoints", dest="max_keypoints", type=int, default=512)
    q.add_argument("--parallel-windows", dest="parallel_windows", type=int,
                   default=1, help="reconstruct N windows concurrently, "
                   "round-robin over local devices (PP)")
    q.set_defaults(fn=_cmd_kitti_eval)

    q = sub.add_parser("mission-sim",
                       help="closed-loop autonomous mission (one lax.scan)")
    q.add_argument("--steps", type=int, default=1200)
    q.add_argument("--cruise-alt", dest="cruise_alt", type=float, default=4.0)
    q.add_argument("--out-traj", dest="out_traj", default=None)
    q.set_defaults(fn=_cmd_mission_sim)

    q = sub.add_parser("mvs", help="posed images -> dense depth + TSDF mesh "
                       "(MVE dmrecon/scene2pset/fssrecon/meshclean analogue)")
    q.add_argument("--images", required=True)
    q.add_argument("--poses", required=True, help="pose txt (world->cam, "
                   "same contract as `rgbd`)")
    q.add_argument("--fx", type=float, default=600.391)
    q.add_argument("--fy", type=float, default=600.079)
    q.add_argument("--cx", type=float, default=320.0)
    q.add_argument("--cy", type=float, default=240.0)
    q.add_argument("--n-src", dest="n_src", type=int, default=4)
    q.add_argument("--n-planes", dest="n_planes", type=int, default=64)
    q.add_argument("--d-min", dest="d_min", type=float, default=1.0)
    q.add_argument("--d-max", dest="d_max", type=float, default=80.0)
    q.add_argument("--voxel-res", dest="voxel_res", type=float, default=0.0,
                   help="0 = auto (median depth / 100)")
    q.add_argument("--out", default="mesh.ply")
    q.add_argument("--out-points", dest="out_points", default="")
    q.set_defaults(fn=_cmd_mvs)

    q = sub.add_parser("ply2bt", help="PLY -> octomap .bt")
    q.add_argument("ply")
    q.add_argument("--res", type=float, default=0.1)
    q.add_argument("--out", required=True)
    q.add_argument("--max-points", dest="max_points", type=int, default=0)
    q.set_defaults(fn=_cmd_ply2bt)

    q = sub.add_parser(
        "serve", help="listen for a live RGB-D frame stream and fuse it "
        "(the AirSim-capture ingestion role, ref/airsim/main.cpp:1369-1392)")
    q.add_argument("--config")
    q.add_argument("--port", type=int, default=0,
                   help="TCP port (0 = ephemeral, printed on start)")
    q.add_argument("--batch", type=int, default=4,
                   help="frames per device dispatch")
    q.add_argument("--out-ply", dest="out_ply")
    q.add_argument("--out-bt", dest="out_bt")
    q.set_defaults(fn=_cmd_serve)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.distributed or args.coordinator:
        from tpu3drec.parallel.multihost import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
