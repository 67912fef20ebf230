"""Aux subsystem tests: Kalman/PID, capture sim, trajectory eval."""

import os

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.data.capture_sim import CaptureSim, SimScene
from tpu3drec.utils.config import CameraConfig
from tpu3drec.utils.estimation import (
    PIDController,
    altitude_kalman,
    kalman_filter,
    pid_rollout,
)
from tpu3drec.utils.trajectory_eval import (
    ate,
    camera_centers_w2c,
    read_kitti_poses,
    rpe,
    trajectory_length,
    write_kitti_poses,
)


class TestKalman:
    def test_tracks_constant_velocity(self, rng):
        params = altitude_kalman(dt=0.1, q=0.01, r=0.5)
        T = 200
        true = 2.0 + 0.5 * 0.1 * np.arange(T)
        z = (true + rng.normal(0, 0.7, T))[:, None].astype(np.float32)
        xs, Ps = kalman_filter(params, jnp.zeros(2), jnp.eye(2) * 10.0,
                               jnp.asarray(z))
        est = np.asarray(xs)[:, 0]
        # filter should beat the raw measurements in the steady state
        raw_err = np.abs(z[100:, 0] - true[100:]).mean()
        filt_err = np.abs(est[100:] - true[100:]).mean()
        assert filt_err < raw_err * 0.7
        # true velocity: 0.05 units per 0.1s step = 0.5 units/s
        assert abs(float(np.asarray(xs)[-1, 1]) - 0.5) < 0.2


class TestPID:
    def test_p_only_proportional(self):
        pid = PIDController(kp=2.0, ki=0.0, kd=0.0)
        outs = pid_rollout(pid, jnp.asarray([1.0, -0.5, 0.25]), dt=0.1)
        np.testing.assert_allclose(np.asarray(outs), [2.0, -1.0, 0.5], atol=1e-6)

    def test_integral_accumulates_and_clamps(self):
        pid = PIDController(kp=0.0, ki=1.0, kd=0.0, i_limit=0.25)
        outs = pid_rollout(pid, jnp.ones(10), dt=0.1)
        np.testing.assert_allclose(float(np.asarray(outs)[-1]), 0.25, atol=1e-6)

    def test_closed_loop_converges(self):
        # simple first-order plant x' = u, drive x -> 1
        pid = PIDController(kp=3.0, ki=0.5, kd=0.1)
        s = pid.init()
        x = 0.0
        for _ in range(300):
            s, u = pid.step(s, 1.0 - x, 0.05)
            x = x + float(u) * 0.05
        assert abs(x - 1.0) < 0.05


class TestCaptureSim:
    def test_layout_and_pipeline(self, tmp_path, rng):
        scene = SimScene.random(rng, n=80)
        cam = CameraConfig(fx=100.0, fy=100.0, cx=40.0, cy=30.0, width=80, height=60)
        sim = CaptureSim(scene, cam=cam)
        poses = sim.fly(3)
        sim.capture(str(tmp_path), poses)
        assert os.path.exists(tmp_path / "front" / "0.jpg")
        assert os.path.exists(tmp_path / "depth" / "2.png")
        assert os.path.exists(tmp_path / "poses.txt")

        # fused through the RGBD pipeline it must reconstruct the scene shell
        from tpu3drec.pipelines import rgbd
        from tpu3drec.utils.config import (
            DepthDecodeConfig,
            MapConfig,
            RGBDPipelineConfig,
        )

        cfg = RGBDPipelineConfig(
            camera=cam,
            depth=DepthDecodeConfig(mode="uint16_mm"),
            map=MapConfig(voxel_res=1.0, min_depth=0.1, max_depth=55.0),
            pose_file=str(tmp_path / "poses.txt"),
            depth_dir=str(tmp_path / "depth"),
            out_ply=str(tmp_path / "map.ply"),
        )
        res = rgbd.run(cfg)
        assert res.n_points > 0

    def test_depth_consistency(self, rng):
        """Rendered depth at a blob center ~ its camera-frame z."""
        scene = SimScene.random(rng, n=1)
        scene.points[0] = [0.0, 0.0, 10.0]
        scene.radii[0] = 1.0
        cam = CameraConfig(fx=100.0, fy=100.0, cx=40.0, cy=30.0, width=80, height=60)
        sim = CaptureSim(scene, cam=cam)
        from tpu3drec.data.capture_sim import render_frame

        rgb, depth = render_frame(scene, np.eye(3, dtype=np.float32),
                                  np.zeros(3, np.float32), cam)
        assert abs(depth[30, 40] - 10.0) < 1e-3


class TestTrajectoryEval:
    def test_kitti_pose_roundtrip(self, tmp_path, rng):
        F = 5
        Ts = np.tile(np.eye(4), (F, 1, 1))
        for f in range(F):
            Ts[f, :3, :3] = ScipyR.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
            Ts[f, :3, 3] = rng.normal(size=3)
        p = str(tmp_path / "00.txt")
        write_kitti_poses(p, Ts)
        back = read_kitti_poses(p)
        np.testing.assert_allclose(back, Ts, atol=1e-8)

    def test_ate_zero_for_similarity_transformed(self, rng):
        gt = rng.normal(size=(20, 3))
        R = ScipyR.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
        est = 2.0 * gt @ R.T + np.array([1, 2, 3])
        err, aligned, _ = ate(est, gt)
        assert err < 1e-5

    def test_rpe_identity(self, rng):
        F = 10
        Ts = np.tile(np.eye(4), (F, 1, 1))
        Ts[:, 0, 3] = np.arange(F)
        t_err, r_err = rpe(Ts, Ts)
        assert t_err < 1e-12 and r_err < 1e-6

    def test_centers_and_length(self):
        Rs = np.tile(np.eye(3), (3, 1, 1))
        ts = np.array([[0, 0, 0], [-1, 0, 0], [-2, 0, 0]], float)
        c = camera_centers_w2c(Rs, ts)
        np.testing.assert_allclose(c[:, 0], [0, 1, 2])
        assert trajectory_length(c) == 2.0
