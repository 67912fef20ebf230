"""Occupancy mapping + free-space raycasting tests."""

import jax.numpy as jnp
import numpy as np

from tpu3drec.mapping.btio import read_bt, write_bt
from tpu3drec.mapping.occupancy import (
    L_HIT,
    L_MISS,
    OccupancyMap,
    ray_free_voxels,
    scan_update,
)


class TestRayFree:
    def test_straight_ray_marks_cells(self):
        origin = jnp.zeros(3)
        points = jnp.asarray([[0.0, 0.0, 1.0]])  # 1m along z, res 0.1
        keys, ok = ray_free_voxels(origin, points, jnp.ones(1, bool), 0.1,
                                   max_samples=32)
        k = np.asarray(keys)[np.asarray(ok)]
        zs = sorted(set(k[:, 2]))
        # cells 0..8 free (endpoint voxel z=9/10 excluded)
        assert zs[0] == 0 and zs[-1] <= 9
        assert len(zs) >= 8
        assert (k[:, :2] == 0).all()

    def test_endpoint_voxel_not_free(self):
        origin = jnp.zeros(3)
        points = jnp.asarray([[0.0, 0.0, 0.55]])
        keys, ok = ray_free_voxels(origin, points, jnp.ones(1, bool), 0.1,
                                   max_samples=32)
        k = np.asarray(keys)[np.asarray(ok)]
        assert 5 not in set(k[:, 2])  # endpoint voxel z-key 5


class TestScanUpdate:
    def test_occupied_wins_within_scan(self):
        """A hit at 0.05 (voxel 0) with another ray passing through voxel 0:
        voxel 0 must not appear in the free set."""
        origin = jnp.asarray([0.0, 0.0, -1.0])
        points = jnp.asarray([[0.0, 0.0, 0.05], [0.0, 0.0, 1.0]])
        skeys, m_occ, m_free = scan_update(origin, points, jnp.ones(2, bool),
                                           0.1, max_samples=64)
        k = np.asarray(skeys)
        occ = {tuple(r) for r in k[np.asarray(m_occ)]}
        free = {tuple(r) for r in k[np.asarray(m_free)]}
        assert (0, 0, 0) in occ
        assert (0, 0, 0) not in free
        assert len(occ & free) == 0
        assert len(free) > 5  # cells between origin and the far hit


class TestOccupancyMap:
    def test_logodds_accumulate_and_flip(self):
        m = OccupancyMap(res=0.1)
        origin = np.zeros(3)
        pts = np.array([[0.0, 0.0, 1.0]], np.float32)
        m.insert_scan(origin, pts)
        occ = {tuple(k) for k in m.occupied_keys()}
        free = {tuple(k) for k in m.free_keys()}
        assert (0, 0, 9) in occ or (0, 0, 10) in occ
        assert (0, 0, 0) in free
        # hammer a previously-free voxel with hits until it flips occupied
        hit = np.array([[0.05, 0.05, 0.05]], np.float32)
        for _ in range(3):
            m.insert_scan(origin, hit, with_freespace=False)
        assert (0, 0, 0) in {tuple(k) for k in m.occupied_keys()}

    def test_clamping(self):
        m = OccupancyMap(res=0.1)
        hit = np.array([[0.05, 0.05, 0.05]], np.float32)
        for _ in range(50):
            m.insert_scan(np.zeros(3), hit, with_freespace=False)
        assert m.logodds.max() <= 3.6  # octomap clamp

    def test_bt_roundtrip_with_free(self, tmp_path):
        m = OccupancyMap(res=0.1)
        m.insert_scan(np.zeros(3), np.array([[0.0, 0.0, 1.0]], np.float32))
        p = str(tmp_path / "occ.bt")
        n = m.write_bt(p)
        assert n > 0
        occ, free, res = read_bt(p, with_free=True)
        assert res == 0.1
        assert {tuple(k) for k in occ} == {tuple(k) for k in m.occupied_keys()}
        assert {tuple(k) for k in free} == {tuple(k) for k in m.free_keys()}

    def test_mixed_write_read_pruning(self, tmp_path):
        # full 2x2x2 free block + separate occupied voxel
        free = np.array([[x, y, z] for x in range(2) for y in range(2)
                         for z in range(2)], np.int32)
        occ = np.array([[5, 5, 5]], np.int32)
        p = str(tmp_path / "mix.bt")
        write_bt(p, occ, 0.1, free_keys=free)
        o2, f2, _ = read_bt(p, with_free=True)
        assert {tuple(k) for k in o2} == {(5, 5, 5)}
        assert {tuple(k) for k in f2} == {tuple(k) for k in free}


def test_occupancy_cli_end_to_end(tmp_path, rng):
    """`cli occupancy` on capture-layout inputs: occupied + free leaves in
    the output .bt."""
    import json

    from tpu3drec.data.capture_sim import CaptureSim, SimScene
    from tpu3drec.pipelines.cli import main
    from tpu3drec.utils.config import CameraConfig

    scene = SimScene.clustered(rng, n_landmarks=120, sats=3)
    cam = CameraConfig(fx=110.0, fy=110.0, cx=64.0, cy=48.0, width=128, height=96)
    sim = CaptureSim(scene, cam=cam)
    sim.capture(str(tmp_path), sim.fly(2, step=np.array([0.5, 0, 0.3])))
    cfg = {
        "camera": {"fx": 110.0, "fy": 110.0, "cx": 64.0, "cy": 48.0,
                   "width": 128, "height": 96},
        "depth": {"mode": "uint16_mm"},
        "map": {"min_depth": 0.1},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / "occ.bt")
    main(["occupancy", "--config", str(cfg_path),
          "--poses", str(tmp_path / "poses.txt"),
          "--depth-dir", str(tmp_path / "depth"),
          "--res", "1.0", "--max-range", "55", "--out", out])
    occ, free, res = read_bt(out, with_free=True)
    assert res == 1.0
    assert len(occ) > 50
    assert len(free) > len(occ)  # carved space dominates
