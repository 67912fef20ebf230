"""Distributed tests on the 8-device emulated CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu3drec.parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from tpu3drec.parallel.ring import ring_nearest_neighbors, sharded_voxel_count


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(data=1, space=8, model=1)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh(data=0, space=2)
        assert m.shape["data"] == 4 and m.shape["space"] == 2

    def test_pad_to_multiple(self):
        x = np.ones((10, 3))
        p, n = pad_to_multiple(x, 8)
        assert p.shape == (16, 3) and n == 10

    def test_shard_batch_places(self, mesh8):
        x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
        xs = shard_batch(mesh8, x, axis="space")
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), x)


class TestRingNN:
    def test_matches_global_search(self, mesh8, rng):
        Nq, Nr = 64, 128  # divisible by 8
        q = rng.normal(size=(Nq, 3)).astype(np.float32)
        r = rng.normal(size=(Nr, 3)).astype(np.float32)
        qs = shard_batch(mesh8, q, "space")
        rs = shard_batch(mesh8, r, "space")
        idx, d2 = ring_nearest_neighbors(qs, rs, mesh8)
        ref = ((q[:, None] - r[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
        np.testing.assert_allclose(np.asarray(d2), ref.min(1), atol=1e-5)


class TestShardedVoxels:
    def test_count_matches_host(self, mesh8, rng):
        from tpu3drec.mapping.voxel import voxelize
        from baseline.reference_cpu import octree_insert_equiv

        pts = rng.uniform(-2, 2, size=(400, 3)).astype(np.float32)
        keys = np.asarray(voxelize(jnp.asarray(pts), 0.2))
        valid = np.ones(400, bool)
        ks = shard_batch(mesh8, keys, "space")
        vs = shard_batch(mesh8, valid, "space")
        count = int(sharded_voxel_count(ks, vs, mesh8))
        assert count == len(octree_insert_equiv(pts.astype(np.float64), 0.2))

    def test_count_with_cross_shard_duplicates(self, mesh8):
        # every shard holds the same 2 keys: global unique must be 2
        keys = np.tile(np.array([[1, 2, 3], [4, 5, 6]], np.int32), (8, 1))
        valid = np.ones(16, bool)
        ks = shard_batch(mesh8, keys, "space")
        vs = shard_batch(mesh8, valid, "space")
        assert int(sharded_voxel_count(ks, vs, mesh8)) == 2


class TestShardedBA:
    def test_sharded_obs_equals_unsharded(self, mesh8, rng):
        """BA with observation arrays sharded over the mesh must match the
        single-device result (the reductions become psums)."""
        from tests.test_ba import _make_problem
        from tpu3drec.sfm.ba import ba_solve

        prob, _, _ = _make_problem(rng, F=4, L=64, perturb=0.005)
        res_single = ba_solve(prob, max_lm_iters=5, cg_iters=10)

        sharding = NamedSharding(mesh8, P("space"))
        prob_sharded = prob._replace(
            cam_idx=jax.device_put(prob.cam_idx, sharding),
            pt_idx=jax.device_put(prob.pt_idx, sharding),
            uv=jax.device_put(prob.uv, sharding),
            weight=jax.device_put(prob.weight, sharding),
        )
        res_sharded = ba_solve(prob_sharded, max_lm_iters=5, cg_iters=10)
        np.testing.assert_allclose(
            np.asarray(res_sharded.cam_params),
            np.asarray(res_single.cam_params), atol=1e-4,
        )
        np.testing.assert_allclose(
            float(res_sharded.final_cost), float(res_single.final_cost),
            rtol=1e-3, atol=1e-6,  # atol: both converge to numerical zero
        )

    def test_landmark_sharded_equals_unsharded(self, mesh8, rng):
        """Landmark STATE partitioned over the mesh (VERDICT r2 item 8):
        per-device points/V-blocks are 1/8 of the global problem, and the
        solve matches the replicated-landmark solver."""
        from tests.test_ba import _make_problem
        from tpu3drec.parallel.ba_sharded import (
            ba_solve_landmark_sharded, prepare_landmark_shards)
        from tpu3drec.sfm.ba import ba_solve

        # L=256 -> 32 landmarks per device; noise makes LM do real work
        prob, _, _ = _make_problem(rng, F=6, L=256, perturb=0.01,
                                   noise_px=0.3)
        res_single = ba_solve(prob, max_lm_iters=6, cg_iters=12)
        res_sharded = ba_solve_landmark_sharded(
            prob, mesh8, axis="space", max_lm_iters=6, cg_iters=12)

        np.testing.assert_allclose(
            np.asarray(res_sharded.cam_params),
            np.asarray(res_single.cam_params), atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_sharded.points),
            np.asarray(res_single.points), atol=2e-3,
        )
        np.testing.assert_allclose(
            float(res_sharded.final_cost), float(res_single.final_cost),
            rtol=1e-3,
        )

    def test_landmark_sharded_depth_priors_equal_unsharded(self, mesh8, rng):
        """Depth-prior rows shard with their observations (VERDICT r3 #5):
        the landmark-sharded solver with metric depth must match ba_solve
        AND recover metric scale from a 0.7x-shrunk initialization — the
        'metric at scale' capability (design.md §7)."""
        from tests.test_ba import _make_problem
        from tpu3drec.core.se3 import axis_angle_to_matrix
        from tpu3drec.parallel.ba_sharded import ba_solve_landmark_sharded
        from tpu3drec.sfm.ba import ba_solve

        prob, _, _ = _make_problem(rng, F=4, L=128)
        cams = np.asarray(prob.cam_params)
        Xs = np.asarray(prob.points)
        ci = np.asarray(prob.cam_idx)
        pi = np.asarray(prob.pt_idx)
        Rs = np.stack([np.asarray(axis_angle_to_matrix(jnp.asarray(c[:3])))
                       for c in cams])
        z = (np.einsum("oij,oj->oi", Rs[ci], Xs[pi])
             + cams[ci, 3:])[:, 2].astype(np.float32)
        # 30% of priors dropped (0 = none), like the pipeline's sparse maps
        keep = np.random.default_rng(3).uniform(size=z.shape) > 0.3
        z = np.where(keep, z, 0.0).astype(np.float32)

        s = 0.7
        shrunk = prob._replace(
            cam_params=jnp.asarray(
                np.concatenate([cams[:, :3], cams[:, 3:] * s], axis=1)),
            points=jnp.asarray(Xs * s),
            depth=jnp.asarray(z),
            depth_weight=5.0,
        )
        res_single = ba_solve(shrunk, max_lm_iters=15, cg_iters=20)
        res_sharded = ba_solve_landmark_sharded(
            shrunk, mesh8, axis="space", max_lm_iters=15, cg_iters=20)

        np.testing.assert_allclose(
            np.asarray(res_sharded.cam_params),
            np.asarray(res_single.cam_params), atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_sharded.points),
            np.asarray(res_single.points), atol=5e-3,
        )
        np.testing.assert_allclose(
            float(res_sharded.final_cost), float(res_single.final_cost),
            rtol=1e-3, atol=1e-6,
        )
        # and the depth rows pulled the scale back: recovered camera-frame
        # depths match the metric priors
        new_cams = np.asarray(res_sharded.cam_params)
        new_X = np.asarray(res_sharded.points)
        Rn = np.stack([np.asarray(axis_angle_to_matrix(jnp.asarray(c[:3])))
                       for c in new_cams])
        z_new = (np.einsum("oij,oj->oi", Rn[ci], new_X[pi])
                 + new_cams[ci, 3:])[:, 2]
        rel = np.abs(z_new[keep] - z[keep]) / z[keep]
        assert np.median(rel) < 0.02, np.median(rel)

    def test_landmark_shard_prep_routes_all_observations(self, rng):
        """Every observation lands on its landmark's shard with the right
        local index; padded slots carry weight 0."""
        from tests.test_ba import _make_problem
        from tpu3drec.parallel.ba_sharded import prepare_landmark_shards

        prob, _, _ = _make_problem(rng, F=4, L=100)
        parts = prepare_landmark_shards(prob, 8)
        assert parts.Ls == 13  # ceil(100/8)
        ci = parts.cam_idx.reshape(8, parts.Oc)
        pl = parts.pt_idx_local.reshape(8, parts.Oc)
        ww = parts.weight.reshape(8, parts.Oc)
        # reconstruct global (cam, pt) pairs from the shard layout
        got = set()
        for s in range(8):
            for o in range(parts.Oc):
                if ww[s, o] > 0:
                    got.add((int(ci[s, o]), s * parts.Ls + int(pl[s, o])))
        expect = set(zip(np.asarray(prob.cam_idx).tolist(),
                         np.asarray(prob.pt_idx).tolist()))
        assert got == expect
        assert float(ww.sum()) == float(np.asarray(prob.weight).sum())


class TestShardedFusion:
    def test_frames_sharded_over_mesh(self, rng):
        from tpu3drec.core.unproject import fuse_depth_maps

        mesh = make_mesh(data=4, space=2)
        F, h, w = 8, 16, 24
        depths = rng.uniform(0.1, 10, size=(F, h, w)).astype(np.float32)
        Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (F, 3, 3)).copy()
        ts = rng.normal(size=(F, 3)).astype(np.float32)
        sh = NamedSharding(mesh, P(("data", "space")))
        pts, valid = fuse_depth_maps(
            jax.device_put(depths, sh),
            jax.device_put(Rs, sh),
            jax.device_put(ts, sh),
            100.0, 100.0, 12.0, 8.0,
        )
        # result matches unsharded
        pts2, _ = fuse_depth_maps(
            jnp.asarray(depths), jnp.asarray(Rs), jnp.asarray(ts),
            100.0, 100.0, 12.0, 8.0,
        )
        np.testing.assert_allclose(np.asarray(pts), np.asarray(pts2), atol=1e-5)


class TestTensorParallel:
    def test_tp_sharded_training_step_matches_replicated(self, rng):
        """TP over the model axis: same loss as replicated params (the
        capability SURVEY §2.3 keeps available, off by default)."""
        from tpu3drec.models.training import TrainConfig, init_state, make_train_step
        from tpu3drec.parallel.mesh import make_mesh
        from tpu3drec.parallel.tp import shard_params_tp, tp_param_shardings

        mesh = make_mesh(data=4, space=1, model=2)
        H, W = 32, 64
        cfg = TrainConfig(height=H, width=W, batch_size=4)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, 10)
        step = make_train_step(model, tx, cfg)
        batch = {
            k: jnp.asarray(rng.uniform(size=(4, H, W, 3)).astype(np.float32))
            for k in ("target", "prev", "next")
        }
        key = jax.random.PRNGKey(1)
        _, loss_repl, _ = step(state, batch, key)

        shardings = tp_param_shardings(state.params, mesh)
        # at least the wide conv kernels must actually be sharded
        n_sharded = sum(
            1 for s in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x.spec != P(), shardings,
                                       is_leaf=lambda x: isinstance(x, NamedSharding))
            ) if s
        )
        assert n_sharded > 5
        tp_params = shard_params_tp(state.params, mesh)
        state_tp = jax.tree_util.tree_map(lambda x: x, state)
        state_tp.params = tp_params
        _, loss_tp, _ = step(state_tp, batch, key)
        np.testing.assert_allclose(float(loss_tp), float(loss_repl), rtol=1e-4)
