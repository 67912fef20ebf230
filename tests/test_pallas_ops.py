"""Pallas kernel correctness (interpret mode on CPU; same code runs
compiled on TPU — the bench exercises that path)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.ops.ba_blocks import ba_blocks, local_jacobians_reference
from tpu3drec.ops.icp_nn import nearest_neighbors_pallas


class TestIcpNNKernel:
    def test_matches_bruteforce(self, rng):
        q = rng.normal(size=(300, 3)).astype(np.float32)
        r = rng.normal(size=(700, 3)).astype(np.float32)
        idx, d2 = nearest_neighbors_pallas(jnp.asarray(q), jnp.asarray(r))
        ref = ((q[:, None] - r[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
        np.testing.assert_allclose(np.asarray(d2), ref.min(1), atol=1e-4)

    def test_padding_never_wins(self, rng):
        # sizes straddling tile boundaries; far query must still match real ref
        q = np.array([[100.0, 100.0, 100.0]], np.float32)
        r = rng.normal(size=(5, 3)).astype(np.float32)
        idx, d2 = nearest_neighbors_pallas(jnp.asarray(q), jnp.asarray(r))
        ref = ((q[:, None] - r[None]) ** 2).sum(-1)
        assert int(idx[0]) == int(ref.argmin(1)[0])

    def test_agrees_with_blocked_scan(self, rng):
        from tpu3drec.sfm.icp import nearest_neighbors

        q = rng.normal(size=(128, 3)).astype(np.float32)
        r = rng.normal(size=(512, 3)).astype(np.float32)
        i1, d1 = nearest_neighbors_pallas(jnp.asarray(q), jnp.asarray(r))
        i2, d2 = nearest_neighbors(jnp.asarray(q), jnp.asarray(r), block=128)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestBABlocksKernel:
    def _setup(self, rng, O=100):
        from scipy.spatial.transform import Rotation as ScipyR

        K = np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]], np.float32)
        Rm = ScipyR.from_rotvec(rng.normal(size=(O, 3)) * 0.3).as_matrix().astype(np.float32)
        X = rng.uniform([-2, -2, 4], [2, 2, 10], size=(O, 3)).astype(np.float32)
        t = rng.normal(size=(O, 3)).astype(np.float32) * 0.1
        Xc = np.einsum("oij,oj->oi", Rm, X) + t
        Xc[:, 2] = np.abs(Xc[:, 2]) + 3.0  # keep in front
        uv = rng.uniform([0, 0], [640, 480], size=(O, 2)).astype(np.float32)
        w = rng.uniform(0.1, 1.0, size=O).astype(np.float32)
        return K, Rm, Xc, uv, w

    def test_jacobians_match_autodiff(self, rng):
        K, Rm, Xc, uv, w = self._setup(rng)
        out = ba_blocks(jnp.asarray(Xc), jnp.asarray(Rm), jnp.asarray(uv),
                        jnp.asarray(w), jnp.asarray(K))
        Jc_ref, Jp_ref = local_jacobians_reference(
            jnp.asarray(Xc), jnp.asarray(Rm), jnp.asarray(uv), jnp.asarray(K)
        )
        # blocks follow from reference jacobians
        U_ref = np.einsum("o,oia,oib->oab", w, np.asarray(Jc_ref), np.asarray(Jc_ref))
        V_ref = np.einsum("o,oia,oib->oab", w, np.asarray(Jp_ref), np.asarray(Jp_ref))
        W_ref = np.einsum("o,oia,oib->oab", w, np.asarray(Jc_ref), np.asarray(Jp_ref))
        np.testing.assert_allclose(np.asarray(out["U"]), U_ref, rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out["V"]), V_ref, rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out["W"]), W_ref, rtol=2e-3, atol=2e-2)

    def test_residual_and_gradient(self, rng):
        K, Rm, Xc, uv, w = self._setup(rng, O=50)
        out = ba_blocks(jnp.asarray(Xc), jnp.asarray(Rm), jnp.asarray(uv),
                        jnp.asarray(w), jnp.asarray(K))
        z = Xc[:, 2]
        ru = K[0, 0] * Xc[:, 0] / z + K[0, 2] - uv[:, 0]
        rv = K[1, 1] * Xc[:, 1] / z + K[1, 2] - uv[:, 1]
        np.testing.assert_allclose(np.asarray(out["res"])[:, 0], ru, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out["res"])[:, 1], rv, rtol=1e-4, atol=1e-2)
        # bc = -w Jc^T r
        Jc_ref, _ = local_jacobians_reference(
            jnp.asarray(Xc), jnp.asarray(Rm), jnp.asarray(uv), jnp.asarray(K)
        )
        r = np.stack([ru, rv], -1)
        bc_ref = -np.einsum("o,oia,oi->oa", w, np.asarray(Jc_ref), r)
        np.testing.assert_allclose(np.asarray(out["bc"]), bc_ref, rtol=2e-3, atol=5e-2)
