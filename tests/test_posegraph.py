"""Pose-graph optimization tests: drift correction via loop closure."""

import jax.numpy as jnp
import numpy as np

from tpu3drec.sfm.posegraph import (
    PoseGraph,
    edge_residuals,
    optimize_pose_graph,
    make_sequential_edges,
    add_loop_closure,
    _pose_to_matrix,
    _se3_log,
)


def test_residual_zero_for_consistent_graph(rng):
    # ground-truth poses along a line with small rotations
    F = 5
    poses = np.zeros((F, 6), np.float32)
    poses[:, 3] = np.arange(F)  # translate along x
    poses[:, 1] = 0.05 * np.arange(F)  # slight yaw
    Ts = [np.asarray(_pose_to_matrix(jnp.asarray(p))) for p in poses]
    rels = np.stack([
        np.asarray(_se3_log(jnp.asarray(np.linalg.inv(Ts[i]) @ Ts[i + 1])))
        for i in range(F - 1)
    ]).astype(np.float32)
    g = PoseGraph(
        poses=jnp.asarray(poses),
        edge_i=jnp.arange(F - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, F, dtype=jnp.int32),
        rel=jnp.asarray(rels),
        weight=jnp.ones(F - 1),
    )
    r = np.asarray(edge_residuals(g.poses, g))
    assert np.abs(r).max() < 1e-5


def test_loop_closure_corrects_drift(rng):
    """A square loop with odometry drift: closure pulls the end home."""
    # 4 sides of a square, 90° yaw turns; odometry has noise
    rels = []
    for side in range(4):
        rels.append([0, 0, 0, 1.0, 0, 0])       # forward 1m
        rels.append([0, 0, np.pi / 2, 0, 0, 0])  # turn 90°
    rels = np.asarray(rels, np.float32)
    noisy = rels + rng.normal(0, 0.02, size=rels.shape).astype(np.float32)
    g = make_sequential_edges(jnp.asarray(noisy))
    # drifted open-loop endpoint
    end_open = np.asarray(_pose_to_matrix(g.poses[-1]))[:3, 3]

    # closure: node 8 (after full square) should coincide with node 0
    g2 = add_loop_closure(g, 0, 8, jnp.zeros(6), weight=10.0)
    opt, costs = optimize_pose_graph(g2, iters=20)
    end_closed = np.asarray(_pose_to_matrix(opt[8]))[:3, 3]

    assert np.linalg.norm(end_closed) < np.linalg.norm(end_open) * 0.3
    assert float(costs[-1]) < float(costs[0])


def test_fixed_node_stays(rng):
    rels = rng.normal(0, 0.1, size=(4, 6)).astype(np.float32)
    g = make_sequential_edges(jnp.asarray(rels))
    opt, _ = optimize_pose_graph(g, iters=5)
    np.testing.assert_allclose(np.asarray(opt[0]), np.asarray(g.poses[0]), atol=1e-7)
