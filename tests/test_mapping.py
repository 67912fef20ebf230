"""Voxel dedup + .bt octree golden/round-trip tests."""

import numpy as np
import jax.numpy as jnp

from tpu3drec.mapping import (
    voxelize,
    unique_voxels,
    dedup_voxels_host,
    write_bt,
    read_bt,
)
from tpu3drec.mapping.btio import morton_encode, morton_decode
from baseline.reference_cpu import octree_insert_equiv


def test_voxelize_floor_semantics():
    pts = jnp.array([[0.05, -0.05, 0.15], [0.0, 0.1, -0.1]])
    keys = np.asarray(voxelize(pts, 0.1))
    np.testing.assert_array_equal(keys, [[0, -1, 1], [0, 1, -1]])


def test_unique_matches_reference_set(rng):
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    keys = dedup_voxels_host(pts, 0.1)
    ref = octree_insert_equiv(pts.astype(np.float64), 0.1)
    got = {tuple(k) for k in keys}
    # fp32 vs fp64 flooring can disagree exactly at voxel boundaries; none
    # of the random draws should sit on one
    assert got == ref


def test_unique_mask_and_count(rng):
    pts = np.repeat(rng.uniform(-1, 1, size=(100, 3)), 5, axis=0).astype(np.float32)
    keys = voxelize(jnp.asarray(pts), 0.1)
    valid = jnp.ones((500,), dtype=bool)
    skeys, mask, count = unique_voxels(keys, valid)
    assert int(count) == len({tuple(k) for k in np.asarray(keys)})
    assert int(np.asarray(mask).sum()) == int(count)


def test_unique_respects_valid_mask(rng):
    pts = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    valid = np.zeros(64, dtype=bool)
    valid[:10] = True
    keys = dedup_voxels_host(pts, 0.05, valid=valid)
    ref = octree_insert_equiv(pts[:10].astype(np.float64), 0.05)
    assert {tuple(k) for k in keys} == ref


def test_morton_roundtrip(rng):
    keys = rng.integers(0, 1 << 16, size=(256, 3)).astype(np.uint64)
    m = morton_encode(keys)
    back = morton_decode(m)
    np.testing.assert_array_equal(back, keys)


def test_morton_child_order():
    # morton must order children x-minor (octomap computeChildIdx: x+2y+4z)
    k = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.uint64)
    m = morton_encode(k)
    assert m[0] == 1 and m[1] == 2 and m[2] == 4


class TestBT:
    def test_roundtrip_random(self, rng, tmp_path):
        keys = np.unique(rng.integers(-100, 100, size=(500, 3)), axis=0).astype(np.int32)
        path = str(tmp_path / "map.bt")
        n = write_bt(path, keys, 0.1)
        assert n > 0
        got, res = read_bt(path)
        assert res == 0.1
        def keyset(a):
            return {tuple(k) for k in a}
        assert keyset(got) == keyset(keys)

    def test_pruning_full_block(self, tmp_path):
        # a full 2x2x2 block of voxels must prune to one leaf node
        keys = np.array(
            [[x, y, z] for x in range(2) for y in range(2) for z in range(2)],
            dtype=np.int32,
        )
        path = str(tmp_path / "block.bt")
        n_pruned = write_bt(path, keys, 0.1)
        got, _ = read_bt(path)
        assert {tuple(k) for k in got} == {tuple(k) for k in keys}
        # single off-block voxel for comparison: 16 levels of single-child
        n_single = write_bt(str(tmp_path / "one.bt"), keys[:1], 0.1)
        # pruned block collapses its deepest level: one fewer node than the
        # root->depth-16 chain of a single-voxel tree (17 nodes)
        assert n_single == 17
        assert n_pruned == n_single - 1

    def test_header_fields(self, tmp_path):
        path = str(tmp_path / "h.bt")
        write_bt(path, np.array([[0, 0, 0]], dtype=np.int32), 0.25)
        with open(path, "rb") as f:
            head = f.read(200).decode("ascii", errors="replace")
        assert head.startswith("# Octomap OcTree binary file\n")
        assert "id OcTree" in head
        assert "res 0.25" in head
        assert "\ndata\n" in head

    def test_empty(self, tmp_path):
        path = str(tmp_path / "e.bt")
        n = write_bt(path, np.zeros((0, 3), dtype=np.int32), 0.1)
        assert n == 0
        got, res = read_bt(path)
        assert got.shape == (0, 3)
