"""Golden-byte pins for the .bt octree format (VERDICT r1 item 6: both
writers were only ever validated against each other and the same-repo
reader).

The expected byte streams below are derived BY HAND from octomap's
published `writeBinaryNode` semantics (`AbstractOccupancyOcTree`: per child
a 2-bit code — 00 unknown, 01 occupied leaf, 10 free leaf, 11 inner —
packed LSB-first four-per-byte, children 0-3 in byte 0 and 4-7 in byte 1,
nodes emitted in preorder with children visited 0..7; `writeBinary` prunes
first, and a subtree holding its full single-label voxel complement prunes
to one leaf; reference usage `ref/octomap/txt_transfer_octomap.py:31-36`).
They are NOT produced by either writer under test, so a shared structural
misunderstanding (child indexing, DFS order, pruning, node count, header)
in python + C++ cannot cancel out. The one axiom shared with the writers
is the 2-bit code table itself, taken from the octomap source comment.

Key space: depth 16, key = signed_voxel_index + 2^15, child index at each
level = x_bit + 2*y_bit + 4*z_bit (x least significant) — octomap
`computeChildIdx`.
"""

import numpy as np
import pytest

from tpu3drec.mapping.btio import read_bt, write_bt
from tpu3drec.utils import native

HEADER = (
    b"# Octomap OcTree binary file\n"
    b"# (feel free to add / change comments, but leave the first line as it"
    b" is!)\n#\n"
    b"id OcTree\nsize %d\nres 0.5\ndata\n"
)

# Signed key (0,0,0) -> offset key (2^15,)*3: only bit 15 set, so the root's
# child 7 (x,y,z bit all set) starts a chain of child-0 inner nodes down to
# the depth-15 node whose child 0 is the occupied voxel leaf.
ROOT = bytes([0x00, 0xC0])          # child 7 inner -> bits 11 at pair 3 of byte 1
CHAIN = bytes([0x03, 0x00])         # child 0 inner
OCC_LEAF0 = bytes([0x01, 0x00])     # child 0 occupied leaf

GOLDEN_SINGLE = (17, ROOT + 14 * CHAIN + OCC_LEAF0)

# Full {0,1}^3 cube: the depth-15 node's 8 children are all occupied ->
# prunes to an occupied leaf one level up (its parent writes 01).
GOLDEN_CUBE = (16, ROOT + 13 * CHAIN + OCC_LEAF0)

# Occupied (0,0,0) + free (1,0,0): same depth-15 parent, child 0 occupied
# (01) and child 1 free (10 -> 0b1000 in byte 0).
GOLDEN_FREE = (18, ROOT + 14 * CHAIN + bytes([0x09, 0x00]))


def _expect(n_nodes: int, payload: bytes) -> bytes:
    return HEADER % n_nodes + payload


class TestGoldenBytes:
    def test_single_voxel(self, tmp_path):
        p = str(tmp_path / "one.bt")
        n = write_bt(p, np.zeros((1, 3), np.int32), 0.5, backend="python")
        assert n == GOLDEN_SINGLE[0]
        assert open(p, "rb").read() == _expect(*GOLDEN_SINGLE)

    def test_full_cube_prunes(self, tmp_path):
        keys = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                        -1).reshape(-1, 3).astype(np.int32)
        p = str(tmp_path / "cube.bt")
        n = write_bt(p, keys, 0.5, backend="python")
        assert n == GOLDEN_CUBE[0]
        assert open(p, "rb").read() == _expect(*GOLDEN_CUBE)

    def test_free_leaf(self, tmp_path):
        p = str(tmp_path / "free.bt")
        n = write_bt(p, np.zeros((1, 3), np.int32), 0.5, backend="python",
                     free_keys=np.asarray([[1, 0, 0]], np.int32))
        assert n == GOLDEN_FREE[0]
        assert open(p, "rb").read() == _expect(*GOLDEN_FREE)

    @pytest.mark.skipif(not native.available(), reason="native lib absent")
    def test_native_matches_golden(self, tmp_path):
        p1 = str(tmp_path / "n1.bt")
        assert native.bt_write_keys(
            p1, np.zeros((1, 3), np.int32), 0.5) == GOLDEN_SINGLE[0]
        assert open(p1, "rb").read() == _expect(*GOLDEN_SINGLE)

        p2 = str(tmp_path / "n2.bt")
        assert native.bt_write_keys(
            p2, np.zeros((1, 3), np.int32), 0.5,
            free_keys=np.asarray([[1, 0, 0]], np.int32)) == GOLDEN_FREE[0]
        assert open(p2, "rb").read() == _expect(*GOLDEN_FREE)

    def test_reader_roundtrip_with_free(self, tmp_path):
        p = str(tmp_path / "rt.bt")
        write_bt(p, np.zeros((1, 3), np.int32), 0.5, backend="python",
                 free_keys=np.asarray([[1, 0, 0]], np.int32))
        occ, res = read_bt(p)
        np.testing.assert_array_equal(np.asarray(occ),
                                      np.zeros((1, 3), np.int32))
        assert float(res) == 0.5
