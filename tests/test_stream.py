"""Live frame-stream ingestion (tpu3drec/data/stream.py): the runtime
analogue of the reference's AirSim capture RPC (`ref/airsim/main.cpp:
1369-1392`). Covers the wire protocol (Python and C++ producers), the
queue-decoupled streaming fusion, and equivalence with the offline rgbd
pipeline on the same frames."""

import os
import shutil
import subprocess
import threading

import numpy as np
import pytest

from tpu3drec.data.stream import (
    FrameStreamClient,
    FrameStreamServer,
    StreamFrame,
    stream_fuse,
    write_capture_blob,
)
from tpu3drec.utils.config import CameraConfig, RGBDPipelineConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_frames(rng, F=6, H=48, W=64):
    depths = rng.uniform(1.0, 30.0, size=(F, H, W)).astype(np.float32)
    q = rng.normal(size=(F, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.normal(size=(F, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(F, H, W, 3), dtype=np.uint8)
    return depths, q, t, rgb


def _cfg(tmp_path, H=48, W=64):
    cfg = RGBDPipelineConfig()
    cfg.camera = CameraConfig(fx=60.0, fy=60.0, cx=W / 2, cy=H / 2,
                              width=W, height=H)
    cfg.out_ply = str(tmp_path / "stream.ply")
    cfg.out_bt = str(tmp_path / "stream.bt")
    return cfg


def _stream_in_thread(server, depths, q, t, rgb=None):
    def produce():
        client = FrameStreamClient("127.0.0.1", server.port)
        for i in range(len(depths)):
            client.send(StreamFrame(
                frame_id=i, depth=depths[i],
                rgb=None if rgb is None else rgb[i],
                t=t[i], q_xyzw=q[i]))
        client.close()

    th = threading.Thread(target=produce)
    th.start()
    return th


def test_stream_fuse_matches_offline_pipeline(tmp_path, rng):
    """Streamed fusion must produce the same cloud and voxel set as the
    offline rgbd pipeline on identical frames (batch 4 over 6 frames:
    exercises the padded final micro-batch)."""
    from tpu3drec.mapping.btio import read_bt
    from tpu3drec.pipelines.rgbd import run_arrays

    depths, q, t, rgb = _make_frames(rng)
    cfg = _cfg(tmp_path)
    server = FrameStreamServer()
    th = _stream_in_thread(server, depths, q, t, rgb)
    res = stream_fuse(server, cfg, batch=4, keep_points=True)
    th.join()
    assert res.n_frames == 6

    cfg2 = _cfg(tmp_path)
    cfg2.out_ply = str(tmp_path / "off.ply")
    cfg2.out_bt = str(tmp_path / "off.bt")
    ref = run_arrays(depths, q, t, cfg2, keep_points=True)
    assert res.n_points == ref.n_points
    np.testing.assert_allclose(
        np.sort(res.points, axis=0), np.sort(ref.points, axis=0), atol=1e-4)
    k1, _ = read_bt(cfg.out_bt)
    k2, _ = read_bt(cfg2.out_bt)
    np.testing.assert_array_equal(np.unique(k1, axis=0),
                                  np.unique(k2, axis=0))


def test_stream_without_pose_fuses_at_identity(tmp_path, rng):
    depths, q, t, _ = _make_frames(rng, F=2)
    cfg = _cfg(tmp_path)
    cfg.out_bt = ""
    server = FrameStreamServer()

    def produce():
        c = FrameStreamClient("127.0.0.1", server.port)
        for i in range(2):
            c.send(StreamFrame(frame_id=i, depth=depths[i]))
        c.close()

    th = threading.Thread(target=produce)
    th.start()
    res = stream_fuse(server, cfg, batch=2, keep_points=True)
    th.join()
    # identity pose: world == camera frame, z = depth
    from tpu3drec.pipelines.rgbd import run_arrays

    ident_q = np.tile(np.array([0, 0, 0, 1], np.float32), (2, 1))
    ident_t = np.zeros((2, 3), np.float32)
    cfg2 = _cfg(tmp_path)
    cfg2.out_ply = str(tmp_path / "id.ply")
    cfg2.out_bt = ""
    ref = run_arrays(depths, ident_q, ident_t, cfg2, keep_points=True)
    np.testing.assert_allclose(
        np.sort(res.points, axis=0), np.sort(ref.points, axis=0), atol=1e-4)


def test_stream_shape_mismatch_raises(tmp_path, rng):
    cfg = _cfg(tmp_path)  # configured 48x64
    server = FrameStreamServer()

    def produce():
        c = FrameStreamClient("127.0.0.1", server.port)
        c.send(StreamFrame(frame_id=0,
                           depth=np.zeros((32, 32), np.float32)))
        c.close()

    th = threading.Thread(target=produce)
    th.start()
    with pytest.raises(ValueError, match="shape"):
        stream_fuse(server, cfg, batch=2)
    th.join()


def test_truncated_stream_surfaces_error(tmp_path, rng):
    """A producer dying mid-frame must raise at the consumer, not hang or
    silently truncate."""
    import socket
    import struct

    cfg = _cfg(tmp_path)
    server = FrameStreamServer()
    s = socket.create_connection(("127.0.0.1", server.port))
    s.sendall(b"T3DR" + struct.pack("<I", 1))
    s.sendall(struct.pack("<IHHB", 0, 48, 64, 0))
    s.sendall(b"\x00" * 100)  # far less than 4*48*64
    s.close()
    with pytest.raises(ConnectionError, match="mid-message"):
        stream_fuse(server, cfg, batch=2)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_cpp_sender_end_to_end(tmp_path, rng):
    """The C++ capture client (native/stream_sender.cpp) streams a recorded
    blob; the fused result must match the offline pipeline bit-for-bit in
    float tolerance — proves the cross-language wire protocol."""
    sender = os.path.join(REPO, "native", "stream_sender")
    if not os.path.exists(sender):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                            "stream_sender"], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    depths, q, t, rgb = _make_frames(rng, F=5)
    blob = str(tmp_path / "cap.t3dc")
    write_capture_blob(blob, depths, rgb=rgb, t=t, q_xyzw=q)

    cfg = _cfg(tmp_path)
    server = FrameStreamServer()
    proc = subprocess.Popen([sender, blob, "127.0.0.1", str(server.port)],
                            stdout=subprocess.PIPE, text=True)
    res = stream_fuse(server, cfg, batch=2, keep_points=True)
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0, out
    assert "sent 5 frames" in out
    assert res.n_frames == 5

    from tpu3drec.pipelines.rgbd import run_arrays

    cfg2 = _cfg(tmp_path)
    cfg2.out_ply = str(tmp_path / "off.ply")
    cfg2.out_bt = ""
    ref = run_arrays(depths, q, t, cfg2, keep_points=True)
    np.testing.assert_allclose(
        np.sort(res.points, axis=0), np.sort(ref.points, axis=0), atol=1e-4)
