"""Worker process for the 2-process jax.distributed test
(tests/test_multihost.py). Each invocation is ONE host: it initializes the
distributed runtime against the shared coordinator, proves a cross-process
collective works (psum over the 2-device global mesh), and writes its shard
of the PLY/.bt artifacts; process 0 merges.

Usage: python tests/multihost_worker.py <coordinator> <nproc> <pid> <outdir>
"""

import os
import sys

# the repo root, regardless of the caller's cwd/site-packages state:
# running this file as a script puts tests/ (not the repo) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any device use
jax.config.update("jax_num_cpu_devices", 1)
# share the suite's persistent compile cache: worker compiles (window SfM
# especially) dominate wall time, and under a loaded xdist run a cold
# worker can blow the test's timeout — warm runs are replays
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu3drec_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "writers"

    from tpu3drec.parallel.multihost import (
        barrier,
        init_distributed,
        process_slice,
        write_bt_sharded,
        write_ply_sharded,
    )

    assert init_distributed(coord, nproc, pid)
    if mode == "train":
        # multi-host DATA-PARALLEL training: each host feeds its local
        # batch shard; gradients sync across processes through the global
        # mesh (the psum rides the jax.distributed backend). Every host
        # must end with IDENTICAL parameters.
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from tpu3drec.models.training import (
            TrainConfig, init_state, make_train_step)

        H, W, B_global = 64, 96, 4
        cfg = TrainConfig(height=H, width=W, batch_size=B_global)
        model, state, tx = init_state(jax.random.PRNGKey(0), cfg, 10)
        step = make_train_step(model, tx, cfg)

        mesh = Mesh(np.array(jax.devices()), ("data",))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)

        B_local = B_global // nproc
        key = jax.random.PRNGKey(0)
        for it in range(3):
            batch = {}
            for ki, k in enumerate(("target", "prev", "next")):
                # deterministic GLOBAL batch; each host materializes only
                # its slice
                rng_g = np.random.default_rng(1000 * it + ki)
                full = rng_g.uniform(
                    size=(B_global, H, W, 3)).astype(np.float32)
                local = full[pid * B_local:(pid + 1) * B_local]
                batch[k] = multihost_utils.host_local_array_to_global_array(
                    local, mesh, P("data"))
            state, loss, aux = step(state, batch, key)
        # parameters must be bit-identical across hosts after synced steps
        leaves = jax.tree_util.tree_leaves(state.params)
        norm = float(np.sum([np.linalg.norm(np.asarray(
            jax.device_get(l)).astype(np.float64)) for l in leaves]))
        with open(outdir + f"/train_norm_{pid}.txt", "w") as f:
            f.write(repr(norm))
        barrier("train_done")
        print(f"WORKER_OK pid={pid} param_norm={norm!r} "
              f"loss={float(jax.device_get(loss)):.5f}")
        return
    if mode == "kitti":
        # window-sharded multi-host SfM: each process reconstructs its
        # slice of windows; stitched trajectories replicate on every host
        from tpu3drec.pipelines.kitti import KittiRunConfig, run_windowed_sfm

        images = np.load(outdir + "/images.npy")
        K = np.load(outdir + "/K.npy")
        cfg = KittiRunConfig(window=6, stride=3, max_keypoints=192,
                             loop_closure=False)
        Ts, recs = run_windowed_sfm(images, K, cfg)
        if pid == 0:
            np.savez(outdir + "/mh_traj.npz",
                     **{f"T{i}": T for i, T in enumerate(Ts)
                        if T is not None})
        barrier("kitti_done")
        print(f"WORKER_OK pid={pid} windows_owned={len(recs)} "
              f"covered={sum(T is not None for T in Ts)}")
        return
    if mode == "rgbd":
        # the real pipeline, frame-sharded across processes: cfg json is
        # prepared by the parent; out paths land in outdir
        import json

        from tpu3drec.pipelines import rgbd
        from tpu3drec.utils.config import RGBDPipelineConfig, from_dict

        with open(outdir + "/cfg.json") as f:
            cfg = from_dict(RGBDPipelineConfig, json.load(f))
        res = rgbd.run(cfg)
        barrier("done")
        print(f"WORKER_OK pid={pid} frames={res.n_frames} "
              f"voxels={res.n_voxels}")
        return
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc  # global device view

    # cross-process collective: each process contributes (pid+1); the
    # replicated global sum must see every host's shard
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("d",))
    local = np.full((1,), jax.process_index() + 1.0, np.float32)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("d"))
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    val = float(np.asarray(jax.device_get(total)))
    expect = nproc * (nproc + 1) / 2
    assert val == expect, (val, expect)

    # sharded artifact writers: each host writes only its slice
    N = 10
    pts = np.arange(N * 3, dtype=np.float32).reshape(N, 3)
    sl = process_slice(N)
    write_ply_sharded(outdir + "/cloud.ply", pts[sl])

    keys = np.stack(
        [np.arange(N), np.zeros(N), np.zeros(N)], axis=1).astype(np.int32)
    write_bt_sharded(outdir + "/map.bt", keys[sl], 0.5)

    barrier("done")
    print(f"WORKER_OK pid={pid} psum={val}")


if __name__ == "__main__":
    main()
