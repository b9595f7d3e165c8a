"""Multi-process multi-chip dry run via ``jax.distributed`` (VERDICT r2 #5 —
the one SURVEY §2.3 row that was only exercised single-process).

Spawns N local processes, each contributing M virtual CPU devices to one
global JAX runtime (``jax.distributed.initialize`` + gloo cross-process
collectives — the CPU stand-in for DCN), then runs BOTH multi-chip paths on
the global N*M-device mesh:

1. the GSPMD dp x mp training step (batched differentiable SLAM, gradients
   to depth + intrinsics) with the batch axis sharded across processes via
   ``jax.make_array_from_process_local_data`` — each process feeds only its
   local batch rows, exactly like a per-host data loader on a real pod;
2. the explicit ``shard_map`` pipeline (``MapShardedPointFusion``) on a flat
   map-axis mesh spanning processes — its per-frame winner-table
   ``all_gather``s ride the cross-process (DCN-analogue) transport.

On real multi-host TPU the same code holds with
``jax.distributed.initialize()`` auto-detecting the slice topology; the map
axis should then be laid out within a host's ICI domain and only the batch
(dp) axis across DCN — see docs/design.md §6.

Usage:
    python scripts/multiprocess_dryrun.py [--nproc 2] [--local-devices 2]
Exit code 0 = every process ran both paths with finite results.
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def child(pid: int, nproc: int, local_devices: int, port: int) -> None:
    # A clean JAX config is required BEFORE the first jax import side
    # effects: no inherited platform/device-count env (the parent may sit on
    # a TPU host with axon registered), CPU platform forced via the config
    # API (beats any registered PJRT plugin), gloo for cross-process
    # collectives.
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from gradslam_tpu import PointFusion, RGBDImages
    from gradslam_tpu.datasets import synthetic_sequence
    from gradslam_tpu.parallel import MapShardedPointFusion

    devices = jax.devices()
    n = len(devices)
    assert n == nproc * local_devices, (n, nproc, local_devices)
    assert jax.process_count() == nproc

    # ---- path 1: GSPMD dp x mp train step, batch sharded across processes.
    # dp == nproc so every process owns exactly one mesh row: the per-process
    # batch split below matches device ownership for ANY (nproc,
    # local_devices) — with dp derived from n//2 instead, local_devices=1
    # gave rows_per_proc=0 and the step silently ran on an EMPTY batch.
    mesh = Mesh(np.asarray(devices).reshape(nproc, local_devices),
                ("dp", "mp"))
    B, L, H, W = nproc, 2, 16, 24
    rgb, depths, intrinsics, poses = synthetic_sequence(B, L, H, W)

    slam = PointFusion(odom="gradicp", dsratio=2, numiters=2, use_jit=False)

    def train_step(rgb, depths, intrinsics, poses):
        def loss_fn(depths_, intrinsics_):
            frames = RGBDImages(rgb, depths_, intrinsics_, poses)
            pointclouds, out_poses = slam.forward(frames)
            pts = jax.lax.with_sharding_constraint(
                pointclouds.points, NamedSharding(mesh, P("dp", "mp", None))
            )
            return jnp.sum(pts**2) + jnp.sum(out_poses[:, :, :3, 3] ** 2)

        return jax.value_and_grad(loss_fn, argnums=(0, 1))(depths, intrinsics)

    bsh = NamedSharding(mesh, P("dp"))
    rows_per_proc = B // nproc
    assert rows_per_proc >= 1 and B % nproc == 0, (B, nproc)

    def to_global(a):
        local = a[pid * rows_per_proc:(pid + 1) * rows_per_proc]
        return jax.make_array_from_process_local_data(bsh, local)

    args = [to_global(np.asarray(a))
            for a in (rgb, depths, intrinsics, poses)]
    step = jax.jit(train_step, in_shardings=(bsh,) * 4)
    loss, (g_depth, g_intr) = step(*args)
    assert np.isfinite(float(loss)), "loss not finite"
    # a zero loss means the global batch was empty (mis-split feeding) —
    # the synthetic scene always yields nonzero map energy
    assert float(loss) > 0, "train step saw an empty batch (loss == 0)"
    for g in (g_depth, g_intr):  # only local shards are addressable
        for s in g.addressable_shards:
            assert np.all(np.isfinite(np.asarray(s.data))), "grad not finite"
    print(f"[proc {pid}] train step ok: loss={float(loss):.4f} "
          f"({jax.process_count()} processes, {n} devices)", flush=True)

    # ---- path 2: explicit shard_map fusion across processes
    flat = Mesh(np.asarray(devices), ("map",))
    rep = NamedSharding(flat, P())
    frames = RGBDImages(*[
        jax.device_put(jnp.asarray(a[:1]), rep)
        for a in (rgb, depths, intrinsics, poses)
    ])
    msf = MapShardedPointFusion(map_capacity=n * 256, mesh=flat)
    smap, _poses = msf(frames)
    counts = [int(np.asarray(s.data).sum())
              for s in smap.num_points.addressable_shards]
    assert sum(counts) > 0, "local shards appended no points"
    print(f"[proc {pid}] shard_map fusion ok: local rows {counts}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()

    if args.child is not None:
        child(args.child, args.nproc, args.local_devices, args.port)
        return

    # pick a free coordinator port (avoids collisions in parallel CI)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(i),
             "--nproc", str(args.nproc),
             "--local-devices", str(args.local_devices),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(args.nproc)
    ]
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0] + "\n<timeout>"
        print(f"--- process {i} (rc={p.returncode}) ---")
        print(out)
        rc |= p.returncode if p.returncode is not None else 1
    if rc == 0:
        print(f"multiprocess dryrun ok: {args.nproc} processes x "
              f"{args.local_devices} devices")
    sys.exit(rc)


if __name__ == "__main__":
    main()
