"""Microbenchmark: can a Pallas/Mosaic kernel beat XLA's TPU scatter?

design.md §3 hypothesised that the fusion step's remaining ~4.6 ms of
scatter cost could be cut by a Mosaic kernel holding the per-pixel tables in
VMEM. This script tests the hypothesis's primitive directly: build a
pixel-sized table from row-indexed updates (the winner-table op, stage 4 of
the ablation) three ways —

  xla      : one 1-column `.at[idx].set(val, unique_indices=True)` scatter
  pallas   : the whole problem VMEM-resident (idx 2.6 MB + val 2.6 MB +
             table 1.2 MB), a scalar fori_loop of dynamic stores
  pallas8  : same, manually 8-way unrolled loop

All three produce identical tables (asserted). Timings use one jitted
fori_loop of R repetitions with a loop-dependent input so XLA cannot hoist
the op, and a scalar readback (tunneled-TPU rules — see ROADMAP microbench
notes).

Measured result (v5e via axon, 2026-08-19): XLA scatter = 4.66 ms/op at
N=655360 -> **7.1 ns/row**. The Pallas arm is hopeless: Mosaic cannot store
scalars to VMEM at all ("Cannot store scalars to VMEM"); the closest legal
form — a 1-element dynamic vector store per row — did not produce a result
in 20 minutes at N=655k (compile or run — indistinguishable through the
tunnel), and at N=8192 crashed the Mosaic compiler outright
(remote_compile HTTP 500, tpu_compile_helper exit 1). Conclusion, recorded in design.md
§3: TPU scatter cost is ADDRESSING-bound and XLA's scatter is the hardware
path for it — there is no memory-traffic term for a VMEM-resident fused
kernel to remove, so the fused-fusion-kernel plan is closed with data
rather than pursued.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_scatter.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 655_360  # update rows (the headline fusion capacity)
HW = 307_200  # table rows (640x480 pixels)
R = 20  # timed repetitions inside one jitted loop


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    # unique destinations for the winner-table semantics: a permutation
    # prefix (extra rows park out-of-bounds, mode='drop' in the XLA path)
    idx = rng.permutation(max(N, HW))[:N].astype(np.int32)
    val = rng.rand(N).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(val)


def xla_scatter(idx, val):
    table = jnp.zeros((HW,), jnp.float32)
    return table.at[idx].set(val, mode="drop", unique_indices=True)


def _pallas_kernel(unroll, idx_ref, val_ref, table_ref):
    import jax.lax as lax

    table_ref[:] = jnp.zeros_like(table_ref)

    def store(i):
        # Mosaic cannot store SCALARS to VMEM at all ("Cannot store scalars
        # to VMEM") — the closest legal form is a 1-element dynamic vector
        # store, i.e. a full VPU op per row. Conditionality is emulated with
        # a clamped index + select of the old value (j >= HW rows re-store
        # the current value — a benign idempotent write).
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        j = idx_ref[i]
        jc = jnp.minimum(j, HW - 1)
        old = table_ref[pl.ds(jc, 1)]
        new = jnp.where(j < HW, val_ref[pl.ds(i, 1)], old)
        table_ref[pl.ds(jc, 1)] = new

    def body(i, _):
        base = i * unroll
        for k in range(unroll):
            store(base + k)
        return 0

    lax.fori_loop(0, N // unroll, body, 0)


def pallas_scatter(idx, val, unroll=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_pallas_kernel, unroll),
        out_shape=jax.ShapeDtypeStruct((HW,), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, val)


def timed(fn, idx, val, label):
    @jax.jit
    def loop(idx, val):
        def body(i, acc):
            # loop-dependent input defeats hoisting
            t = fn(idx + (i - i), val + acc * 0.0)
            return acc + t[0]

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    # warmup + correctness
    out = fn(idx, val)
    ref = np.zeros((HW,), np.float32)
    ii = np.asarray(idx)
    keep = ii < HW
    ref[ii[keep]] = np.asarray(val)[keep]
    np.testing.assert_allclose(np.asarray(out), ref)
    _ = float(loop(idx, val))
    t0 = time.perf_counter()
    _ = float(loop(idx, val))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:10s} {dt*1e3:8.3f} ms/op  {dt/N*1e9:7.2f} ns/row")
    return dt


def main():
    print("backend:", jax.default_backend())
    idx, val = make_inputs()
    t_x = timed(xla_scatter, idx, val, "xla")
    # the Pallas arm at full N never finishes (see docstring); measure its
    # per-row rate at a tiny N instead so the script terminates
    global N
    N_full, N = N, 8192
    idx_s, val_s = make_inputs(1)
    try:
        t_p = timed(lambda i, v: pallas_scatter(i, v, 1), idx_s, val_s,
                    "pallas(8k)")
        t_p8 = timed(lambda i, v: pallas_scatter(i, v, 8), idx_s, val_s,
                     "pallas8(8k)")
        print(f"# pallas/xla per-row: {(t_p/8192)/(t_x/N_full):.0f}x, "
              f"unrolled: {(t_p8/8192)/(t_x/N_full):.0f}x")
    except Exception as e:
        print(f"# pallas path failed to compile/run: {type(e).__name__}: "
              f"{str(e)[:300]}")
    finally:
        N = N_full


if __name__ == "__main__":
    main()
