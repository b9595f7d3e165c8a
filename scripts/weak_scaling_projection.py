"""Weak-scaling fps PROJECTION for the map-sharded fusion pipeline on a real
v5e slice (VERDICT r3 #10 stretch).

Multi-chip hardware does not exist in this environment (the map-sharded
pipeline is validated for *correctness* on an 8-virtual-device CPU mesh —
tests/parallel/test_map_sharded.py), so this script turns the two things we
HAVE measured into a projected K-chip throughput table:

1. the single-chip per-frame stage ablation of `update_map_fusion` at the
   640x480 headline (docs/design.md §3, measured on v5e at capacity 655k);
2. the exact per-frame collective volume of `MapShardedPointFusion`
   (docs/design.md §6: three per-pixel winner tables, ``3*K*B*H*W*4`` bytes
   per all_gather — frame-sized, capacity-independent, asserted by
   tests/parallel/test_map_sharded.py::TestCollectiveVolume).

Model, stated explicitly so it can be falsified when hardware shows up:

- O(capacity) stages (projection, gate gather, winner-table scatter, rebuild)
  divide by K — each shard owns cap/K rows (`ShardedMap`).
- The flat sort is O(n log n) on each shard's own rows: cost scales as
  ``(n/K · log(n/K)) / (n · log n)`` — slightly BETTER than 1/K. This is why
  the sharded design keeps the sort per-shard instead of letting GSPMD
  all-gather a sharded sort axis (design.md §6).
- Per-pixel table work (winner fold after the all_gather, merge math in
  pixel space) does NOT divide: every shard folds all K winner tables over
  all H*W pixels. Modeled as streaming at HBM bandwidth (measured class:
  <1 ms for 9.2M points — design.md §2), so it grows ~linearly in K but
  from a tiny base.
- The all_gather rides ICI at ~45 GB/s/link (v5e, ring): time =
  per-link bytes / bandwidth + a fixed ~20 us launch per collective.
- Odometry (tracked configs) and frame-side map derivations are NOT modeled
  — this projects the fusion step that dominates the gt-odometry headline.

Run: python scripts/weak_scaling_projection.py   (pure host math, no jax)
"""

import json
import math

# --- measured inputs (docs/design.md §3 stage ablation; v5e, fp32) ---------
H, W = 480, 640
HW = H * W
CAP = 655_000  # ablation capacity
# stage -> (ms/frame at K=1, scaling class)
#   'cap'    : linear in owned map rows  -> /K
#   'sort'   : n log n in owned rows     -> (n/K log n/K)/(n log n)
#   'pixel'  : per-pixel table work      -> constant (every shard, full HW)
#   'fold'   : per-pixel x K fold        -> ~linear in K from a small base
STAGES = {
    "streaming projection": (1.00, "cap"),
    "frame gather & gating": (1.64, "cap"),
    "4-key flat sort": (1.70, "sort"),
    "winner-table scatter": (3.12, "cap"),
    "winner-row gathers & merge math": (2.47, "pixel"),
    "inverse (row->pixel) scatter": (1.49, "pixel"),
    "rebuild gathers & selects": (5.19, "cap"),
}
SINGLE_CHIP_TOTAL_MS = sum(ms for ms, _ in STAGES.values())  # 16.61

ICI_GBPS = 45.0  # v5e per-link
COLLECTIVE_LAUNCH_US = 20.0
N_TABLES = 3  # negcc, ray, gidx winner tables (design.md §6)
FOLD_MS_PER_K = 0.04  # 3*HW*4 B streamed per shard table at ~100 GB/s eff.


def project(K: int) -> dict:
    t = {}
    for name, (ms, cls) in STAGES.items():
        if cls == "cap":
            t[name] = ms / K
        elif cls == "sort":
            n = CAP
            t[name] = ms * ((n / K) * math.log2(max(n / K, 2))) / (
                n * math.log2(n))
        else:  # 'pixel'
            t[name] = ms
    # winner fold: each shard streams K tables of HW entries
    t["winner fold (xK tables)"] = FOLD_MS_PER_K * K if K > 1 else 0.0
    # all_gather of the three winner tables: ring all-gather moves
    # (K-1)/K of the full table through each link
    if K > 1:
        bytes_per_link = N_TABLES * HW * 4 * (K - 1) / K
        t["all_gather (3 winner tables)"] = (
            bytes_per_link / (ICI_GBPS * 1e9) * 1e3
            + N_TABLES * COLLECTIVE_LAUNCH_US / 1e3
        )
    total = sum(t.values())
    return {
        "K": K,
        "ms_per_frame": round(total, 2),
        "fps": round(1000.0 / total, 1),
        "speedup_vs_1chip": round(SINGLE_CHIP_TOTAL_MS / total, 2),
        "parallel_fraction_realized": round(
            (SINGLE_CHIP_TOTAL_MS / total) / K, 2),
        "stages_ms": {k: round(v, 3) for k, v in t.items()},
    }


def main():
    rows = [project(K) for K in (1, 2, 4, 8)]
    for r in rows:
        print(json.dumps(r))
    # the headline interpretation, kept honest:
    r8 = rows[-1]
    print(
        f"# projected 8-chip v5e fusion step: {r8['ms_per_frame']} ms/frame "
        f"({r8['fps']} fps, {r8['speedup_vs_1chip']}x) — sublinear because "
        "the per-pixel merge stages don't divide; the interconnect "
        "contributes <0.1 ms/frame (frame-sized, capacity-independent "
        "volume). MODEL, not measurement: single-chip stage costs are "
        "measured (design.md §3), the scaling classes are assumptions "
        "stated in this script's docstring."
    )


if __name__ == "__main__":
    main()
