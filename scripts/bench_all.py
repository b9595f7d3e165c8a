"""Extended benchmark suite over the BASELINE.md operating points (the
headline driver metric stays in bench.py). Prints one JSON line per config
and writes the whole set to a committed per-round artifact
(``BENCH_ALL_r<N>.json``, ``--out`` to override) so tracked-odometry
performance is recorded per round, not just in ROADMAP prose (VERDICT r1 #2).

Configs (BASELINE.json):
  2. ICPSLAM + point-to-plane ICP                          (synthetic clip)
  3. PointFusion + GradICP (fresh + reuse lookahead)       (synthetic clip)
  4. Large map: 60 frames 640x480, map -> 1.13M points     (ScanNet analogue)
  5. Batched differentiable SLAM: vmap over 8 sequences, backprop to
     depth + intrinsics                                    (no reference equiv.)
"""

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _default_out():
    """BENCH_ALL_r<N>.json where N follows the driver's BENCH_r<N>.json."""
    rounds = [
        int(f[len("BENCH_r"):-len(".json")])
        for f in os.listdir(REPO)
        if f.startswith("BENCH_r") and f.endswith(".json")
        and f[len("BENCH_r"):-len(".json")].isdigit()
    ]
    n = max(rounds, default=0) + 1
    return os.path.join(REPO, f"BENCH_ALL_r{n:02d}.json")


def run(out_path=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _synthetic_frames_arrays
    from gradslam_tpu import ICPSLAM, PointFusion, RGBDImages

    results = []
    out_path = out_path or _default_out()
    device_platform = jax.devices()[0].platform

    def _write(partial):
        payload = {
            "date": datetime.date.today().isoformat(),
            "device": device_platform,
            "configs": results,
        }
        payload["partial"] = bool(partial)
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")

    def record(entry):
        # stream each row as it lands AND persist the partial artifact: the
        # remote-TPU tunnel can die mid-suite (observed 2026-08-19), and a
        # crash must keep every row measured so far on disk
        print(json.dumps(entry), flush=True)
        results.append(entry)
        _write(partial=True)

    # Shared measurement protocol for EVERY row of the artifact (keeps
    # trace_s/compile_s and fps comparable across configs):
    # - explicit AOT trace+compile so compile time is recorded per config
    #   (VERDICT r2 #7); cached-path number with the persistent cache warm;
    # - pipelined warm loop with a per-run scalar readback (on tunneled
    #   backends block_until_ready can return early, and host-side indexing
    #   dispatches a remote dynamic_slice per access).
    def _hbm_gb(compiled):
        """Compiled program's device-memory footprint in GiB (argument +
        output + temp/scratch), or None if the backend can't report it."""
        mem = compiled.memory_analysis()
        if mem is None:
            return None
        return round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes) / 2**30, 2)

    def aot(jit_fn, *args):
        t0 = time.perf_counter()
        lowered = jit_fn.lower(*args)
        trace_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        # warm_compile_s: compile the SAME program again through the
        # persistent cache (fresh lowering, so nothing in-process is
        # reused). This is what a re-run of the script pays (VERDICT r3 #3).
        t0 = time.perf_counter()
        jit_fn.lower(*args).compile()
        warm_compile_s = time.perf_counter() - t0
        return compiled, round(trace_s, 2), round(compile_s, 2), round(
            warm_compile_s, 2)

    def measure_fps(go, args, iters, readback, frames_per_run):
        t0 = time.perf_counter()
        outs = [go(*args) for _i in range(iters)]
        for o in outs:
            readback(o)
        dt = (time.perf_counter() - t0) / iters
        return round(frames_per_run / dt, 2)

    # ---- hardware-anchored reporting (VERDICT r4 #7) -------------------
    # v5e peak HBM bandwidth; the fusion pipeline is ADDRESSING-bound, not
    # bandwidth-bound (design.md §3: scatters/gathers run at ns/row near the
    # scalar-issue rate while moving only 32-byte rows), so hbm_bw_util is
    # expected to read low — floor_ratio against the §2/§3 per-row cost
    # model is the column that proves "fast" against the chip.
    _PEAK_HBM_GBPS = 819.0

    def fusion_hw(caps, H, W, odom_terms=None):
        """Cost model for a fusion-family config. ``caps`` = capacity
        schedule [(frames, cap), ...] (or int). Per frame the fusion
        pipeline makes ~9 O(capacity) row passes (projection, gating
        gather, 4-key sort, winner scatter, merge gathers, inverse scatter,
        rebuild gathers — §3 ablation) of 32-byte rows plus ~8 frame-sized
        f32 planes. Floor = the §3 '1 scatter + 3 gathers + 1 sort'
        algorithmic minimum at the measured per-row primitive costs
        (7.1 ns scatter, 2.5 ns 8-wide gather, ~3 ns 4-key sort).
        ``odom_terms`` = total odometry row-iterations per frame
        (sum over pyramid levels of iters x window_rows x association
        passes) — adds the projective odometry floor: per row-iteration one
        streaming projection + one row gather (~3.5 ns; KNN rows get no
        model — their cost is MXU matmuls, not row passes)."""
        if isinstance(caps, int):
            caps = [(1, caps)]
        rows = sum(n * c for n, c in caps) / sum(n for n, _ in caps)
        bytes_pf = 9 * rows * 32 + 8 * H * W * 4
        floor_ms = rows * (7.1 + 3 * 2.5 + 3.0) / 1e6
        if odom_terms:
            bytes_pf += odom_terms * 2 * 32
            floor_ms += odom_terms * 3.5 / 1e6
        return dict(rows_per_frame=int(rows), bytes_per_frame=int(bytes_pf),
                    floor_ms_per_frame=floor_ms)

    def timed(tag, slam, frames, B, L, iters=4, baseline=None, ate=False,
              hw=None):
        # One bad config must not kill an unattended suite run (the
        # watcher-driven round-5 runs execute with nobody at the wheel):
        # record the failure as a row and keep measuring.
        try:
            _timed(tag, slam, frames, B, L, iters, baseline, ate, hw)
        except Exception as e:
            record({"metric": tag, "value": None, "unit": "frames/s",
                    "error": f"{type(e).__name__}: {str(e)[:300]}"})

    def _timed(tag, slam, frames, B, L, iters, baseline, ate, hw):
        # On-device checksum readback: see measure_fps note above.
        @jax.jit
        def go_jit(fr):
            pc, op = slam(fr)
            return pc, op, pc.num_points[0] + op[0, -1, 0, 3]

        go, trace_s, compile_s, warm_compile_s = aot(go_jit, frames)
        hbm_gb = _hbm_gb(go)

        pc, op, c = go(frames)
        _ = float(c)
        dropped = int(np.asarray(pc.num_dropped).sum())
        assert dropped == 0, f"{tag}: map overflowed ({dropped} rows dropped)"
        ate_m = None
        if ate:
            from gradslam_tpu.metrics import ate_rmse

            ate_m = float(ate_rmse(op[0], frames.poses[0]))
        fps = measure_fps(go, (frames,), iters, lambda o: float(o[2]), B * L)
        entry = {
            "metric": tag,
            "value": fps,
            "unit": "frames/s",
            "trace_s": trace_s,
            "compile_s": compile_s,
            "warm_compile_s": warm_compile_s,
        }
        if baseline:
            entry["vs_baseline"] = round(fps / baseline, 1)
        if ate_m is not None:
            entry["ate_m"] = round(ate_m, 7)  # tracking accuracy vs GT poses
        if hbm_gb is not None:
            entry["hbm_gb"] = hbm_gb
        if hw is not None:
            # the cost model is per-sequence-frame; fps counts B*L frames,
            # so a batched config would silently misreport by a factor of B
            assert B == 1, "hw= cost-model columns assume B == 1"
            dt_frame = 1.0 / fps  # seconds per frame (B=1 configs)
            entry["rows_per_frame"] = hw["rows_per_frame"]
            entry["bytes_per_frame"] = hw["bytes_per_frame"]
            entry["hbm_gbps"] = round(
                hw["bytes_per_frame"] / dt_frame / 1e9, 1)
            entry["hbm_bw_util"] = round(
                hw["bytes_per_frame"] / dt_frame / 1e9 / _PEAK_HBM_GBPS, 4)
            entry["floor_ms_per_frame"] = round(
                hw["floor_ms_per_frame"], 2)
            entry["floor_ratio"] = round(
                hw["floor_ms_per_frame"] / (dt_frame * 1e3), 3)
        record(entry)

    # config 2/3: tracked odometry at 320x240 (dsratio 4). Capacities are
    # right-sized but non-truncating: ICPSLAM aggregates every valid pixel
    # (30 * 320 * 240 points); the PointFusion map converges to ~138k points.
    B, L, H, W = 1, 30, 240, 320
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    # Amortized capacity growth (map_capacity schedules): the aggregate map
    # grows by exactly H*W valid pixels per frame (synthetic clip, all depths
    # valid); the gradicp PointFusion map was measured at 76.8k -> 89.9k ->
    # 113.1k -> 137.8k points at frames 0/9/19/29 (~7-9% headroom per
    # segment). Results are identical to fixed-capacity runs (tested).
    icp = ICPSLAM(
        odom="icp", dsratio=4, numiters=10,
        map_capacity=[(5, (i + 1) * 5 * H * W) for i in range(6)],
    )
    timed("ICPSLAM(icp) 320x240 frames/s", icp, frames, B, L, baseline=0.121,
          ate=True)
    # recency-window odometry: associate against the latest 2 frames' worth
    # of map rows instead of projecting the whole (growing) aggregate map —
    # constant odometry cost per frame, tracks at least as well (stale
    # duplicate aggregate points bias the solver; see TestICPWindowFrames).
    icp_w = ICPSLAM(
        odom="icp", dsratio=4, numiters=10, icp_window_frames=2,
        map_capacity=[(5, (i + 1) * 5 * H * W) for i in range(6)],
    )
    timed("ICPSLAM(icp, 2-frame window) 320x240 frames/s", icp_w, frames, B, L,
          baseline=0.121, ate=True)
    # production-best ICPSLAM: recency window + coarse-to-fine (ATE on this
    # clip improves: 3.9e-5 m vs 4.7e-5 flat-windowed)
    icp_wp = ICPSLAM(
        odom="icp", pyramid=[(8, 8), (4, 3)], icp_window_frames=2,
        map_capacity=[(5, (i + 1) * 5 * H * W) for i in range(6)],
    )
    timed("ICPSLAM(icp, window+pyramid) 320x240 frames/s", icp_wp, frames, B, L,
          baseline=0.121, ate=True)
    # Six 5-frame segments at ~4% headroom over the measured per-frame map
    # sizes (76.8/81.8/89.9/101.0/113.0/125.8/137.8k at frames
    # 0/4/9/14/19/24/29): mean capacity 122.9k -> 112.9k (-8.1%), every
    # fusion pass is O(capacity). Zero-drop asserted per row.
    gicp_sched = [
        (5, 85_504), (5, 94_208), (5, 105_472),
        (5, 117_760), (5, 131_072), (5, 143_360),
    ]
    gicp = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                       map_capacity=gicp_sched)
    timed("PointFusion(gradicp) 320x240 frames/s", gicp, frames, B, L,
          baseline=0.323, ate=True)
    gicp_r = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                         map_capacity=gicp_sched, lookahead_assoc="reuse")
    timed("PointFusion(gradicp, reuse lookahead) 320x240 frames/s", gicp_r,
          frames, B, L, baseline=0.323, ate=True)
    # production-best: reuse lookahead + quantized-color map (geometry and
    # trajectory identical; colors 8-bit)
    gicp_q = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                         map_capacity=gicp_sched, lookahead_assoc="reuse",
                         quantize_colors=True)
    timed("PointFusion(gradicp, reuse+quantized) 320x240 frames/s", gicp_q,
          frames, B, L, baseline=0.323, ate=True)
    # PROJECTIVE data association (odom_assoc='projective', VERDICT r3 #1):
    # frame-to-model association by map->frame projection + row gather —
    # O(N) per iteration, no KNN anywhere. Same solver/robustness knobs.
    win320 = 2 * (H // 4) * (W // 4)  # default icp_capacity at ds4
    hw_proj320 = fusion_hw(gicp_sched, H, W,
                           odom_terms=10 * win320 * 2)  # fresh lookahead
    gicp_proj = PointFusion(odom="gradicp", odom_assoc="projective",
                            odom_sym_normals=True,  # recommended default
                            dsratio=4, numiters=10, map_capacity=gicp_sched)
    timed("PointFusion(gradicp, projective) 320x240 frames/s", gicp_proj,
          frames, B, L, baseline=0.323, ate=True, hw=hw_proj320)
    # sub-pixel (bilinear) projective association (VERDICT r4 #2): removes
    # the half-pixel in-plane quantization floor of nearest-pixel lookup at
    # the cost of 4 row gathers per iteration instead of 1. Done bar:
    # easy-clip ATE <= the KNN rows above at comparable fps.
    gicp_proj_sub = PointFusion(odom="gradicp", odom_assoc="projective",
                                odom_sym_normals=True, odom_subpixel=True,
                                dsratio=4, numiters=10,
                                map_capacity=gicp_sched)
    timed("PointFusion(gradicp, projective subpixel) 320x240 frames/s",
          gicp_proj_sub, frames, B, L, baseline=0.323, ate=True)
    # in-scan relocalization armed on a healthy clip (VERDICT r3 #4 done
    # bar): the health gate runs every frame but the lax.cond recovery
    # branch never executes — the row's cost vs the row above IS the
    # healthy-path overhead (must be <5%).
    gicp_proj_reloc = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        dsratio=4, numiters=10,
        map_capacity=gicp_sched, relocalize_below=0.2,
    )
    timed("PointFusion(gradicp, projective, relocalize armed) 320x240 frames/s",
          gicp_proj_reloc, frames, B, L, baseline=0.323, ate=True)
    # + the auto-arming keyframe drift gate (anchor_every): healthy-path
    # cost = one more window association per frame (the anchored recovery
    # sits behind its own lax.cond)
    gicp_proj_anchor = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        dsratio=4, numiters=10,
        map_capacity=gicp_sched, relocalize_below=0.2, anchor_every=10,
    )
    timed("PointFusion(gradicp, projective, relocalize+anchor armed) "
          "320x240 frames/s", gicp_proj_anchor, frames, B, L,
          baseline=0.323, ate=True)
    # coarse-to-fine odometry: 6 iters at ds=8 + 2 at ds=4 replaces 10 at
    # ds=4 (KNN cost ~1/ds^4 per iteration). Schedule picked by a measured
    # sweep (v5e): 8:8+4:3 155.9 fps, 8:8+4:2 170.8, 8:6+4:2 175.9,
    # 16:4+8:4+4:2 154.7 (a third level doesn't pay) — all at ATE 1.27e-5 m
    # on this clip, and within 4% of the flat solve's ATE on the real ICL
    # golden clip (4.97e-4/4.12e-4 vs 4.87e-4/3.98e-4 m).
    gicp_p = PointFusion(odom="gradicp", pyramid=[(8, 6), (4, 2)],
                         map_capacity=gicp_sched, lookahead_assoc="reuse",
                         quantize_colors=True)
    timed("PointFusion(gradicp, pyramid 8:6+4:2, reuse+quantized) 320x240 frames/s",
          gicp_p, frames, B, L, baseline=0.323, ate=True)

    # config 3 at FULL resolution (BASELINE.md #3, VERDICT r2 #1): the
    # north-star tracked operating point — PointFusion + GradICP at 640x480,
    # 30 frames (reference entry: /root/reference/examples/pointfusion.py
    # with odometry=gradicp). Baseline measured at the same point by
    # scripts/measure_baseline.py --tracked-640 (same dsratio=4/numiters=10).
    baseline_path = os.path.join(REPO, "MEASURED_BASELINE.json")
    tb640 = None
    hard_base = None
    hard_base320 = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            _mb = json.load(f)
        tb640 = _mb.get("tracked_baselines", {}).get(
            "pointfusion_gradicp_640x480_fps"
        )
        # reference CPU on the same hard clip (plain LS; its ATE is recorded
        # in MEASURED_BASELINE.json hard_clip_baseline.ate_m — VERDICT r3 #8)
        hard_base = _mb.get("hard_clip_baseline", {}).get("reference_fps")
        hard_base320 = _mb.get(
            "hard_clip_baseline_320x240", {}).get("reference_fps")
    B, L, H, W = 1, 30, 480, 640
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    # same clip as the gt headline, so the same capacity schedule holds
    # (tracked map sizes match gt to tie-break noise; zero-drop asserted).
    # Six 5-frame segments at ~3% headroom: mean capacity ~426k vs 453k for
    # the previous 3x10 split — measured +4.6% fps on the gt headline.
    sched640 = [
        (5, 332_800), (5, 360_448), (5, 399_360),
        (5, 443_392), (5, 486_400), (5, 532_480),
    ]
    gicp640 = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                          map_capacity=sched640)
    timed("PointFusion(gradicp) 640x480 frames/s", gicp640, frames, B, L,
          iters=2, baseline=tb640, ate=True)
    gicp640_p = PointFusion(odom="gradicp", pyramid=[(8, 6), (4, 2)],
                            lookahead_assoc="reuse", quantize_colors=True,
                            map_capacity=sched640)
    timed("PointFusion(gradicp, pyramid 8:6+4:2, reuse+quantized) 640x480 frames/s",
          gicp640_p, frames, B, L, iters=2, baseline=tb640, ate=True)
    # projective association at the north-star operating point: the KNN-free
    # mode's headline rows (VERDICT r3 #1 'done' bar: plain >= 30 fps,
    # production >= 60 fps, ATE within 2x of the KNN rows above).
    win640 = 2 * (H // 4) * (W // 4)
    hw_proj640 = fusion_hw(sched640, H, W, odom_terms=10 * win640 * 2)
    gicp640_proj = PointFusion(odom="gradicp", odom_assoc="projective",
                               odom_sym_normals=True,
                               dsratio=4, numiters=10, map_capacity=sched640)
    timed("PointFusion(gradicp, projective) 640x480 frames/s", gicp640_proj,
          frames, B, L, iters=2, baseline=tb640, ate=True, hw=hw_proj640)
    # armed in-scan relocalization at the north-star resolution (VERDICT r4
    # #4 done bar: >=0.95x the row above's fps, HBM near the unarmed run —
    # the health gate now scores the solver's own window and the recovery
    # hypotheses run as a scan, so the healthy path holds no K-hypothesis
    # buffers).
    gicp640_proj_reloc = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        dsratio=4, numiters=10, map_capacity=sched640,
        relocalize_below=0.2,
    )
    timed("PointFusion(gradicp, projective, relocalize armed) 640x480 "
          "frames/s", gicp640_proj_reloc, frames, B, L, iters=2,
          baseline=tb640, ate=True, hw=hw_proj640)
    gicp640_proj_q = PointFusion(odom="gradicp", odom_assoc="projective",
                                 odom_sym_normals=True,
                                 dsratio=4, numiters=10, quantize_colors=True,
                                 map_capacity=sched640)
    timed("PointFusion(gradicp, projective, quantized) 640x480 frames/s",
          gicp640_proj_q, frames, B, L, iters=2, baseline=tb640, ate=True)
    # production projective: coarse-to-fine + reuse lookahead + quantized
    # colors on the KNN-free mode (the candidate fastest tracked config)
    gicp640_proj_prod = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        pyramid=[(8, 6), (4, 2)],
        lookahead_assoc="reuse", quantize_colors=True,
        map_capacity=sched640,
    )
    # reuse lookahead: 1 association pass/iter; per-level windows 2*(H/ds)^2
    hw_prod640 = fusion_hw(
        sched640, H, W,
        odom_terms=6 * 2 * (H // 8) * (W // 8) + 2 * win640,
    )
    timed("PointFusion(gradicp, projective, pyramid 8:6+4:2, reuse+quantized)"
          " 640x480 frames/s",
          gicp640_proj_prod, frames, B, L, iters=2, baseline=tb640, ate=True,
          hw=hw_prod640)

    # Hard accuracy clip (VERDICT r2 #4): 6 cm/frame accelerating camera,
    # 5 mm depth noise, ~12% frame-inconsistent outlier patches biased up to
    # ±35 cm (datasets.hard_sequence). Plain least-squares visibly degrades;
    # the robustness features earn their keep — the ate_m spread across these
    # rows IS the result (speed is secondary here). 160x120 is the reference
    # examples' own operating resolution (/root/reference/examples/
    # pointfusion.py:46-49). At 320x240 this clip used to defeat EVERY
    # config from frame 1 (~0.35 m ATE across plain/robust/cv/pyramid,
    # swept on TPU 2026-08-19); factor isolation showed the 5 mm depth
    # NOISE alone does it (outliers-only tracks at 3.8 mm) — the
    # reference's pitch-1 finite-difference normals have noise/baseline
    # ~ sigma*fx/z, which doubles with resolution. normal_pitch=2 restores
    # the 160x120 normal SNR at 4x the pixels and tracks at 18 mm (row
    # below). Chasing this clip also exposed and fixed two real runaway
    # bugs (CV orthonormality doubling, unbounded robust steps — see
    # docs/design.md §4 and TestMotionModelStability).
    from gradslam_tpu.datasets import hard_sequence

    B, L, H, W = 1, 30, 120, 160
    rgb, depths, intrinsics, poses = hard_sequence(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    hard_cap = L * H * W  # fast camera + unfusable outliers: generous fixed cap
    hard_cfgs = [
        ("plain", {}),
        ("huber", dict(robust_loss="huber")),
        ("tukey", dict(robust_loss="tukey")),
        ("pyramid 8:6+4:2", dict(pyramid=[(8, 6), (4, 2)])),
        ("cv", dict(motion_model="constant_velocity")),
        ("cv+tukey", dict(motion_model="constant_velocity",
                          robust_loss="tukey")),
        # tuned production config: CPU sweep 2026-08-19 over scale/dist_thresh/
        # pyramid/prune combos — 19 mm vs plain's ~350 mm over 30 frames
        ("cv+tukey tuned s=0.03 dt=0.01", dict(
            motion_model="constant_velocity", robust_loss="tukey",
            robust_scale=0.03, dist_thresh=0.01)),
    ]
    for name, kw in hard_cfgs:
        kw = dict(kw)
        if "pyramid" not in kw:
            kw.update(dsratio=4, numiters=10)
        hslam = PointFusion(odom="gradicp", map_capacity=hard_cap, **kw)
        timed(f"PointFusion(gradicp, {name}) hard-clip 160x120 frames/s",
              hslam, frames, B, L, iters=2, baseline=hard_base, ate=True)

    # hard clip at 320x240 — tracks ONLY with the wider normal baseline
    # (normal_pitch=2; pitch 1 is ~0.29 m here no matter the config)
    B, L, H, W = 1, 30, 240, 320
    rgb, depths, intrinsics, poses = hard_sequence(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    hslam = PointFusion(
        odom="gradicp", dsratio=4, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=2,
    )
    timed("PointFusion(gradicp, tuned+normal_pitch=2) hard-clip 320x240 "
          "frames/s", hslam, frames, B, L, iters=4, baseline=hard_base320,
          ate=True)
    # KNN-free tracking on the same clip: projective + symmetric normals
    # (the anti-drift objective; one-sided normals run away at ~5 mm/frame
    # here — design.md §4) + the normal gate. Measured r4: 46 mm vs the
    # KNN row's ~15 mm, at several times its speed.
    hslam_psym = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        odom_angle_gate=60.0, dsratio=4, numiters=10,
        map_capacity=L * H * W, motion_model="constant_velocity",
        robust_loss="tukey", robust_scale=0.03, dist_thresh=0.01,
        normal_pitch=2,
    )
    timed("PointFusion(gradicp, projective sym+gate) hard-clip 320x240 "
          "frames/s", hslam_psym, frames, B, L, iters=2,
          baseline=hard_base320, ate=True)
    # hybrid pyramid: coarse projective pre-alignment + short KNN re-anchor
    # level — KNN-grade robustness at ~8x the pure-KNN speed (the KNN level
    # runs 4 iters at ds8). UNGATED since round 5: the r4 gate30 row's
    # 25.9 mm relied on the then-unnormalized gate dot — blended map
    # normals have norm < 1, so the old gate was per-row TIGHTER exactly
    # where normals were heavily blended. With the normalized (exact-angle)
    # gate, the sweep says the KNN re-anchor level works best ungated here:
    # nogate 17.9 mm / gate20 36.4 mm / gate30 42.5 mm / gate45 48 mm (CPU
    # sweep 2026-08-20; design.md §4).
    hslam_hyb = PointFusion(
        odom="gradicp", pyramid=[(8, 6), (8, 4)],
        odom_assoc=["projective", "knn"], odom_sym_normals=True,
        map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=2,
    )
    timed("PointFusion(gradicp, hybrid proj+knn pyramid) hard-clip 320x240 "
          "frames/s", hslam_hyb, frames, B, L, iters=2,
          baseline=hard_base320, ate=True)

    # hard clip at the NORTH-STAR 640x480: both noise knobs scale with
    # NOTE on baselines: the 640x480 hard rows carry no vs_baseline on
    # purpose — a reference CPU run at this size extrapolates to ~6 h
    # (320x240 took 1453 s and the KNN cost grows ~16x: 4x src points x
    # 4x map points) and the reference already diverges at BOTH smaller
    # resolutions (1.23 m ATE at 160x120, 1.17 m at 320x240 —
    # MEASURED_BASELINE.json), so the number would anchor nothing new.
    # resolution (ds ~ W/80, pitch ~ W/160; docs/design.md §4). Measured
    # sweep (TPU 2026-08-19): ds8/pitch4 17.2 mm, ds16/pitch4 23.3 mm,
    # ds8/pitch2 0.41 m (insufficient normal baseline), ds4/any 0.55-3.7 m
    # (association density). Robust tracking at full resolution.
    B, L, H, W = 1, 30, 480, 640
    rgb, depths, intrinsics, poses = hard_sequence(B, L, H, W)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    hslam = PointFusion(
        odom="gradicp", dsratio=8, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, tuned ds8+normal_pitch=4) hard-clip 640x480 "
          "frames/s", hslam, frames, B, L, iters=2, ate=True)
    # DENSE ds4 tracking at full resolution — the regime where the KNN mode
    # diverges outright (0.55-3.7 m at any pitch, design.md §4). The
    # projective mode with the full anti-drift recipe tracks it: symmetric
    # normals (tangential-drift fix) + normal gate + small point-to-point
    # rows + tightened tukey. TPU sweep 2026-08-19: this config 29.9 mm —
    # within 2x of the coarse ds8 KNN row above (17.2 mm; VERDICT r3 #5
    # done bar). Sensitive neighbours for the record: rs0.03 56.7 mm,
    # p0.5/rs0.02 82 mm, rs0.015 diverges.
    hslam_proj = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        odom_angle_gate=45.0, odom_point_weight=0.25,
        dsratio=4, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.02, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, projective sym+gate+p0.25 ds4) "
          "hard-clip 640x480 frames/s", hslam_proj, frames, B, L, iters=2,
          ate=True)
    # same config with SUB-PIXEL association + the analytic point-row fold
    # (VERDICT r4 #2+#5): the bilinear lookup removes the half-pixel
    # quantization the point rows used to average over, and the point
    # block no longer materializes a (4N, 6) system.
    hslam_proj_sub = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        odom_angle_gate=45.0, odom_point_weight=0.25, odom_subpixel=True,
        dsratio=4, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.02, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, projective sym+gate+p0.25 subpixel ds4) "
          "hard-clip 640x480 frames/s", hslam_proj_sub, frames, B, L,
          iters=2, ate=True)
    # subpixel WITHOUT point rows: does the bilinear lookup alone supply
    # the tangential constraint the point rows existed to add?
    hslam_sub_nop = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        odom_angle_gate=45.0, odom_subpixel=True,
        dsratio=4, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.02, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, projective sym+gate subpixel ds4) "
          "hard-clip 640x480 frames/s", hslam_sub_nop, frames, B, L,
          iters=2, ate=True)
    # hybrid proj+KNN pyramid at the north-star resolution (VERDICT r4 #3:
    # the 320x240 hybrid delivered 25.9 mm @ 32.3 fps but was never benched
    # at 640x480). KNN level at ds8 = the known-good 640x480 KNN regime.
    # CPU sweep 2026-08-20: gate45 24.3 mm, gate30 33.2 mm, 6 KNN iters
    # 45.1 mm (more KNN iterations chase noise — same mechanism as r4).
    hslam_hyb640 = PointFusion(
        odom="gradicp", pyramid=[(8, 6), (8, 4)],
        odom_assoc=["projective", "knn"], odom_sym_normals=True,
        odom_angle_gate=45.0, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, hybrid proj+knn pyramid) hard-clip 640x480 "
          "frames/s", hslam_hyb640, frames, B, L, iters=2, ate=True)
    # PRODUCTION recipe: hybrid + Keller-style map maintenance. Pruning
    # unstable points (confidence < 1.5, i.e. seen once) every 4 frames
    # keeps the map at ~594k STABLE points instead of saturating at 7.95M
    # noise appends — the odometry then associates against a clean map:
    # 16.2 mm ATE (beats the 17.2 mm ds8-KNN gold row) at a 1.2M-row
    # buffer, zero drops, trajectory identical at 1.2M/1.6M/2.4M/9.2M
    # capacity (sweeps 2026-08-20; 1.05M overflows — 375k drops).
    # quantize_colors + lookahead reuse are the same production fast-path
    # knobs as the easy-clip rows (+35% fps here, reuse also sheds one KNN
    # per iteration and nudges ATE 17.0 -> 16.2 mm). Requires the round-5
    # segment-boundary prune (a lax.cond prune in the scan body forfeits
    # map-buffer aliasing - design.md 'Map maintenance').
    hslam_hyb640_prune = PointFusion(
        odom="gradicp", pyramid=[(8, 6), (8, 4)],
        odom_assoc=["projective", "knn"], odom_sym_normals=True,
        odom_angle_gate=45.0, map_capacity=1_228_800,
        prune_every=4, prune_min_confidence=1.5,
        quantize_colors=True, lookahead_assoc="reuse",
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=4,
    )
    # iters=6: hard-clip frame time is data-dependent (~2x single-shot error
    # bars — round-5 journal); the production row's runs are ~2 s each, so
    # averaging 6 is nearly free next to its compile.
    timed("PointFusion(gradicp, hybrid pyramid + prune4, reuse+quantized) "
          "hard-clip 640x480 frames/s", hslam_hyb640_prune, frames, B, L,
          iters=6, ate=True)
    # KNN at the DENSE ds4 with the round-4 normal gate — the density
    # regime the gate was built for (ungated KNN ds4 diverges outright at
    # 0.55-3.7 m; design.md §4).
    hslam_knn_gate = PointFusion(
        odom="gradicp", odom_assoc="knn", odom_angle_gate=45.0,
        dsratio=4, numiters=10, map_capacity=L * H * W,
        motion_model="constant_velocity", robust_loss="tukey",
        robust_scale=0.03, dist_thresh=0.01, normal_pitch=4,
    )
    timed("PointFusion(gradicp, knn ds4+gate45) hard-clip 640x480 frames/s",
          hslam_knn_gate, frames, B, L, iters=2, ate=True)

    # config 4: large map / long sequence (BASELINE.md #4 analogue — no
    # ScanNet data in this environment, so the same procedural scene with a
    # 4x-speed camera: the map reaches 1.13M points by frame 60, matching a
    # reference run to 0.003%). The later segments exceed 3*H*W so the
    # 'windowed' association path is exercised at scale. Baseline: reference
    # CPU 0.1506 fps (MEASURED_BASELINE.json "large_map_baseline").
    from gradslam_tpu.datasets import synthetic_sequence

    B, L, H, W = 1, 60, 480, 640
    rgb, depths, intrinsics, poses = synthetic_sequence(B, L, H, W, speed=4.0)
    frames = RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )
    # measured sizes at frames 9/19/29/39/49/59: 425,478 / 595,849 /
    # 741,021 / 869,868 / 997,261 / 1,125,455 (+3% headroom per 10-frame
    # segment, rounded up to multiples of 1024): mean capacity 908k -> 817k
    big_sched = [
        (10, 438_272), (10, 614_400), (10, 763_904),
        (10, 896_000), (10, 1_028_096), (10, 1_160_192),
    ]
    hw_big = fusion_hw(big_sched, H, W)
    big = PointFusion(odom="gt", map_capacity=big_sched)
    timed("PointFusion(gt) 640x480 large-map (1.13M pts, 60 frames) frames/s",
          big, frames, B, L, iters=2, baseline=0.1506, hw=hw_big)
    big_q = PointFusion(odom="gt", quantize_colors=True,
                        map_capacity=big_sched)
    timed("PointFusion(gt) 640x480 large-map (quantized colors) frames/s",
          big_q, frames, B, L, iters=2, baseline=0.1506, hw=hw_big)
    # TRACKED large map (VERDICT r4 #9): projective odometry against the
    # growing 1.13M-point map — association cost stays frame-sized (the
    # finest window is 2*(H/ds)*(W/ds) rows regardless of map size; only
    # the O(capacity) window compaction grows, and the nested-pyramid path
    # pays it once per frame). zero-drop asserted by timed().
    big_t = PointFusion(
        odom="gradicp", odom_assoc="projective", odom_sym_normals=True,
        pyramid=[(8, 6), (4, 2)], lookahead_assoc="reuse",
        quantize_colors=True, map_capacity=big_sched,
        motion_model="constant_velocity",  # 4x-speed camera
    )
    hw_big_t = fusion_hw(
        big_sched, H, W,
        odom_terms=6 * 2 * (H // 8) * (W // 8) + 2 * 2 * (H // 4) * (W // 4),
    )
    timed("PointFusion(gradicp, projective, pyramid, reuse+quantized) "
          "640x480 large-map tracked frames/s",
          big_t, frames, B, L, iters=2, baseline=0.1506, ate=True,
          hw=hw_big_t)

    # config 5: batched differentiable SLAM (grad wrt depth + intrinsics)
    B, L, H, W = 8, 4, 120, 160
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    slam = PointFusion(odom="gt", use_jit=False, map_capacity=L * H * W)

    def loss_fn(d, K):
        fr = RGBDImages(jnp.asarray(rgb), d, K, jnp.asarray(poses))
        pc, traj = slam.forward(fr)
        return jnp.sum(pc.points**2)

    grad_step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    d0, K0 = jnp.asarray(depths), jnp.asarray(intrinsics)
    g = grad_step(d0, K0)
    _ = float(g[0].ravel()[0])
    record(
        {
            "metric": "batched differentiable SLAM (B=8, grads to depth+intrinsics)",
            "value": measure_fps(grad_step, (d0, K0), 3,
                                 lambda g: float(g[0].ravel()[0]), B * L),
            "unit": "frames/s",
        }
    )

    # config 5 at benchmark resolution (VERDICT r4 #6): the batched
    # differentiable-SLAM flagship moved from 120x160/L=4 to 320x240/L=8 —
    # 8 sequences, backward through the full fused forward, remat on (the
    # 8-way batch multiplies every per-frame residual).
    B, L, H, W = 8, 8, 240, 320
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    slam = PointFusion(odom="gt", use_jit=False, remat=True,
                       map_capacity=L * H * W)

    def loss_fn_big(d, K):
        fr = RGBDImages(jnp.asarray(rgb), d, K, jnp.asarray(poses))
        pc, traj = slam.forward(fr)
        return jnp.sum(pc.points**2)

    tag = "batched differentiable SLAM (B=8, 320x240, L=8, remat)"
    try:
        grad_jit = jax.jit(jax.grad(loss_fn_big, argnums=(0, 1)))
        grad_c, trace_s, compile_s, warm_compile_s = aot(
            grad_jit, jnp.asarray(depths), jnp.asarray(intrinsics))
        hbm_gb = _hbm_gb(grad_c)
        g = grad_c(jnp.asarray(depths), jnp.asarray(intrinsics))
        gd = float(np.abs(np.asarray(g[0])).max())
        assert np.isfinite(gd) and gd > 0, gd
        entry = {
            "metric": tag,
            # iters=4: a run is ~3 s and a mid-row tunnel hiccup once read
            # 8 fps where isolated remeasurement reproduces 22.7 (r5)
            "value": measure_fps(
                grad_c, (jnp.asarray(depths), jnp.asarray(intrinsics)), 4,
                lambda g: float(g[0].ravel()[0]), B * L),
            "unit": "frames/s",
            "trace_s": trace_s,
            "compile_s": compile_s,
            "warm_compile_s": warm_compile_s,
        }
        if hbm_gb is not None:
            entry["hbm_gb"] = hbm_gb
        record(entry)
    except Exception as e:  # OOM is a valid finding
        record({"metric": tag, "value": None, "unit": "frames/s",
                "error": f"{type(e).__name__}: {str(e)[:200]}"})

    # config 5 at HEADLINE scale (VERDICT r2 #2): gradient-mode SLAM at the
    # north-star operating point — jax.grad through the FULL 30-frame 640x480
    # PointFusion program, remat off vs on, recording throughput and the
    # compiled program's HBM footprint (XLA memory_analysis: argument +
    # output + temp/scratch). The remat=False row answers "does the 640x480
    # backward even fit HBM"; the remat=True row prices the recompute.
    B, L, H, W = 1, 30, 480, 640
    rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
    d0, K0 = jnp.asarray(depths), jnp.asarray(intrinsics)
    rgb_j, poses_j = jnp.asarray(rgb), jnp.asarray(poses)
    for remat in (False, True):
        slam = PointFusion(odom="gt", use_jit=False, remat=remat,
                           map_capacity=540_672)

        def loss_fn(d, K):
            fr = RGBDImages(rgb_j, d, K, poses_j)
            pc, traj = slam.forward(fr)
            return jnp.sum(pc.points**2)

        tag = (f"grad(PointFusion(gt)) 640x480 30-frame backward "
               f"(remat={'on' if remat else 'off'})")
        try:
            grad_jit = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
            grad_c, trace_s, compile_s, warm_compile_s = aot(grad_jit, d0, K0)
            hbm_gb = _hbm_gb(grad_c)
            g = grad_c(d0, K0)
            gd = float(np.abs(np.asarray(g[0])).max())
            gk = float(np.abs(np.asarray(g[1])).max())
            assert np.isfinite(gd) and np.isfinite(gk), (gd, gk)
            assert gd > 0, "zero gradient to depth"
            entry = {
                "metric": tag,
                "value": measure_fps(grad_c, (d0, K0), 2,
                                     lambda g: float(g[0].ravel()[0]), B * L),
                "unit": "frames/s",
                "trace_s": trace_s,
                "compile_s": compile_s,
                "warm_compile_s": warm_compile_s,
            }
            if hbm_gb is not None:
                entry["hbm_gb"] = hbm_gb
            record(entry)
        except Exception as e:  # OOM with remat off is a valid finding
            record({
                "metric": tag,
                "value": None,
                "unit": "frames/s",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            })

    # tracked-gradient benchmark (VERDICT r3 #6): the framework's
    # differentiating claim is gradients THROUGH gradICP — price the backward
    # of the tracked pipeline where it is expensive, not just the gt path.
    # The projective variants price the backward of the KNN-free mode: the
    # forward saves no O(N*M) distance matrices, so its backward is
    # proportionally lighter too.
    for (H, W, res_tag, remats, assoc) in (
            (240, 320, "320x240", (False, True), "knn"),
            (480, 640, "640x480", (False, True), "knn"),
            (480, 640, "640x480, projective", (False, True), "projective")):
        B, L = 1, 30
        rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
        d0, K0 = jnp.asarray(depths), jnp.asarray(intrinsics)
        rgb_j, poses_j = jnp.asarray(rgb), jnp.asarray(poses)
        cap = 147_456 if W == 320 else 540_672
        for remat in remats:
            kw = {}
            if assoc == "projective":
                kw = dict(odom_assoc="projective", odom_sym_normals=True)
            slam = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                               use_jit=False, remat=remat, map_capacity=cap,
                               **kw)

            def loss_fn(d, K):
                fr = RGBDImages(rgb_j, d, K, poses_j)
                pc, traj = slam.forward(fr)
                return jnp.sum(pc.points**2)

            tag = (f"grad(PointFusion(gradicp)) {res_tag} 30-frame backward "
                   f"(remat={'on' if remat else 'off'})")
            try:
                grad_jit = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
                grad_c, trace_s, compile_s, warm_compile_s = aot(
                    grad_jit, d0, K0)
                hbm_gb = _hbm_gb(grad_c)
                g = grad_c(d0, K0)
                gd = float(np.abs(np.asarray(g[0])).max())
                gk = float(np.abs(np.asarray(g[1])).max())
                assert np.isfinite(gd) and np.isfinite(gk), (gd, gk)
                assert gd > 0, "zero gradient to depth through gradICP"
                entry = {
                    "metric": tag,
                    "value": measure_fps(
                        grad_c, (d0, K0), 2,
                        lambda g: float(g[0].ravel()[0]), B * L),
                    "unit": "frames/s",
                    "trace_s": trace_s,
                    "compile_s": compile_s,
                    "warm_compile_s": warm_compile_s,
                }
                if hbm_gb is not None:
                    entry["hbm_gb"] = hbm_gb
                record(entry)
            except Exception as e:  # OOM with remat off is a valid finding
                record({
                    "metric": tag,
                    "value": None,
                    "unit": "frames/s",
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                })

    _write(partial=False)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="artifact path (default: BENCH_ALL_r<next>.json)")
    args = ap.parse_args()
    run(args.out)
