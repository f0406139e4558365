"""Headline benchmark: particle-filter SLAM throughput on one TPU chip.

Headline metric (BASELINE.json): scans/sec/chip at 1k particles on the
1000-scan museum dataset, vs the reference C pipeline's 3.95 scans/s
(253.28 s / 1000 scans on a Ryzen 7 6800U, dissertation p.33 §10).

Beyond the headline, every number the README/PARITY quote is re-measured
here so it cannot silently rot (VERDICT r1 "what's missing" #2):

- ``vs_local_oracle``: apples-to-apples baseline — the clean-room C++ oracle
  with the reference's naive EDT timed on THIS host;
- ``secondary``: fidelity mode, PF-10240, scan-driven EKF-FastSLAM, graph
  SLAM with loop closures, the building-scale hard workload (60x45 m, 3800
  scans) in fidelity/wide/PF/graph modes, streaming per-scan latency
  (p50/p99 vs the reference's 10 Hz sensor budget, dissertation p.23 §8.2),
  and the virtual-mesh scaling sweep;
- ``kernels``: per-kernel ms / FLOPs / bytes / fraction-of-roofline for the
  Pallas EDT (vs the reference's 0.4 ms per 400² HLS kernel, dissertation
  p.46 fig. 14) and the correlation-volume kernel, with a compiled-on-TPU
  equality check against the jnp oracles.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N, ...}

Indestructibility (round 4; BENCH_r03 was lost to a wedged axon tunnel that
hung the first trivial dispatch — rc 124, parsed null):
- EVERY python process whose env carries PALLAS_AXON_POOL_IPS claims the
  single TPU at interpreter boot (sitecustomize registers an axon session —
  measured: an idle ``python -c "time.sleep()"`` blocks all other
  processes' dispatches until it exits and its grant drains, taking
  minutes). The driver-invoked ``python bench.py`` process therefore
  already holds THE claim — so it runs the stages itself (the RUNNER) and
  spawns a claim-free WATCHER child (env stripped) that owns the artifact.
- the WATCHER inherits stdout, collects ``STAGE_RESULT=`` JSON lines from
  the runner over a pipe, and is the only process that prints the final
  JSON line — guarded by a deadline watchdog thread and SIGTERM/SIGINT
  handlers, so the artifact degrades instead of zeroing.
- a wedged dispatch cannot be interrupted in-process (the round-3 failure
  mode) but the runner can always be killed: when a stage exceeds its
  budget the watcher SIGKILLs the runner and finishes the remaining stages
  in a fresh child — on the TPU when enough budget remains to drain the
  dead runner's grant, else on CPU (``JAX_PLATFORMS=cpu``) with reduced
  scan counts, clearly labeled.
- the persistent XLA compile cache (``.jax_cache``) makes recovery children
  and repeated bench invocations cheap.

Measurement methodology (round 3; the round-1/2 numbers were poisoned by
the remote-attached "axon" TPU path and are NOT comparable):
- ``block_until_ready`` does not block on this backend — every timing
  forces a host fetch;
- a repeated identical (program, inputs) dispatch can be served from cache
  or hang — every timed dispatch perturbs its inputs;
- each dispatch carries a ~140 ms round-trip/transfer floor — model runs
  subtract a measured trivial-program floor and report the median of 3
  runs; kernels use the slope of a chained lax.scan between two lengths.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

C_BASELINE_SCANS_PER_SEC = 3.95  # reference: 1000 scans / 253.28 s
REF_HLS_EDT_MS_400 = 0.4         # dissertation p.46 fig. 14 (400x400)

# TPU v5e (v5 lite) single-chip peaks for the roofline denominator.
PEAK_F32_FLOPS = 98.3e12   # MXU f32 ~ bf16/2 (197 TFLOP/s bf16)
PEAK_HBM_BW = 819e9        # bytes/s

_T0 = time.time()
# children inherit the PARENT's absolute deadline via env
_DEADLINE = float(os.environ.get("BENCH_DEADLINE_TS") or (_T0 + 530.0))
# leave ~60 s of the driver's 590 s for slack

# Child processes run with reduced scan counts when the parent fell back to
# CPU (a full PF-1024 museum-1000 run is a TPU workload, not a CPU one).
CPU_FB = os.environ.get("BENCH_CPU_FALLBACK") == "1"


def _left() -> float:
    return _DEADLINE - time.time()


def _log(msg: str) -> None:
    print(f"[{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


# ===========================================================================
# Child-side measurement helpers
# ===========================================================================

_FLOORS: dict = {}


def _dispatch_floor(ranges: np.ndarray) -> float:
    """Round-trip + transfer floor (s) for a dispatch carrying ``ranges``.

    Measured as the median of trivial jitted reductions over perturbed copies
    (identical dispatches can dedupe/hang on the axon tunnel). Cached per
    input shape."""
    import statistics

    import jax
    import jax.numpy as jnp

    key = ranges.shape
    if key in _FLOORS:
        return _FLOORS[key]
    triv = jax.jit(lambda r: jnp.sum(r) * jnp.float32(1e-9))
    float(triv(jnp.asarray(ranges)))  # compile
    ts = []
    for k in range(5):
        r = jnp.asarray(ranges + np.float32(1e-6 * (k + 1)))
        t0 = time.perf_counter()
        float(triv(r))
        ts.append(time.perf_counter() - t0)
    _FLOORS[key] = statistics.median(ts)
    _log(f"dispatch floor {key}: {_FLOORS[key] * 1e3:.0f} ms")
    return _FLOORS[key]


def _timed_run(runner, label: str, gt, n_scans: int, floor_s: float = 0.0,
               reps: int = 3):
    """Compile+run once, then report the median of ``reps`` timed runs with
    the dispatch/transfer floor subtracted. Returns (scans/s, ATE).

    ``runner(eps)`` must thread ``eps`` into its device inputs (e.g.
    ``ranges + eps``) so every timed dispatch is distinct — on the axon
    tunnel a repeated identical (program, inputs) dispatch can be served
    from cache or hang, which silently inflated the round-1/2 numbers."""
    import statistics

    from lidar_slam_tpu.utils.metrics import ate

    t0 = time.time()
    path0 = np.asarray(runner(0.0)[0])
    _log(f"{label}: compile+first run {time.time() - t0:.1f}s")
    ts = []
    for k in range(reps):
        t0 = time.perf_counter()
        np.asarray(runner(np.float32(1e-5 * (k + 1)))[0])
        ts.append(time.perf_counter() - t0)
    dev = max(statistics.median(ts) - floor_s, 1e-9)
    # ATE from the UNPERTURBED run: chaotic-regime configs (the +-1-window
    # building parity pipeline) can flip between tracking and divergence on
    # a 1e-5 input perturbation, and the parity surface is eps=0
    err = float(ate(path0, gt))
    sps = (n_scans - 1) / dev
    _log(f"{label}: {sps:.1f} scans/s (device {dev:.3f}s, floor "
         f"{floor_s * 1e3:.0f} ms)  ATE {err:.4f} m")
    return sps, err


def _kernel_ms(fn, make_args, l1: int = 64, l2: int = 4096,
               reps: int = 3) -> float:
    """Per-call ms as the SLOPE of a chained lax.scan between two lengths.

    Three defenses against the axon tunnel (all measured, round 3):
    (a) ``block_until_ready`` does not actually block on this backend —
        force a host fetch (``float(...)``) instead;
    (b) every dispatch carries a large, noisy constant round-trip (~30-100
        ms), so total/iters is meaningless — time two scan lengths and take
        the slope;
    (c) a repeated identical (program, inputs) dispatch can dedupe or hang —
        ``make_args(k)`` must return FRESH inputs for every call.

    ``fn(acc, *args)`` must thread the loop-carried f32 scalar ``acc`` into
    its inputs (value-preservingly) so XLA cannot hoist the kernel out of the
    scan as loop-invariant, and return an array whose sum feeds ``acc``.
    """
    import statistics

    import jax
    import jax.numpy as jnp

    def make(length):
        def many(*a):
            def body(acc, _):
                out = fn(acc, *a)
                return acc + jnp.sum(out), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return acc

        return jax.jit(many)

    j1, j2 = make(l1), make(l2)
    k = 0
    float(j1(*make_args(k)))  # compile
    float(j2(*make_args(k + 1)))
    k += 2
    t1s, t2s = [], []
    for _ in range(reps):
        a1, a2 = make_args(k), make_args(k + 1)
        k += 2
        t0 = time.perf_counter()
        float(j1(*a1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(j2(*a2))
        t2s.append(time.perf_counter() - t0)
    slope = (statistics.median(t2s) - statistics.median(t1s)) / (l2 - l1)
    return max(slope * 1e3, 0.0)


def _museum():
    from lidar_slam_tpu.io import dataset

    n = 200 if CPU_FB else 1000
    ranges, gt, _ = dataset.ensure_dataset(n_scans=1000, seed=0)
    return ranges[:n], gt[:n], n


def _building():
    from lidar_slam_tpu.io import dataset, simulate

    n = 400 if CPU_FB else simulate.BUILDING_N_SCANS
    ranges, gt, _ = dataset.ensure_dataset(
        n_scans=simulate.BUILDING_N_SCANS, world="building")
    return ranges[:n], gt[:n], n


# ===========================================================================
# Stages (each runs in its own subprocess: `python bench.py --stage NAME`)
# ===========================================================================

def stage_headline() -> dict:
    """PF-1024 on museum-1000: the BASELINE.json headline configuration."""
    from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
    from lidar_slam_tpu.models import fastslam

    ranges, gt, n = _museum()
    floor = _dispatch_floor(ranges)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, particles=ParticleConfig(n_particles=1024))
    # 5 reps on the headline: at ~0.2 s device time per run the subtracted
    # dispatch floor dominates the run-to-run spread (4.2-7.2k scans/s
    # observed at 3 reps); the median of 5 damps it at ~1 s extra cost
    sps, err = _timed_run(lambda eps: fastslam.run_pf(ranges + eps, cfg),
                          "pf-1024", gt, n, floor, reps=5)
    note = " [CPU fallback, 200 scans]" if CPU_FB else ""
    return {"headline": {
        "metric": f"scans/sec/chip, 1024 particles, museum-{n} "
                  f"(ATE {err:.3f} m){note}",
        "value": round(sps, 2), "ate": round(err, 4)}}


def stage_oracle() -> dict:
    """Clean-room C++ oracle with the reference's naive EDT, on THIS host."""
    from lidar_slam_tpu import native
    from lidar_slam_tpu.io import dataset

    ranges, _, _ = dataset.ensure_dataset(n_scans=1000, seed=0)
    n_o = 200
    t0 = time.time()
    native.run_oracle(ranges[:n_o], use_naive_edt=True)
    sps = n_o / (time.time() - t0)
    _log(f"local naive-EDT oracle: {sps:.1f} scans/s")
    return {"secondary": {"oracle_naive_local": {"scans_per_sec": round(sps, 2)}}}


def stage_kernels() -> dict:
    """Per-kernel ms/FLOPs/bytes/roofline + compiled equality vs jnp oracle."""
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.ops import correlative, edt
    from lidar_slam_tpu.utils.profiling import cost_analysis

    out: dict = {}
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.random((400, 400)) < 0.02)

    if on_tpu:
        from lidar_slam_tpu.ops.pallas_edt import edt_clamped_pallas as edt_fn
    else:
        edt_fn = edt.edt_clamped

    # compiled-on-device equality vs the brute-force-backed jnp oracle
    got = np.asarray(jax.jit(edt_fn)(occ))
    want = np.asarray(jax.jit(edt.edt_clamped)(occ))
    edt_exact = bool(np.array_equal(got, want))

    l1, l2 = (16, 256) if CPU_FB else (64, 4096)
    # acc >= 0 always, so xor-ing with (acc > 1e30) is the identity — but XLA
    # cannot prove it, which pins the kernel inside the timing loop
    ms = _kernel_ms(lambda acc, o: edt_fn(jnp.logical_xor(o, acc > 1e30)),
                    lambda k: (jnp.asarray(
                        np.random.default_rng(100 + k).random((400, 400))
                        < 0.02),), l1=l1, l2=l2)
    costs = cost_analysis(edt_fn, occ)
    flops = float(costs.get("flops", 0.0))
    bytes_ = float(costs.get("bytes accessed", 0.0))
    sol_s = max(flops / PEAK_F32_FLOPS, bytes_ / PEAK_HBM_BW)
    out["edt_400"] = {
        "ms": round(ms, 4), "flops": flops, "bytes": bytes_,
        "roofline_frac": round(sol_s / (ms * 1e-3), 4) if ms > 0 else None,
        "exact_vs_oracle": edt_exact,
        "vs_ref_hls_0.4ms": round(REF_HLS_EDT_MS_400 / ms, 1) if ms > 0 else None,
    }
    _log(f"edt_400: {ms:.3f} ms  exact={edt_exact}")

    # correlation volume on representative PF shapes
    metric = jax.jit(edt.edt_clamped)(occ)
    from lidar_slam_tpu.core.gridmap import OccGrid

    grid = OccGrid(occ=occ, n_rows=jnp.int32(400), n_cols=jnp.int32(400),
                   origin=jnp.zeros(2, jnp.float32), pixel=jnp.float32(0.1))
    sx = jnp.asarray(rng.uniform(2, 35, 1079), jnp.float32)
    sy = jnp.asarray(rng.uniform(2, 35, 1079), jnp.float32)
    sv = jnp.ones(1079, bool)
    base = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)

    def vol_fn(m, x, y, v, b):
        return correlative.build_score_volume(
            m, grid, x, y, v, b, n_theta=7, theta_step=0.0043633, half=6).scores

    def vol_args(k):
        r = np.random.default_rng(200 + k)
        return (metric,
                jnp.asarray(r.uniform(2, 35, 1079), jnp.float32),
                jnp.asarray(r.uniform(2, 35, 1079), jnp.float32),
                sv, base)

    ms_v = _kernel_ms(
        lambda acc, m, x, y, v, b: vol_fn(m + jnp.minimum(acc, 0.0), x, y, v, b),
        vol_args, l1=l1, l2=min(l2, 2048))
    costs = cost_analysis(vol_fn, metric, sx, sy, sv, base)
    flops = float(costs.get("flops", 0.0))
    bytes_ = float(costs.get("bytes accessed", 0.0))
    sol_s = max(flops / PEAK_F32_FLOPS, bytes_ / PEAK_HBM_BW)
    out["volume_7x13x13"] = {
        "ms": round(ms_v, 4), "flops": flops, "bytes": bytes_,
        "roofline_frac": round(sol_s / (ms_v * 1e-3), 4) if ms_v > 0 else None,
    }
    _log(f"volume: {ms_v:.3f} ms")
    return {"kernels": out}


def stage_fidelity() -> dict:
    from lidar_slam_tpu import native
    from lidar_slam_tpu.config import DEFAULT_CONFIG
    from lidar_slam_tpu.models import scan_matcher
    from lidar_slam_tpu.utils.metrics import max_abs_err

    ranges, gt, n = _museum()
    floor = _dispatch_floor(ranges)
    f_sps, f_err = _timed_run(
        lambda eps: scan_matcher.run_scan(ranges + eps, DEFAULT_CONFIG),
        "fidelity-museum", gt, n, floor)
    cpath, _ = native.run_oracle(ranges)
    jpath, _ = scan_matcher.run_scan(ranges, DEFAULT_CONFIG)
    return {"secondary": {"fidelity_museum1000": {
        "scans_per_sec": round(f_sps, 1), "ate": round(f_err, 4),
        "n_scans": n,
        "bit_exact_vs_oracle": bool(
            max_abs_err(np.asarray(jpath), cpath) == 0.0)}}}


def stage_pf10240() -> dict:
    from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
    from lidar_slam_tpu.models import fastslam

    if CPU_FB:
        # a 10k-particle sweep is a TPU workload; on the CPU fallback its
        # compile alone blows the stage budget for a meaningless number
        return {"secondary": {"pf10240_museum1000": {
            "skipped": "cpu fallback"}}}
    ranges, gt, n = _museum()
    floor = _dispatch_floor(ranges)
    big = dataclasses.replace(
        DEFAULT_CONFIG, particles=ParticleConfig(n_particles=10240))
    p_sps, p_err = _timed_run(lambda eps: fastslam.run_pf(ranges + eps, big),
                              "pf-10240", gt, n, floor)
    return {"secondary": {"pf10240_museum1000": {
        "scans_per_sec": round(p_sps, 1), "ate": round(p_err, 4)}}}


def stage_building() -> dict:
    """Building-3800 hard workload: parity, wide (solved), and PF configs."""
    from lidar_slam_tpu import native
    from lidar_slam_tpu.config import BUILDING_CONFIG, BUILDING_WIDE_CONFIG
    from lidar_slam_tpu.models import fastslam, scan_matcher
    from lidar_slam_tpu.utils.metrics import max_abs_err

    b_ranges, b_gt, n_b = _building()
    b_floor = _dispatch_floor(b_ranges)
    secondary: dict = {}
    # (a) parity config (+-1 window): diverges exactly like the C oracle
    f_sps, f_err = _timed_run(
        lambda eps: scan_matcher.run_scan(b_ranges + eps, BUILDING_CONFIG),
        "fidelity-building", b_gt, n_b, b_floor)
    cpath, _ = native.run_oracle_cfg(b_ranges, BUILDING_CONFIG)
    jpath, _ = scan_matcher.run_scan(b_ranges, BUILDING_CONFIG)
    secondary["fidelity_building3800"] = {
        "scans_per_sec": round(f_sps, 1), "ate": round(f_err, 4),
        "n_scans": n_b,
        "bit_exact_vs_oracle": bool(
            max_abs_err(np.asarray(jpath), cpath) == 0.0)}
    # sub-runs are individually deadline-gated so a slow chip degrades the
    # stage to fewer entries instead of losing the whole stage to a kill
    if _left() > 60:
        # (b) solved config (+-2 correlative window): the accuracy headline
        # on the hard workload the reference's fixed window cannot track
        w_sps, w_err = _timed_run(
            lambda eps: scan_matcher.run_scan(b_ranges + eps,
                                              BUILDING_WIDE_CONFIG),
            "wide-building", b_gt, n_b, b_floor)
        secondary["building3800_wide"] = {
            "scans_per_sec": round(w_sps, 1), "ate": round(w_err, 4)}
    return {"secondary": secondary}


def stage_building_pf() -> dict:
    """PF-1024 + graph-closure feedback on building-3800
    (models/pf_graph_slam.py): the multi-hypothesis config's real number.
    The closure-free PF bakes one corridor mis-registration into its shared
    map (0.697 m ATE — the standing ablation, pf1024_building3800 in
    BENCH_r04.json); the feedback path re-anchors the particle cloud and
    rebuilds the map from optimized keyframes, so 1024 hypotheses finally
    beat one."""
    from lidar_slam_tpu.config import BUILDING_CONFIG
    from lidar_slam_tpu.models.pf_graph_slam import run_pf_graph
    from lidar_slam_tpu.utils.metrics import ate

    b_ranges, b_gt, n_b = _building()
    bcfg = dataclasses.replace(
        BUILDING_CONFIG, particles=dataclasses.replace(
            BUILDING_CONFIG.particles, n_particles=1024))
    t0 = time.time()
    path, _, gs = run_pf_graph(b_ranges, bcfg)
    dt = time.time() - t0
    err = float(ate(np.asarray(path), b_gt))
    err_s = float(ate(gs.smoothed_path(path), b_gt))
    _log(f"building-pf-graph: {(n_b - 1) / dt:.1f} scans/s wall, "
         f"ATE {err:.4f} m (smoothed {err_s:.4f}), "
         f"{len(gs.closures)} closures")
    return {"secondary": {"pf1024_building3800": {
        "scans_per_sec_wall": round((n_b - 1) / dt, 1),
        "ate": round(err, 4), "ate_smoothed": round(err_s, 4),
        "closures": len(gs.closures),
        "closure_feedback": True, "n_scans": n_b,
        "ablation_no_closure": "BENCH_r04.json pf1024_building3800: "
                               "ATE 0.6972 at 2253.7 scans/s"}}}


def stage_building_graph() -> dict:
    """Graph backend on building-3800: the loop-closure recovery headline.

    The capability the reference lacks entirely (SURVEY §0: no loop closure,
    no pose graph): ambiguity-gated closures (graph_slam.LoopClosureConfig
    corridor-aliasing gates) on the 60x45 m tour, target ATE < 0.2 m at
    >= the C baseline's 3.95 scans/s."""
    from lidar_slam_tpu.config import BUILDING_WIDE_CONFIG
    from lidar_slam_tpu.models.graph_slam import GraphSlam
    from lidar_slam_tpu.utils.metrics import ate

    b_ranges, b_gt, n_b = _building()
    gs = GraphSlam(BUILDING_WIDE_CONFIG)
    t0 = time.time()
    path, _ = gs.run(b_ranges)
    cold_dt = time.time() - t0
    err = float(ate(np.asarray(path), b_gt))
    err_s = float(ate(gs.smoothed_path(path), b_gt))
    _log(f"building-graph cold: {(n_b - 1) / cold_dt:.1f} scans/s wall, "
         f"ATE {err:.4f} m (smoothed {err_s:.4f}), "
         f"{len(gs.closures)} closures")
    # warm = steady state from the SAME run: each jitted program's first
    # call carries its compile/executable load through the tunnel; the
    # StageTimer re-prices those first calls at the median of the rest
    # (VERDICT r4 weak #3 — the warm number previously lived only in a
    # commit message; a second full run doubled the stage past its budget)
    warm_dt = gs.timer.steady_state_total()
    entry = {
        "scans_per_sec_wall": round((n_b - 1) / cold_dt, 1),
        "cold_s": round(cold_dt, 1),
        "ate_smoothed": round(err_s, 4),
        "warm_scans_per_sec": round((n_b - 1) / max(warm_dt, 1e-6), 1),
        "warm_note": "single-run steady-state estimate: per-program "
                     "first-call compile/load re-priced at the median of "
                     "its remaining calls (StageTimer.steady_state_total)",
        "ate": round(err, 4), "closures": len(gs.closures),
        "n_scans": n_b}
    _log(f"building-graph warm estimate: "
         f"{(n_b - 1) / max(warm_dt, 1e-6):.1f} scans/s")
    return {"secondary": {"building3800_graph": entry}}


def stage_ekf() -> dict:
    """EKF-FastSLAM (BASELINE config 2): hybrid grid+landmark observation.

    The hybrid model (models/ekf_hybrid.py) is the config-2 number: the
    pure landmark filter is corridor-blind between corner sightings and ran
    0.78 m ATE on this tour (BENCH_r04) — 12x its grid-PF sibling. The
    landmark-only filter stays as the ablation entry."""
    from lidar_slam_tpu.models import ekf_slam
    from lidar_slam_tpu.models.ekf_hybrid import run_ekf_hybrid

    ranges, gt, n = _museum()
    floor = _dispatch_floor(ranges)
    ecfg = ekf_slam.long_tour_config(1024)
    h_sps, h_err = _timed_run(
        lambda eps: run_ekf_hybrid(ranges + eps, ecfg),
        "ekf-hybrid-1024", gt, n, floor)
    secondary = {"ekf1024_museum1000": {
        "scans_per_sec": round(h_sps, 1), "ate": round(h_err, 4),
        "observation_model": "hybrid grid+landmark"}}
    if _left() > 60:
        e_sps, e_err = _timed_run(
            lambda eps: ekf_slam.run_ekf_slam_scan(
                ranges + eps, ecfg, seed=0,
                max_range=ekf_slam.LONG_TOUR_MAX_RANGE),
            "ekf-landmark-only", gt, n, floor)
        secondary["ekf1024_landmark_only"] = {
            "scans_per_sec": round(e_sps, 1), "ate": round(e_err, 4)}
    return {"secondary": secondary}


def stage_graph() -> dict:
    from lidar_slam_tpu.config import DEFAULT_CONFIG
    from lidar_slam_tpu.io import simulate
    from lidar_slam_tpu.models.graph_slam import GraphSlam
    from lidar_slam_tpu.utils.metrics import ate

    n = 300 if CPU_FB else 700
    g_ranges, g_gt = simulate.generate_dataset(
        n_scans=n, seed=0, waypoints=simulate.LOOP_WAYPOINTS)
    gs = GraphSlam(DEFAULT_CONFIG)
    t0 = time.time()
    gs.run(g_ranges)                      # warm (compiles)
    _log(f"graph-{n}: warm run {time.time() - t0:.1f}s")
    gs = GraphSlam(DEFAULT_CONFIG)
    t0 = time.time()
    path, _ = gs.run(g_ranges + np.float32(1e-5))
    dt = time.time() - t0
    _log(f"graph-{n}: {(n - 1) / dt:.1f} scans/s wall, "
         f"{len(gs.closures)} closures")
    return {"secondary": {"graph_700loop": {
        "scans_per_sec": round((n - 1) / dt, 1),
        "ate": round(float(ate(np.asarray(path), g_gt)), 4),
        "ate_smoothed": round(float(ate(gs.smoothed_path(path), g_gt)), 4),
        "closures": len(gs.closures), "n_scans": n}}}


def stage_streaming() -> dict:
    """Per-scan latency of the streaming paths vs the 10 Hz sensor budget.

    The reference's operating point is a 10 Hz lidar (dissertation p.23
    §8.2) and its edge variant measures end-to-end wall time per scan
    (esp32_edge.c main loop). Two paths measured here, p50/p99 per scan:
    - run_host_loop: host-driven jitted step (device step + pose fetch);
    - streaming HTTP: ScanServer -> prefetching client -> jitted step (the
      full edge-pipeline analog, network included).
    On the axon tunnel each dispatch carries a ~140 ms round-trip floor, so
    this is the honest real-time picture for THIS deployment, not a defect
    of the program (single-chip local attach removes the floor)."""
    import jax.numpy as jnp

    from lidar_slam_tpu.config import DEFAULT_CONFIG
    from lidar_slam_tpu.io import server as srv
    from lidar_slam_tpu.models import scan_matcher

    ranges, _, _ = _museum()
    n = min(140, ranges.shape[0])   # 140 scans: p99 stable, ~25 s cheaper
    #                                 than 200 at the tunnel's per-fetch floor

    def lat_stats(lats_s: list) -> dict:
        a = np.asarray(lats_s) * 1e3
        return {"p50_ms": round(float(np.percentile(a, 50)), 1),
                "p99_ms": round(float(np.percentile(a, 99)), 1),
                "mean_ms": round(float(a.mean()), 1),
                "realtime_10hz_frac": round(float((a <= 100.0).mean()), 3)}

    # host-loop path
    step = scan_matcher.make_step_fn(DEFAULT_CONFIG)
    state = scan_matcher.init_state(jnp.asarray(ranges[0]), DEFAULT_CONFIG)
    state, pose = step(state, jnp.asarray(ranges[1]))  # compile
    np.asarray(pose)
    lats = []
    for t in range(2, n):
        t0 = time.perf_counter()
        state, pose = step(state, jnp.asarray(ranges[t]))
        np.asarray(pose)                 # force the host fetch (honest e2e)
        lats.append(time.perf_counter() - t0)
    host = lat_stats(lats)
    _log(f"host-loop latency: p50 {host['p50_ms']} ms  p99 {host['p99_ms']} ms")

    # streaming HTTP path (server + prefetching client + jitted step)
    server = srv.ScanServer(ranges[:n]).start()
    try:
        stream = srv.scan_stream(server.url, n)
        state = scan_matcher.init_state(jnp.asarray(next(stream)),
                                        DEFAULT_CONFIG)
        lats = []
        first = True
        for r in stream:
            t0 = time.perf_counter()
            state, pose = step(state, jnp.asarray(r))
            np.asarray(pose)
            if first:
                first = False            # skip the compile-carrying step
            else:
                lats.append(time.perf_counter() - t0)
    finally:
        server.stop()
    http = lat_stats(lats)
    _log(f"streaming latency: p50 {http['p50_ms']} ms  p99 {http['p99_ms']} ms")
    return {"secondary": {"streaming_latency": {
        "budget_ms": 100.0, "host_loop": host, "http_stream": http,
        "n_scans": n}}}


def stage_submap() -> dict:
    """Submap-atlas graph SLAM (the unbounded-map story): O(M) anchor
    rewrites instead of O(points) map rebuilds after closure (SURVEY §5
    long-context analog; no artifact number existed before round 5)."""
    from lidar_slam_tpu.config import DEFAULT_CONFIG, SubmapConfig
    from lidar_slam_tpu.io import simulate
    from lidar_slam_tpu.models.submap_graph_slam import SubmapGraphSlam
    from lidar_slam_tpu.utils.metrics import ate

    n = 300 if CPU_FB else 700
    ranges, gt = simulate.generate_dataset(
        n_scans=n, seed=0, waypoints=simulate.LOOP_WAYPOINTS)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        submaps=SubmapConfig(n_submaps=32, submap_capacity=4096,
                             k_nearest=8, spawn_dist=2.0))
    gs = SubmapGraphSlam(cfg)
    t0 = time.time()
    path, _ = gs.run(ranges)
    dt = time.time() - t0
    n_sub = int(gs.final_state.atlas.n_submaps)
    err = float(ate(np.asarray(path), gt))
    _log(f"submap-graph-{n}: {(n - 1) / dt:.1f} scans/s wall, ATE {err:.4f}, "
         f"{len(gs.closures)} closures, {n_sub} resident submaps")
    return {"secondary": {"submap_graph": {
        "scans_per_sec_wall": round((n - 1) / dt, 1), "ate": round(err, 4),
        "closures": len(gs.closures), "resident_submaps": n_sub,
        "n_scans": n}}}


def stage_scaling_tpu() -> dict:
    """Multi-chip cost model measured on the real chip (BASELINE.md's
    >=0.8 scaling-efficiency target needs a quantitative basis this
    1-chip environment can produce — VERDICT r4 missing #1):

    (a) sharded-vs-unsharded PF step on a 1-device mesh — isolates the
        GSPMD partitioning + collective-insertion overhead a multi-chip
        program pays per step, with zero ICI cost (collectives on a
        1-device mesh are self-copies);
    (b) the analytic per-step collective-bytes model of the sharded PF
        (resampling all_gather + weight psum + EDT halo ppermute), the
        traffic that WOULD ride ICI at D devices.
    """
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
    from lidar_slam_tpu.core import sensor
    from lidar_slam_tpu.models import fastslam
    from lidar_slam_tpu.parallel import mesh as mesh_lib
    from lidar_slam_tpu.parallel import sharded

    n_steps = 60
    ranges, _, _ = _museum()
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, particles=ParticleConfig(n_particles=1024))
    p = cfg.particles.n_particles

    # both paths timed as ONE whole-sequence lax.scan dispatch (a per-step
    # host loop would bury the GSPMD delta under the ~140 ms tunnel floor)
    angles = jnp.asarray(sensor.beam_angles(cfg.lidar))
    mesh1 = mesh_lib.make_mesh(n_particles_shards=1, n_map_shards=1,
                               devices=jax.devices()[:1])

    def body_u(st, r):
        return fastslam.pf_step(st, r, cfg, angles)

    def body_s(st, r):
        st, est = fastslam.pf_step(st, r, cfg, angles)
        st = jax.lax.with_sharding_constraint(
            st, sharded.state_shardings(st, mesh1))
        return st, est

    @jax.jit
    def run_u(rs):
        st = fastslam.init_particles(rs[0], cfg, 0)
        return jax.lax.scan(body_u, st, rs[1:])[1]

    @jax.jit
    def run_s(rs):
        st = fastslam.init_particles(rs[0], cfg, 0)
        st = jax.lax.with_sharding_constraint(
            st, sharded.state_shardings(st, mesh1))
        return jax.lax.scan(body_s, st, rs[1:])[1]

    rs = jnp.asarray(ranges[:n_steps])
    # floor for THIS dispatch's transfer size (the full-dataset floor is
    # larger than the whole 60-scan run and clamped the subtraction to 0)
    floor = _dispatch_floor(np.asarray(ranges[:n_steps]))

    def timed(fn, eps):
        t0 = time.time()
        float(np.asarray(fn(rs + eps))[-1, 0])
        return time.time() - t0

    timed(run_u, np.float32(0.0))              # compile
    timed(run_s, np.float32(1e-7))             # compile
    t_u = min(timed(run_u, np.float32(k * 1e-6)) for k in (1, 2, 3)) - floor
    t_s = min(timed(run_s, np.float32(k * 1e-6)) for k in (4, 5, 6)) - floor
    t_u, t_s = max(t_u, 1e-3), max(t_s, 1e-3)

    # analytic per-step collective bytes at D shards (f32 = 4 B):
    # - weight normalization/ESS: psum of (2,) partials               ~16 B
    # - systematic resample: all_gather of shard logw (P*4 B) + the
    #   ancestor exchange, worst case every particle's (poses+prev_poses)
    #   crossing shards: 2 * P * 3 * 4 B
    # - keyframe EDT halo (map axis, amortized over ~1/8 keyframe rate):
    #   2 directions * max_dist rows * fine_size cols * 4 B
    g = cfg.grid
    halo = 2 * int(g.max_dist_px) * g.fine_size * 4
    bytes_per_step = {
        "resample_all_gather": p * 4 + 2 * p * 3 * 4,
        "weight_psum": 16,
        "edt_halo_ppermute_per_keyframe": halo,
    }
    per_u = t_u / (n_steps - 1)
    per_s = t_s / (n_steps - 1)
    _log(f"scaling-tpu: unsharded {per_u * 1e3:.1f} ms/step, 1-dev-mesh "
         f"sharded {per_s * 1e3:.1f} ms/step, overhead x{per_s / per_u:.3f}")
    return {"secondary": {"scaling_tpu_overhead": {
        "note": "sharded-vs-unsharded PF-1024 on a real-chip 1-device mesh "
                "(GSPMD overhead, zero ICI); collective bytes are the "
                "analytic per-step ICI traffic at D>1",
        "unsharded_ms_per_step": round(per_u * 1e3, 2),
        "sharded_1dev_ms_per_step": round(per_s * 1e3, 2),
        "gspmd_overhead_ratio": round(per_s / per_u, 3),
        "collective_bytes_per_step": bytes_per_step,
        "n_steps": n_steps}}}


def stage_scaling() -> dict:
    """Shard-count sweep of the sharded PF step (BASELINE config 4).

    Real multi-chip hardware is unavailable in this container (one v5e
    chip behind a tunnel), so the sweep runs on an 8-virtual-device CPU
    mesh (the parent launches this stage with JAX_PLATFORMS=cpu and
    --xla_force_host_platform_device_count=8): it validates that the
    pjit/shard_map program compiles AND executes at 1/2/4/8 particle
    shards. Labeled as program validation — the real single-chip scans/s is
    the headline; ICI scaling efficiency needs a real slice."""
    from lidar_slam_tpu.io import dataset
    from lidar_slam_tpu.parallel import multihost

    r, _, _ = dataset.ensure_dataset(n_scans=40, seed=0)
    rep = multihost.scaling_report(r, n_particles=512,
                                   shard_counts=(1, 2, 4, 8), n_scans=24)
    rep = {str(k): round(v, 2) for k, v in rep.items()}
    _log(f"scaling (virtual mesh): {rep}")
    return {"secondary": {"scaling_virtual_mesh": {
        "note": "PROGRAM VALIDATION ONLY: all D virtual devices share one "
                "host's cores (and run concurrently with the TPU bench), "
                "so D-shard runs re-divide constant compute — falling "
                "scans/s here measures host oversubscription, not ICI "
                "scaling. Quantitative multi-chip cost evidence lives in "
                "scaling_tpu_overhead (real-chip GSPMD overhead + analytic "
                "collective bytes).",
        "scans_per_sec": rep}}}


STAGES = {
    "headline": stage_headline,
    "oracle": stage_oracle,
    "kernels": stage_kernels,
    "fidelity": stage_fidelity,
    "pf10240": stage_pf10240,
    "building": stage_building,
    "building_pf": stage_building_pf,
    "building_graph": stage_building_graph,
    "ekf": stage_ekf,
    "graph": stage_graph,
    "submap": stage_submap,
    "streaming": stage_streaming,
    "scaling_tpu": stage_scaling_tpu,
    "scaling": stage_scaling,
}


def run_child(names: list, out=None) -> None:
    """Run the given stages IN ONE PROCESS, streaming one JSON line each.

    One process for all stages because every python process with the axon
    env registers a session whose first dispatch pays the chip-claim
    handover; the warmup below absorbs it exactly once. ``out`` defaults to
    stdout (recovery children); the runner passes the watcher's pipe."""
    import jax

    # persistent compile cache: recovery children and repeated bench
    # invocations skip recompiles of the whole-run scan programs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    out = out or sys.stdout

    def emit(stage: str, payload: dict) -> None:
        try:
            out.write("STAGE_RESULT="
                      + json.dumps({"stage": stage, **payload}) + "\n")
            out.flush()
        except (BrokenPipeError, ValueError):
            pass   # collector died; keep computing (results still in logs)

    import jax.numpy as jnp

    t0 = time.time()
    f = jax.jit(lambda a: jnp.sum(a) * 2)
    float(f(jnp.ones(1000)))
    t1 = time.time() - t0
    t0 = time.time()
    float(f(jnp.ones(1000) + 1e-6))
    emit("__warmup__", {"result": {
        "backend": jax.default_backend(),
        "first_dispatch_s": round(t1, 2),
        "dispatch_s": round(time.time() - t0, 3)}})

    for name in names:
        if _left() < 20:
            emit(name, {"error": "skipped (child deadline)"})
            continue
        emit(name, {"start": True})
        t0 = time.time()
        try:
            res = STAGES[name]()
        except Exception as e:  # noqa: BLE001 — a stage must not kill the rest
            emit(name, {"error": f"{type(e).__name__}: {e}"})
            continue
        # every entry carries its backend so a mixed tpu/cpu-fallback
        # artifact stays unambiguous per number
        backend = jax.default_backend()
        for v in res.get("secondary", {}).values():
            if isinstance(v, dict):
                v.setdefault("backend", backend)
        for v in res.get("kernels", {}).values():
            if isinstance(v, dict):
                v.setdefault("backend", backend)
        if "headline" in res:
            res["headline"]["backend"] = backend
        emit(name, {"result": res, "seconds": round(time.time() - t0, 1)})


# ===========================================================================
# Runner (the driver-invoked process: holds the boot-time TPU claim) and
# Watcher (claim-free child: owns the artifact; cannot be wedged)
# ===========================================================================

# (stage, per-stage budget s once the child is warm, skip below this budget)
# Cheap stages run first so a cold warmup degrades the tail, not the count;
# the two expensive building stages precede graph (VERDICT priority).
_BASE_PLAN = [
    ("headline", 150, 40),
    ("ekf", 180, 50),
    ("kernels", 170, 50),
    ("oracle", 60, 25),
    ("pf10240", 100, 35),
    ("fidelity", 110, 35),
    ("scaling_tpu", 90, 35),
    # 300 s: measured 223 s in a cache-cold process (the PF-chunk +
    # closure programs all pay first-call executable loads through the
    # tunnel); the round-5 session runs pre-warmed .jax_cache
    ("building_pf", 300, 80),
    ("building_graph", 200, 70),
    ("building", 190, 60),
    ("graph", 170, 60),
    ("submap", 120, 50),
    ("streaming", 110, 35),
    ("scaling", 130, 45),
]


def _plan_order() -> list:
    """Priority rotation (VERDICT r4 weak #4): stages that missed the LAST
    driver artifact (timeout / skipped / failed / never recorded) run right
    after the headline, so a starved stage cannot starve twice in a row.
    Deterministic from the newest committed BENCH_r*.json — the runner,
    watcher, and every recovery child compute the same order."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    arts = sorted(glob.glob(os.path.join(here, "BENCH_r[0-9]*.json")))
    missing: set = set()
    if arts:
        try:
            with open(arts[-1]) as f:
                data = json.load(f)
            # driver artifacts wrap the bench line under "parsed"
            stages = ((data.get("parsed") or data) or {}).get("stages", {})
            missing = {n for n, _, _ in _BASE_PLAN
                       if not str(stages.get(n, "missing")).startswith("ok")}
        except (OSError, ValueError, AttributeError):
            pass
    head = [e for e in _BASE_PLAN if e[0] == "headline"]
    hot = [e for e in _BASE_PLAN
           if e[0] != "headline" and e[0] in missing]
    rest = [e for e in _BASE_PLAN
            if e[0] != "headline" and e[0] not in missing]
    return head + hot + rest


PLAN = _plan_order()
# The axon relay "parks" after minutes of idleness; un-parking has been
# measured at 89-300+ s for the first dispatch (cold mornings ~205 s, after
# a mid-dispatch SIGKILL up to 15+ min). 320 s catches most cold starts
# while still leaving the reduced-count CPU fallback enough room.
WARMUP_BUDGET = 320.0

CPU_ONLY_STAGES = {"scaling"}   # always on the virtual CPU mesh


def _cpu_env(env: dict) -> dict:
    env = dict(env)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # must not claim the TPU
    env.pop("BENCH_AXON_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_CPU_FALLBACK"] = "1"
    return env


def _tpu_env(env: dict) -> dict:
    """Restore the stashed axon pool var for THE one TPU child."""
    env = dict(env)
    if env.get("BENCH_AXON_IPS"):
        env["PALLAS_AXON_POOL_IPS"] = env.pop("BENCH_AXON_IPS")
    return env


class _Child:
    """A stage-runner child whose stdout lines stream into a queue."""

    def __init__(self, stages: list, env: dict, here: str):
        import queue

        self.proc = subprocess.Popen(
            [sys.executable, os.path.join(here, "bench.py"),
             "--stages", ",".join(stages)],
            env=env, cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
            start_new_session=True)   # own pgid: killable as a group
        self.q: "queue.Queue" = queue.Queue()

        def read(stream, tag):
            for ln in iter(stream.readline, ""):
                self.q.put((tag, ln.rstrip("\n")))
            self.q.put((tag, None))

        for stream, tag in ((self.proc.stdout, "out"),
                            (self.proc.stderr, "err")):
            threading.Thread(target=read, args=(stream, tag),
                             daemon=True).start()

    def kill(self) -> None:
        try:
            os.killpg(self.proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass

    def wait(self):
        return self.proc.wait()


def main_runner() -> None:
    """The driver-invoked process. Its interpreter boot already claimed the
    TPU (sitecustomize), so it runs the stages itself and delegates artifact
    ownership to a claim-free watcher child that inherits stdout."""
    here = os.path.dirname(os.path.abspath(__file__))
    wenv = dict(os.environ)
    pool = wenv.pop("PALLAS_AXON_POOL_IPS", None)
    if pool:
        wenv["BENCH_AXON_IPS"] = pool   # for a recovery TPU child
    wenv["BENCH_DEADLINE_TS"] = repr(_DEADLINE)
    watcher = subprocess.Popen(
        [sys.executable, os.path.join(here, "bench.py"),
         "--watch", str(os.getpid())],
        env=wenv, cwd=here, stdin=subprocess.PIPE, text=True)
    main_stages = [n for n, _, _ in PLAN if n not in CPU_ONLY_STAGES]
    try:
        run_child(main_stages, out=watcher.stdin)
        watcher.stdin.write("DONE\n")
        watcher.stdin.flush()
        watcher.stdin.close()
    except (BrokenPipeError, ValueError):
        pass
    # the watcher prints the single JSON artifact line to the shared stdout;
    # exiting before it finishes would race the driver's read of that line
    watcher.wait()


def main_watch(runner_pid: int) -> None:
    import queue

    result: dict = {
        "metric": "bench incomplete (no stage finished)",
        "value": 0.0,
        "unit": "scans/s",
        "vs_baseline": None,
        "vs_local_oracle": None,
        "backend": None,
        "kernels": {},
        "secondary": {},
        "stages": {},
    }
    done = threading.Event()

    def finish(partial: bool = False) -> None:
        if done.is_set():
            return
        done.set()
        if partial:
            result["partial"] = True
        hl = result.pop("_headline", None)
        if hl:
            result["metric"] = hl["metric"]
            result["value"] = hl["value"]
            result["vs_baseline"] = round(
                hl["value"] / C_BASELINE_SCANS_PER_SEC, 2)
        orc = result["secondary"].get("oracle_naive_local")
        if orc and result["value"]:
            result["vs_local_oracle"] = round(
                result["value"] / orc["scans_per_sec"], 1)
        print(json.dumps(result), flush=True)

    def on_deadline() -> None:
        # fires even if a subprocess wait is stuck; prints partials and exits
        time.sleep(max(_DEADLINE - 8.0 - time.time(), 0.0))
        if not done.is_set():
            _log("watchdog: deadline reached, dumping partial artifact")
            finish(partial=True)
            os._exit(0)

    threading.Thread(target=on_deadline, daemon=True).start()

    def on_signal(signum, frame):
        _log(f"signal {signum}: dumping partial artifact")
        finish(partial=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    here = os.path.dirname(os.path.abspath(__file__))
    budgets = {name: b for name, b, _ in PLAN}
    need = {name: n for name, _, n in PLAN}
    # the scaling stage runs in its own always-CPU child at the end
    main_stages = [n for n, _, _ in PLAN if n not in CPU_ONLY_STAGES]

    def consume(src, stages: list, warmup_budget: float,
                label_backend: bool = True) -> tuple:
        """Drain one stage source (the runner's pipe or a recovery child).

        Returns (remaining, warmup_failed): the stages that did NOT finish
        when the source had to be killed ([] when done / exited), and
        whether the kill happened before the source's warmup dispatch ever
        completed (= device unusable, not a slow stage).
        ``label_backend=False`` keeps this source's backend out of the
        artifact's top-level label (the concurrent CPU scaling child must
        not claim the backend field before the TPU runner warms up)."""
        pending = list(stages)
        expected_done = time.time() + warmup_budget
        current = None            # stage the source announced it started
        warmed = False
        while pending:
            timeout = min(expected_done, _DEADLINE - 10.0) - time.time()
            if timeout <= 0:
                # The RUNNER is NOT killed here: `python bench.py` exiting
                # before the watcher prints the artifact races the driver's
                # read of stdout. A wedged runner parks harmlessly in its
                # stuck dispatch; the watcher kills it AFTER finish().
                if not getattr(src, "defer_kill", False):
                    src.kill()
                if not warmed:
                    _log("source never completed its warmup dispatch; "
                         "device unusable")
                    return pending, True
                victim = current or pending[0]
                _log(f"{victim}: stage budget exhausted, abandoning source")
                result["stages"][victim] = "timeout"
                return [n for n in pending if n != victim], False
            try:
                tag, ln = src.q.get(timeout=min(timeout, 5.0))
            except queue.Empty:
                continue
            if ln is None:
                if tag != "out":
                    continue
                if getattr(src, "clean_done", False):
                    # runner finished and closed the pipe after DONE
                    return [], False
                rc = src.wait()
                _log(f"source exited rc={rc} with {len(pending)} "
                     f"stages pending")
                return pending, not warmed
            if tag == "err":
                _log(f"  child| {ln}")
                continue
            if ln.strip() == "DONE":
                src.clean_done = True
                # stages still pending at DONE (skipped by the child's own
                # deadline guard) go back to the caller so the recovery
                # phase can retry them under the watcher's own budget
                # accounting (ADVICE r4: they were marked 'not run' and
                # never retried even with budget remaining)
                for name in pending:
                    result["stages"].setdefault(name, "not run")
                return list(pending), False
            if not ln.startswith("STAGE_RESULT="):
                continue
            msg = json.loads(ln[len("STAGE_RESULT="):])
            stage = msg["stage"]
            if stage == "__warmup__":
                w = msg["result"]
                warmed = True
                if label_backend and result.get("backend") is None:
                    result["backend"] = w["backend"]
                _log(f"source warm: backend={w['backend']} first dispatch "
                     f"{w['first_dispatch_s']}s")
                expected_done = time.time() + budgets[pending[0]]
                continue
            if msg.get("start"):
                current = stage
                expected_done = time.time() + budgets.get(stage, 120)
                continue
            if stage in pending:
                pending.remove(stage)
            current = None
            if "error" in msg:
                result["stages"][stage] = f"failed ({msg['error'][:120]})"
                _log(f"{stage}: FAILED {msg['error'][:200]}")
            else:
                res = msg["result"]
                if "headline" in res:
                    result["_headline"] = res["headline"]
                result["secondary"].update(res.get("secondary", {}))
                result["kernels"].update(res.get("kernels", {}))
                result["stages"][stage] = f"ok ({msg.get('seconds', 0):.0f}s)"
                _log(f"{stage}: ok in {msg.get('seconds', 0):.0f}s")
            if pending:
                expected_done = time.time() + budgets[pending[0]]
        return [], False

    # --- phase 0: the CPU-only scaling stage runs CONCURRENTLY with the
    # TPU runner from the start — it never touches the chip (env stripped,
    # 8-virtual-device CPU mesh), and serialized after everything else it
    # missed the artifact in two of four rounds (VERDICT r4 missing #1).
    senv = _cpu_env(dict(os.environ))
    senv.pop("BENCH_CPU_FALLBACK", None)
    senv["BENCH_DEADLINE_TS"] = repr(_DEADLINE)
    senv["XLA_FLAGS"] = (senv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8")
    scaling_thread = threading.Thread(
        target=consume, args=(_Child(["scaling"], senv, here), ["scaling"]),
        kwargs={"warmup_budget": 120.0, "label_backend": False}, daemon=True)
    scaling_thread.start()

    # --- phase 1: the runner (this watcher's parent) streams over stdin
    pending = list(main_stages)
    runner_src = _RunnerSource(runner_pid)
    remaining, warmup_failed = consume(runner_src, pending, WARMUP_BUDGET)
    # clean DONE = the runner finished (possibly skipping tail stages by
    # its own deadline guard) — it blocks in watcher.wait() until we exit
    runner_healthy = runner_src.clean_done or not remaining

    # --- phase 2: CPU recovery children for whatever the runner left
    # behind. Always CPU: a fresh TPU child would queue behind the (possibly
    # still wedged, deliberately unkilled) runner's grant for minutes.
    attempts = 0
    env = dict(os.environ)
    while remaining and attempts < 3:
        remaining = [n for n in remaining if _left() > need[n]]
        if not remaining:
            break
        attempts += 1
        if "BENCH_CPU_FALLBACK" not in env:
            why = ("deadline-skip recovery" if runner_healthy
                   else "cpu-fallback after wedge")
            _log(f"recovering remaining stages on CPU ({why})")
            result["backend"] = (
                f"{result.get('backend') or 'tpu-unreachable'}; {why}")
            env = _cpu_env(env)
        child_env = dict(env)
        child_env["BENCH_DEADLINE_TS"] = repr(_DEADLINE)
        remaining, _wf = consume(
            _Child(remaining, child_env, here), remaining, 60.0)

    for name in main_stages:
        result["stages"].setdefault(name, "skipped (deadline)")

    # --- phase 3: join the concurrent scaling child (phase 0)
    scaling_thread.join(timeout=max(_DEADLINE - 12.0 - time.time(), 0.0))
    if scaling_thread.is_alive():
        result["stages"].setdefault("scaling", "timeout (concurrent child)")

    finish()
    # Only NOW may a wedged runner die: the artifact line is flushed to the
    # shared stdout, so ending `python bench.py` cannot race the driver's
    # read. In the healthy path (DONE received) the runner is blocked in
    # watcher.wait() and exits 0 by itself right after us — no kill, or
    # every clean run would report rc 137.
    sys.stdout.flush()
    if not runner_healthy:
        runner_src.kill()


class _RunnerSource:
    """Adapter: the runner's STAGE_RESULT stream arrives on OUR stdin."""

    def __init__(self, runner_pid: int):
        import queue

        self.pid = runner_pid
        self.clean_done = False
        self.defer_kill = True   # see consume(): killed only after finish()
        self.q: "queue.Queue" = queue.Queue()

        def read():
            for ln in sys.stdin:
                self.q.put(("out", ln.rstrip("\n")))
            self.q.put(("out", None))

        threading.Thread(target=read, daemon=True).start()

    def kill(self) -> None:
        try:
            os.kill(self.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass

    def wait(self) -> str:
        return "runner"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None, choices=sorted(STAGES))
    ap.add_argument("--stages", default=None,
                    help="comma-separated stage list (recovery-child mode)")
    ap.add_argument("--watch", default=None, type=int, metavar="RUNNER_PID",
                    help="watcher mode: own the artifact, monitor the runner")
    args = ap.parse_args()
    if args.watch is not None:
        main_watch(args.watch)
    elif args.stages:
        run_child(args.stages.split(","))
    elif args.stage:
        run_child([args.stage])
    else:
        main_runner()
