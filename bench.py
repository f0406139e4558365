"""Headline benchmark: particle-filter SLAM throughput on one TPU chip.

Headline metric (BASELINE.json): scans/sec/chip at 1k particles on the
1000-scan museum dataset, vs the reference C pipeline's 3.95 scans/s
(253.28 s / 1000 scans on a Ryzen 7 6800U, dissertation p.33 §10).

Beyond the headline, every number the README/PARITY quote is re-measured
here so it cannot silently rot (VERDICT r1 "what's missing" #2):

- ``vs_local_oracle``: apples-to-apples baseline — the clean-room C++ oracle
  with the reference's naive EDT timed on THIS host;
- ``secondary``: fidelity mode, PF-10240, scan-driven EKF-FastSLAM, graph
  SLAM with loop closures, and the building-scale hard workload (60x45 m,
  3800 scans — io/simulate.building_world) with its oracle-parity check;
- ``kernels``: per-kernel ms / FLOPs / bytes / fraction-of-roofline for the
  Pallas EDT (vs the reference's 0.4 ms per 400² HLS kernel, dissertation
  p.46 fig. 14) and the correlation-volume kernel, with a compiled-on-TPU
  equality check against the jnp oracles (VERDICT r1 #4).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N, ...}

Measurement methodology (round 3; the round-1/2 numbers were poisoned by
the remote-attached "axon" TPU path and are NOT comparable):
- ``block_until_ready`` does not block on this backend — every timing
  forces a host fetch;
- a repeated identical (program, inputs) dispatch can be served from cache
  or hang — every timed dispatch perturbs its inputs;
- each dispatch carries a ~140 ms round-trip/transfer floor — model runs
  subtract a measured trivial-program floor and report the median of 3
  runs; kernels use the slope of a chained lax.scan between two lengths.

Stages run inside a global deadline (the round driver allows ~590 s); each
stage is individually fenced so a slow compile degrades the artifact instead
of zeroing it.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

C_BASELINE_SCANS_PER_SEC = 3.95  # reference: 1000 scans / 253.28 s
REF_HLS_EDT_MS_400 = 0.4         # dissertation p.46 fig. 14 (400x400)

# TPU v5e (v5 lite) single-chip peaks for the roofline denominator.
PEAK_F32_FLOPS = 98.3e12   # MXU f32 ~ bf16/2 (197 TFLOP/s bf16)
PEAK_HBM_BW = 819e9        # bytes/s

_T0 = time.time()
_DEADLINE = _T0 + 520.0    # leave ~70 s of the driver's 590 s for slack


def _left() -> float:
    return _DEADLINE - time.time()


def _log(msg: str) -> None:
    print(f"[{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr)


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
    path = np.asarray(runner(0.0)[0])
    _log(f"{label}: compile+first run {time.time() - t0:.1f}s")
    ts = []
    for k in range(reps):
        t0 = time.perf_counter()
        path = np.asarray(runner(np.float32(1e-5 * (k + 1)))[0])
        ts.append(time.perf_counter() - t0)
    dev = max(statistics.median(ts) - floor_s, 1e-9)
    err = float(ate(path, gt))
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


def bench_kernels(out: dict) -> None:
    """Per-kernel ms/FLOPs/bytes/roofline + compiled equality vs jnp oracle."""
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.ops import correlative, edt
    from lidar_slam_tpu.utils.profiling import cost_analysis

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

    # acc >= 0 always, so xor-ing with (acc > 1e30) is the identity — but XLA
    # cannot prove it, which pins the kernel inside the timing loop
    ms = _kernel_ms(lambda acc, o: edt_fn(jnp.logical_xor(o, acc > 1e30)),
                    lambda k: (jnp.asarray(
                        np.random.default_rng(100 + k).random((400, 400))
                        < 0.02),))
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
    _log(f"edt_400: {ms:.3f} ms  exact={edt_exact}  "
         f"(ref HLS 0.4 ms -> {REF_HLS_EDT_MS_400 / ms:.1f}x)")

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
        vol_args, l2=2048)
    costs = cost_analysis(vol_fn, metric, sx, sy, sv, base)
    flops = float(costs.get("flops", 0.0))
    bytes_ = float(costs.get("bytes accessed", 0.0))
    sol_s = max(flops / PEAK_F32_FLOPS, bytes_ / PEAK_HBM_BW)
    out["volume_7x13x13"] = {
        "ms": round(ms_v, 4), "flops": flops, "bytes": bytes_,
        "roofline_frac": round(sol_s / (ms_v * 1e-3), 4) if ms_v > 0 else None,
    }
    _log(f"volume: {ms_v:.3f} ms")


def main() -> None:
    import jax

    # persistent compile cache: repeated bench invocations skip the ~2 min
    # XLA compile of the whole-run scan program
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from lidar_slam_tpu import native
    from lidar_slam_tpu.config import (BUILDING_CONFIG, BUILDING_WIDE_CONFIG,
                                       DEFAULT_CONFIG, ParticleConfig)
    from lidar_slam_tpu.io import dataset, simulate
    from lidar_slam_tpu.models import fastslam, scan_matcher
    from lidar_slam_tpu.utils.metrics import ate, max_abs_err

    n_scans = 1000
    ranges, gt, _ = dataset.ensure_dataset(n_scans=n_scans, seed=0)
    _log(f"devices: {jax.devices()}")

    secondary: dict = {}
    kernels: dict = {}

    # ---- headline: PF-1024, museum-1000 --------------------------------------
    floor = _dispatch_floor(ranges)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, particles=ParticleConfig(n_particles=1024))
    try:
        sps, err = _timed_run(lambda eps: fastslam.run_pf(ranges + eps, cfg),
                              "pf-1024", gt, n_scans, floor)
        metric = (f"scans/sec/chip, 1024 particles, museum-1000 "
                  f"(ATE {err:.3f} m)")
    except Exception as e:  # compile-helper stalls etc.: report SOMETHING
        _log(f"particle filter bench failed ({e!r}); falling back to fidelity")
        sps, err = _timed_run(
            lambda eps: scan_matcher.run_scan(ranges + eps, DEFAULT_CONFIG),
            "fidelity", gt, n_scans, floor)
        metric = f"scans/sec/chip, fidelity mode, museum-1000 (ATE {err:.3f} m)"

    # ---- local apples-to-apples baseline: naive-EDT C++ oracle, this host ----
    vs_local = None
    try:
        n_o = 200
        t0 = time.time()
        native.run_oracle(ranges[:n_o], use_naive_edt=True)
        oracle_sps = n_o / (time.time() - t0)
        secondary["oracle_naive_local"] = {"scans_per_sec": round(oracle_sps, 2)}
        vs_local = round(sps / oracle_sps, 1)
        _log(f"local naive-EDT oracle: {oracle_sps:.1f} scans/s")
    except Exception as e:
        _log(f"local oracle baseline failed: {e!r}")

    # ---- kernel-level numbers -------------------------------------------------
    if _left() > 120:
        try:
            bench_kernels(kernels)
        except Exception as e:
            _log(f"kernel bench failed: {e!r}")

    # ---- secondary configs, in priority order, deadline-fenced ---------------
    def stage(name, need_s, fn):
        if _left() < need_s:
            _log(f"skip {name} (deadline: {_left():.0f}s left)")
            return
        try:
            fn()
        except Exception as e:
            _log(f"{name} failed: {e!r}")

    def s_fidelity():
        f_sps, f_err = _timed_run(
            lambda eps: scan_matcher.run_scan(ranges + eps, DEFAULT_CONFIG),
            "fidelity-museum", gt, n_scans, floor)
        cpath, _ = native.run_oracle(ranges)
        jpath, _ = scan_matcher.run_scan(ranges, DEFAULT_CONFIG)
        secondary["fidelity_museum1000"] = {
            "scans_per_sec": round(f_sps, 1), "ate": round(f_err, 4),
            "bit_exact_vs_oracle": bool(
                max_abs_err(np.asarray(jpath), cpath) == 0.0)}

    def s_building():
        b_ranges, b_gt, _ = dataset.ensure_dataset(
            n_scans=simulate.BUILDING_N_SCANS, world="building")
        n_b = b_ranges.shape[0]
        b_floor = _dispatch_floor(b_ranges)
        # (a) parity config (+-1 window): diverges exactly like the C oracle
        f_sps, f_err = _timed_run(
            lambda eps: scan_matcher.run_scan(b_ranges + eps, BUILDING_CONFIG),
            "fidelity-building", b_gt, n_b, b_floor)
        cpath, _ = native.run_oracle_cfg(b_ranges, BUILDING_CONFIG)
        jpath, _ = scan_matcher.run_scan(b_ranges, BUILDING_CONFIG)
        secondary["fidelity_building3800"] = {
            "scans_per_sec": round(f_sps, 1), "ate": round(f_err, 4),
            "bit_exact_vs_oracle": bool(
                max_abs_err(np.asarray(jpath), cpath) == 0.0)}
        # (b) solved config (+-2 correlative window): the accuracy headline
        # on the hard workload the reference's fixed window cannot track
        w_sps, w_err = _timed_run(
            lambda eps: scan_matcher.run_scan(b_ranges + eps,
                                              BUILDING_WIDE_CONFIG),
            "wide-building", b_gt, n_b, b_floor)
        secondary["building3800_wide"] = {
            "scans_per_sec": round(w_sps, 1), "ate": round(w_err, 4)}
        bcfg = dataclasses.replace(
            BUILDING_CONFIG, particles=dataclasses.replace(
                BUILDING_CONFIG.particles, n_particles=1024))
        p_sps, p_err = _timed_run(
            lambda eps: fastslam.run_pf(b_ranges + eps, bcfg),
            "pf1024-building", b_gt, n_b, b_floor)
        secondary["pf1024_building3800"] = {
            "scans_per_sec": round(p_sps, 1), "ate": round(p_err, 4)}

    def s_pf10240():
        big = dataclasses.replace(
            DEFAULT_CONFIG, particles=ParticleConfig(n_particles=10240))
        p_sps, p_err = _timed_run(lambda eps: fastslam.run_pf(ranges + eps, big),
                                  "pf-10240", gt, n_scans, floor)
        secondary["pf10240_museum1000"] = {
            "scans_per_sec": round(p_sps, 1), "ate": round(p_err, 4)}

    def s_ekf():
        from lidar_slam_tpu.models import ekf_slam

        ecfg = ekf_slam.long_tour_config(1024)
        e_sps, e_err = _timed_run(
            lambda eps: ekf_slam.run_ekf_slam_scan(
                ranges + eps, ecfg, lidar_cfg=DEFAULT_CONFIG.lidar, seed=0,
                max_range=ekf_slam.LONG_TOUR_MAX_RANGE),
            "ekf-1024", gt, n_scans, floor)
        secondary["ekf1024_museum1000"] = {
            "scans_per_sec": round(e_sps, 1), "ate": round(e_err, 4)}

    def s_graph():
        from lidar_slam_tpu.models.graph_slam import GraphSlam

        g_ranges, g_gt = simulate.generate_dataset(
            n_scans=700, seed=0, waypoints=simulate.LOOP_WAYPOINTS)
        gs = GraphSlam(DEFAULT_CONFIG)
        t0 = time.time()
        gs.run(g_ranges)                      # warm (compiles)
        _log(f"graph-700: warm run {time.time() - t0:.1f}s")
        gs = GraphSlam(DEFAULT_CONFIG)
        t0 = time.time()
        path, _ = gs.run(g_ranges + np.float32(1e-5))
        dt = time.time() - t0
        secondary["graph_700loop"] = {
            "scans_per_sec": round(699 / dt, 1),
            "ate": round(float(ate(np.asarray(path), g_gt)), 4),
            "closures": len(gs.closures)}
        _log(f"graph-700: {699 / dt:.1f} scans/s wall, "
             f"{len(gs.closures)} closures")

    def s_scaling():
        """Shard-count sweep of the sharded PF step (BASELINE config 4).

        Real multi-chip hardware is unavailable in this container (one v5e
        chip behind a tunnel), so the sweep runs on an 8-virtual-device CPU
        mesh in a subprocess: it validates that the pjit/shard_map program
        compiles AND executes at 1/2/4/8 particle shards. Labeled as
        program validation — the real single-chip scans/s is the headline;
        ICI scaling efficiency needs a real slice."""
        import os
        import subprocess

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # must not claim the TPU
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
        code = (
            "import json\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from lidar_slam_tpu.io import dataset\n"
            "from lidar_slam_tpu.parallel import multihost\n"
            "r, _, _ = dataset.ensure_dataset(n_scans=40, seed=0)\n"
            "rep = multihost.scaling_report(r, n_particles=512,\n"
            "    shard_counts=(1, 2, 4, 8), n_scans=24)\n"
            "print('SCALING=' + json.dumps({str(k): round(v, 2)\n"
            "    for k, v in rep.items()}))\n")
        out = subprocess.run(["python", "-c", code], env=env, cwd="/root/repo",
                             capture_output=True, text=True, timeout=_left())
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("SCALING=")]
        if not line:
            raise RuntimeError(f"scaling subprocess failed: {out.stderr[-500:]}")
        rep = json.loads(line[0][len("SCALING="):])
        secondary["scaling_virtual_mesh"] = {
            "note": "8-virtual-device CPU mesh program validation, "
                    "scans/s per shard count (not ICI scaling)",
            "scans_per_sec": rep}
        _log(f"scaling (virtual mesh): {rep}")

    # Cheap required BASELINE configs first; the expensive graph backend
    # runs last so a slow compile degrades optional entries, not required
    # ones (round-2 lost pf10240 to the graph stage's 270 s).
    stage("fidelity", 90, s_fidelity)
    stage("pf10240", 60, s_pf10240)
    stage("building", 150, s_building)
    stage("ekf", 80, s_ekf)
    stage("scaling", 70, s_scaling)
    stage("graph", 80, s_graph)

    print(json.dumps({
        "metric": metric,
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / C_BASELINE_SCANS_PER_SEC, 2),
        "vs_local_oracle": vs_local,
        "kernels": kernels,
        "secondary": secondary,
    }))


if __name__ == "__main__":
    main()
