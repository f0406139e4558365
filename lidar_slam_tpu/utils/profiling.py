"""Profiling and cost accounting.

The reference profiled externally ("Very Sleepy" sampling; dissertation p.33
found EDT = 89.98% of runtime) and timed with clock() brackets (main.c:826,
971). TPU equivalents:

- ``stage_timer``: wall-clock brackets with device sync (honest step timing);
- ``trace``: jax.profiler context writing a TensorBoard/perfetto trace;
- ``cost_analysis``: XLA's FLOP/byte estimates for a jitted function — the
  "speed-of-light" accounting used to sanity-check kernel efficiency.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage (syncs the device on exit)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.samples[name].append(dt)

    def steady_state_total(self) -> float:
        """Total wall time with each stage's FIRST call re-priced at the
        median of its remaining calls — the first call of every jitted
        program carries its compile / executable load (on a remote-attached
        chip that load dominates), so this estimates the warm steady state
        from a single run without paying for a second one."""
        import statistics

        total = 0.0
        for name, xs in self.samples.items():
            if len(xs) > 1:
                total += sum(xs[1:]) + statistics.median(xs[1:])
            else:
                total += sum(xs)
        return total

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = [f"{'stage':24s} {'total s':>9s} {'calls':>7s} {'share':>7s}"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:24s} {t:9.3f} {self.counts[name]:7d} "
                         f"{100 * t / total:6.1f}%")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA cost analysis of ``jax.jit(fn)`` on the given example args."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return dict(costs or {})


def scan_slope_ms(fn, make_args, l1: int = 64, l2: int = 1024,
                  reps: int = 3) -> float:
    """Per-call ms of a jittable op as the slope of a chained ``lax.scan``
    between two lengths — the only honest microbenchmark on a remote-attached
    TPU (identical dispatches dedupe; every dispatch has a ~30-140 ms floor;
    block_until_ready does not block). ``fn(acc, *args)`` must thread the f32
    carry into its inputs value-preservingly and return an array; ``make_args``
    must return fresh inputs per call."""
    import statistics

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
    float(j1(*make_args(k)))
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


def pf_stage_profile(cfg=None, n_scans: int = 120, seed: int = 0) -> dict:
    """Per-stage ms breakdown of one particle-filter step (the analog of the
    reference's fig. 9 profile that justified accelerating the EDT).

    Runs each stage of ``models/fastslam.pf_step`` as its own chained-scan
    microbenchmark on representative museum-dataset state: raster+crop, EDT,
    correlation-volume build, per-particle cascade lookup, systematic
    resampling, and estimate refinement. Returns {stage: ms}."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
    from lidar_slam_tpu.core import gridmap, se2, sensor
    from lidar_slam_tpu.io import dataset
    from lidar_slam_tpu.models import fastslam
    from lidar_slam_tpu.ops import correlative
    from lidar_slam_tpu.ops import edt as edt_ops

    if cfg is None:
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, particles=ParticleConfig(n_particles=1024))
    pc, g, mc = cfg.particles, cfg.grid, cfg.matcher
    p = pc.n_particles

    # representative state: run the PF a short distance into the dataset
    ranges, _, _ = dataset.ensure_dataset(n_scans=n_scans, seed=seed)
    _, state = fastslam.run_pf(ranges, cfg, seed=seed)
    angles = jnp.asarray(sensor.beam_angles(cfg.lidar))
    scan = sensor.read_scan(jnp.asarray(ranges[-1]), angles, cfg.lidar)
    rng = np.random.default_rng(seed)

    def jitter(k):
        return jnp.float32(1e-6 * (k + 1))

    out = {}

    # --- raster + local-map crop (keyframe path)
    def raster(acc, pose):
        wx, wy = se2.transform_ref(scan.x, scan.y, pose + acc * 0.0)
        local = gridmap.extract_local_map(state.pmap, wx, wy, scan.valid,
                                          g.border_size)
        _, fine = gridmap.rasterize_dual(local, g)
        return fine.occ.astype(jnp.float32)

    pose0 = state.pmap.keyframe_pose
    out["raster_crop"] = scan_slope_ms(
        raster, lambda k: (pose0 + jitter(k),), l2=512)

    # --- EDT (keyframe path)
    occ = state.fine.occ

    def edt_fn(acc, o):
        return edt_ops.edt(jnp.logical_xor(o, acc > 1e30), int(g.max_dist_px))

    out["edt"] = scan_slope_ms(
        edt_fn, lambda k: (jnp.roll(occ, k, axis=0),), l2=2048)

    # --- correlation-volume build (every step)
    base0 = jnp.mean(state.poses, axis=0)

    def vol(acc, base):
        return correlative.build_score_volume(
            state.fine_metric, state.fine, scan.x, scan.y, scan.valid,
            base + acc * 0.0, n_theta=pc.vol_theta_bins, theta_step=mc.fine_r,
            half=pc.vol_half).scores

    out["volume_build"] = scan_slope_ms(
        vol, lambda k: (base0 + jitter(k),), l2=2048)

    # --- per-particle trilinear lookup (every step)
    vols = correlative.build_cascade(
        state.fine_metric, state.fine, scan.x, scan.y, scan.valid, base0,
        n_theta=pc.vol_theta_bins, theta_step=mc.fine_r, half=pc.vol_half,
        levels=pc.cascade_levels)

    def lookup(acc, poses):
        d, _ = correlative.lookup_cascade(vols, poses + acc * 0.0)
        return d

    poses0 = state.poses
    out["lookup_1024"] = scan_slope_ms(
        lookup, lambda k: (poses0 + jitter(k),), l2=2048)

    # --- systematic resampling (every step)
    def resample(acc, logw):
        return fastslam.systematic_resample(
            jax.random.PRNGKey(0), logw + acc * 0.0).astype(jnp.float32)

    logw0 = jnp.asarray(rng.normal(size=p), jnp.float32)
    out["resample_1024"] = scan_slope_ms(
        resample, lambda k: (logw0 + jitter(k),), l2=2048)

    # --- whole step, for the unaccounted remainder
    def whole(acc, r):
        st2, pose = fastslam.pf_step(state, r + acc * 0.0, cfg, angles)
        return pose

    r0 = jnp.asarray(ranges[-1])
    out["whole_step"] = scan_slope_ms(
        whole, lambda k: (r0 + jitter(k),), l2=512)
    return out
