"""Real multi-process jax.distributed run (VERDICT r1 item 3).

Round 1 validated sharding only on a single-process virtual mesh;
``parallel/multihost.initialize`` had never crossed a process boundary. Here
2 OS processes (4 virtual CPU devices each) form one 8-device global mesh via
``jax.distributed`` over 127.0.0.1 — the DCN code path — run 12 sharded PF
steps, and the trajectory must match the single-process 8-device run.

The reference's distribution was a 3-process HTTP chain
(Lidar_server.py / ESP32_Server.c / esp32_edge.c); this is its TPU-native
equivalent: one logical program spanning processes, collectives instead of
sockets.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, resample: bool) -> np.ndarray:
    port = _free_port()
    out = os.path.join(tmp_path, "mp_path.npy")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
    env["MP_WORKER_RESAMPLE"] = "1" if resample else "0"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return np.load(out)


def _single_process_reference(resample: bool) -> np.ndarray:
    import importlib.util

    spec = importlib.util.spec_from_file_location("_mp_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return np.asarray(mod.run_case(resample=resample))


@pytest.mark.slow
def test_two_process_pf_matches_single_process(tmp_path):
    """Deterministic contract: with resampling off, the 2-process DCN run
    and the single-process run compute the same program up to collective
    reduction order — trajectories must match to float tolerance."""
    mp_path = _run_workers(tmp_path, resample=False)
    sp_path = _single_process_reference(resample=False)
    np.testing.assert_allclose(mp_path, sp_path, rtol=0.0, atol=1e-5)


@pytest.mark.slow
def test_two_process_pf_with_resampling_tracks(tmp_path):
    """Full-pipeline contract: with resampling on, a one-ulp weight
    difference from cross-process reduction order can legally flip a
    selection and move the estimate by ~a pixel or two, so exact equality
    is not the spec — both topologies must produce a coherent trajectory
    within estimator noise of each other."""
    mp_path = _run_workers(tmp_path, resample=True)
    sp_path = _single_process_reference(resample=True)
    assert mp_path.shape == sp_path.shape
    # identical until the first resampling event…
    np.testing.assert_allclose(mp_path[:2], sp_path[:2], rtol=0, atol=1e-5)
    # …then bounded by estimator noise, not divergence (a lost filter is
    # meters off within a few scans)
    diff = np.hypot(*(mp_path[:, :2] - sp_path[:, :2]).T)
    assert float(diff.max()) < 0.2, diff
