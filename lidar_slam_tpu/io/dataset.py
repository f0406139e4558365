"""Dataset loading/saving.

Format parity with the reference: one scan per CSV row, 1079 comma-separated
float ranges (read by ``readDatasetLineByLine``, main.c:22-30; served row-wise
by ``Lidar_server.py``). A fast ``.npz`` cache sits beside the CSV since the
text parse is pure overhead for repeated runs (the native C++ reader in
``lidar_slam_tpu/native`` covers the production ingest path).
"""

from __future__ import annotations

import os

import numpy as np

DEFAULT_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def save_csv(path: str, ranges: np.ndarray) -> None:
    np.savetxt(path, ranges, fmt="%.6f", delimiter=",")


def load_csv(path: str) -> np.ndarray:
    return np.loadtxt(path, delimiter=",", dtype=np.float32)


def ensure_dataset(n_scans: int = 1000, data_dir: str | None = None,
                   seed: int = 0, world: str = "museum"):
    """Synthesize (or load cached) dataset + ground truth.

    world: 'museum' (20x15 m, round-1 validation fixture) or 'building'
    (60x45 m hard workload, io/simulate.building_world — pair it with
    ``config.BUILDING_CONFIG``). Returns (ranges (T,1079) f32,
    gt_poses (T,3) f32, csv_path).
    """
    from lidar_slam_tpu.io import simulate

    data_dir = data_dir or os.path.abspath(DEFAULT_DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    tag = f"{world}_v2_{n_scans}_s{seed}"  # bump suffix when the generator changes
    npz = os.path.join(data_dir, tag + ".npz")
    csv = os.path.join(data_dir, tag + ".csv")
    if os.path.exists(npz):
        blob = np.load(npz)
        return blob["ranges"], blob["gt"], csv
    if world == "museum":
        ranges, gt = simulate.generate_dataset(n_scans=n_scans, seed=seed)
    elif world == "building":
        ranges, gt = simulate.generate_dataset(
            n_scans=n_scans, seed=seed, speed=simulate.BUILDING_SPEED,
            waypoints=simulate.BUILDING_WAYPOINTS,
            world=simulate.building_world())
    else:
        raise ValueError(f"unknown world {world!r}")
    np.savez_compressed(npz, ranges=ranges, gt=gt)
    if not os.path.exists(csv):
        save_csv(csv, ranges)
    return ranges, gt, csv
