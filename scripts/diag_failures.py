"""Failure clustering for a 500-episode benchmark npz (VERDICT r2 weak #2).

Regenerates the deterministic seed-41 start distribution, joins it with the
per-episode outcomes in the results npz, and clusters the failures by start
geometry: optical-axis spin angle, residual spin after the 4-way rotation
search, sampling-box offset, and height.  Pure host-side numpy analysis.

Reference geometry: spins linspace(-120, 120) per circle
(vitvs_v2.py:1295-1342); rotation search {0,90,180,270} deg about optical x
(vitvs_v2.py:1151-1189).

Usage: python scripts/diag_failures.py artifacts/results_tpu500_dino_standard.npz
"""

import os
import sys

import numpy as np
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(path):
    from vitvs_tpu.harness.samplers import generate_episode_starts
    from vitvs_tpu.io_bridge.config import VSConfig

    d = np.load(path, allow_pickle=True)
    n = len(d["convergence_flags"])
    cfg = VSConfig(num_samples=n, num_circles=4)
    positions, quats, _ = generate_episode_starts(cfg, seed=41)
    assert np.allclose(positions, d["initial_positions"], atol=1e-6), \
        "regenerated start stream does not match the npz"

    per = n // 4
    spin = np.concatenate([np.linspace(-120, 120, per)] * 4)[:n]

    conv = d["convergence_flags"].astype(bool)
    fail = ~conv
    iters = d["all_iteration_histories"].astype(int)
    low_pos = d["lowest_position_errors"]   # cm
    low_ori = d["lowest_orientation_errors"]  # deg

    # residual spin after the rotation search: angle between the searched
    # best pose and the plain look-at orientation, about the optical axis
    best = d["best_poses"]  # (n, 2) object: (position, quat) per episode
    bq = np.stack([np.asarray(q, np.float64) for q in best[:, 1]])
    rel = (R.from_quat(bq) * R.from_quat(quats).inv()).magnitude() * 180 / np.pi
    # searched angle is the 0/90/180/270 member applied; residual spin =
    # initial spin folded into (-45, 45] by the nearest search angle
    folded = (spin + 45) % 90 - 45

    dxy = np.linalg.norm(positions[:, :2], axis=1)
    z = positions[:, 2]

    print(f"n={n} converged={conv.sum()} ({100*conv.mean():.1f}%) failed={fail.sum()}")
    print(f"iters: converged mean {iters[conv].mean():.0f}, failed mean {iters[fail].mean():.0f}")

    def bucket(name, vals, edges):
        print(f"\n-- {name} --")
        for lo, hi in zip(edges[:-1], edges[1:]):
            m = (vals >= lo) & (vals < hi)
            if m.sum() == 0:
                continue
            fr = fail[m].mean()
            print(f"  [{lo:7.1f},{hi:7.1f}): n={m.sum():4d} fail={fail[m].sum():3d} ({100*fr:5.1f}%)")

    bucket("spin angle (deg)", spin, np.linspace(-120, 120, 13))
    bucket("|folded spin| after 4-way search (deg)", np.abs(folded), np.array([0, 10, 20, 30, 45.01]))
    bucket("xy offset from goal axis (m)", dxy, np.linspace(0, 0.9, 10))
    bucket("start height z (m)", z, np.linspace(z.min(), z.max() + 1e-6, 9))
    bucket("search-vs-lookat rotation (deg)", rel, np.array([0, 45, 135, 225, 361]))

    # failure outcome taxonomy
    print("\n-- failure outcomes --")
    f_idx = np.where(fail)[0]
    near = (low_pos[fail] < 5) & (low_ori[fail] < 5)
    print(f"  near-miss (<5cm & <5deg lowest): {near.sum()}/{fail.sum()}")
    print(f"  hit max_iterations (1500):      {(iters[fail] >= 1500).sum()}")
    print(f"  early stop (<1500):             {(iters[fail] < 1500).sum()}")
    print(f"  lowest pos err of failures: median {np.median(low_pos[fail]):.1f} cm, "
          f"p90 {np.percentile(low_pos[fail], 90):.1f} cm")
    print(f"  lowest ori err of failures: median {np.median(low_ori[fail]):.1f} deg")

    # the dominant joint cluster
    print("\n-- worst 20 failures (idx, spin, folded, dxy, z, iters, lowpos, lowori) --")
    order = f_idx[np.argsort(-low_pos[f_idx])][:20]
    for i in order:
        print(f"  {i:3d} spin={spin[i]:7.1f} fold={folded[i]:6.1f} dxy={dxy[i]:.2f} "
              f"z={z[i]:.2f} it={iters[i]:4d} low={low_pos[i]:6.1f}cm/{low_ori[i]:5.1f}deg")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "artifacts/results_tpu500_dino_standard.npz")
