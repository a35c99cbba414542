"""Summarize every benchmark npz archive in a directory as one table.

Walks `artifacts/` (or a given directory), loads each reference-format
results npz (the 22-array schema of vitvs_v2.py:1493-1516, written by
`harness/results.py`), and prints one markdown row per run: method/mode
parsed from the filename, episode count, convergence rate, lowest-error
stats, APE, and length ratio.  One command reproduces the numbers cited
in README.md and docs/TASK_VALIDATION.md from the archived artifacts:

    python scripts/summarize_runs.py [artifacts/]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

# pure-host analysis: force the CPU backend BEFORE the evals import pulls in
# jax, so summarizing never blocks on (or contends with) the TPU relay
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitvs_tpu.harness import evals  # noqa: E402

# results_{config}_{method}_{mode}.npz  (harness/results.py; the reference's
# filename pattern at vitvs_v2.py:1487-1489)
_NAME = re.compile(r"results_(?P<config>.+)_(?P<method>dino(?:_no_rot)?|sift|"
                   r"orb|akaze|harris|classical)_(?P<mode>standard|perturbed)"
                   r"\.npz$")


def summarize(path: str) -> dict | None:
    m = _NAME.search(os.path.basename(path))
    if not m:
        return None
    d = np.load(path, allow_pickle=True)
    if "convergence_flags" not in d:
        return None
    s = evals.convergence_stats(d)
    row = dict(m.groupdict(), episodes=s.num_samples,
               converged=s.num_converged, rate=s.convergence_rate,
               pos_cm=s.mean_lowest_position_error,
               pos_sd=s.std_lowest_position_error,
               rot_deg=s.mean_lowest_orientation_error,
               rot_sd=s.std_lowest_orientation_error,
               iters=s.mean_iterations, wall_s=s.total_execution_time)
    try:
        (pm, _), _ = evals.ape(d)
        row["ape_cm"] = pm
        row["lratio"], _ = evals.length_ratio(d)
    except Exception:            # replay/partial archives without histories
        row["ape_cm"] = row["lratio"] = float("nan")
    return row


def main(argv: list[str]) -> int:
    root = argv[1] if len(argv) > 1 else "artifacts"
    rows = []
    for name in sorted(os.listdir(root)):
        if name.endswith(".npz"):
            try:
                row = summarize(os.path.join(root, name))
            except Exception as e:                  # corrupt / foreign npz
                print(f"  [skip {name}: {e}]", file=sys.stderr)
                row = None
            if row:
                rows.append((name, row))
    hdr = (f"| archive | method | mode | eps | conv | rate | lowest err "
           f"| APE cm | len | iters | wall s |")
    print(hdr)
    print("|" + "---|" * 11)
    for name, r in rows:
        err = (f"{r['pos_cm']:.2f}±{r['pos_sd']:.2f} cm / "
               f"{r['rot_deg']:.2f}±{r['rot_sd']:.2f}°"
               if np.isfinite(r["pos_cm"]) else "—")
        print(f"| {name} | {r['method']} | {r['mode']} | {r['episodes']} "
              f"| {r['converged']} | {r['rate']:.1f}% | {err} "
              f"| {r['ape_cm']:.1f} | {r['lratio']:.2f} "
              f"| {r['iters']:.0f} | {r['wall_s']:.0f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
