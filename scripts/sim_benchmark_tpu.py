"""Reduced-scale on-TPU run of the full simulated benchmark (reference
operating config: ViT-S/14 @ 308, binning, rotation search), used to
validate the end-to-end harness on real hardware.

Usage: python scripts/sim_benchmark_tpu.py [num_samples] [num_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vitvs_tpu.harness.benchmark import run_benchmark
    from vitvs_tpu.io_bridge.config import VSConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    cfg = VSConfig(num_samples=n, num_circles=4, max_iterations=steps,
                   min_iterations=min(300, steps), pinv_mode="dls")
    print(f"control_dt={cfg.control_dt} model={cfg.model_name}@{cfg.dino_input_size}",
          flush=True)
    t0 = time.time()
    stats, path, _ = run_benchmark(
        cfg, out_dir="/tmp", config_name="tpu_vits308",
        rotation_search=True, chunk=8, num_steps=steps, verbose=True,
        checkpoint_path="/tmp/tpu_eps_v3.pkl")
    print(f"TOTAL {time.time()-t0:.1f}s; convergence {stats.convergence_rate:.1f}% "
          f"({stats.num_converged}/{stats.num_samples}); {path}", flush=True)


if __name__ == "__main__":
    main()
