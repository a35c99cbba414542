"""ViT-L/14 @ 518 serving-point measurement (VERDICT r3 item 5).

Applies the exact flagship serving stack (int8-static W8A8 + nomax3
deferred-normalize attention + conv patch embed + matmul-impl K/V pooling)
to dinov2_vitl14 and measures single-stream servo Hz with bench.py's
interleaved-slope methodology — same chains, same chip-window normalizer —
so the number is directly comparable to BENCH_r*.json captures.

Usage: python scripts/bench_vitl.py [pool]   (default kv_pool=2)
Prints one JSON line per operating point.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def main():
    pool = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = bench.run_bench("dinov2_vitl14", kv_pool=pool)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
