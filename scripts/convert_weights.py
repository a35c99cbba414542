"""Convert a torch DINO/DINOv2 checkpoint to an orbax params directory.

The reference pulls pretrained weights from torch.hub at controller startup
(`dinov2_extractor.py:57-83`); in zero-egress or production settings, run
this once offline:

    python scripts/convert_weights.py dinov2_vits14.pth out_ckpt/ \
        [--model dinov2_vits14] [--stride 14]

then point the CLI / DescriptorExtractor at `out_ckpt/`:

    python -m vitvs_tpu.io_bridge.cli --method dino --checkpoint out_ckpt/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt", help=".pth state_dict (torch.hub download)")
    ap.add_argument("out_dir", help="orbax output directory")
    ap.add_argument("--model", default=None, help="preset name for validation")
    ap.add_argument("--stride", type=int, default=None)
    args = ap.parse_args()

    from vitvs_tpu.models.convert import from_torch_file, save_params

    params, cfg = from_torch_file(args.torch_ckpt, args.model, args.stride)
    save_params(params, args.out_dir)
    print(f"converted {args.torch_ckpt} -> {args.out_dir}")
    print(f"architecture: {cfg}")


if __name__ == "__main__":
    main()
