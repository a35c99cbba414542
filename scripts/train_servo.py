"""Train servo descriptors in-sim and checkpoint them (VERDICT r1 task 3).

Trains the reference operating model (DINOv2-arch ViT-S/14 @ 308, layer 11)
from random init with the goal-view/episode-view InfoNCE objective
(train/finetune.py), on the benchmark poster scene, until the serving-path
matcher is reliable across the episode start distribution; saves an orbax
checkpoint consumable by `--checkpoint` in the CLI.

Usage:
  python -u scripts/train_servo.py --out artifacts/ckpt_vits308 \
      [--steps 2000] [--batch 8] [--size 308] [--model dinov2_vits14]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chain", type=int, default=25, help="train steps per jit call")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--size", type=int, default=308)
    ap.add_argument("--model", default="dinov2_vits14")
    ap.add_argument("--layer", type=int, default=11)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--poster", default=None,
                    help="texture image, or 'synthetic' (default: the"
                         " reference's real viso poster)")
    ap.add_argument("--perturb-prob", type=float, default=0.5)
    ap.add_argument("--resume", default=None, help="orbax checkpoint to start from")
    ap.add_argument("--attn-score", default="softmax",
                    choices=["softmax", "relu", "sqrelu"],
                    help="serving attention score redesign to co-train for"
                         " (ViTConfig.attn_score)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize blocks in the train step "
                         "(ViTConfig.remat_blocks) — required for ViT-L@518 "
                         "on a 16 GB chip")
    ap.add_argument("--kv-pool", type=int, default=1,
                    help="K/V patch-grid pooling to co-train for"
                         " (ViTConfig.kv_pool)")
    ap.add_argument("--ls-init", type=float, default=None,
                    help="override LayerScale init for from-scratch training "
                         "(DINOv2's 1e-5 is a fine-tuning init; from random "
                         "weights it keeps every block near-identity and "
                         "block-weight gradients ~1e-5x — ViT-S escapes the "
                         "regime, ViT-L demonstrably stalls in it: loss "
                         "plateau 4.2-4.5 vs ViT-S 1.15 on the identical "
                         "curriculum.  Ignored with --resume)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vitvs_tpu.harness.pipeline import ServoModel
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.models import vit as vit_mod
    from vitvs_tpu.models.convert import load_params, save_params
    from vitvs_tpu.sim import Scene, load_poster_scene, make_synthetic_poster
    from vitvs_tpu.train import TrainState
    from vitvs_tpu.train.finetune import make_servo_train_epoch, matching_quality

    cfg = VSConfig(dino_input_size=args.size, model_name=args.model,
                   layer=args.layer, attn_score=args.attn_score,
                   kv_pool=args.kv_pool)
    model = ServoModel.create(cfg, compute_dtype=jnp.bfloat16)
    if args.remat:
        import dataclasses

        model = dataclasses.replace(
            model, vit=dataclasses.replace(model.vit, remat_blocks=True))
    if args.poster == "synthetic":
        scene = Scene.create(make_synthetic_poster(512, seed=0))
    elif args.poster:
        from vitvs_tpu.io_bridge.images import load_image

        scene = Scene.create(load_image(args.poster))
    else:
        scene = load_poster_scene()

    if args.resume:
        params = load_params(args.resume)
        print(f"[train] resumed params from {args.resume}", flush=True)
    else:
        params = vit_mod.init_vit(model.vit, jax.random.PRNGKey(args.seed))
        if args.ls_init is not None:
            params["blocks"]["ls1"] = jnp.full_like(
                params["blocks"]["ls1"], args.ls_init)
            params["blocks"]["ls2"] = jnp.full_like(
                params["blocks"]["ls2"], args.ls_init)
            print(f"[train] LayerScale init overridden to {args.ls_init}",
                  flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1), args.lr * 0.05)
    optimizer = optax.adamw(sched, weight_decay=1e-4)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    epoch = make_servo_train_epoch(model, optimizer, scene, args.batch,
                                   args.chain, perturb_prob=args.perturb_prob)

    key = jax.random.PRNGKey(args.seed + 1)
    f0, a0 = matching_quality(params, model, scene, jax.random.PRNGKey(123))
    print(f"[train] init matching: valid-frac {f0:.3f}, patch-acc {a0:.3f}",
          flush=True)

    def save_part(params, done):
        """Crash-resumable periodic save: orbax refuses to overwrite, so
        write to a fresh dir and atomically swap it in as <out>.part.
        A sidecar <out>.part.json records how many steps the part covers,
        so a resumer can compute the true remainder (resume with
        --resume <out>.part --steps <steps - done>; note the warmup-cosine
        schedule restarts — params-only resume, not full state)."""
        import shutil

        part, new = args.out + ".part", args.out + ".part.new"
        shutil.rmtree(new, ignore_errors=True)
        save_params(jax.tree.map(lambda a: np.asarray(a, np.float32), params),
                    new)
        shutil.rmtree(part, ignore_errors=True)
        os.replace(new, part)
        with open(part + ".json", "w") as fh:
            json.dump({"done": done, "steps": args.steps}, fh)

    t0 = time.time()
    done = 0
    history = []
    while done < args.steps:
        key, sub = jax.random.split(key)
        state, losses = epoch(state, scene, sub)
        done += args.chain
        losses = np.asarray(losses)
        history.extend(losses.tolist())
        print(f"[train] step {done}/{args.steps}: loss {losses[-1]:.4f} "
              f"(mean {losses.mean():.4f})  [{time.time()-t0:.0f}s]", flush=True)
        if done % (args.chain * 8) == 0 or done >= args.steps:
            f, a = matching_quality(state.params, model, scene,
                                    jax.random.PRNGKey(done))
            print(f"[train]   matching: valid-frac {f:.3f}, patch-acc {a:.3f}",
                  flush=True)
            if done < args.steps:
                save_part(state.params, done)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    save_params(jax.tree.map(lambda a: np.asarray(a, np.float32), state.params),
                args.out)
    with open(args.out + ".trainlog.json", "w") as fh:
        json.dump({"loss": history, "final_matching": [f, a],
                   "args": vars(args)}, fh)
    # the completed checkpoint supersedes any crash-resume part — leaving a
    # stale .part around would silently hijack a later retrain-from-scratch
    import shutil

    shutil.rmtree(args.out + ".part", ignore_errors=True)
    try:
        os.remove(args.out + ".part.json")
    except FileNotFoundError:
        pass
    print(f"[train] saved checkpoint to {args.out}", flush=True)


if __name__ == "__main__":
    main()
