"""CLI — the `run_ibvs.sh` equivalent.

Reference dispatch (`src/run_ibvs.sh:5-11,25-81`):
    ./run_ibvs.sh --method {sift,orb,akaze,dino} [--config f] [--perturbation]
spins up roslaunch + Gazebo, then runs the controller's benchmark main().

Here the simulator is in-process and on-device:

    python -m vitvs_tpu.io_bridge.cli --method dino [--config f.yaml]
        [--perturbation] [--no-rotation-search] [--num-samples N]
        [--checkpoint DIR] [--out DIR]

`--method dino` runs the ViT pipeline; `sift`-class classical methods run
the gradient-feature pipeline in vitvs_tpu.classical.
"""

from __future__ import annotations

import argparse
import os
import sys

# every non-dino method runs the classical controller and inherits its abort
# semantics (5x divergence abort, ibvs_standard.py:215); 'classical' aliases
# sift for r1 compatibility
CLASSICAL_METHODS = ("classical", "sift", "orb", "akaze", "harris")


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native ViT-VS benchmark")
    p.add_argument("--method", default="dino",
                   choices=["dino", *CLASSICAL_METHODS],
                   help="feature pipeline: dino = ViT descriptors; sift = DoG"
                        " scale-space + 128-d L2; orb = steered BRIEF binary;"
                        " akaze = nonlinear scale space + M-LDB binary;"
                        " harris = single-scale corner baseline"
                        " ('classical' aliases sift)")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--perturbation", action="store_true",
                   help="per-episode perturbed poster textures")
    p.add_argument("--no-rotation-search", action="store_true")
    p.add_argument("--num-samples", type=int, default=None,
                   help="override config num_samples")
    p.add_argument("--control-dt", type=float, default=None,
                   help="override config control_dt (sim integration period"
                        " per controller iteration; for dt-sensitivity"
                        " sweeps of the convergence ladder)")
    p.add_argument("--num-steps", type=int, default=None,
                   help="cap rollout length (default: config max_iterations)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir of converted DINOv2 weights")
    p.add_argument("--out", default=".", help="results output directory")
    p.add_argument("--chunk", type=int, default=8, help="vmap batch size")
    p.add_argument("--poster", default=None,
                   help="poster texture: an image file, or 'synthetic' for"
                        " the procedural test poster (default: the"
                        " reference's real viso poster on its real geometry)")
    p.add_argument("--resume", default=None,
                   help="episode checkpoint file for crash-resumable sweeps")
    p.add_argument("--episodes", default=None,
                   help="comma-separated ABSOLUTE episode indices to replay"
                        " (e.g. '37,102,441'): bit-identical to the same"
                        " episodes inside the full seed-41 sweep (dino only)")
    p.add_argument("--mesh", action="store_true",
                   help="shard rollout chunks over all devices (dp x tp mesh;"
                        " per-episode keys are device-layout invariant,"
                        " results match single-device to float tolerance)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree for the ViT params (with"
                        " --mesh; use for ViT-L+ models)")
    p.add_argument("--int8", action="store_true",
                   help="serve the ViT on the int8 W8A8 path (the bench.py"
                        " configuration) instead of bf16")
    p.add_argument("--live", default=None, metavar="DIR",
                   help="live observability channel: write an annotated "
                        "current-frame snapshot of the first in-flight "
                        "episode of each chunk to DIR every --live-every "
                        "rollout segments (the reference's per-frame RViz "
                        "topics, vitvs_v2.py:516-521; dino method only)")
    p.add_argument("--live-every", type=int, default=1,
                   help="segments between live snapshots (default 1)")
    p.add_argument("--int8-static", action="store_true",
                   help="with --int8: static per-tensor activation scales"
                        " (SmoothQuant fold) calibrated on rendered scene"
                        " views, instead of per-token dynamic scales")
    args = p.parse_args(argv)

    from vitvs_tpu.io_bridge.config import VSConfig, load_config

    cfg = load_config(args.config) if args.config else VSConfig()
    if args.num_samples:
        cfg = cfg.replace(num_samples=args.num_samples)
    if args.control_dt:
        cfg = cfg.replace(control_dt=args.control_dt)
    if args.method in CLASSICAL_METHODS:
        # classical controller uses the 5x divergence abort (ibvs_standard.py:215)
        cfg = cfg.replace(divergence_multiplier=5.0, early_divergence_abort=True)

    # flag-combination validation BEFORE the (expensive) checkpoint load so
    # misuse fails instantly
    if args.int8_static and not args.int8:
        p.error("--int8-static requires --int8")
    if args.tp != 1 and not args.mesh:
        p.error("--tp requires --mesh (tensor parallelism shards over the mesh)")
    if args.method != "dino" and (args.int8 or args.mesh):
        p.error(f"--int8/--mesh apply to the dino pipeline only; "
                f"--method {args.method} runs the classical controller "
                f"(f32, single-device)")
    if args.episodes and args.method != "dino":
        p.error("--episodes applies to the dino pipeline only")

    params = None
    if args.checkpoint:
        from vitvs_tpu.models.convert import load_params

        params = load_params(args.checkpoint)

    # every result-changing flag must disambiguate the npz name — a smoke
    # run (--num-samples 10, --num-steps 50, --poster synthetic) must never
    # silently overwrite an archived full-sweep artifact
    config_name = (os.path.splitext(os.path.basename(args.config))[0]
                   if args.config else "config")
    if args.int8:
        # keep int8 sweeps from shadowing bf16 npz (and static from dynamic)
        config_name += "_int8cal" if args.int8_static else "_int8"
    if args.control_dt:
        config_name += f"_dt{args.control_dt:g}"   # dt-sensitivity sweeps
    if args.num_samples:
        config_name += f"_n{args.num_samples}"
    if args.num_steps:
        config_name += f"_steps{args.num_steps}"
    if args.poster:
        stem = ("synthetic" if args.poster == "synthetic" else
                os.path.splitext(os.path.basename(args.poster))[0])
        config_name += f"_poster-{stem}"
    episode_indices = None
    if args.episodes:
        episode_indices = [int(s) for s in args.episodes.split(",")]
        config_name += "_replay"   # never shadow a full-sweep npz

    scene = None   # None -> the benchmark drivers load the real poster scene
    if args.poster == "synthetic":
        from vitvs_tpu.sim import Scene, make_synthetic_poster

        scene = Scene.create(make_synthetic_poster(512, seed=0))
    elif args.poster:
        from vitvs_tpu.io_bridge.images import load_image
        from vitvs_tpu.sim import Scene

        scene = Scene.create(load_image(args.poster))

    mesh = None
    if args.mesh:
        from vitvs_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp)

    if args.method == "dino":
        from vitvs_tpu.harness.benchmark import run_benchmark

        stats, path, _ = run_benchmark(
            cfg, params=params, scene=scene, out_dir=args.out,
            config_name=config_name,
            perturbation=args.perturbation,
            rotation_search=not args.no_rotation_search,
            chunk=args.chunk, num_steps=args.num_steps,
            checkpoint_path=args.resume, mesh=mesh,
            quantized=args.int8, int8_static=args.int8_static,
            episode_indices=episode_indices,
            live_dir=args.live, live_every=args.live_every,
        )
    else:
        from vitvs_tpu.classical.benchmark import run_classical_benchmark

        stats, path, _ = run_classical_benchmark(
            cfg, scene=scene, out_dir=args.out, config_name=config_name,
            method=args.method if args.method != "classical" else "sift",
            perturbation=args.perturbation, chunk=args.chunk,
            num_steps=args.num_steps, checkpoint_path=args.resume,
        )

    print(f"results: {path}")
    print(f"convergence: {stats.convergence_rate:.1f}% "
          f"({stats.num_converged}/{stats.num_samples})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
