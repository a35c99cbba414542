"""CLI and classical-benchmark smoke tests."""

import os

import numpy as np
import pytest

from vitvs_tpu.io_bridge import cli


def test_cli_help():
    with pytest.raises(SystemExit) as e:
        cli.main(["--help"])
    assert e.value.code == 0


def test_cli_rejects_unknown_method():
    with pytest.raises(SystemExit):
        cli.main(["--method", "bogus"])


def test_classical_benchmark_smoke(tmp_path):
    """Tiny classical sweep end-to-end (small camera via config override)."""
    from vitvs_tpu.classical.benchmark import run_classical_benchmark
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import Scene, make_synthetic_poster

    cfg = VSConfig(u_max=128, v_max=128, f_x=100.5, f_y=100.5,
                   num_pairs=12, lambda_=0.5, control_dt=0.1,
                   num_samples=2, num_circles=1, max_iterations=6,
                   pinv_mode="dls")
    scene = Scene.create(make_synthetic_poster(128, seed=1))
    stats, path, _ = run_classical_benchmark(
        cfg, scene=scene, out_dir=str(tmp_path), config_name="smoke",
        method="sift", chunk=2, num_steps=6, max_corners=128, verbose=False)
    assert stats.num_samples == 2
    assert path.endswith("results_smoke_sift_standard.npz")
    d = np.load(path, allow_pickle=True)
    assert len(d["convergence_flags"]) == 2

    # perturbed mode: per-chunk texture generation (r3: upfront vmap OOM'd
    # on real-size scenes)
    stats_p, path_p, _ = run_classical_benchmark(
        cfg, scene=scene, out_dir=str(tmp_path), config_name="smoke",
        method="sift", chunk=2, num_steps=6, max_corners=128, verbose=False,
        perturbation=True)
    assert stats_p.num_samples == 2
    assert path_p.endswith("results_smoke_sift_perturbed.npz")


def test_classical_benchmark_checkpoint_resume(tmp_path):
    """Classical sweeps checkpoint/resume like the dino harness (the orb/
    akaze binary pipelines run 1-3 h per 64-episode sweep; CLI --resume)."""
    from vitvs_tpu.classical.benchmark import run_classical_benchmark
    from vitvs_tpu.io_bridge.config import VSConfig
    from vitvs_tpu.sim import Scene, make_synthetic_poster

    cfg = VSConfig(u_max=128, v_max=128, f_x=100.5, f_y=100.5,
                   num_pairs=12, lambda_=0.5, control_dt=0.1,
                   num_samples=4, num_circles=2, max_iterations=6,
                   pinv_mode="dls")
    scene = Scene.create(make_synthetic_poster(128, seed=1))
    ckpt = str(tmp_path / "classical.pkl")
    stats, path, _ = run_classical_benchmark(
        cfg, scene=scene, out_dir=str(tmp_path), config_name="ck",
        method="sift", chunk=2, num_steps=6, max_corners=128, verbose=False,
        checkpoint_path=ckpt)
    assert stats.num_samples == 4
    assert os.path.exists(ckpt)
    flags1 = np.load(path, allow_pickle=True)["convergence_flags"]

    # resume with a full checkpoint: no rollout work, identical results
    stats2, path2, _ = run_classical_benchmark(
        cfg, scene=scene, out_dir=str(tmp_path), config_name="ck2",
        method="sift", chunk=2, num_steps=6, max_corners=128, verbose=False,
        checkpoint_path=ckpt)
    assert stats2.num_samples == 4
    np.testing.assert_array_equal(
        np.load(path2, allow_pickle=True)["convergence_flags"], flags1)


def test_cli_rejects_int8_for_classical():
    with pytest.raises(SystemExit):
        cli.main(["--method", "sift", "--int8"])


def test_cli_rejects_static_without_int8():
    with pytest.raises(SystemExit):
        cli.main(["--method", "dino", "--int8-static"])


def test_cli_int8_static_and_dt_threaded(monkeypatch, tmp_path):
    """--int8-static reaches run_benchmark and --control-dt overrides the
    config (with npz-name disambiguation for both)."""
    seen = {}

    def fake_run(cfg, **kw):
        seen["cfg"] = cfg
        seen.update(kw)

        class S:  # minimal stats shape for the CLI's summary print
            convergence_rate, num_converged, num_samples = 0.0, 0, 0

        return S, None, None

    import vitvs_tpu.harness.benchmark as bench_mod

    monkeypatch.setattr(bench_mod, "run_benchmark", fake_run)
    cli.main(["--method", "dino", "--int8", "--int8-static",
              "--control-dt", "0.2", "--num-samples", "2",
              "--out", str(tmp_path)])
    assert seen["quantized"] and seen["int8_static"]
    assert seen["cfg"].control_dt == 0.2
    # every result-changing flag disambiguates the npz name (incl. the
    # explicit --num-samples override, so smoke runs cannot clobber
    # archived full-sweep artifacts)
    assert seen["config_name"].endswith("_int8cal_dt0.2_n2")
