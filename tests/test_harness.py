"""Harness tests: benchmark driver (with checkpoint/resume), samplers,
visualization, profiling utilities."""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_rollout import tiny_setup  # noqa: E402

from vitvs_tpu.harness import samplers, viz  # noqa: E402
from vitvs_tpu.harness.benchmark import run_benchmark  # noqa: E402
from vitvs_tpu.io_bridge.config import VSConfig  # noqa: E402
from vitvs_tpu.utils import StageTimer  # noqa: E402


# ---------------------------------------------------------------------------
# samplers (legacy-seed parity with the reference's sampling chain)
# ---------------------------------------------------------------------------


def test_generate_episode_starts_deterministic():
    cfg = VSConfig(num_samples=16, num_circles=4)
    p1, q1, n1 = samplers.generate_episode_starts(cfg, seed=41)
    p2, q2, n2 = samplers.generate_episode_starts(cfg, seed=41)
    assert n1 == n2 == 16
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(q1, q2)


def test_generate_episode_starts_rejects_empty_sweep():
    # num_samples < num_circles floors to 0 per circle; must fail loudly,
    # not return an empty sweep (the int8-static calibration path would
    # then crash on a shape mismatch instead)
    cfg = VSConfig(num_samples=2, num_circles=4)
    with pytest.raises(ValueError, match="empty sweep"):
        samplers.generate_episode_starts(cfg, seed=41)


def test_positions_within_reference_box():
    cfg = VSConfig(num_samples=100, num_circles=4)
    p, q, n = samplers.generate_episode_starts(cfg)
    lo = samplers.DESIRED_POSITION - samplers.BOX_SAMPLE_SIZE / 2
    hi = samplers.DESIRED_POSITION + samplers.BOX_SAMPLE_SIZE / 2
    assert (p >= lo).all() and (p <= hi).all()
    # quats normalized
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-9)


def test_legacy_stream_matches_reference_call_order():
    """The exact sampling stream: np.random.seed(41) -> uniform box ->
    per-circle uniform thetas (vitvs_v2.py:1397-1418)."""
    cfg = VSConfig(num_samples=8, num_circles=4, circle_radius_aug=0.08)
    p, _, _ = samplers.generate_episode_starts(cfg, seed=41)
    rs = np.random.RandomState(41)
    half = samplers.BOX_SAMPLE_SIZE / 2
    expect = rs.uniform(samplers.DESIRED_POSITION - half,
                        samplers.DESIRED_POSITION + half, size=(8, 3))
    np.testing.assert_array_equal(p, expect)


def test_orientations_look_at_focal_points():
    cfg = VSConfig(num_samples=12, num_circles=4)
    p, q, _ = samplers.generate_episode_starts(cfg)
    from scipy.spatial.transform import Rotation as R
    # body +x must point roughly toward the reference point neighborhood
    fwd = R.from_quat(q).apply(np.array([1.0, 0, 0]))
    to_ref = samplers.REFERENCE_POINT - p
    to_ref = to_ref / np.linalg.norm(to_ref, axis=1, keepdims=True)
    cos = (fwd * to_ref).sum(1)
    assert (cos > 0.9).all()  # focal points lie within 0.32 m of the reference


def test_pose_error_stats():
    cfg = VSConfig(num_samples=50, num_circles=5)
    p, q, _ = samplers.generate_episode_starts(cfg)
    mean_cm, std_cm = samplers.pose_error_stats(p, samplers.DESIRED_POSITION)
    assert 10 < mean_cm < 100
    m, s = samplers.orientation_error_stats(q, samplers.DESIRED_ORIENTATION)
    assert 0 < m < 120


# ---------------------------------------------------------------------------
# benchmark driver end-to-end (tiny model)
# ---------------------------------------------------------------------------


def test_run_benchmark_end_to_end(tmp_path):
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=12)
    cfg = model.cfg.replace(num_samples=4, num_circles=2)
    ckpt = str(tmp_path / "episodes.pkl")
    stats, path, summaries = run_benchmark(
        cfg, params=params, model=model, scene=scene, out_dir=str(tmp_path),
        config_name="tiny", rotation_search=False, chunk=2, num_steps=12,
        verbose=False, checkpoint_path=ckpt,
    )
    assert stats.num_samples == 4
    assert os.path.exists(path)
    # rotation-off ablation runs write ..._dino_no_rot_... like the
    # reference's vitvs_v2_rotation_off.py
    assert path.endswith("_dino_no_rot_standard.npz")
    assert os.path.exists(ckpt)
    d = np.load(path, allow_pickle=True)
    assert len(d["convergence_flags"]) == 4
    assert d["all_position_histories"][0].shape[1] == 3

    # resume: with a full checkpoint the rerun does no rollout work
    stats2, _, _ = run_benchmark(
        cfg, params=params, model=model, scene=scene, out_dir=str(tmp_path),
        config_name="tiny2", rotation_search=False, chunk=2, num_steps=12,
        verbose=False, checkpoint_path=ckpt,
    )
    assert stats2.num_samples == 4


def test_run_benchmark_live_channel(tmp_path):
    """`live_dir` writes annotated-frame snapshots during the sweep — the
    offline stand-in for the reference's per-frame RViz topics
    (vitvs_v2.py:516-521,863-923)."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=12)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    live = tmp_path / "live"
    run_benchmark(
        cfg, params=params, model=model, scene=scene, out_dir=str(tmp_path),
        config_name="tinylive", rotation_search=False, chunk=2, num_steps=12,
        segment_steps=4, verbose=False, save=False, live_dir=str(live),
    )
    pngs = sorted(p.name for p in live.glob("ep*.png"))
    assert len(pngs) == 3, pngs          # 12 steps / 4-step segments
    assert pngs[0] == "ep0000_step00004.png"
    assert (live / "latest.png").exists()
    import matplotlib.image as mpimg

    img = mpimg.imread(live / pngs[0])
    assert img.ndim == 3 and img.shape[0] > 0


def test_resume_refuses_foreign_checkpoint(tmp_path):
    """A resume file written by a run with different episodes/flags must
    refuse to load (harness/chunks.load_episodes fingerprint), not silently
    pair the old results with the new run's start poses."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=12)
    cfg = model.cfg.replace(num_samples=4, num_circles=2)
    ckpt = str(tmp_path / "episodes.pkl")
    common = dict(params=params, model=model, scene=scene,
                  out_dir=str(tmp_path), rotation_search=False, chunk=2,
                  num_steps=12, verbose=False, checkpoint_path=ckpt,
                  save=False)
    run_benchmark(cfg, config_name="a", **common)
    # same run identity, different output name: legitimate resume
    run_benchmark(cfg, config_name="b", **common)
    # different episode subset: must refuse
    with pytest.raises(ValueError, match="different run"):
        run_benchmark(cfg, config_name="c", episode_indices=[0, 2], **common)
    # different rollout length: must refuse
    common2 = dict(common, num_steps=10)
    with pytest.raises(ValueError, match="different run"):
        run_benchmark(cfg, config_name="d", **common2)


def test_run_benchmark_int8_path(tmp_path):
    """`quantized=True` serves the int8 W8A8 path end-to-end through the
    sweep driver (the configuration bench.py measures; VERDICT r2 item 3)."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=8)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    stats, path, _ = run_benchmark(
        cfg, params=params, model=model, scene=scene, out_dir=str(tmp_path),
        config_name="tinyq", rotation_search=True, chunk=2, num_steps=8,
        verbose=False, quantized=True,
    )
    assert stats.num_samples == 2
    d = np.load(path, allow_pickle=True)
    assert len(d["convergence_flags"]) == 2


def test_run_benchmark_with_perturbation_and_rotation_search(tmp_path):
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=8)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    stats, path, _ = run_benchmark(
        cfg, params=params, model=model, scene=scene, out_dir=str(tmp_path),
        config_name="tinyp", perturbation=True, rotation_search=True,
        chunk=2, num_steps=8, verbose=False,
    )
    assert stats.num_samples == 2
    assert path.endswith("_perturbed.npz")


def test_perturbed_results_chunk_invariant(tmp_path):
    """Per-chunk texture generation (r3: the upfront vmap OOM'd on real-size
    scenes) derives keys from absolute episode indices, so results must be
    bitwise identical across --chunk settings."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=6)
    cfg = model.cfg.replace(num_samples=4, num_circles=1)
    common = dict(params=params, model=model, scene=scene,
                  out_dir=str(tmp_path), perturbation=True,
                  rotation_search=False, num_steps=6, verbose=False)
    _, p1, _ = run_benchmark(cfg, config_name="c2", chunk=2, **common)
    _, p4, _ = run_benchmark(cfg, config_name="c4", chunk=4, **common)
    d1, d4 = np.load(p1, allow_pickle=True), np.load(p4, allow_pickle=True)
    np.testing.assert_array_equal(d1["convergence_flags"], d4["convergence_flags"])
    for i in range(4):
        np.testing.assert_array_equal(d1["all_position_histories"][i],
                                      d4["all_position_histories"][i])


def test_episode_replay_bit_identical(tmp_path):
    """`episode_indices` replays episodes by absolute seed-41 index: start
    poses, rotation-search keys, rollout keys and perturbation textures all
    derive from the absolute index, so the replay must be bitwise identical
    to the same episodes inside the full sweep."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=6)
    cfg = model.cfg.replace(num_samples=5, num_circles=1)
    common = dict(params=params, model=model, scene=scene,
                  out_dir=str(tmp_path), perturbation=True,
                  rotation_search=True, num_steps=6, verbose=False)
    _, pf, _ = run_benchmark(cfg, config_name="full", chunk=2, **common)
    _, pr, _ = run_benchmark(cfg, config_name="replay", chunk=2,
                             episode_indices=[1, 4], **common)
    df, dr = np.load(pf, allow_pickle=True), np.load(pr, allow_pickle=True)
    assert dr["convergence_flags"].shape[0] == 2
    for r, f in enumerate([1, 4]):
        np.testing.assert_array_equal(dr["initial_positions"][r],
                                      df["initial_positions"][f])
        np.testing.assert_array_equal(dr["all_position_histories"][r],
                                      df["all_position_histories"][f])
        np.testing.assert_array_equal(dr["convergence_flags"][r],
                                      df["convergence_flags"][f])


# ---------------------------------------------------------------------------
# viz
# ---------------------------------------------------------------------------


def test_draw_points_overlays():
    img = np.zeros((32, 32, 3), np.uint8)
    out = viz.draw_points(img, np.array([[5, 5]]), np.array([[20, 20]]), radius=1)
    assert (out[5, 5] == [0, 255, 0]).all()
    assert (out[20, 20] == [255, 0, 0]).all()
    assert (img == 0).all()  # original untouched


def test_correspondence_figure_renders():
    g = np.random.default_rng(0).random((40, 40, 3))
    c = np.random.default_rng(1).random((40, 40, 3))
    pts = np.array([[5.0, 6.0], [20.0, 30.0]])
    fig = viz.correspondence_figure(g, c, pts, pts + 2,
                                    valid=np.array([True, True]))
    img = viz.figure_to_image(fig)
    assert img.ndim == 3 and img.shape[2] == 3


def test_plot_trajectory(tmp_path):
    d = {
        "all_iteration_histories": np.array([5]),
        "all_position_histories": np.array([np.random.default_rng(0).random((5, 3))],
                                           dtype=object),
    }
    fig = viz.plot_trajectory(d, 0)
    assert fig is not None


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------


def test_stage_timer():
    import jax.numpy as jnp

    t = StageTimer()
    with t.stage("work") as h:
        h["result"] = jnp.zeros(10) + 1
    with t.stage("work"):
        pass
    s = t.summary()
    assert s["work"]["count"] == 2
    assert "work" in t.report()


def test_segmented_rollout_matches_single_segment(tmp_path):
    """Host-chained segments must be bit-identical to one long scan."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=20)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    common = dict(params=params, model=model, scene=scene, out_dir=str(tmp_path),
                  rotation_search=False, chunk=2, num_steps=20, verbose=False,
                  save=False)
    s1, _, sum1 = run_benchmark(cfg, config_name="a", segment_steps=None, **common)
    s2, _, sum2 = run_benchmark(cfg, config_name="b", segment_steps=5, **common)
    assert s1.num_converged == s2.num_converged
    for k in ("final_positions", "lowest_position_errors", "all_iteration_histories"):
        np.testing.assert_allclose(np.asarray(sum1[k], float),
                                   np.asarray(sum2[k], float), atol=1e-6)
    for a, b in zip(sum1["all_position_histories"], sum2["all_position_histories"]):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), atol=1e-6)


def test_segment_steps_not_dividing_T_clamps_history(tmp_path):
    """With num_steps=12, segment_steps=5 exactly 12 steps run and histories
    have length 12 (the last segment is clamped to the remainder), and the
    results equal the single-segment run."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=12)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    common = dict(params=params, model=model, scene=scene, out_dir=str(tmp_path),
                  rotation_search=False, chunk=2, num_steps=12, verbose=False,
                  save=False)
    _, _, sum1 = run_benchmark(cfg, config_name="a", segment_steps=None, **common)
    _, _, sum2 = run_benchmark(cfg, config_name="b", segment_steps=5, **common)
    for h in sum2["all_position_histories"]:
        assert np.asarray(h).shape[0] <= 12  # histories trimmed to iterations
    for a, b in zip(sum1["all_position_histories"],
                    sum2["all_position_histories"]):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float),
                                   atol=1e-6)


def test_results_invariant_to_chunk_size(tmp_path):
    """Episode PRNG keys derive from the absolute episode index, so results
    must not depend on --chunk (ADVICE r1)."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=8)
    cfg = model.cfg.replace(num_samples=4, num_circles=2)
    common = dict(params=params, model=model, scene=scene, out_dir=str(tmp_path),
                  rotation_search=False, num_steps=8, verbose=False, save=False)
    _, _, sum1 = run_benchmark(cfg, config_name="a", chunk=2, **common)
    _, _, sum2 = run_benchmark(cfg, config_name="b", chunk=3, **common)
    np.testing.assert_allclose(np.asarray(sum1["final_positions"], float),
                               np.asarray(sum2["final_positions"], float),
                               atol=1e-6)


def test_all_frozen_fast_forward_matches_device_run(tmp_path):
    """Once every episode in a chunk is frozen, the remaining segments are
    synthesized host-side (benchmark.run_chunk fast-forward).  Driving
    num_steps past max_iterations freezes all episodes mid-sweep; the
    segmented run (which fast-forwards) must equal the single-segment run
    (which executes every step on device)."""
    params, model, scene = tiny_setup(pixel_identity=True, max_iterations=15)
    cfg = model.cfg.replace(num_samples=2, num_circles=1)
    common = dict(params=params, model=model, scene=scene, out_dir=str(tmp_path),
                  rotation_search=False, chunk=2, num_steps=40, verbose=False,
                  save=False)
    s1, _, sum1 = run_benchmark(cfg, config_name="a", segment_steps=None, **common)
    s2, _, sum2 = run_benchmark(cfg, config_name="b", segment_steps=10, **common)
    # all episodes must actually have frozen before T (else this test is vacuous)
    assert all(int(it) <= 16 for it in sum2["all_iteration_histories"])
    assert s1.num_converged == s2.num_converged
    for k in ("final_positions", "position_errors", "lowest_position_errors",
              "all_iteration_histories"):
        np.testing.assert_allclose(np.asarray(sum1[k], float),
                                   np.asarray(sum2[k], float), atol=0)
    for a, b in zip(sum1["all_position_histories"], sum2["all_position_histories"]):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), atol=0)
    for a, b in zip(sum1["all_applied_velocity_x"], sum2["all_applied_velocity_x"]):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), atol=0)


def test_summarize_runs_row(tmp_path):
    """scripts/summarize_runs.py parses the reference filename pattern and
    reproduces convergence_stats/ape/length_ratio for an archive."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.summarize_runs import summarize
    from vitvs_tpu.harness import results

    n, steps = 3, 5
    pos = [np.linspace([0.3, 0.0, 0.61], [0.0, 0.0, 0.61], steps)] * n
    ori = [np.tile([0.0, 0.7071068, 0.0, 0.7071068], (steps, 1))] * n
    summaries = {
        "initial_positions": np.asarray([p[0] for p in pos]),
        "initial_orientations": np.asarray([o[0] for o in ori]),
        "convergence_flags": np.array([True, True, False]),
        "position_errors": np.array([0.5, 0.6, 30.0]),
        "orientation_errors": np.array([0.1, 0.2, 5.0]),
        "lowest_position_errors": np.array([0.5, 0.6, 30.0]),
        "lowest_orientation_errors": np.array([0.1, 0.2, 5.0]),
        "all_iteration_histories": np.array([steps, steps, steps]),
        "all_position_histories": pos,
        "all_orientation_histories": ori,
    }
    path = results.save_results(str(tmp_path), summaries, 12.5,
                                config_name="real64", method="akaze",
                                perturbed=True)
    assert path.endswith("results_real64_akaze_perturbed.npz")
    row = summarize(path)
    assert row["method"] == "akaze" and row["mode"] == "perturbed"
    assert row["episodes"] == 3 and row["converged"] == 2
    assert row["rate"] == pytest.approx(100 * 2 / 3)
    assert row["pos_cm"] == pytest.approx(0.55)
    assert np.isfinite(row["ape_cm"]) and row["lratio"] == pytest.approx(1.0)
    # non-results npz names are skipped
    assert summarize(os.path.join(str(tmp_path), "ckpt_weights.npz")) is None
