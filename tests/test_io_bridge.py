"""io_bridge tests: native sensor bridge, host servo loop, io_callback step,
config round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from vitvs_tpu.io_bridge import native as nb
from vitvs_tpu.io_bridge.config import VSConfig, load_config, save_config


def test_depth_conversion_roundtrip_and_clipping():
    d = np.array([[0.5, 0.05, 20.0, np.nan], [1.234, 0.0, 9.99, 3.0]], np.float32)
    mm = nb.depth_m_to_u16mm(d)
    # clipped/out-of-range/NaN -> 0 (RealSensePlugin clipping semantics)
    assert mm.tolist() == [[500, 0, 0, 0], [1234, 0, 9990, 3000]]
    m = nb.depth_u16mm_to_m(mm)
    np.testing.assert_allclose(m[0, 0], 0.5, atol=1e-3)


def test_rgb8_conversion():
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    out = nb.rgb8_to_unit_float(rgb)
    np.testing.assert_allclose(out, rgb / 255.0, atol=1e-6)
    out2 = nb.rgb8_to_unit_float(rgb, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(out2, (rgb / 255.0 - 0.5) / 0.5, atol=1e-5)


def test_bilinear_resize_u8():
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:4] = 100
    rgb[4:] = 200
    out = nb.bilinear_resize_u8(rgb, 4, 4)
    assert out.shape == (4, 4, 3)
    assert out[0, 0, 0] == 100 and out[3, 0, 0] == 200


def test_frame_buffer_last_writer_wins():
    fb = nb.NativeFrameBuffer(4, 3)
    for i in range(3):
        rgb = np.full((3, 4, 3), i, np.uint8)
        fb.publish(rgb, np.full((3, 4), 0.5 + i, np.float32))
    stamp, rgb, depth = fb.latest()
    assert stamp == 3
    assert rgb[0, 0, 0] == 2
    np.testing.assert_allclose(depth, 2.5, atol=1e-3)


def test_config_roundtrip(tmp_path):
    cfg = VSConfig(lambda_=0.05, num_pairs=32)
    p = tmp_path / "cfg.yaml"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.lambda_ == 0.05 and cfg2.num_pairs == 32
    assert cfg2.c_x == cfg.u_max / 2


def test_serving_redesign_keys_thread_to_the_vit_config(tmp_path):
    """attn_score / kv_pool / kv_pool_impl must flow yaml -> VSConfig ->
    ServoModel.create -> ViTConfig (the pool-campaign configs rely on it)."""
    from vitvs_tpu.harness.pipeline import ServoModel

    p = tmp_path / "cfg.yaml"
    p.write_text("attn_score: softmax\nkv_pool: 2\nkv_pool_impl: matmul\n"
                 "model_name: dinov2_vits14\n")
    cfg = load_config(p)
    model = ServoModel.create(cfg)
    assert model.vit.kv_pool == 2
    assert model.vit.kv_pool_impl == "matmul"
    assert model.vit.attn_score == "softmax"


def test_load_reference_format_config(tmp_path):
    """A YAML with exactly the reference's keys (config.yaml:1-39) loads."""
    p = tmp_path / "ref.yaml"
    p.write_text("""
u_max: 640
v_max: 480
lambda_: 0.03
min_error: 100
max_error: 70000
f_x: 502.3016357421875
f_y: 502.3016357421875
num_pairs: 24
image_path: 'goalrgb.jpg'
max_velocity: 1.0
dino_input_size: 308
background_thresh: 0.005
thresh_filter_keypoints: 1
use_feature_binning: true
num_samples: 500
num_circles: 4
circle_radius_aug: 0.08
velocity_convergence_threshold: 0.00008
velocity_threshold_translation: 0.0000000000000000005
velocity_threshold_rotation: 0.0000000000000000005
error_threshold_ratio: 0.001
error_threshold_absolute_translation: 0.1
error_threshold_absolute_rotation: 0.1
min_iterations: 300
max_iterations: 1500
max_velocity_vector_history: 200
ema_alpha: 0.8
""")
    cfg = load_config(p)
    assert cfg.f_x == 502.3016357421875
    assert cfg.dino_input_size == 308
    assert cfg.use_feature_binning is True
    assert cfg.ema_alpha == 0.8


class _SimSource:
    def __init__(self, scene, cam, pos, quat):
        import jax.numpy as jnp
        from vitvs_tpu.sim import observe

        rgb, depth = observe(scene, cam, pos, quat)
        self.rgb = (np.asarray(rgb) * 255).astype(np.uint8)
        self.depth = np.asarray(depth)

    def get_frame(self):
        return self.rgb, self.depth


class _Sink:
    def __init__(self):
        self.twists = []

    def send_twist(self, t):
        self.twists.append(np.asarray(t))


def test_servo_loop_end_to_end():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_rollout import tiny_setup, GOAL_POS, GOAL_QUAT
    from vitvs_tpu.io_bridge.host_loop import ServoLoop
    from vitvs_tpu.sim import observe

    params, model, scene = tiny_setup(pixel_identity=True)
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    src = _SimSource(scene, model.camera,
                     GOAL_POS + jnp.array([0.05, 0.0, 0.1]), GOAL_QUAT)
    sink = _Sink()
    loop = ServoLoop(params, model, goal_rgb, src, sink)
    infos = loop.run(max_iterations=3)
    assert len(infos) == 3
    assert len(sink.twists) == 3
    assert all(i["num_valid"] >= 4 for i in infos)
    # static camera, deterministic matching modulo PRNG pair selection:
    # commanded twist must be non-trivial (positive approach component)
    assert abs(sink.twists[-1]).max() > 1e-4


def test_io_callback_step():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_rollout import tiny_setup, GOAL_POS, GOAL_QUAT
    from vitvs_tpu.io_bridge.host_loop import make_io_servo_step
    from vitvs_tpu.harness.pipeline import goal_descriptors
    from vitvs_tpu.sim import observe
    import jax

    params, model, scene = tiny_setup(pixel_identity=True)
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    gd = goal_descriptors(params, model, goal_rgb)
    src = _SimSource(scene, model.camera,
                     GOAL_POS + jnp.array([0.0, 0.0, 0.1]), GOAL_QUAT)
    sink = _Sink()
    step = make_io_servo_step(model, src.get_frame, sink.send_twist)
    ev, ei, v, ok = step(params, gd, jnp.zeros(6), jnp.zeros((), bool),
                         jnp.zeros(6), jax.random.PRNGKey(0))
    assert bool(ok)
    assert len(sink.twists) == 1


def test_servo_loop_viz_hook():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_rollout import tiny_setup, GOAL_POS, GOAL_QUAT
    from vitvs_tpu.io_bridge.host_loop import ServoLoop
    from vitvs_tpu.sim import observe

    params, model, scene = tiny_setup(pixel_identity=True)
    goal_rgb, _ = observe(scene, model.camera, GOAL_POS, GOAL_QUAT)
    src = _SimSource(scene, model.camera,
                     GOAL_POS + jnp.array([0.05, 0.0, 0.1]), GOAL_QUAT)
    frames = []
    loop = ServoLoop(params, model, goal_rgb, src, _Sink(),
                     viz_every=1, viz_sink=frames.append)
    loop.run(max_iterations=2)
    assert len(frames) == 2
    assert frames[0].shape == (128, 128, 3)


def test_frame_buffer_ir_roundtrip():
    """Four-sensor mailbox (fb_create_ir/fb_publish_ir/fb_latest_ir): the
    stereo-IR planes ride the same seqlock'd frame as color+depth."""
    fb = nb.NativeFrameBuffer(4, 3, with_ir=True)
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    depth = np.full((3, 4), 1.5, np.float32)
    ir1 = np.arange(12, dtype=np.uint8).reshape(3, 4)
    ir2 = ir1 + 100
    fb.publish(rgb, depth, ir1, ir2)
    stamp, r, d, i1, i2 = fb.latest_ir()
    assert stamp == 1
    np.testing.assert_array_equal(r, rgb)
    np.testing.assert_allclose(d, 1.5, atol=1e-3)
    np.testing.assert_array_equal(i1, ir1)
    np.testing.assert_array_equal(i2, ir2)
    # plain latest() still serves color+depth from the same buffer
    _, r2, _ = fb.latest()
    np.testing.assert_array_equal(r2, rgb)


def test_frame_buffer_ir_guards():
    fb = nb.NativeFrameBuffer(4, 3)
    with pytest.raises(ValueError, match="with_ir"):
        fb.publish(np.zeros((3, 4, 3), np.uint8), np.zeros((3, 4), np.float32),
                   np.zeros((3, 4), np.uint8), np.zeros((3, 4), np.uint8))
    with pytest.raises(ValueError, match="with_ir"):
        fb.latest_ir()
    fbi = nb.NativeFrameBuffer(4, 3, with_ir=True)
    with pytest.raises(ValueError, match="IR shape"):
        fbi.publish(np.zeros((3, 4, 3), np.uint8), np.zeros((3, 4), np.float32),
                    np.zeros((2, 2), np.uint8), np.zeros((3, 4), np.uint8))
