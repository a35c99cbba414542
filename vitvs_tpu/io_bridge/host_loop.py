"""Host I/O bridge: real camera in, robot velocity out.

The reference's L1/L2 boundary is ROS pub/sub (`setup_ros_communication`,
vitvs_v2.py:423-442; `gazebo_vel_broadcaster.py`).  Here the device graph
stays pure and host I/O enters at exactly two points:

* :func:`make_io_servo_step` — the jit-native path: `io_callback` pulls the
  latest (rgb, depth) frame inside the jitted graph and pushes the twist
  out, so one device call runs an entire servo iteration including I/O.
* :class:`ServoLoop` — the practical driver: grabs a frame on the host,
  invokes the jitted pipeline, forwards the twist; tracks the same
  feature-failure counter/abort semantics as the reference controller.

Frame sources implement `get_frame() -> (rgb uint8 (H,W,3), depth_m f32
(H,W))`; sinks implement `send_twist(np.ndarray (6,)) -> None`.  The native
C++ sensor bridge (native/sensor_bridge.cpp) provides a lock-free
latest-frame buffer implementing the same last-writer-wins semantics as the
reference's ROS callbacks (vitvs_v2.py:455-462).
"""

from __future__ import annotations

import time
from typing import Callable, Protocol

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import io_callback

from vitvs_tpu.control import EmaState
from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, servo_step


class FrameSource(Protocol):
    def get_frame(self) -> tuple[np.ndarray, np.ndarray]: ...


class TwistSink(Protocol):
    def send_twist(self, twist: np.ndarray) -> None: ...


def make_io_servo_step(model: ServoModel,
                       get_frame: Callable[[], tuple[np.ndarray, np.ndarray]],
                       send_twist: Callable[[np.ndarray], None]):
    """One jitted function = {pull frame -> full pipeline -> push twist}.

    The camera pull and twist push are `io_callback`s at the graph boundary
    (ordered=True: the pull must precede the push).  params and goal
    descriptors are CALL-TIME arguments of the returned step (an earlier
    signature also accepted them here and silently ignored them)."""
    cfg = model.cfg
    h, w = cfg.v_max, cfg.u_max

    def _pull():
        rgb, depth = get_frame()
        return (np.asarray(rgb, np.uint8).reshape(h, w, 3),
                np.asarray(depth, np.float32).reshape(h, w))

    def _push(twist):
        send_twist(np.asarray(twist))
        return np.zeros((), np.int32)

    @jax.jit
    def step(params, goal_desc, ema_value, ema_init, prev_v, key):
        rgb, depth = io_callback(
            _pull, (jax.ShapeDtypeStruct((h, w, 3), jnp.uint8),
                    jax.ShapeDtypeStruct((h, w), jnp.float32)),
            ordered=True)
        res = servo_step(params, model, goal_desc, rgb, depth,
                         EmaState(ema_value, ema_init), prev_v, key)
        io_callback(
            _push, jax.ShapeDtypeStruct((), jnp.int32), res.body_twist,
            ordered=True)
        return res.ema.value, res.ema.initialized, res.v_c, res.feature_ok

    return step


class ServoLoop:
    """Practical host driver mirroring `Controller.run`'s I/O behavior."""

    def __init__(self, params, model: ServoModel, goal_rgb,
                 source: FrameSource, sink: TwistSink, seed: int = 0,
                 viz_every: int = 0, viz_sink=None):
        """viz_every=N renders the correspondence overlay every N iterations
        and passes it to viz_sink(image_uint8) — the offline equivalent of
        the reference's per-frame /camera/image_processed topic
        (vitvs_v2.py:692-700)."""
        self.params = params
        self.model = model
        self.source = source
        self.sink = sink
        self.viz_every = viz_every
        self.viz_sink = viz_sink
        self.goal_rgb = np.asarray(goal_rgb)
        self.goal_desc = jax.jit(
            lambda p, f: goal_descriptors(p, model, f))(params, jnp.asarray(goal_rgb))
        self._step = jax.jit(
            lambda p, gd, rgb, depth, ev, ei, pv, k: servo_step(
                p, model, gd, rgb, depth, EmaState(ev, ei), pv, k))
        self.key = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self):
        self.ema_value = jnp.zeros(6, jnp.float32)
        self.ema_init = jnp.zeros((), bool)
        self.prev_v = jnp.zeros(6, jnp.float32)
        self.fail_count = 0
        self.iteration = 0

    def iterate(self) -> dict:
        rgb, depth = self.source.get_frame()
        self.key, sub = jax.random.split(self.key)
        t0 = time.perf_counter()
        res = self._step(self.params, self.goal_desc, jnp.asarray(rgb),
                         jnp.asarray(depth, jnp.float32),
                         self.ema_value, self.ema_init, self.prev_v, sub)
        twist = np.asarray(res.body_twist)
        dt = time.perf_counter() - t0

        ok = bool(res.feature_ok)
        self.fail_count = 0 if ok else self.fail_count + 1
        if self.fail_count >= self.model.cfg.max_feature_failures:
            # reference: RuntimeError('Persistent feature detection failure')
            raise RuntimeError("Persistent feature detection failure")

        self.sink.send_twist(twist)
        if self.viz_every and self.iteration % self.viz_every == 0 and ok:
            from vitvs_tpu.harness import viz as _viz

            img = _viz.draw_points(
                np.asarray(rgb),
                np.asarray(res.s_uv)[np.asarray(res.valid)],
                np.asarray(res.s_uv_star)[np.asarray(res.valid)])
            if self.viz_sink is not None:
                self.viz_sink(img)
        self.ema_value = res.ema.value
        self.ema_init = res.ema.initialized
        self.prev_v = res.v_c
        self.iteration += 1
        return {
            "iteration": self.iteration,
            "v_c": np.asarray(res.v_c),
            "twist": twist,
            "feature_ok": ok,
            "num_valid": int(res.num_valid),
            "mean_sim": float(res.mean_sim),
            "step_time_s": dt,
        }

    def run(self, max_iterations: int | None = None,
            should_stop: Callable[[dict], bool] | None = None):
        max_it = max_iterations or self.model.cfg.max_iterations
        infos = []
        for _ in range(max_it):
            info = self.iterate()
            infos.append(info)
            if should_stop and should_stop(info):
                break
        return infos
