"""Convergence / stopping state machine as a pure scanned function.

Faithful port of the decision logic in `is_visual_servoing_done`
(reference vitvs_v2.py:345-421), restructured as carried state for
`lax.scan` / `lax.while_loop`:

* hard minimum of `min_iterations` (reference literal 300, :347);
* divergence abort when translation error exceeds `divergence_multiplier` x
  initial (2x ViT controller :359, 5x classical ibvs_standard.py:215);
* converged when BOTH errors dropped >= 90% (:364-365) — or when below the
  absolute thresholds (:367-368; note the reference compares the
  centimeter-valued error against 0.01, i.e. 0.1 mm, and we reproduce that
  exactly);
* velocity-trend stop over the last 200 commands split into two 100-sample
  windows (:373-404);
* max-iteration stop (:412-419).

Errors are ground-truth pose errors (cm / deg) as in the reference — a
sim-only oracle (SURVEY §3.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vitvs_tpu.io_bridge.config import VSConfig

WINDOW = 200  # two 100-sample windows (reference literal, vitvs_v2.py:373)


class ConvergenceState(NamedTuple):
    iteration: jnp.ndarray            # () int32, count AFTER current step
    initial_err_trans: jnp.ndarray    # () cm
    initial_err_rot: jnp.ndarray      # () deg
    vel_buffer: jnp.ndarray           # (WINDOW, 6) circular buffer of v_c
    vel_count: jnp.ndarray            # () int32 total writes
    done: jnp.ndarray                 # () bool
    converged: jnp.ndarray            # () bool


def convergence_init(initial_err_trans_cm, initial_err_rot_deg) -> ConvergenceState:
    return ConvergenceState(
        iteration=jnp.zeros((), jnp.int32),
        initial_err_trans=jnp.asarray(initial_err_trans_cm, jnp.float32),
        initial_err_rot=jnp.asarray(initial_err_rot_deg, jnp.float32),
        vel_buffer=jnp.zeros((WINDOW, 6), jnp.float32),
        vel_count=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        converged=jnp.zeros((), bool),
    )


def _window_means(buffer: jnp.ndarray, count: jnp.ndarray):
    """Means of ||v_trans|| (mm/s) and ||v_rot|| (deg/s) over the two
    chronological 100-sample halves of the circular buffer."""
    # chronological order: roll so the oldest sample comes first
    start = count % WINDOW  # next write position == oldest element
    chron = jnp.roll(buffer, -start, axis=0)
    first, second = chron[: WINDOW // 2], chron[WINDOW // 2:]

    def stats(win):
        trans = jnp.linalg.norm(win[:, :3] * 1000.0, axis=1)
        rot = jnp.linalg.norm(jnp.degrees(win[:, 3:]), axis=1)
        return jnp.mean(trans), jnp.mean(rot)

    return stats(first), stats(second)


def convergence_step(
    state: ConvergenceState,
    v_c: jnp.ndarray,
    err_trans_cm: jnp.ndarray,
    err_rot_deg: jnp.ndarray,
    cfg: VSConfig,
    update_velocity: jnp.ndarray | bool = True,
) -> ConvergenceState:
    """One servo iteration's bookkeeping + stop decision.

    Call AFTER computing the smoothed velocity command and the current
    ground-truth errors.  Once done is set, the state freezes (mask-friendly
    for fixed-length scans / batched rollouts).

    `update_velocity=False` reproduces a feature-failure iteration: the
    reference skips the history append (ibvs early-returns before
    vitvs_v2.py:625-628) while the outer loop still counts the iteration.
    """
    frozen = state.done
    update_velocity = jnp.asarray(update_velocity)

    # --- velocity history (vitvs_v2.py:625-628, capped ring of 200)
    write_pos = state.vel_count % WINDOW
    written = state.vel_buffer.at[write_pos].set(v_c.astype(jnp.float32))
    vel_buffer = jnp.where(update_velocity, written, state.vel_buffer)
    vel_count = state.vel_count + update_velocity.astype(jnp.int32)
    iteration = state.iteration + 1

    e0t = state.initial_err_trans
    e0r = state.initial_err_rot

    # --- decision ladder
    past_min = iteration >= cfg.min_iterations
    diverged = err_trans_cm > cfg.divergence_multiplier * e0t

    error_reduced_90 = ((err_trans_cm / e0t) < 0.1) & ((err_rot_deg / e0r) < 0.1)
    error_below_abs = (err_trans_cm < 0.01) & (err_rot_deg < 1.0)  # cm-vs-0.01 kept

    (f_t, f_r), (s_t, s_r) = _window_means(vel_buffer, vel_count)
    have_window = vel_count >= WINDOW
    trend_stop = have_window & (f_t < 1.0) & (f_r < 0.1) & (s_t > f_t) & (s_r > f_r)

    max_iter = iteration >= cfg.max_iterations

    done = past_min & (diverged | trend_stop | max_iter)
    converged = past_min & (
        (diverged & False)
        | (~diverged & trend_stop & error_reduced_90)
        | (~diverged & ~trend_stop & max_iter & error_reduced_90)
    )
    # error_below_abs participates in the reference's `error_converged` but the
    # returned flag on every stop path is error_reduced_90 (vitvs_v2.py:404,414);
    # keep the variable for parity-tracing and API completeness:
    del error_below_abs

    new_state = ConvergenceState(
        iteration=iteration,
        initial_err_trans=e0t,
        initial_err_rot=e0r,
        vel_buffer=vel_buffer,
        vel_count=vel_count,
        done=done,
        converged=converged,
    )

    # freeze once done
    return ConvergenceState(
        *(jnp.where(frozen, old, new) for old, new in zip(state, new_state))
    )
