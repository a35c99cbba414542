"""Descriptor fine-tuning — in-sim feature adaptation.

The reference has NO training ("the ViT is frozen, pretrained,
inference-only", SURVEY overview).  This subsystem goes beyond it: because
the simulator is differentiable-friendly and the scene geometry is known
analytically, GROUND-TRUTH patch correspondences between any two camera
views are available in closed form (project patch centers through the plane),
which supervises an InfoNCE objective over the dense descriptors:

    two views of the scene  ->  ViT descriptors  ->  contrastive loss
    against the geometric correspondence  ->  adamw update.

Uses: adapting descriptors to a deployment scene/texture domain, recovering
servo-able features from weak checkpoints, or training small descriptor
models from scratch for embedded settings (tests demonstrate a randomly
initialized tiny ViT learning matchable features in tens of steps).

The train step is a single jitted function of (params, opt_state, batch) and
shards over a (dp, tp) mesh exactly like inference (parallel/mesh.py):
batch over dp, parameters over tp — XLA inserts the gradient all-reduces.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from vitvs_tpu.core import camera as camera_mod
from vitvs_tpu.core import se3

from vitvs_tpu.harness.pipeline import ServoModel, preprocess
from vitvs_tpu.models.extractor import extract_descriptors
from vitvs_tpu.sim import Scene, observe, perturb_texture


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# Geometric supervision
# ---------------------------------------------------------------------------


def _patch_centers_px(model: ServoModel) -> jnp.ndarray:
    """(t, 2) patch-centre pixel coordinates (u, v) in the CAMERA frame."""
    gh, gw = model.grid()
    s = model.cfg.dino_input_size
    scale = s / gh
    rows = (jnp.arange(gh) + 0.5) * scale
    cols = (jnp.arange(gw) + 0.5) * scale
    vv, uu = jnp.meshgrid(rows, cols, indexing="ij")
    u = uu * model.cfg.u_max / s
    v = vv * model.cfg.v_max / s
    return jnp.stack([u, v], -1).reshape(-1, 2)


def geometric_correspondences(
    model: ServoModel, scene: Scene,
    pos_a: jnp.ndarray, quat_a: jnp.ndarray,
    pos_b: jnp.ndarray, quat_b: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ground-truth patch map A->B via the plane geometry.

    Returns (idx (t,) int32 — target patch in view B for each patch of view
    A, valid (t,) bool — ray hits the poster and lands inside view B)."""
    cam = model.camera
    gh, gw = model.grid()
    uv = _patch_centers_px(model)                       # (t, 2)
    uv_b, world, t_hit, z = camera_mod.reproject_via_plane(
        cam, uv, pos_a, quat_a, pos_b, quat_b, scene.plane_z)
    hit = t_hit > 1e-6
    on_poster = (hit
                 & (jnp.abs(world[:, 0]) <= scene.half_size[0])
                 & (jnp.abs(world[:, 1]) <= scene.half_size[1]))
    u_b, v_b = uv_b[:, 0], uv_b[:, 1]
    in_front = z > 1e-6
    s = model.cfg.dino_input_size
    gu = u_b * s / model.cfg.u_max / (s / gw)           # patch col in B
    gv = v_b * s / model.cfg.v_max / (s / gh)           # patch row in B
    col = jnp.floor(gu).astype(jnp.int32)
    row = jnp.floor(gv).astype(jnp.int32)
    inside = (col >= 0) & (col < gw) & (row >= 0) & (row < gh)
    idx = jnp.clip(row, 0, gh - 1) * gw + jnp.clip(col, 0, gw - 1)
    return idx, on_poster & in_front & inside


def make_pair_batch(model: ServoModel, scene: Scene, key: jax.Array,
                    batch: int, pos_noise: float = 0.08,
                    rot_noise_deg: float = 10.0, perturb: bool = True):
    """Render `batch` view pairs around the goal pose with GT correspondence.

    Returns dict of (B, ...) arrays: img_a, img_b (preprocessed), idx, valid.
    """
    from vitvs_tpu.harness.samplers import DESIRED_ORIENTATION, DESIRED_POSITION

    goal_p = jnp.asarray(DESIRED_POSITION, jnp.float32)
    goal_q = jnp.asarray(DESIRED_ORIENTATION, jnp.float32)

    def one(k):
        ka, kb, kr, kt = jax.random.split(k, 4)
        pa = goal_p + jax.random.uniform(ka, (3,), minval=-pos_noise, maxval=pos_noise)
        pb = goal_p + jax.random.uniform(kb, (3,), minval=-pos_noise, maxval=pos_noise)
        ang = jax.random.uniform(kr, (2,), minval=-jnp.radians(rot_noise_deg),
                                 maxval=jnp.radians(rot_noise_deg))
        qa = se3.rotate_about_body_x(goal_q, ang[0])
        qb = se3.rotate_about_body_x(goal_q, ang[1])
        sc = scene
        if perturb:
            sc = scene._replace(texture=perturb_texture(kt, scene.texture))
        rgb_a, _ = observe(sc, model.camera, pa, qa)
        rgb_b, _ = observe(sc, model.camera, pb, qb)
        idx, valid = geometric_correspondences(model, scene, pa, qa, pb, qb)
        return {
            "img_a": preprocess(model, rgb_a),
            "img_b": preprocess(model, rgb_b),
            "idx": idx,
            "valid": valid,
        }

    return jax.vmap(one)(jax.random.split(key, batch))


def make_servo_pair_batch(
    model: ServoModel, scene: Scene, key: jax.Array, batch: int,
    box=(1.2, 1.2, 0.3),                 # BOX_SAMPLE_SIZE (vitvs_v2.py:1393)
    rot_range_deg: float = 135.0,        # covers ±120° spins mod the 90° search
    focal_radius: float = 0.32,          # focal circles (vitvs_v2.py:981-1010)
    perturb_prob: float = 0.5,
    min_z: float = 0.12,
):
    """Goal-view/episode-view training pairs — the benchmark's ACTUAL matching
    task: view A is the goal pose on the clean texture (the serving goal
    image, a constant), view B an episode-like start pose (uniform box
    position, look-at orientation toward a focal point near the poster
    centre, optical-axis spin), optionally on a perturbed texture (the
    perturbation sweeps swap the poster per episode while the goal image
    stays clean — generate_perturbed_models.py + vitvs_v2.py:1440).

    Returns (goal_img (S,S,3), dict of (B, ...): img_b, idx_ab, valid_ab,
    idx_ba, valid_ba).
    """
    from vitvs_tpu.harness.samplers import (DESIRED_ORIENTATION,
                                            DESIRED_POSITION, REFERENCE_POINT)

    goal_p = jnp.asarray(DESIRED_POSITION, jnp.float32)
    goal_q = jnp.asarray(DESIRED_ORIENTATION, jnp.float32)
    half = jnp.asarray(box, jnp.float32) / 2.0
    ref = jnp.asarray(REFERENCE_POINT, jnp.float32)

    goal_rgb, _ = observe(scene, model.camera, goal_p, goal_q)
    goal_img = preprocess(model, goal_rgb)

    def one(k):
        kp, kf, kr, kt, kb = jax.random.split(k, 5)
        pb = goal_p + jax.random.uniform(kp, (3,), minval=-half, maxval=half)
        pb = pb.at[2].set(jnp.maximum(pb[2], min_z))  # stay above the plane
        foc = ref + focal_radius * jnp.append(
            jax.random.uniform(kf, (2,), minval=-1.0, maxval=1.0), 0.0)
        qb = se3.look_at_quaternion(pb, foc)
        spin = jax.random.uniform(kr, (), minval=-jnp.radians(rot_range_deg),
                                  maxval=jnp.radians(rot_range_deg))
        qb = se3.rotate_about_body_x(qb, spin)
        tex = jnp.where(jax.random.bernoulli(kb, perturb_prob),
                        perturb_texture(kt, scene.texture), scene.texture)
        rgb_b, _ = observe(scene._replace(texture=tex), model.camera, pb, qb)
        idx_ab, valid_ab = geometric_correspondences(
            model, scene, goal_p, goal_q, pb, qb)
        idx_ba, valid_ba = geometric_correspondences(
            model, scene, pb, qb, goal_p, goal_q)
        return {
            "img_b": preprocess(model, rgb_b),
            "idx_ab": idx_ab, "valid_ab": valid_ab,
            "idx_ba": idx_ba, "valid_ba": valid_ba,
        }

    return goal_img, jax.vmap(one)(jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# Loss + train step
# ---------------------------------------------------------------------------


def info_nce_loss(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                  idx: jnp.ndarray, valid: jnp.ndarray,
                  temperature: float = 0.1) -> jnp.ndarray:
    """Contrastive matching loss over one view pair.

    desc_a/desc_b: (t, d); idx: (t,) GT target in B; valid: (t,) mask."""
    a = desc_a / (jnp.linalg.norm(desc_a, axis=-1, keepdims=True) + 1e-8)
    b = desc_b / (jnp.linalg.norm(desc_b, axis=-1, keepdims=True) + 1e-8)
    logits = (a @ b.T) / temperature                    # (t, t)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, idx[:, None], axis=1)[:, 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _batch_loss(params, model: ServoModel, batch) -> jnp.ndarray:
    def one(img_a, img_b, idx, valid):
        imgs = jnp.stack([img_a, img_b])
        desc = extract_descriptors(
            params, model.vit, imgs, layer=model.cfg.layer, facet=model.cfg.facet,
            bin=False,  # train on raw facet descriptors; binning is linear
            compute_dtype=model.compute_dtype, precision=model.precision,
        )[:, 0]
        return info_nce_loss(desc[0].astype(jnp.float32),
                             desc[1].astype(jnp.float32), idx, valid)

    losses = jax.vmap(one)(batch["img_a"], batch["img_b"], batch["idx"], batch["valid"])
    return jnp.mean(losses)


def make_train_step(model: ServoModel, optimizer):
    """Jitted (state, batch) -> (state, loss) adamw/whatever-optax step."""

    @jax.jit
    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(
            lambda p: _batch_loss(p, model, batch))(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def train_descriptor_model(params, model: ServoModel, scene: Scene,
                           steps: int = 100, batch: int = 4,
                           learning_rate: float = 3e-4, seed: int = 0,
                           verbose: bool = False):
    """Convenience loop: fine-tune descriptors on sim view pairs."""
    import optax

    optimizer = optax.adamw(learning_rate)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        batch_data = make_pair_batch(model, scene, sub, batch)
        state, loss = step_fn(state, batch_data)
        losses.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"[train] step {i}: loss {losses[-1]:.4f}", flush=True)
    return state, losses


# ---------------------------------------------------------------------------
# Servo-descriptor training (goal view vs episode views, scanned on-device)
# ---------------------------------------------------------------------------


def _servo_batch_loss(params, model: ServoModel, goal_img, batch) -> jnp.ndarray:
    """Symmetric InfoNCE between the (shared) goal view and B episode views.

    The goal descriptor is computed ONCE per step and every episode view is
    extracted in one batched forward — matching the serving structure where
    goal descriptors are a per-episode constant (harness/pipeline.py)."""
    imgs = jnp.concatenate([goal_img[None], batch["img_b"]], axis=0)
    desc = extract_descriptors(
        params, model.vit, imgs, layer=model.cfg.layer, facet=model.cfg.facet,
        bin=False,  # binning is linear; train on raw facet descriptors
        compute_dtype=model.compute_dtype, precision=model.precision,
    )[:, 0].astype(jnp.float32)
    d_goal, d_eps = desc[0], desc[1:]

    def one(db, idx_ab, valid_ab, idx_ba, valid_ba):
        return 0.5 * (info_nce_loss(d_goal, db, idx_ab, valid_ab)
                      + info_nce_loss(db, d_goal, idx_ba, valid_ba))

    losses = jax.vmap(one)(d_eps, batch["idx_ab"], batch["valid_ab"],
                           batch["idx_ba"], batch["valid_ba"])
    return jnp.mean(losses)


def make_servo_train_epoch(model: ServoModel, optimizer, scene: Scene,
                           batch: int, steps_per_call: int,
                           perturb_prob: float = 0.5):
    """One jitted call = `steps_per_call` full train steps via lax.scan
    (batch rendering included) — amortizes the host->TPU round trip, which
    otherwise dominates at ~30 ms per blocking call in this environment.

    Scene arrays are jit arguments (closure captures embed in the remote
    compile payload)."""

    @jax.jit
    def epoch(state: TrainState, scene_arg: Scene, key: jax.Array):
        def body(state, k):
            kb, _ = jax.random.split(k)
            goal_img, batch_data = make_servo_pair_batch(
                model, scene_arg, kb, batch, perturb_prob=perturb_prob)
            loss, grads = jax.value_and_grad(
                lambda p: _servo_batch_loss(p, model, goal_img, batch_data)
            )(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            import optax

            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return jax.lax.scan(body, state, jax.random.split(key, steps_per_call))

    return epoch


def matching_quality(params, model: ServoModel, scene: Scene, key: jax.Array,
                     num_views: int = 8, num_pairs: int | None = None):
    """Serving-path evaluation: run the actual correspondence matcher between
    the goal view and episode-like views; report (mean valid-pair fraction,
    mean patch-index agreement with the geometric ground truth)."""
    from vitvs_tpu.match import find_correspondences
    from vitvs_tpu.harness.pipeline import goal_descriptors, preprocess as _pre

    k = num_pairs or model.cfg.num_pairs
    grid = model.grid()
    goal_img, batch = make_servo_pair_batch(model, scene, key, num_views,
                                            perturb_prob=0.0)

    src_q = model.source_quantized_bins

    def _desc(params, img):
        # the ACTUAL serving descriptor path (mirrors pipeline.servo_step):
        # quantized extraction, and source-quantized bins when enabled
        d = extract_descriptors(
            params, model.vit, img[None], layer=model.cfg.layer,
            facet=model.cfg.facet, bin=model.materialize_bins and not src_q,
            compute_dtype=model.compute_dtype, precision=model.precision,
            quantized=model.quantized)[0, 0]
        if src_q:
            from vitvs_tpu.match.binned import quantize_binned_int8

            d = quantize_binned_int8(d, grid)
        return d

    def _match(gd, db, kk):
        sim = None
        if model.binned and model.fast_binned_match:
            from vitvs_tpu.match.binned import binned_cosine_similarity

            sim = binned_cosine_similarity(gd, db, grid,
                                           precision=model.precision,
                                           int8=model.quantized)
        return find_correspondences(
            gd, db, grid, k, kk,
            distance_threshold=model.cfg.thresh_filter_keypoints,
            precision=model.precision, use_kernel=model.use_match_kernel,
            int8=model.quantized, sim_matrix=sim)

    @jax.jit
    def run(params, goal_img, batch, key):
        gd = _desc(params, goal_img)

        def one(img_b, idx_ab, valid_ab, kk):
            db = _desc(params, img_b)
            m = _match(gd, db, kk)
            # ground truth: patch m.points1 (goal) should land at idx_ab
            pts1 = m.points1.astype(jnp.int32)
            pts2 = m.points2.astype(jnp.int32)
            p1 = pts1[:, 0] * grid[1] + pts1[:, 1]
            p2 = pts2[:, 0] * grid[1] + pts2[:, 1]
            gt = idx_ab[p1]
            gt_ok = valid_ab[p1]
            # count a match correct if within one patch of the GT target
            r2, c2 = p2 // grid[1], p2 % grid[1]
            rg, cg = gt // grid[1], gt % grid[1]
            near = (jnp.abs(r2 - rg) <= 1) & (jnp.abs(c2 - cg) <= 1)
            correct = jnp.sum(jnp.where(m.valid & gt_ok, near, False))
            denom = jnp.maximum(jnp.sum(m.valid & gt_ok), 1)
            return m.num_valid / k, correct / denom

        frac, acc = jax.vmap(one)(batch["img_b"], batch["idx_ab"],
                                  batch["valid_ab"],
                                  jax.random.split(key, num_views))
        return jnp.mean(frac), jnp.mean(acc)

    f, a = run(params, goal_img, batch, key)
    return float(f), float(a)
