"""vitvs_tpu — a TPU-native visual-servoing framework.

Rebuilds the capabilities of ViT-VS (arXiv:2503.04545; reference implementation:
a ROS1 + Gazebo + PyTorch pipeline) as a single jitted JAX/Pallas graph per
servo iteration:

    camera frame -> preprocess -> DINOv2-style ViT patch descriptors
                 -> dense cosine-similarity correspondence (cyclical consistency)
                 -> IBVS control law (interaction matrix + damped pseudo-inverse)
                 -> 6-DoF camera velocity

plus a pure-function camera/scene simulator replacing Gazebo so whole
closed-loop rollouts run on-device (``lax.scan``), ``vmap`` over environments,
and ``jax.sharding`` meshes for multi-chip evaluation.

Subpackages
-----------
core      camera model, SE(3)/quaternion math, image preprocessing
models    pure-JAX DINOv2-style ViT, facet extraction, weight conversion
ops       Pallas TPU kernels (attention, fused cosine matching) + XLA fallbacks
match     dense patch correspondence pipeline (fixed-k, masked)
control   IBVS law, EMA smoothing, convergence state machine
sim       textured-plane pinhole renderer + twist integrator (Gazebo stand-in)
harness   pose samplers, episode rollouts, benchmark driver, npz results, eval
parallel  device-mesh sharding helpers for batched rollouts
io_bridge host camera/actuation I/O via io_callback, config, CLI
classical classical (intensity-gradient) feature pipeline, SIFT-class capability
"""

__version__ = "0.1.0"

from vitvs_tpu.core.camera import CameraIntrinsics  # noqa: F401
from vitvs_tpu.io_bridge.config import VSConfig, load_config  # noqa: F401
