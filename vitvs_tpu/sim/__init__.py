from vitvs_tpu.sim.scene import Scene, render, make_synthetic_poster
from vitvs_tpu.sim.perturb import perturb_texture
from vitvs_tpu.sim.env import observe, env_step

__all__ = [
    "Scene",
    "render",
    "make_synthetic_poster",
    "perturb_texture",
    "observe",
    "env_step",
]
