from vitvs_tpu.sim.scene import (Scene, load_poster_scene,
                                 make_synthetic_poster, render, render_ir)
from vitvs_tpu.sim.perturb import perturb_texture
from vitvs_tpu.sim.env import observe, env_step
from vitvs_tpu.sim.pointcloud import organized_point_cloud

__all__ = [
    "Scene",
    "render",
    "render_ir",
    "load_poster_scene",
    "make_synthetic_poster",
    "perturb_texture",
    "observe",
    "env_step",
    "organized_point_cloud",
]
