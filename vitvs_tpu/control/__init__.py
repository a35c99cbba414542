from vitvs_tpu.control.ibvs import (
    interaction_matrix,
    ibvs_velocity,
    ema_update,
    EmaState,
    body_twist_from_optical,
    depth_at_points,
)
from vitvs_tpu.control.convergence import ConvergenceState, convergence_init, convergence_step

__all__ = [
    "interaction_matrix",
    "ibvs_velocity",
    "ema_update",
    "EmaState",
    "body_twist_from_optical",
    "depth_at_points",
    "ConvergenceState",
    "convergence_init",
    "convergence_step",
]
