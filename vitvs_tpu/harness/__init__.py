from vitvs_tpu.harness.pipeline import ServoModel, goal_descriptors, servo_step
from vitvs_tpu.harness.rollout import rollout_episode, find_best_start_pose
from vitvs_tpu.harness import samplers, results, evals

__all__ = [
    "ServoModel",
    "goal_descriptors",
    "servo_step",
    "rollout_episode",
    "find_best_start_pose",
    "samplers",
    "results",
    "evals",
]
