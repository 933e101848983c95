"""Control suite: dm_control-style tasks over the TPU-native engine.

The reference ships zero tasks (SURVEY.md §0 consequence 3); these implement
the BASELINE.json config ladder: pendulum swingup, cartpole balance/swingup,
cheetah run, walker stand/walk/run, humanoid stand/walk/run.

Usage::

    env = suite.load("cheetah", "run")                 # single functional env
    benv = suite.load_batched("cheetah", "run", 4096)  # lockstep batch
"""

from __future__ import annotations

import numpy as np

from ..api.environment import BatchedEnvironment, Environment
from . import cartpole, cheetah, humanoid, pendulum, walker
from .common import asset_path, load_asset

_REGISTRY = {
    ("pendulum", "swingup"): pendulum.swingup,
    ("cartpole", "balance"): cartpole.balance,
    ("cartpole", "swingup"): cartpole.swingup,
    ("cheetah", "run"): cheetah.run,
    ("walker", "stand"): walker.stand,
    ("walker", "walk"): walker.walk,
    ("walker", "run"): walker.run,
    ("humanoid", "stand"): humanoid.stand,
    ("humanoid", "walk"): humanoid.walk,
    ("humanoid", "run"): humanoid.run,
}

ALL_TASKS = tuple(sorted(_REGISTRY))
BENCHMARK_TASKS = ALL_TASKS


def load(domain: str, task: str, dtype=np.float64, **kwargs) -> Environment:
    """Build a single functional Environment for (domain, task)."""
    try:
        factory = _REGISTRY[(domain, task)]
    except KeyError:
        raise ValueError(
            f"unknown task {domain}/{task}; available: {ALL_TASKS}"
        ) from None
    model, task_obj = factory(dtype=dtype, **kwargs)
    return Environment(model, task_obj)


def load_batched(
    domain: str, task: str, num_envs: int, dtype=np.float32, **kwargs
) -> BatchedEnvironment:
    """Build a lockstep BatchedEnvironment (f32 by default: TPU path)."""
    try:
        factory = _REGISTRY[(domain, task)]
    except KeyError:
        raise ValueError(
            f"unknown task {domain}/{task}; available: {ALL_TASKS}"
        ) from None
    model, task_obj = factory(dtype=dtype, **kwargs)
    return BatchedEnvironment(model, task_obj, num_envs)
