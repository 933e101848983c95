"""Cheetah run (BASELINE.md config 2; the flagship benchmark model)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model
from ..state import Data
from . import rewards
from .common import load_asset

_RUN_SPEED = 10.0
_TIME_LIMIT = 10.0


class Run:
    """Run forward as fast as possible (dm_control cheetah.run style:
    reward = tolerance(forward speed, (10, inf), margin=10, linear))."""

    discount = 1.0

    def __init__(self, model: Model, time_limit: float = _TIME_LIMIT):
        self.time_limit = time_limit

    def init_episode(self, model: Model, data: Data, rng) -> Data:
        # random perturbation of the leg joints (the root stays high enough
        # that the feet start above the floor)
        noise = 0.1 * jax.random.uniform(
            rng, (model.nq,), dtype=data.qpos.dtype, minval=-1.0, maxval=1.0
        )
        noise = noise.at[:3].set(0.0)  # keep root pose
        return data.replace(qpos=data.qpos + noise)

    def observe(self, model: Model, data: Data):
        # position (without rootx, which is translation-invariant) + velocity
        return jnp.concatenate([data.qpos[1:], data.qvel])

    def reward(self, model: Model, data: Data, obs, action):
        speed = data.qvel[0]
        return rewards.tolerance(
            speed, bounds=(_RUN_SPEED, jnp.inf), margin=_RUN_SPEED,
            value_at_margin=0.0, sigmoid="linear",
        )

    def done(self, model: Model, data: Data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model: Model):
        """In-kernel env layer for the Pallas rollout megakernel: same
        reward/termination/reset semantics as the methods above, expressed
        on scalar-graph values (ops/megakernel.py)."""
        from ..ops.megakernel import EnvHooks

        mask = np.ones(model.nq)
        mask[:3] = 0.0  # init_episode keeps the root pose

        def reward(q, v, ctrl):
            # tolerance(speed, (RUN_SPEED, inf), margin=RUN_SPEED,
            # value_at_margin=0, sigmoid=linear) == clip(speed/RUN_SPEED, 0, 1)
            return jnp.clip(v[0] / _RUN_SPEED, 0.0, 1.0)

        def observe(q, v):
            # == self.observe: concat(qpos[1:], qvel)
            return list(q[1:]) + list(v)

        return EnvHooks(
            reward=reward,
            time_limit=self.time_limit,
            reset_noise=0.1,
            reset_mask=mask,
            observe=observe,
            n_obs=(model.nq - 1) + model.nv,
        )


def run(model: Model | None = None, dtype=None, **kw):
    model = model if model is not None else load_asset("cheetah", dtype=dtype or np.float64)
    return model, Run(model, **kw)
