"""Pendulum swingup (BASELINE.md config 0)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model import Model
from ..state import Data
from . import rewards
from .common import load_asset, uniform

_TIME_LIMIT = 20.0


class SwingUp:
    """Swing the pole upright and balance (dm_control pendulum.swingup
    style: reward = tolerance(cos(angle), (0.95, 1), margin=1.95))."""

    discount = 1.0

    def __init__(self, model: Model, time_limit: float = _TIME_LIMIT):
        self.time_limit = time_limit
        self._hinge_qadr = model.jnt_qposadr[model.name2id("joint", "hinge")]

    def init_episode(self, model: Model, data: Data, rng) -> Data:
        angle = uniform(rng, -jnp.pi, jnp.pi, dtype=data.qpos.dtype)
        qpos = data.qpos.at[self._hinge_qadr].set(angle)
        return data.replace(qpos=qpos)

    def observe(self, model: Model, data: Data):
        theta = data.qpos[self._hinge_qadr]
        return jnp.stack([jnp.cos(theta), jnp.sin(theta), data.qvel[0]])

    def reward(self, model: Model, data: Data, obs, action):
        return rewards.tolerance(obs[0], bounds=(0.95, 1.0), margin=1.95)

    def done(self, model: Model, data: Data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model: Model):
        """In-kernel env layer for the Pallas rollout megakernel: reward =
        tolerance(cos(theta), (0.95, 1), margin=1.95); resets randomize the
        hinge uniformly over [-pi, pi] like init_episode."""
        from ..ops.megakernel import EnvHooks
        import numpy as np

        qadr = self._hinge_qadr

        def reward(q, v, ctrl):
            return rewards.tolerance(
                jnp.cos(q[qadr]), bounds=(0.95, 1.0), margin=1.95
            )

        def observe(q, v):
            # == self.observe: [cos(theta), sin(theta), qvel[0]]
            return [jnp.cos(q[qadr]), jnp.sin(q[qadr]), v[0]]

        mask = np.zeros(model.nq)
        mask[qadr] = np.pi
        return EnvHooks(
            reward=reward,
            time_limit=self.time_limit,
            reset_noise=1.0,
            reset_mask=mask,
            observe=observe,
            n_obs=3,
        )


def swingup(model: Model | None = None, dtype=None, **kwargs):
    import numpy as np

    model = model if model is not None else load_asset(
        "pendulum", dtype=dtype or np.float64
    )
    return model, SwingUp(model, **kwargs)
