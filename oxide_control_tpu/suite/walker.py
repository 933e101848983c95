"""Planar walker stand / walk / run (BASELINE.md config 2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model
from ..state import Data
from . import rewards
from .common import load_asset, randomize_limited_joints

_STAND_HEIGHT = 1.2
_WALK_SPEED = 1.0
_RUN_SPEED = 8.0
_TIME_LIMIT = 25.0


class _Walker:
    discount = 1.0

    def __init__(self, model: Model, move_speed: float, time_limit: float = _TIME_LIMIT):
        self.move_speed = move_speed
        self.time_limit = time_limit
        self._torso = model.name2id("body", "torso")

    def init_episode(self, model: Model, data: Data, rng) -> Data:
        k1, k2 = jax.random.split(rng)
        qpos = randomize_limited_joints(model, data.qpos, k1, fraction=0.1)
        qvel = 0.01 * jax.random.normal(k2, (model.nv,), dtype=data.qvel.dtype)
        return data.replace(qpos=qpos, qvel=qvel)

    def observe(self, model: Model, data: Data):
        # orientations + height + velocity (dm_control walker style, reduced:
        # rootx is translation-invariant and excluded)
        height = data.qpos[0] + 1.3  # rootz is relative to the initial 1.3
        return jnp.concatenate(
            [jnp.stack([height]), data.qpos[2:], data.qvel]
        )

    def _stand_reward(self, model: Model, data: Data):
        torso_height = data.xpos[self._torso][2]
        torso_upright = data.xmat[self._torso][2, 2]
        standing = rewards.tolerance(
            torso_height, bounds=(_STAND_HEIGHT, jnp.inf), margin=_STAND_HEIGHT / 2
        )
        upright = (1.0 + torso_upright) / 2.0
        return (3.0 * standing + upright) / 4.0

    def reward(self, model: Model, data: Data, obs, action):
        stand = self._stand_reward(model, data)
        if self.move_speed == 0:
            return stand
        speed = data.qvel[1]  # rootx velocity
        move = rewards.tolerance(
            speed, bounds=(self.move_speed, jnp.inf),
            margin=self.move_speed / 2, value_at_margin=0.5, sigmoid="linear",
        )
        return stand * (5.0 * move + 1.0) / 6.0

    def done(self, model: Model, data: Data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model: Model):
        """In-kernel env layer for the Pallas rollout megakernel.

        The reward reads the torso frame from the scalar-graph FK
        (EnvHooks.needs_fk): the SAME expressions the kernel step already
        computes, so there is no hand-derived frame reconstruction to keep
        in sync (VERDICT r3 weak #9).  Reset randomization equals
        init_episode exactly: limited joints uniform within 10% of their
        range around the range MIDPOINT (randomize_limited_joints),
        qvel ~ N(0, 0.01^2)."""
        from ..ops.megakernel import EnvHooks

        move_speed = self.move_speed
        torso = self._torso

        def reward(q, v, ctrl, fk):
            torso_height = fk["xpos"][torso][2]
            torso_upright = fk["xmat"][torso][8]
            standing = rewards.tolerance(
                torso_height, bounds=(_STAND_HEIGHT, jnp.inf),
                margin=_STAND_HEIGHT / 2,
            )
            upright = (1.0 + torso_upright) / 2.0
            stand = (3.0 * standing + upright) / 4.0
            if move_speed == 0:
                return stand
            move = rewards.tolerance(
                v[1], bounds=(move_speed, jnp.inf),
                margin=move_speed / 2, value_at_margin=0.5, sigmoid="linear",
            )
            return stand * (5.0 * move + 1.0) / 6.0

        def observe(q, v):
            # == self.observe: concat([1.3 + rootz], qpos[2:], qvel)
            return [1.3 + q[0]] + list(q[2:]) + list(v)

        mask = np.zeros(model.nq)
        qpos0 = np.asarray(jax.device_get(model.qpos0)).copy()
        for j in range(model.njnt):
            if model.jnt_limited[j]:
                rng_j = np.asarray(jax.device_get(model.jnt_range))[j]
                adr = model.jnt_qposadr[j]
                mask[adr] = 0.05 * float(rng_j[1] - rng_j[0])
                # randomize_limited_joints centers on the range midpoint,
                # not on qpos0
                qpos0[adr] = 0.5 * float(rng_j[0] + rng_j[1])
        return EnvHooks(
            reward=reward,
            time_limit=self.time_limit,
            reset_noise=1.0,  # amplitude carried per-coordinate by the mask
            reset_mask=mask,
            reset_qpos0=qpos0,
            reset_qvel_sigma=0.01,
            observe=observe,
            n_obs=1 + (model.nq - 2) + model.nv,
            needs_fk=True,
        )


def _make(speed):
    def factory(model: Model | None = None, dtype=None, **kw):
        m = model if model is not None else load_asset("walker", dtype=dtype or np.float64)
        return m, _Walker(m, move_speed=speed, **kw)

    return factory


stand = _make(0.0)
walk = _make(_WALK_SPEED)
run = _make(_RUN_SPEED)
