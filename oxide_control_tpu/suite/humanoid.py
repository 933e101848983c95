"""Humanoid stand / walk / run (BASELINE.md config 3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model
from ..state import Data
from . import rewards
from .common import load_asset

_STAND_HEIGHT = 1.4
_WALK_SPEED = 1.0
_RUN_SPEED = 10.0
_TIME_LIMIT = 25.0


class _Humanoid:
    discount = 1.0

    def __init__(self, model: Model, move_speed: float, time_limit: float = _TIME_LIMIT):
        self.move_speed = move_speed
        self.time_limit = time_limit
        self._head = model.name2id("body", "head")
        self._torso = model.name2id("body", "torso")

    def init_episode(self, model: Model, data: Data, rng) -> Data:
        k1, k2 = jax.random.split(rng)
        noise = 0.01 * jax.random.normal(k1, (model.nq,), dtype=data.qpos.dtype)
        # keep the root quaternion valid: perturb only position + joints
        noise = noise.at[3:7].set(0.0)
        qvel = 0.01 * jax.random.normal(k2, (model.nv,), dtype=data.qvel.dtype)
        return data.replace(qpos=data.qpos + noise, qvel=qvel)

    def observe(self, model: Model, data: Data):
        # joint angles (root xy excluded: translation-invariant), root height
        # + orientation, velocities
        return jnp.concatenate([data.qpos[2:], data.qvel])

    def reward(self, model: Model, data: Data, obs, action):
        head_height = data.xpos[self._head][2]
        torso_upright = data.xmat[self._torso][2, 2]
        standing = rewards.tolerance(
            head_height, bounds=(_STAND_HEIGHT, jnp.inf), margin=_STAND_HEIGHT / 4
        )
        upright = rewards.tolerance(
            torso_upright, bounds=(0.9, jnp.inf), margin=1.9,
            value_at_margin=0.0, sigmoid="linear",
        )
        stand_reward = standing * upright
        small_control = rewards.tolerance(
            jnp.asarray(action), margin=1.0, value_at_margin=0.0,
            sigmoid="quadratic",
        ).mean()
        small_control = (4.0 + small_control) / 5.0
        # horizontal com velocity approximated by the free-root linear vel
        # (world frame for free joints)
        horiz = jnp.linalg.norm(data.qvel[0:2])
        if self.move_speed == 0:
            dont_move = rewards.tolerance(data.qvel[0:2], margin=2.0).mean()
            return small_control * stand_reward * dont_move
        move = rewards.tolerance(
            horiz, bounds=(self.move_speed, jnp.inf), margin=self.move_speed,
            value_at_margin=0.0, sigmoid="linear",
        )
        move = (5.0 * move + 1.0) / 6.0
        return small_control * stand_reward * move

    def done(self, model: Model, data: Data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model: Model):
        """In-kernel env layer for the Pallas rollout megakernel.

        Head height and torso uprightness come from the scalar-graph FK
        (EnvHooks.needs_fk) — the same body-frame expressions the kernel
        step computes, instead of a hand-derived quaternion reconstruction
        (VERDICT r3 weak #9).  Reset randomization equals init_episode
        exactly: qpos ~ qpos0 + N(0, 0.01^2) (quaternion untouched),
        qvel ~ N(0, 0.01^2)."""
        from ..ops.megakernel import EnvHooks

        head_b = model.name2id("body", "head")
        torso_b = self._torso
        move_speed = self.move_speed

        def reward(q, v, ctrl, fk):
            m22 = fk["xmat"][torso_b][8]  # torso z-axis . world z
            head_height = fk["xpos"][head_b][2]
            standing = rewards.tolerance(
                head_height, bounds=(_STAND_HEIGHT, jnp.inf),
                margin=_STAND_HEIGHT / 4,
            )
            upright = rewards.tolerance(
                m22, bounds=(0.9, jnp.inf), margin=1.9,
                value_at_margin=0.0, sigmoid="linear",
            )
            stand_reward = standing * upright
            sc = sum(
                rewards.tolerance(c, margin=1.0, value_at_margin=0.0,
                                  sigmoid="quadratic")
                for c in ctrl
            ) / len(ctrl)
            small_control = (4.0 + sc) / 5.0
            if move_speed == 0:
                dont_move = 0.5 * (
                    rewards.tolerance(v[0], margin=2.0)
                    + rewards.tolerance(v[1], margin=2.0)
                )
                return small_control * stand_reward * dont_move
            horiz = jnp.sqrt(v[0] * v[0] + v[1] * v[1])
            move = rewards.tolerance(
                horiz, bounds=(move_speed, jnp.inf), margin=move_speed,
                value_at_margin=0.0, sigmoid="linear",
            )
            move = (5.0 * move + 1.0) / 6.0
            return small_control * stand_reward * move

        def observe(q, v):
            # == self.observe: concat(qpos[2:], qvel)
            return list(q[2:]) + list(v)

        sigma = np.full(model.nq, 0.01)
        sigma[3:7] = 0.0  # keep the root quaternion exactly at identity
        return EnvHooks(
            reward=reward,
            time_limit=self.time_limit,
            reset_qpos_sigma=sigma,
            reset_qvel_sigma=0.01,
            observe=observe,
            n_obs=(model.nq - 2) + model.nv,
            needs_fk=True,
        )


def _make(speed):
    def factory(model: Model | None = None, dtype=None, **kw):
        m = model if model is not None else load_asset("humanoid", dtype=dtype or np.float64)
        return m, _Humanoid(m, move_speed=speed, **kw)

    return factory


stand = _make(0.0)
walk = _make(_WALK_SPEED)
run = _make(_RUN_SPEED)
