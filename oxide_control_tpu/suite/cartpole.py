"""Cartpole balance / swingup (BASELINE.md config 1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model
from ..state import Data
from . import rewards
from .common import load_asset, uniform

_TIME_LIMIT = 10.0


class _Cartpole:
    discount = 1.0

    def __init__(self, model: Model, swing_up: bool, time_limit: float = _TIME_LIMIT):
        self.swing_up = swing_up
        self.time_limit = time_limit
        self._slider = model.jnt_qposadr[model.name2id("joint", "slider")]
        self._hinge = model.jnt_qposadr[model.name2id("joint", "hinge")]

    def init_episode(self, model: Model, data: Data, rng) -> Data:
        k1, k2, k3 = jax.random.split(rng, 3)
        dt = data.qpos.dtype
        if self.swing_up:
            x = 0.01 * jax.random.normal(k1, dtype=dt)
            theta = (jnp.pi + 0.01 * jax.random.normal(k2, dtype=dt)).astype(dt)
        else:
            x = uniform(k1, -0.1, 0.1, dtype=dt)
            theta = uniform(k2, -0.034, 0.034, dtype=dt)
        qpos = data.qpos.at[self._slider].set(x).at[self._hinge].set(theta)
        qvel = 0.01 * jax.random.normal(k3, (model.nv,), dtype=data.qvel.dtype)
        return data.replace(qpos=qpos, qvel=qvel)

    def observe(self, model: Model, data: Data):
        x = data.qpos[self._slider]
        theta = data.qpos[self._hinge]
        return jnp.concatenate(
            [jnp.stack([x, jnp.cos(theta), jnp.sin(theta)]), data.qvel]
        )

    def reward(self, model: Model, data: Data, obs, action):
        # dm_control cartpole smooth reward: upright * small_control *
        # small_velocity * centered
        cos_theta = obs[1]
        upright = (cos_theta + 1.0) / 2.0
        centered = rewards.tolerance(obs[0], margin=2.0)
        centered = (1.0 + centered) / 2.0
        small_control = rewards.tolerance(
            jnp.asarray(action).reshape(-1)[0], margin=1.0,
            value_at_margin=0.0, sigmoid="quadratic",
        )
        small_control = (4.0 + small_control) / 5.0
        ang_vel = data.qvel[1]
        small_velocity = rewards.tolerance(ang_vel, margin=5.0)
        small_velocity = (1.0 + small_velocity) / 2.0
        return upright * small_control * small_velocity * centered

    def done(self, model: Model, data: Data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model: Model):
        """In-kernel env layer for the Pallas rollout megakernel: the
        reward reads qpos/qvel/ctrl only; swingup resets target the
        pole-down pose (theta = pi) like init_episode."""
        from ..ops.megakernel import EnvHooks

        slider, hinge = self._slider, self._hinge

        def reward(q, v, ctrl):
            upright = (jnp.cos(q[hinge]) + 1.0) / 2.0
            centered = (1.0 + rewards.tolerance(q[slider], margin=2.0)) / 2.0
            small_control = (4.0 + rewards.tolerance(
                ctrl[0], margin=1.0, value_at_margin=0.0, sigmoid="quadratic",
            )) / 5.0
            small_velocity = (1.0 + rewards.tolerance(v[1], margin=5.0)) / 2.0
            return upright * small_control * small_velocity * centered

        def observe(q, v):
            # == self.observe: [x, cos(theta), sin(theta), qvel...]
            return [q[slider], jnp.cos(q[hinge]), jnp.sin(q[hinge])] + list(v)

        # exact init_episode distribution (reset-parity with the API env):
        # swingup: x ~ N(0, 0.01^2), theta ~ pi + N(0, 0.01^2);
        # balance: x ~ U(-0.1, 0.1), theta ~ U(-0.034, 0.034);
        # both:    qvel ~ N(0, 0.01^2)
        qpos0 = np.asarray(jax.device_get(model.qpos0)).copy()
        mask = np.zeros(model.nq)
        sigma = np.zeros(model.nq)
        if self.swing_up:
            qpos0[hinge] = np.pi
            sigma[slider] = 0.01
            sigma[hinge] = 0.01
        else:
            mask[slider] = 0.1
            mask[hinge] = 0.034
        return EnvHooks(
            reward=reward,
            time_limit=self.time_limit,
            reset_noise=1.0,  # per-coordinate amplitude carried by the mask
            reset_mask=mask,
            reset_qpos0=qpos0,
            reset_qpos_sigma=sigma,
            reset_qvel_sigma=0.01,
            observe=observe,
            n_obs=3 + model.nv,
        )


def balance(model: Model | None = None, dtype=None, **kw):
    model = model if model is not None else load_asset("cartpole", dtype=dtype or np.float64)
    return model, _Cartpole(model, swing_up=False, **kw)


def swingup(model: Model | None = None, dtype=None, **kw):
    model = model if model is not None else load_asset("cartpole", dtype=dtype or np.float64)
    return model, _Cartpole(model, swing_up=True, **kw)
