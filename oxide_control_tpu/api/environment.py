"""Environment / Task abstraction: the TPU-native analog of the reference's
L3 layer (/root/reference/src/lib.rs).

The reference's trait quartet maps to pure functions over pytrees
(SURVEY.md §7):

* ``Task`` (lib.rs:8-16)        -> a Python object of pure methods
  (init_episode / observe / reward / done) + a ``discount`` constant.
* ``Observation`` (lib.rs:18-21)-> the array returned by ``Task.observe``.
* ``Action::apply`` via the ``Actuators`` proxy (lib.rs:23-26)
                                -> the ctrl argument of ``step`` ("only ctrl
  is writable" enforced by function signature instead of a borrow proxy).
* ``TimeStep`` enum (lib.rs:50-60) -> a struct-of-arrays pytree with a
  ``done`` mask (enum -> mask: lockstep batches cannot branch).  A terminal
  step carries discount 0, matching the discount-free ``Finish`` variant.
* ``Environment::step`` (lib.rs:68-87) -> ``Environment.step``: one jitted
  pure function preserving the §3.1 ordering
  (apply ctrl -> physics step -> observe -> reward -> terminate?).

``BatchedEnvironment`` adds the engine's scaling axis: vmapped lockstep
stepping with per-env RNG keys, masked auto-reset of finished/diverged envs
(SURVEY.md §3.4 note), and sharding over a device mesh.
"""

from __future__ import annotations

from typing import Any, Protocol

import jax
import jax.numpy as jnp

from ..model import Model
from ..physics import forward as _forward
from ..state import Data, make_data
from ..utils.divergence import divergence_flags
from ..utils.struct import pytree_dataclass


class Task(Protocol):
    """Episode logic (reference trait Task, lib.rs:8-16). All methods pure."""

    discount: float  # constant per task (lib.rs:12)

    def init_episode(self, model: Model, data: Data, rng: jax.Array) -> Data:
        """Episode randomization/reset (lib.rs:13). Must return a valid core
        state; derived quantities are recomputed by the caller."""
        ...

    def observe(self, model: Model, data: Data) -> jax.Array:
        """Pure read of physics state into an observation (lib.rs:18-21)."""
        ...

    def reward(self, model: Model, data: Data, obs, action) -> jax.Array:
        """Reward from observation+action (lib.rs:15). The full data is also
        provided since most control-suite rewards read physics state."""
        ...

    def done(self, model: Model, data: Data, obs) -> jax.Array:
        """Termination predicate (lib.rs:14)."""
        ...


@pytree_dataclass
class TimeStep:
    """Struct-of-arrays analog of the reference TimeStep enum (lib.rs:50-60):
    ``done=False`` lanes are Step{obs, reward, discount}; ``done=True`` lanes
    are Finish{obs, reward} with discount forced to 0."""

    observation: Any
    reward: jax.Array
    discount: jax.Array
    done: jax.Array


class Environment:
    """Single-env functional environment (reference Environment<T>,
    lib.rs:28-48)."""

    def __init__(self, model: Model, task: Task):
        self._model = model
        self._task = task

    @property
    def model(self) -> Model:
        return self._model

    @property
    def task(self) -> Task:
        return self._task

    def reset(self, rng: jax.Array) -> tuple[Data, Any]:
        """init_episode + observation (reference Environment::reset,
        lib.rs:63-66 — returns a bare observation, no TimeStep)."""
        data = make_data(self._model)
        data = self._task.init_episode(self._model, data, rng)
        data = _forward.forward(self._model, data)
        return data, self._task.observe(self._model, data)

    def step(self, data: Data, action) -> tuple[Data, TimeStep]:
        """One control step preserving the reference ordering (lib.rs:68-87):
        apply ctrl -> physics step -> observe -> reward -> terminate?."""
        dtype = data.qpos.dtype
        data = data.replace(ctrl=jnp.asarray(action, dtype=dtype))
        data = _forward.step(self._model, data)
        # refresh position-derived quantities so the observation reflects the
        # post-integration state (the dm_control lazy-mj_forward idiom)
        from ..physics import smooth as _smooth

        data = _smooth.kinematics(self._model, data)
        # extend the lazy-forward idiom to sensordata: dm_control's
        # observation reads trigger mj_forward at the post-step state, so
        # pos/vel-stage sensors are FRESH at observe time (not the
        # pre-integration values mj_step left behind); see sensor_refresh
        data = _forward.sensor_refresh(self._model, data)
        obs = self._task.observe(self._model, data)
        reward = self._task.reward(self._model, data, obs, action)
        done = self._task.done(self._model, data, obs)
        done = done | divergence_flags(self._model, data)
        discount = jnp.where(done, 0.0, self._task.discount).astype(dtype)
        ts = TimeStep(
            observation=obs,
            reward=jnp.asarray(reward, dtype=dtype),
            discount=discount,
            done=done,
        )
        return data, ts


class BatchedEnvironment:
    """Lockstep batch of environments with masked auto-reset.

    The scaling axis of the engine (SURVEY.md §2.3): a leading env axis on
    the state pytree, stepped by one jitted SPMD program.  Finished or
    diverged lanes are re-initialized in place with fresh per-env RNG keys
    (the batched analog of MuJoCo's auto-reset; lockstep batches can't
    pause one env).
    """

    def __init__(self, model: Model, task: Task, num_envs: int,
                 auto_reset: bool = True):
        self._model = model
        self._task = task
        self._env = Environment(model, task)
        self.num_envs = num_envs
        self.auto_reset = auto_reset

    @property
    def model(self) -> Model:
        return self._model

    @property
    def task(self) -> Task:
        return self._task

    def reset(self, rng: jax.Array) -> tuple[Data, Any]:
        """Vectorized reset. rng: single key, split per env."""
        keys = jax.random.split(rng, self.num_envs)
        return jax.vmap(self._env.reset)(keys)

    def _reset_one(self, rng: jax.Array) -> Data:
        # No full forward here: auto-reset lanes only need a valid *core*
        # state — derived quantities are recomputed by the next step's
        # forward, and the TimeStep reports the pre-reset observation.
        # Sensors are the exception: the post-reset observation a policy
        # acts on must carry valid sensordata (pos/vel fresh; the acc
        # family reads the zero qacc — the megakernel's zeroed carry
        # matches this exactly), so refresh them at the reset state.
        data = make_data(self._model)
        data = self._task.init_episode(self._model, data, rng)
        if self._model.nsensor:
            from ..physics import smooth as _smooth

            data = _smooth.kinematics(self._model, data)
            data = _forward.sensor_refresh(self._model, data)
        return data

    def step(self, data: Data, action, rng: jax.Array):
        """Vectorized step + masked auto-reset.

        Returns (new_data, TimeStep).  The TimeStep reports the *pre-reset*
        terminal observation/reward (reference semantics: the Finish step
        carries the final observation, lib.rs:56-59); lanes that finished
        have their state re-initialized in new_data.
        """
        data, ts = jax.vmap(self._env.step, in_axes=(0, 0))(data, action)
        if self.auto_reset:
            keys = jax.random.split(rng, self.num_envs)
            fresh = jax.vmap(self._reset_one)(keys)
            data = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(ts.done, (-1,) + (1,) * (old.ndim - 1)), new, old
                ),
                fresh,
                data,
            )
        return data, ts
