"""Rollout collection over sharded env batches (BASELINE config 4:
"multi-task suite sharded across hosts feeding a rollout consumer via
collectives").

``rollout`` runs T lockstep env steps under one jit with the env axis
sharded over the mesh; the consumer reduction (mean return across all envs)
crosses the sharded axis, so XLA lowers it to an all-reduce over ICI/DCN —
the engine's collective path.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..api.environment import BatchedEnvironment
from ..state import Data


def rollout(
    benv: BatchedEnvironment,
    data: Data,
    rng: jax.Array,
    num_steps: int,
    policy=None,
):
    """Run `num_steps` lockstep steps, returning (final_data, trajectory,
    mean_return).

    policy: optional fn (rng, obs_batch) -> action_batch; defaults to
    uniform random actions in [-1, 1].
    """
    model = benv.model
    nu = model.nu
    b = benv.num_envs

    def default_policy(key, obs):
        return jax.random.uniform(
            key, (b, nu), minval=-1.0, maxval=1.0, dtype=data.qpos.dtype
        )

    policy_fn = policy or default_policy

    def body(carry, key):
        d, obs = carry
        k_act, k_reset = jax.random.split(key)
        action = policy_fn(k_act, obs)
        d, ts = benv.step(d, action, k_reset)
        return (d, ts.observation), (ts.reward, ts.done)

    obs0 = jax.vmap(lambda dd: benv.task.observe(model, dd))(data)
    keys = jax.random.split(rng, num_steps)
    (data, _), (rewards, dones) = jax.lax.scan(body, (data, obs0), keys)
    # consumer reduction across the (sharded) env axis -> XLA all-reduce
    mean_return = jnp.mean(jnp.sum(rewards, axis=0))
    return data, (rewards, dones), mean_return


def jit_rollout(benv: BatchedEnvironment, num_steps: int, donate: bool = True):
    """Compile a rollout step bundle with donated state for in-place reuse."""
    fn = partial(rollout, benv, num_steps=num_steps)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
