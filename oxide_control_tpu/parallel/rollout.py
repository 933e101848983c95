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
import numpy as np

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


# ---------------------------------------------------------------------------
# megakernel fast path: whole K-step rollout as one Pallas kernel
# ---------------------------------------------------------------------------


def fast_rollout_supported(benv: BatchedEnvironment) -> bool:
    """True if (model, task) qualify for the Pallas rollout megakernel:
    the model is in the scalar-graph class (ops/scalar_graph.supports) and
    the task exposes in-kernel env hooks (reward on qpos/qvel/ctrl only)."""
    from ..ops import megakernel as mk

    return mk.supports(benv.model) and hasattr(benv.task, "kernel_hooks")


class FastRollout:
    """K environment steps per device call, entirely inside one Pallas
    kernel (physics + reward + termination + masked auto-reset), with a
    uniform-random policy sampled on device.

    Usage::

        roll = FastRollout(benv, steps_per_call=100)
        state = roll.init(jax.random.PRNGKey(0))
        state, reward_sum, diverged = roll.run(state, jax.random.PRNGKey(1))

    ``reward_sum`` is the per-env sum of rewards over the K steps
    (auto-reset lanes keep accumulating, as a throughput consumer would).

    Multi-chip: pass ``mesh`` (1-D env mesh, parallel.mesh.make_env_mesh)
    and the kernel runs under ``shard_map`` with the env axis of the
    coordinate-major state sharded across devices — per-device tiles are
    already independent, so the rollout is embarrassingly SPMD and the
    only collective is whatever the consumer does with the rewards.
    """

    def __init__(self, benv: BatchedEnvironment, steps_per_call: int,
                 tile: int = 1024, interpret: bool = False, mesh=None):
        from ..ops import megakernel as mk

        if not fast_rollout_supported(benv):
            raise ValueError(
                "model/task not kernel-eligible (needs the scalar-graph "
                "model class: Newton+Euler/RK4, plane contacts, scalar-"
                "joint actuators — see ops.scalar_graph.supports — "
                "and task.kernel_hooks); use jit_rollout for the general path"
            )
        model = benv.model
        self.benv = benv
        self.steps_per_call = steps_per_call
        self.mesh = mesh
        self._nq, self._nv, self._nu = model.nq, model.nv, model.nu
        b = benv.num_envs
        hooks = benv.task.kernel_hooks(model)
        n_shards = 1 if mesh is None else mesh.size
        assert b % n_shards == 0, (b, n_shards)
        b_local = b // n_shards
        tile = min(tile, b_local)
        kernel = mk.build_rollout(
            model, b_local, steps_per_call, tile=tile, hooks=hooks,
            interpret=interpret,
        )

        def bundle(qpos, qvel, act, ws, time, rng):
            if mesh is not None:
                # per-device RNG stream: fold in the env-axis position
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(mesh.axis_names[0])
                )
            k_ctrl, k_seed = jax.random.split(rng)
            ctrl = jax.random.uniform(
                k_ctrl, (steps_per_call, max(model.nu, 1), b_local),
                minval=-1.0, maxval=1.0, dtype=qpos.dtype,
            )
            seed = jax.random.randint(
                k_seed, (1,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
            )
            return kernel(qpos, qvel, act, ws, time, ctrl, seed)

        if mesh is None:
            self._bundle = jax.jit(bundle, donate_argnums=(0, 1, 2, 3, 4))
        else:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            col = P(None, axis)  # coordinate-major: env axis is axis 1
            sharded = jax.shard_map(
                bundle, mesh=mesh,
                in_specs=(col, col, col, col, col, P()),
                out_specs=(col,) * 7,
                check_vma=False,
            )
            self._bundle = jax.jit(sharded, donate_argnums=(0, 1, 2, 3, 4))

    def init(self, rng: jax.Array):
        """Batched reset -> coordinate-major kernel state (sharded over the
        mesh's env axis when a mesh was given)."""
        data, _ = jax.jit(self.benv.reset)(rng)
        state = self.pack(data)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
            state = tuple(jax.device_put(x, shard) for x in state)
        return state

    def pack(self, data: Data):
        """Data pytree (env-major) -> kernel state (coordinate-major);
        na == 0 models carry one zero act row (see megakernel docstring)."""
        b = data.qpos.shape[0]
        act = data.act.T
        if act.shape[0] == 0:
            act = jnp.zeros((1, b), dtype=data.qpos.dtype)
        return (
            data.qpos.T,
            data.qvel.T,
            act,
            data.qacc_warmstart.T,
            data.time[None, :],
        )

    def run(self, state, rng: jax.Array):
        """One K-step kernel call.

        Returns ``(new_state, reward_sum (B,), diverged_count (B,))`` —
        the divergence counter is the kernel's observability surface
        (SURVEY.md 5.5): how many divergence-triggered auto-resets each
        env lane took during the K steps."""
        qpos, qvel, act, ws, time, rew, div = self._bundle(*state, rng)
        return (qpos, qvel, act, ws, time), rew[0], div[0]
