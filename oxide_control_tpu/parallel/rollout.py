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
    the model is in the scalar-graph class (ops/scalar_graph.supports),
    the task exposes in-kernel env hooks, and — for tasks whose
    observation reads sensordata — every sensor is in the kernel family
    (scalar_graph.sensors_supported)."""
    from ..ops import megakernel as mk
    from ..ops import scalar_graph as sg

    if not (mk.supports(benv.model) and hasattr(benv.task, "kernel_hooks")):
        return False
    hooks = benv.task.kernel_hooks(benv.model)
    if hooks.needs_sensors and not sg.sensors_supported(benv.model):
        return False
    return True


class Trajectory:
    """Per-call rollout outputs (struct-of-arrays, time-major).

    Always present: ``reward_sum (B,)`` (per-env sum over the K steps;
    auto-reset lanes keep accumulating) and ``diverged (B,)`` (divergence-
    triggered auto-reset count, SURVEY.md 5.5 observability).  A step that
    DIVERGED (state non-finite or beyond the mjMAXVAL analog) contributes
    reward 0 — its reward would be computed from garbage state — and sets
    the done flag; consumers see a clean (finite) reward stream.

    With ``collect=True``: ``obs (K, n_obs, B)`` — the pre-step observation
    the policy acted on at each step — plus per-step ``rewards (K, B)`` and
    ``dones (K, B)``, and ``ctrls (K, nu, B)`` when an in-kernel policy
    generated the actions.  Together: the (s_t, a_t, r_t, done_t) tuple an
    RL consumer trains on, matching the reference's contract that ``step``
    yields an observation every step (lib.rs:68-87).
    """

    def __init__(self, reward_sum, diverged, obs=None, rewards=None,
                 dones=None, ctrls=None):
        self.reward_sum = reward_sum
        self.diverged = diverged
        self.obs = obs
        self.rewards = rewards
        self.dones = dones
        self.ctrls = ctrls


class FastRollout:
    """K environment steps per device call, entirely inside one Pallas
    kernel (physics + observation + policy + reward + termination + masked
    auto-reset).

    Actions come from either a uniform-random stream sampled on device
    (default) or an in-kernel tanh-MLP policy (``policy=MLPPolicy(...)``)
    whose parameters are runtime inputs — update them between calls without
    recompiling.  With ``collect=True`` each call also returns the full
    per-step (obs, action, reward, done) trajectory.

    Usage::

        roll = FastRollout(benv, steps_per_call=100,
                           policy=MLPPolicy((64, 64)), collect=True)
        params = roll.init_params(jax.random.PRNGKey(0))
        state = roll.init(jax.random.PRNGKey(1))
        state, traj = roll.run(state, jax.random.PRNGKey(2), params)
        # traj.obs (K, n_obs, B), traj.ctrls (K, nu, B), traj.rewards,
        # traj.dones, traj.reward_sum, traj.diverged

    Multi-chip: pass ``mesh`` (1-D env mesh, parallel.mesh.make_env_mesh)
    and the kernel runs under ``shard_map`` with the env axis of the
    coordinate-major state sharded across devices and the policy params
    replicated — per-device tiles are independent, so the rollout is
    embarrassingly SPMD and the only collective is whatever the consumer
    does with the trajectories.
    """

    def __init__(self, benv: BatchedEnvironment, steps_per_call: int,
                 tile: int = 1024, interpret: bool = False, mesh=None,
                 policy=None, collect: bool = False,
                 applied_forces: bool = False):
        from ..ops import megakernel as mk

        if not fast_rollout_supported(benv):
            raise ValueError(
                "model/task not kernel-eligible (see the exact class spec "
                "in ops.scalar_graph.supports, and task.kernel_hooks); "
                "use jit_rollout for the general path"
            )
        model = benv.model
        self.benv = benv
        self.steps_per_call = steps_per_call
        self.mesh = mesh
        self.policy = policy
        self.collect = collect
        self._nq, self._nv, self._nu = model.nq, model.nv, model.nu
        b = benv.num_envs
        hooks = benv.task.kernel_hooks(model)
        if (policy is not None or collect) and hooks.observe is None:
            raise ValueError(
                "task.kernel_hooks does not define observe; in-kernel "
                "policy/trajectory collection needs the observation hook"
            )
        self.n_obs = hooks.n_obs
        # accelerometer-family sensor observations carry the previous
        # step's stage-1 qacc as a 6th kernel state element
        from ..ops import scalar_graph as sg
        from ..model import SensorType as _ST

        self._carry_qacc = bool(hooks.needs_sensors) and any(
            _ST(t) in sg._ACC_SENSORS for t in model.sensor_type
        )
        self._n_state = 6 if self._carry_qacc else 5
        n_shards = 1 if mesh is None else mesh.size
        assert b % n_shards == 0, (b, n_shards)
        b_local = b // n_shards
        tile = min(tile, b_local)
        kernel = mk.build_rollout(
            model, b_local, steps_per_call, tile=tile, hooks=hooks,
            interpret=interpret, emit_obs=collect, policy=policy,
            applied_forces=applied_forces,
        )
        self._applied_forces = applied_forces
        n_state = self._n_state

        # runtime mocap poses + equality-active lanes (r5 kernel-class
        # admissions): always passed so the jit signature is stable;
        # defaults are the model's mocap rest pose / eq_active0
        self._nmocap, self._neq = model.nmocap, model.neq
        if model.nmocap:
            rows = []
            for bid in range(model.nbody):
                if model.body_mocapid[bid] >= 0:
                    rows.append(np.concatenate([
                        np.asarray(jax.device_get(model.body_pos[bid])),
                        np.asarray(jax.device_get(model.body_quat[bid])),
                    ]))
            flat7 = np.concatenate(rows)  # (7*nmocap,)
            self._default_mocap = jnp.asarray(
                np.broadcast_to(flat7[:, None], (7 * model.nmocap, b)).copy()
            )
        else:
            self._default_mocap = None
        if model.neq:
            ea0 = np.asarray(model.eq_active0, dtype=np.float32)
            self._default_eqact = jnp.asarray(
                np.broadcast_to(ea0[:, None], (model.neq, b)).copy()
            )
        else:
            self._default_eqact = None

        def bundle(state, rng, params, mocap, eq_active, frc):
            if mesh is not None:
                # per-device RNG stream: fold in the env-axis position
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(mesh.axis_names[0])
                )
            k_ctrl, k_seed = jax.random.split(rng)
            seed = jax.random.randint(
                k_seed, (1,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
            )
            dtype = state[0].dtype
            extra = ()
            if model.nmocap:
                extra = extra + (mocap.astype(dtype),)
            if model.neq:
                extra = extra + (eq_active.astype(dtype),)
            if applied_forces:
                extra = extra + (frc[0].astype(dtype), frc[1].astype(dtype))
            if policy is None:
                ctrl = jax.random.uniform(
                    k_ctrl, (steps_per_call, max(model.nu, 1), b_local),
                    minval=-1.0, maxval=1.0, dtype=dtype,
                )
                return kernel(*state, ctrl, seed, *extra)
            flat = [leaf.astype(dtype) for wb in params for leaf in wb]
            return kernel(*state, seed, *flat, *extra)

        if mesh is None:
            self._bundle = jax.jit(bundle, donate_argnums=(0,))
        else:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            col = P(None, axis)  # coordinate-major: env axis is axis 1
            # trajectories: env axis is last
            traj3 = P(None, None, axis)
            traj2 = P(None, axis)
            out = [col] * (n_state + 2)
            if collect:
                out += [traj3, traj2, traj2]
                if policy is not None:
                    out.append(traj3)
            # params are replicated: P() is a pytree-prefix spec covering
            # every (W, b) leaf; mocap/eq_active are per-env (col) or
            # absent (P() prefix over None)
            moc_spec = col if model.nmocap else P()
            eq_spec = col if model.neq else P()
            frc_spec = (col, col) if applied_forces else P()
            sharded = jax.shard_map(
                bundle, mesh=mesh,
                in_specs=((col,) * n_state, P(), P(), moc_spec, eq_spec,
                          frc_spec),
                out_specs=tuple(out),
                check_vma=False,
            )
            self._bundle = jax.jit(sharded, donate_argnums=(0,))

    def init_params(self, rng: jax.Array, dtype=None):
        """Xavier-init policy parameters (list of (W, b) pairs)."""
        assert self.policy is not None
        dtype = dtype or jnp.float32
        return self.policy.init_params(rng, self.n_obs, self._nu, dtype)

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
        na == 0 models carry one zero act row (see megakernel docstring).
        Sensor-observing rollouts additionally carry ``data.qacc`` (the
        acceleration the accelerometer family reads)."""
        b = data.qpos.shape[0]
        act = data.act.T
        if act.shape[0] == 0:
            act = jnp.zeros((1, b), dtype=data.qpos.dtype)
        state = (
            data.qpos.T,
            data.qvel.T,
            act,
            data.qacc_warmstart.T,
            data.time[None, :],
        )
        if self._carry_qacc:
            state = state + (data.qacc.T,)
        return state

    def run(self, state, rng: jax.Array, params=None, mocap_pos=None,
            mocap_quat=None, eq_active=None, qfrc_applied=None,
            xfrc_applied=None):
        """One K-step kernel call.

        Returns ``(new_state, Trajectory)``.  ``params`` (from
        :meth:`init_params`) is required when the rollout carries an
        in-kernel policy, ignored otherwise.

        Mocap models: ``mocap_pos (B, nmocap, 3)`` / ``mocap_quat
        (B, nmocap, 4)`` move the mocap bodies (constant within the K
        steps; defaults to the model rest pose).  Equality models:
        ``eq_active (B, neq)`` 0/1 toggles equality constraints per env
        (Data.eq_active semantics; defaults to eq_active0).  All are
        runtime inputs — no recompile."""
        mocap = self._default_mocap
        if mocap_pos is not None or mocap_quat is not None:
            nm, b = self._nmocap, self._default_mocap.shape[1]
            pos = (jnp.asarray(mocap_pos) if mocap_pos is not None else
                   self._default_mocap.reshape(nm, 7, b)[:, :3]
                   .transpose(2, 0, 1))
            quat = (jnp.asarray(mocap_quat) if mocap_quat is not None else
                    self._default_mocap.reshape(nm, 7, b)[:, 3:]
                    .transpose(2, 0, 1))
            # (B, nmocap, 3/4) -> (nmocap, 7, B) -> (7*nmocap, B)
            mocap = jnp.concatenate(
                [pos.transpose(1, 2, 0), quat.transpose(1, 2, 0)], axis=1
            ).reshape(7 * nm, b)
        eqa = self._default_eqact
        if eq_active is not None:
            eqa = jnp.asarray(eq_active).astype(jnp.float32).T
        frc = None
        if self._applied_forces:
            # Data.qfrc_applied (B, nv) / xfrc_applied (B, nbody, 6) ->
            # coordinate-major rows; default zero (no perturbation)
            b = state[0].shape[1]
            m = self.benv.model
            qf = (jnp.asarray(qfrc_applied).T if qfrc_applied is not None
                  else jnp.zeros((m.nv, b), jnp.float32))
            xf = (jnp.asarray(xfrc_applied).reshape(b, 6 * m.nbody).T
                  if xfrc_applied is not None
                  else jnp.zeros((6 * m.nbody, b), jnp.float32))
            frc = (qf, xf)
        elif qfrc_applied is not None or xfrc_applied is not None:
            raise ValueError(
                "pass applied_forces=True to FastRollout to use "
                "qfrc_applied/xfrc_applied"
            )
        out = self._bundle(tuple(state), rng, params, mocap, eqa, frc)
        ns = self._n_state
        traj = Trajectory(reward_sum=out[ns][0], diverged=out[ns + 1][0])
        if self.collect:
            traj.obs, traj.rewards, traj.dones = out[ns + 2:ns + 5]
            if self.policy is not None:
                traj.ctrls = out[ns + 5]
        return tuple(out[:ns]), traj
