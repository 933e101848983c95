"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4):
sharded-state stepping must equal unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oxide_control_tpu import suite
from oxide_control_tpu.parallel.mesh import (
    env_sharding,
    make_env_mesh,
    shard_env_state,
)
from oxide_control_tpu.parallel.rollout import rollout


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_step_equals_unsharded():
    benv = suite.load_batched("cartpole", "swingup", 16, dtype=np.float64)
    rng = jax.random.PRNGKey(0)
    data, obs = jax.jit(benv.reset)(rng)

    actions = jnp.tile(jnp.linspace(-1, 1, 16)[:, None], (1, 1))
    k = jax.random.PRNGKey(1)

    # unsharded reference
    d_ref, ts_ref = jax.jit(benv.step)(data, actions, k)

    # sharded over 8 devices
    mesh = make_env_mesh()
    data_s = shard_env_state(mesh, data)
    with mesh:
        d_sh, ts_sh = jax.jit(benv.step)(data_s, actions, k)
    np.testing.assert_allclose(
        np.asarray(ts_sh.observation), np.asarray(ts_ref.observation), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(d_sh.qpos), np.asarray(d_ref.qpos), atol=1e-12
    )
    # output actually sharded over the env axis
    shard_axes = ts_sh.observation.sharding.spec
    assert shard_axes[0] == "env" or d_sh.qpos.sharding.spec[0] == "env"


def test_sharded_rollout_collectives():
    """Rollout consumer reduction across the sharded env axis (BASELINE
    config 4's collective path)."""
    benv = suite.load_batched("pendulum", "swingup", 16, dtype=np.float64)
    rng = jax.random.PRNGKey(0)
    data, _ = jax.jit(benv.reset)(rng)

    # unsharded
    _, _, ret_ref = jax.jit(lambda d, k: rollout(benv, d, k, 5))(
        data, jax.random.PRNGKey(2)
    )

    mesh = make_env_mesh()
    data_s = shard_env_state(mesh, data)
    with mesh:
        _, _, ret_sh = jax.jit(lambda d, k: rollout(benv, d, k, 5))(
            data_s, jax.random.PRNGKey(2)
        )
    np.testing.assert_allclose(float(ret_sh), float(ret_ref), rtol=1e-12)


def test_multitask_sharded_rollout():
    """BASELINE config 4 shape: multiple suite tasks, each sharded over its
    own device group of the mesh, feeding per-task mean returns to the
    consumer."""
    from oxide_control_tpu import suite
    from oxide_control_tpu.parallel.multitask import (
        multitask_rollout, partition_devices,
    )

    benvs = [
        suite.load_batched("pendulum", "swingup", 8, dtype=np.float32),
        suite.load_batched("cartpole", "balance", 8, dtype=np.float32),
    ]
    groups = partition_devices(len(benvs))
    assert len(groups) == 2 and len(groups[0]) == 4  # 8 virtual devices
    out = multitask_rollout(benvs, jax.random.PRNGKey(0), num_steps=5)
    assert len(out) == 2
    for data, ret in out:
        assert np.isfinite(ret)
        assert data.qpos.shape[0] == 8


_HOP_XML = """
<mujoco>
  <option timestep="0.01" solver="Newton" iterations="4" tolerance="0"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1"/>
    <body name="ball" pos="0 0 0.5">
      <joint name="z" type="slide" axis="0 0 1"/>
      <joint name="tilt" type="hinge" axis="0 1 0" range="-1 1" limited="true"/>
      <geom name="b" type="sphere" size="0.15" mass="1"/>
    </body>
  </worldbody>
  <actuator><motor joint="z" gear="10"/></actuator>
</mujoco>
"""


class _HopTask:
    discount = 1.0
    time_limit = 0.15

    def init_episode(self, model, data, rng):
        return data

    def observe(self, model, data):
        return jnp.concatenate([data.qpos, data.qvel])

    def reward(self, model, data, obs, action):
        return jnp.clip(data.qpos[0], 0.0, 1.0)

    def done(self, model, data, obs):
        return data.time > self.time_limit - 1e-6

    def kernel_hooks(self, model):
        from oxide_control_tpu.ops.megakernel import EnvHooks

        return EnvHooks(
            reward=lambda q, v, c: jnp.clip(q[0], 0.0, 1.0),
            time_limit=self.time_limit,
            reset_noise=0.0,
        )


def test_fast_rollout_sharded_equals_unsharded():
    """The Pallas megakernel path under shard_map over the 8-device env
    mesh (VERDICT r2 item 3): per-device tiles are independent, so the
    sharded rollout must reproduce the single-device rollout exactly when
    both see the same per-shard RNG streams — here validated by running
    deterministic physics (reset_noise=0) from identical packed states and
    comparing states after K steps with the SAME ctrl sequence."""
    from oxide_control_tpu.api.environment import BatchedEnvironment
    from oxide_control_tpu.mjcf.compile import load_model_from_xml
    from oxide_control_tpu.ops import megakernel as mk
    from oxide_control_tpu.parallel.mesh import make_env_mesh

    model = load_model_from_xml(_HOP_XML, dtype=np.float32)
    task = _HopTask()
    B, K = 16, 6
    benv = BatchedEnvironment(model, task, B)
    mesh = make_env_mesh()

    # reference: raw single-device kernel on the full batch
    data, _ = jax.jit(benv.reset)(jax.random.PRNGKey(0))
    kern = mk.build_rollout(model, B, K, tile=B, hooks=task.kernel_hooks(model),
                            interpret=True)
    ctrl = jax.random.uniform(jax.random.PRNGKey(3), (K, model.nu, B),
                              minval=-1.0, maxval=1.0, dtype=jnp.float32)
    state0 = (
        jnp.asarray(data.qpos.T, jnp.float32),
        jnp.asarray(data.qvel.T, jnp.float32),
        jnp.zeros((1, B), jnp.float32),
        jnp.asarray(data.qacc_warmstart.T, jnp.float32),
        jnp.asarray(data.time[None, :], jnp.float32),
    )
    seed = jnp.zeros((1,), jnp.int32)

    # sharded copies FIRST (the kernels donate their state arguments)
    from jax.sharding import NamedSharding, PartitionSpec as P

    col = P(None, "env")
    shard = NamedSharding(mesh, col)
    state_s = tuple(jax.device_put(x, shard) for x in state0)
    ctrl_s = jax.device_put(ctrl, NamedSharding(mesh, P(None, None, "env")))

    ref = kern(*state0, ctrl, seed)

    kern_loc = mk.build_rollout(model, B // 8, K, tile=B // 8,
                                hooks=task.kernel_hooks(model), interpret=True)
    fn = jax.shard_map(
        lambda *a: kern_loc(*a),
        mesh=mesh,
        in_specs=(col, col, col, col, col, P(None, None, "env"), P()),
        out_specs=(col,) * 7,
        check_vma=False,
    )
    out = jax.jit(fn)(*state_s, ctrl_s, seed)

    for r, o, name in zip(ref, out,
                          ("qpos", "qvel", "act", "ws", "t", "rew", "div")):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=0, atol=1e-6, err_msg=name
        )
    # outputs actually sharded on the env axis
    assert out[0].sharding.spec[1] == "env"


def test_fast_rollout_mesh_api():
    """FastRollout(mesh=...) end-to-end on the virtual mesh (interpret
    kernel): runs, returns finite rewards, state stays sharded."""
    from oxide_control_tpu.api.environment import BatchedEnvironment
    from oxide_control_tpu.mjcf.compile import load_model_from_xml
    from oxide_control_tpu.parallel.mesh import make_env_mesh
    from oxide_control_tpu.parallel.rollout import FastRollout

    model = load_model_from_xml(_HOP_XML, dtype=np.float32)
    benv = BatchedEnvironment(model, _HopTask(), 16)
    mesh = make_env_mesh()
    roll = FastRollout(benv, steps_per_call=5, tile=2, interpret=True,
                       mesh=mesh)
    state = roll.init(jax.random.PRNGKey(0))
    state, traj = roll.run(state, jax.random.PRNGKey(1))
    rew, div = traj.reward_sum, traj.diverged
    assert np.all(np.isfinite(np.asarray(rew)))
    assert rew.shape == (16,)
    assert np.all(np.asarray(div) == 0)
    assert state[0].sharding.spec[1] == "env"
