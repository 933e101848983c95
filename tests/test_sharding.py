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
