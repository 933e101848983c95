"""Shared helpers for the control suite tasks."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..mjcf.compile import load_model
from ..model import Model

ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


@functools.lru_cache(maxsize=None)
def _load_cached(name: str, dtype_str: str) -> Model:
    return load_model(
        os.path.join(ASSET_DIR, f"{name}.xml"), dtype=np.dtype(dtype_str)
    )


def load_asset(name: str, dtype=np.float64) -> Model:
    """Load and compile a suite asset model, cached per (name, dtype)."""
    return _load_cached(name, np.dtype(dtype).name)


def asset_path(name: str) -> str:
    return os.path.join(ASSET_DIR, f"{name}.xml")


def uniform(rng, lo, hi, shape=(), dtype=None):
    u = jax.random.uniform(rng, shape) if dtype is None else \
        jax.random.uniform(rng, shape, dtype=dtype)
    val = lo + (hi - lo) * u
    # keep the caller's storage dtype: under x64 the python-float bounds
    # promote to f64, which scatter into an f32 qpos would reject
    return val if dtype is None else val.astype(dtype)


def randomize_limited_joints(model: Model, qpos, rng, fraction=1.0):
    """Uniformly randomize limited scalar joints within `fraction` of their
    range (the dm_control randomizers.randomize_limited_and_rotational_joints
    idiom for limited hinges/slides)."""
    from ..model import JointType

    keys = jax.random.split(rng, max(model.njnt, 1))
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        if model.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            continue
        adr = model.jnt_qposadr[j]
        lo, hi = model.jnt_range[j][0], model.jnt_range[j][1]
        mid = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo) * fraction
        val = mid + uniform(keys[j], -half, half)
        qpos = qpos.at[adr].set(jnp.asarray(val, dtype=qpos.dtype))
    return qpos


class SensorObsWrapper:
    """Task wrapper appending the model's sensordata to the observation on
    BOTH paths: ``data.sensordata`` (refreshed post-step by the env layer,
    api/environment.py) on the general path, and the in-kernel sensor rows
    (scalar_graph.build_sensors via ``EnvHooks.needs_sensors``) on the
    megakernel path — the normal way real-robot tasks consume IMU/touch/
    frame sensors (VERDICT r4 next #2).

    Requires the base task to expose ``kernel_hooks`` for the fast path;
    every sensor on the model must be in the kernel family
    (scalar_graph.sensors_supported) or FastRollout falls back loudly.
    """

    def __init__(self, base):
        self._base = base

    def __getattr__(self, name):
        return getattr(self._base, name)

    def observe(self, model, data):
        return jnp.concatenate([
            self._base.observe(model, data), data.sensordata
        ])

    def kernel_hooks(self, model):
        import dataclasses as _dc
        import inspect

        base_hooks = self._base.kernel_hooks(model)
        base_obs = base_hooks.observe
        base_params = set(
            inspect.signature(base_obs).parameters
        ) if base_obs is not None else set()

        def observe(q, v, sensordata, **kw):
            passthrough = {k: w for k, w in kw.items() if k in base_params}
            rows = base_obs(q, v, **passthrough) if base_obs else []
            return list(rows) + list(sensordata)

        return _dc.replace(
            base_hooks,
            observe=observe,
            n_obs=base_hooks.n_obs + model.nsensordata,
            needs_sensors=True,
        )
