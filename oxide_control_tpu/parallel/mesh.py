"""Device mesh + env-axis sharding (SURVEY.md §2.3).

The engine's scaling axis is the environment batch: state pytrees carry a
leading env axis which is sharded across chips (ICI) and hosts (DCN) with
``NamedSharding(P('env'))`` under jit.  XLA inserts the collectives; there is
no hand-written communication layer (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_env_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) devices with a single 'env' axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a pytree with a leading env axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, tree):
    """Place a batched state pytree with its leading axis sharded over the
    mesh's env axis (scalars replicated)."""
    shard = env_sharding(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, shard)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)


def multihost_initialize(**kwargs) -> None:
    """Multi-host SPMD runtime bring-up (jax.distributed.initialize wrapper).

    The only swallowed failure is double-initialization (idempotent calls are
    convenient in tests/notebooks); a genuinely misconfigured bring-up
    (bad coordinator address, wrong process count, ...) propagates — a
    silent no-op here would masquerade as single-host mode."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
