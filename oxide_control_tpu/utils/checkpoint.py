"""Checkpoint / resume (SURVEY.md §5.4).

The env ``Data`` pytree *is* the checkpoint: the reference deliberately
exposes exactly this state surface for reproducible resume (time, qpos,
qvel, act, qacc_warmstart, mocap, applied forces —
/root/reference/src/physics.rs:81-171).  Checkpoints here save the core
fields (+ RNG key), restoring bit-identical continuation; derived fields are
recomputed by ``forward``.

Two backends: orbax (sharding-aware, for multi-host) and a plain local
``.npz`` fallback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model
from ..state import Data, make_data

# the exact-resume state surface (reference physics.rs:81-171 accessor list)
CORE_FIELDS = (
    "time",
    "qpos",
    "qvel",
    "act",
    "ctrl",
    "qacc_warmstart",
    "qfrc_applied",
    "xfrc_applied",
    "mocap_pos",
    "mocap_quat",
    "eq_active",
)


def core_state(data: Data) -> dict[str, jax.Array]:
    return {f: getattr(data, f) for f in CORE_FIELDS}


def restore_core(model: Model, core: dict[str, Any], batch: int | None = None) -> Data:
    """Rebuild a full Data from a core dict (derived fields zeroed; run
    forward() to refresh them)."""
    data = make_data(model)
    if batch is not None or (np.ndim(core["qpos"]) > 1):
        b = batch if batch is not None else np.shape(core["qpos"])[0]
        data = jax.tree.map(lambda x: jnp.broadcast_to(x, (b,) + x.shape), data)
    return data.replace(**{k: jnp.asarray(v) for k, v in core.items()})


def save(path: str, data: Data, rng: jax.Array | None = None) -> None:
    """Save core state (+ optional RNG key) to an .npz file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in core_state(data).items()}
    if rng is not None:
        arrays["__rng__"] = np.asarray(jax.random.key_data(rng))
    np.savez(path, **arrays)


def load(path: str, model: Model):
    """Load an .npz checkpoint -> (Data, rng or None)."""
    with np.load(path) as z:
        core = {k: z[k] for k in z.files if k != "__rng__"}
        rng = None
        if "__rng__" in z.files:
            rng = jax.random.wrap_key_data(jnp.asarray(z["__rng__"]))
    return restore_core(model, core), rng


def save_orbax(path: str, data: Data, rng: jax.Array | None = None) -> None:
    """Sharding-aware checkpoint via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckpt = {"core": core_state(data)}
    if rng is not None:
        ckpt["rng"] = jax.random.key_data(rng)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), ckpt, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, model: Model):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    core = restored["core"]
    rng = None
    if "rng" in restored:
        rng = jax.random.wrap_key_data(jnp.asarray(restored["rng"]))
    return restore_core(model, core), rng
