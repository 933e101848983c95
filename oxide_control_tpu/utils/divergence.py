"""Vectorized divergence detection (SURVEY.md §5.3).

The batched analog of MuJoCo's mj_checkPos/mj_checkVel auto-reset and of the
reference's declared-but-host-side ``Error::PhysicsDiverged``
(/root/reference/src/error.rs:7) + mjMAXVAL re-export (physics.rs:2):
per-env boolean flags, usable inside jit for masked auto-reset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model import Model
from ..state import Data

MAXVAL = 1e10


def divergence_flags(model: Model, d: Data) -> jax.Array:
    """Scalar bool (per env under vmap): state is non-finite or out of
    MuJoCo's divergence bounds."""
    bad_pos = jnp.any(~jnp.isfinite(d.qpos)) | jnp.any(jnp.abs(d.qpos) > MAXVAL)
    bad_vel = jnp.any(~jnp.isfinite(d.qvel)) | jnp.any(jnp.abs(d.qvel) > MAXVAL)
    bad_acc = jnp.any(~jnp.isfinite(d.qacc))
    return bad_pos | bad_vel | bad_acc
