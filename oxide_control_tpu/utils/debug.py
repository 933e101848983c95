"""Numerical-sanitizer analogs (SURVEY.md §5.2).

JAX's purity rules out data races; the numerical failure modes that remain
are NaN/Inf creation inside the compiled step and f32 precision loss.  This
module provides:

* :func:`checked_step` — wraps any ``step(model, data) -> data`` in
  ``jax.experimental.checkify`` so NaN/Inf *inside* the pipeline raises a
  checkify error naming the stage output, instead of silently propagating
  until a divergence flag trips thousands of steps later.
* :func:`nan_debug_step` — a ``jax.debug.print``-instrumented step that
  reports per-stage NaN counts at runtime (works under jit/vmap); the
  development analog of MuJoCo's mj_warning stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..model import Model
from ..state import Data
from ..physics import forward as _forward


_CHECK_FIELDS = ("qpos", "qvel", "qacc", "qacc_smooth", "qfrc_constraint")


def checked_step(model: Model):
    """Returns ``(err, data) = fn(data)`` stepping with checkify NaN/Inf
    guards on the core stage outputs.  ``err.throw()`` raises host-side."""

    def raw(d: Data) -> Data:
        d = _forward.step(model, d)
        for name in _CHECK_FIELDS:
            val = getattr(d, name)
            checkify.check(
                jnp.all(jnp.isfinite(val)), f"non-finite {name} after step"
            )
        return d

    return checkify.checkify(raw, errors=checkify.float_checks)


def nan_debug_step(model: Model):
    """Step function that prints per-stage non-finite counts (jit-safe)."""

    def fn(d: Data) -> Data:
        d = _forward.fwd_position(model, d)
        d = _forward.fwd_velocity(model, d)
        d = _forward.fwd_actuation(model, d)
        d = _forward.fwd_acceleration(model, d)
        d = _forward.fwd_constraint(model, d)
        for name in ("qacc_smooth", "qacc"):
            bad = jnp.sum(~jnp.isfinite(getattr(d, name)))
            jax.debug.print(
                "nan_debug: {name} non-finite count = {bad}",
                name=name, bad=bad, ordered=False,
            )
        from ..physics import integrate as _integrate

        return _integrate.euler(model, d)

    return fn
