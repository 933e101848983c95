"""Forward dynamics pipeline and step: the TPU-native ``mj_forward`` /
``mj_step`` (reference: Physics::forward at physics.rs:48-50, Physics::step
at physics.rs:44-46).

``forward(model, data)`` recomputes every derived quantity from the core
state (the dm_control "set_state + forward" idiom, SURVEY.md §3.5);
``step(model, data)`` additionally integrates, advancing time by
``model.opt.timestep``.  Pure functions; batch with ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..model import Integrator, Model
from ..state import Data
from . import collision as _collision
from . import constraint as _constraint
from . import integrate as _integrate
from . import sensor as _sensor
from . import smooth


def fwd_position(model: Model, d: Data) -> Data:
    """Position-dependent computations (mj_fwdPosition analog):
    kinematics -> com quantities -> CRB inertia -> collision."""
    d = smooth.kinematics(model, d)
    d = smooth.com_pos(model, d)
    d = smooth.cam_light(model, d)
    d = smooth.crb(model, d)
    d = _collision.collision(model, d)
    d = _sensor.sensor_pos(model, d)
    return d


def fwd_velocity(model: Model, d: Data) -> Data:
    """Velocity-dependent computations (mj_fwdVelocity analog)."""
    d = smooth.com_vel(model, d)
    d = smooth.rne(model, d)
    d = smooth.passive(model, d)
    d = _sensor.sensor_vel(model, d)
    return d


def fwd_actuation(model: Model, d: Data) -> Data:
    return smooth.actuation(model, d)


def fwd_acceleration(model: Model, d: Data) -> Data:
    return smooth.fwd_acceleration(model, d)


def fwd_constraint(model: Model, d: Data) -> Data:
    return _constraint.fwd_constraint(model, d)


def forward(model: Model, d: Data) -> Data:
    """Full forward dynamics without integration (mj_forward analog;
    reference Physics::forward, physics.rs:48-50)."""
    d = fwd_position(model, d)
    d = fwd_velocity(model, d)
    d = fwd_actuation(model, d)
    d = fwd_acceleration(model, d)
    d = fwd_constraint(model, d)
    d = _sensor.sensor_acc(model, d)
    return d


def sensor_refresh(model: Model, d: Data) -> Data:
    """Refresh sensordata at the CURRENT state (the dm_control
    lazy-mj_forward idiom, extended to sensors): pos/vel-stage sensors
    re-evaluate fresh; the kinematic acc-stage family (accelerometer /
    frameacc) re-evaluates at the current pose with ``d.qacc`` (the last
    solve — zero right after reset); force-stage sensors keep their
    in-step values.  Requires kinematics to be current (smooth.kinematics).
    The megakernel mirrors these semantics exactly
    (ops/scalar_graph.build_sensors), so sensor observations agree
    element for element across paths."""
    if not model.nsensor:
        return d
    d = smooth.com_pos(model, d)
    d = smooth.cam_light(model, d)
    d = _sensor.sensor_pos(model, d)
    d = smooth.com_vel(model, d)
    d = _sensor.sensor_vel(model, d)
    d = _sensor.sensor_acc(model, d, kinematic_only=True)
    return d


def step(model: Model, d: Data) -> Data:
    """Advance the simulation by one timestep (mj_step analog; reference
    Physics::step, physics.rs:44-46 — THE hot call, SURVEY.md §3.1)."""
    d = forward(model, d)
    if model.opt.integrator == Integrator.EULER:
        return _integrate.euler(model, d)
    elif model.opt.integrator == Integrator.RK4:
        return _integrate.rk4(model, d, forward)
    elif model.opt.integrator == Integrator.IMPLICITFAST:
        return _integrate.implicit(model, d, fast=True)
    elif model.opt.integrator == Integrator.IMPLICIT:
        return _integrate.implicit(model, d, fast=False)
    else:
        raise NotImplementedError(f"integrator {model.opt.integrator}")
