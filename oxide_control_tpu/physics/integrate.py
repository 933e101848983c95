"""Integrators: semi-implicit Euler (with implicit joint damping) and RK4.

Matches MuJoCo's mj_Euler / mj_RungeKutta semantics so golden-trajectory
tests against CPU MuJoCo hold step-for-step (SURVEY.md §4 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from ..model import DynType, Integrator, JointType, Model
from ..state import Data
from . import maths


def advance_act(model: Model, act: jax.Array, act_dot: jax.Array, h) -> jax.Array:
    """Integrate activation states (mj_advance): plain Euler for INTEGRATOR /
    FILTER, exact exponential update for FILTEREXACT, then clamp to actrange
    for act-limited actuators."""
    if model.na == 0:
        return act
    actadr = np.array(model.actuator_actadr)
    stateful = np.flatnonzero(actadr >= 0)
    # per-act-dim static tables (one act dim per stateful actuator)
    dyn = np.array(model.actuator_dyntype)[stateful]
    limited = np.array(model.actuator_actlimited, dtype=bool)[stateful]
    tau = jnp.maximum(model.actuator_dynprm[stateful, 0], 1e-15)
    exact = jnp.asarray(dyn == DynType.FILTEREXACT)
    dt = jnp.where(exact, tau * -jnp.expm1(-h / tau), h)
    act = act + act_dot * dt
    lo = model.actuator_actrange[stateful, 0]
    hi = model.actuator_actrange[stateful, 1]
    return jnp.where(jnp.asarray(limited), jnp.clip(act, lo, hi), act)


def integrate_pos(model: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """mj_integratePos: qpos += dt * qvel on the configuration manifold
    (quaternion joints integrate on SO(3) with local angular velocity)."""
    # fast path: all scalar joints (hinge/slide) -> plain vector update
    if all(t in (JointType.HINGE, JointType.SLIDE) for t in model.jnt_type):
        return qpos + dt * qvel
    out = qpos
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        vadr = model.jnt_dofadr[j]
        if jt in (JointType.HINGE, JointType.SLIDE):
            out = out.at[qadr].set(qpos[qadr] + dt * qvel[vadr])
        elif jt == JointType.BALL:
            q = maths.quat_integrate(qpos[qadr : qadr + 4], qvel[vadr : vadr + 3], dt)
            out = out.at[qadr : qadr + 4].set(q)
        else:  # free
            out = out.at[qadr : qadr + 3].set(
                qpos[qadr : qadr + 3] + dt * qvel[vadr : vadr + 3]
            )
            q = maths.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[vadr + 3 : vadr + 6], dt
            )
            out = out.at[qadr + 3 : qadr + 7].set(q)
    return out


def euler(model: Model, d: Data) -> Data:
    """Semi-implicit Euler with implicit joint damping (mj_Euler):

    (M + h*diag(B)) dv = h * (qfrc_smooth + qfrc_constraint), then
    qpos <- integrate(qpos, qvel_new).  Without damping this reduces to
    qvel += h * qacc.
    """
    h = model.opt.timestep
    damped = (not model.opt.disable_eulerdamp) and model.any_damping
    if damped:
        mhb = d.qM + h * jnp.diag(model.dof_damping)
        qfrc = d.qfrc_smooth + d.qfrc_constraint
        dv = h * maths.solve_pd_unrolled(mhb, qfrc)
        qvel = d.qvel + dv
    else:
        qvel = d.qvel + h * d.qacc
    qpos = integrate_pos(model, d.qpos, qvel, h)
    act = advance_act(model, d.act, d.act_dot, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def _qderiv_actuation_damping(model: Model, d: Data) -> jax.Array:
    """Analytic ∂qfrc_smooth/∂qvel restricted to joint damping + affine
    actuator gain/bias velocity terms — exactly the derivative set MuJoCo's
    implicitfast integrator uses (Coriolis/RNE derivative excluded)."""
    from . import smooth as _smooth
    from ..model import BiasType, GainType

    deriv = -jnp.diag(model.dof_damping)
    if model.nu == 0:
        return deriv
    moments, _ = _smooth.actuator_moments(model, d)
    ctrl = d.ctrl
    limited = jnp.asarray(model.actuator_ctrllimited)
    ctrl = jnp.where(
        limited,
        jnp.clip(
            ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1]
        ),
        ctrl,
    )
    actadr = np.array(model.actuator_actadr)
    if model.na:
        act_u = d.act[np.maximum(actadr, 0)]
        force_input = jnp.where(jnp.asarray(actadr >= 0), act_u, ctrl)
    else:
        force_input = ctrl
    gaintype = np.array(model.actuator_gaintype)
    biastype = np.array(model.actuator_biastype)
    dgain = jnp.where(
        jnp.asarray(gaintype == GainType.AFFINE),
        model.actuator_gainprm[:, 2], 0.0,
    )
    dbias = jnp.where(
        jnp.asarray(biastype == BiasType.AFFINE),
        model.actuator_biasprm[:, 2], 0.0,
    )
    dfdv = dgain * force_input + dbias  # (nu,)
    return deriv + moments.T @ (dfdv[:, None] * moments)


def implicit(model: Model, d: Data, fast: bool = True) -> Data:
    """Implicit-in-velocity integration (mj_implicit analog):

    (M - h * D) dv = h * (qfrc_smooth + qfrc_constraint)

    where D = ∂qfrc_smooth/∂qvel.  ``fast`` (implicitfast) restricts D to
    the symmetric damping + actuator-velocity terms and solves with
    Cholesky; full ``implicit`` additionally includes the (non-symmetric)
    RNE Coriolis derivative -∂qfrc_bias/∂qvel — computed exactly with
    jax.jacfwd through the com_vel/rne stages — and solves with LU.
    """
    from . import smooth as _smooth

    h = model.opt.timestep
    deriv = _qderiv_actuation_damping(model, d)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    if fast:
        mhd = d.qM - h * deriv
        dv = h * maths.solve_pd_unrolled(mhd, qfrc)
    else:
        def bias_of(qvel):
            dd = d.replace(qvel=qvel)
            dd = _smooth.com_vel(model, dd)
            dd = _smooth.rne(model, dd)
            return dd.qfrc_bias

        dbias = jax.jacfwd(bias_of)(d.qvel)  # (nv, nv)
        mhd = d.qM - h * (deriv - dbias)
        dv = h * jnp.linalg.solve(mhd, qfrc)
    qvel = d.qvel + dv
    qpos = integrate_pos(model, d.qpos, qvel, h)
    act = advance_act(model, d.act, d.act_dot, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


_RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def rk4(model: Model, d: Data, forward_fn) -> Data:
    """mj_RungeKutta(N=4). ctrl and applied forces held constant over the
    substeps; qpos integrated on the manifold at each stage."""
    h = model.opt.timestep
    qpos0, qvel0, act0 = d.qpos, d.qvel, d.act

    vels = [d.qvel]
    accs = [d.qacc]
    adots = [d.act_dot]
    for i in range(3):
        dq = sum(_RK4_A[i][j] * vels[j] for j in range(i + 1))
        dv = sum(_RK4_A[i][j] * accs[j] for j in range(i + 1))
        da = sum(_RK4_A[i][j] * adots[j] for j in range(i + 1))
        qpos_i = integrate_pos(model, qpos0, dq, h)
        qvel_i = qvel0 + h * dv
        di = d.replace(qpos=qpos_i, qvel=qvel_i, act=act0 + h * da)
        di = forward_fn(model, di)
        vels.append(di.qvel)
        accs.append(di.qacc)
        adots.append(di.act_dot)

    dq = sum(b * v for b, v in zip(_RK4_B, vels))
    dv = sum(b * a for b, a in zip(_RK4_B, accs))
    da = sum(b * a for b, a in zip(_RK4_B, adots))
    qpos = integrate_pos(model, qpos0, dq, h)
    qvel = qvel0 + h * dv
    # final act advance goes through mj_advance semantics (exact filter update
    # with the RK-weighted derivative, then actrange clamp)
    act = advance_act(model, act0, da, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)
