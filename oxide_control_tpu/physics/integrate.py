"""Integrators: semi-implicit Euler (with implicit joint damping) and RK4.

Matches MuJoCo's mj_Euler / mj_RungeKutta semantics so golden-trajectory
tests against CPU MuJoCo hold step-for-step (SURVEY.md §4 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model import Integrator, JointType, Model
from ..state import Data
from . import maths


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
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)


_RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def rk4(model: Model, d: Data, forward_fn) -> Data:
    """mj_RungeKutta(N=4). ctrl and applied forces held constant over the
    substeps; qpos integrated on the manifold at each stage."""
    h = model.opt.timestep
    qpos0, qvel0 = d.qpos, d.qvel

    vels = [d.qvel]
    accs = [d.qacc]
    for i in range(3):
        dq = sum(_RK4_A[i][j] * vels[j] for j in range(i + 1))
        dv = sum(_RK4_A[i][j] * accs[j] for j in range(i + 1))
        qpos_i = integrate_pos(model, qpos0, dq, h)
        qvel_i = qvel0 + h * dv
        di = d.replace(qpos=qpos_i, qvel=qvel_i)
        di = forward_fn(model, di)
        vels.append(di.qvel)
        accs.append(di.qacc)

    dq = sum(b * v for b, v in zip(_RK4_B, vels))
    dv = sum(b * a for b, a in zip(_RK4_B, accs))
    qpos = integrate_pos(model, qpos0, dq, h)
    qvel = qvel0 + h * dv
    return d.replace(qpos=qpos, qvel=qvel, time=d.time + h)
