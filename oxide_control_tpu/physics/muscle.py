"""Muscle actuator model: mju_muscleDynamics / mju_muscleGain /
mju_muscleBias analogs (the MuJoCo 3.x Millard-style FLV muscle).

The reference's actuation contract (mj_step at
/root/reference/src/physics.rs:44-46) includes muscle-type actuators;
these pure functions are validated element-for-element against the
``mujoco`` wheel's mju_muscle* on dense (L, V, act, ctrl) grids
(tests/test_actuation.py) and drive the muscle branch of
smooth.actuation.

Parameter vector (gainprm == biasprm, 9 entries):
  [range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax]
force < 0 means "auto": force = scale / acc0 with acc0 the norm of the
unit-actuator joint acceleration at qpos0 (mjModel.actuator_acc0).
"""

from __future__ import annotations

import jax.numpy as jnp

_MINVAL = 1e-15


def _bump(L, A, mid, B):
    """Smooth quadratic-spline bump: 0 at A and B, 1 at mid (mju_muscleGain
    helper)."""
    left = 0.5 * (A + mid)
    right = 0.5 * (mid + B)

    xl = (L - A) / jnp.maximum(left - A, _MINVAL)
    yl = 0.5 * xl * xl
    xm_l = (mid - L) / jnp.maximum(mid - left, _MINVAL)
    ym_l = 1.0 - 0.5 * xm_l * xm_l
    xm_r = (L - mid) / jnp.maximum(right - mid, _MINVAL)
    ym_r = 1.0 - 0.5 * xm_r * xm_r
    xr = (B - L) / jnp.maximum(B - right, _MINVAL)
    yr = 0.5 * xr * xr

    out = jnp.where(
        L < left, yl,
        jnp.where(L < mid, ym_l, jnp.where(L < right, ym_r, yr)),
    )
    return jnp.where((L <= A) | (L >= B), 0.0, out)


def _norm_length(length, lengthrange, prm):
    r0, r1 = prm[0], prm[1]
    L0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(r1 - r0, _MINVAL)
    return r0 + (length - lengthrange[0]) / jnp.maximum(L0, _MINVAL), L0


def _eff_force(acc0, prm):
    force, scale = prm[2], prm[3]
    return jnp.where(force < 0, scale / jnp.maximum(acc0, _MINVAL), force)


def muscle_gain(length, vel, lengthrange, acc0, prm):
    """Active muscle gain: -force * FL(L) * FV(V) (mju_muscleGain)."""
    lmin, lmax, vmax, fvmax = prm[4], prm[5], prm[6], prm[8]
    L, L0 = _norm_length(length, lengthrange, prm)
    V = vel / jnp.maximum(L0 * vmax, _MINVAL)
    FL = _bump(L, lmin, 1.0, lmax)
    y = fvmax - 1.0
    FV = jnp.where(
        V <= -1.0, 0.0,
        jnp.where(
            V <= 0.0, (V + 1.0) * (V + 1.0),
            jnp.where(
                V <= y,
                fvmax - (y - V) * (y - V) / jnp.maximum(y, _MINVAL),
                fvmax,
            ),
        ),
    )
    return -_eff_force(acc0, prm) * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
    """Passive muscle force: quadratic toe ramping to linear beyond
    b = 0.5*(1 + lmax) (mju_muscleBias)."""
    lmax, fpmax = prm[5], prm[7]
    L, _ = _norm_length(length, lengthrange, prm)
    b = 0.5 * (1.0 + lmax)
    x_mid = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
    x_hi = (L - b) / jnp.maximum(b - 1.0, _MINVAL)
    force = _eff_force(acc0, prm)
    return jnp.where(
        L <= 1.0, 0.0,
        jnp.where(
            L <= b,
            -force * fpmax * 0.5 * x_mid * x_mid,
            -force * fpmax * (0.5 + x_hi),
        ),
    )


def muscle_dynamics(ctrl, act, prm):
    """Activation dynamics with activation-dependent time constants
    (mju_muscleDynamics); prm = [tau_act, tau_deact, tau_smooth]."""
    ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
    actclamp = jnp.clip(act, 0.0, 1.0)
    tau_act = prm[0] * (0.5 + 1.5 * actclamp)
    tau_deact = prm[1] / (0.5 + 1.5 * actclamp)
    dctrl = ctrlclamp - act
    tausmooth = prm[2]
    # hard switch (tausmooth == 0) or sigmoid blend over dctrl
    x = dctrl / jnp.maximum(tausmooth, _MINVAL) + 0.5
    xc = jnp.clip(x, 0.0, 1.0)
    sig = xc * xc * xc * (3.0 * xc * (2.0 * xc - 5.0) + 10.0)  # mju_sigmoid
    blend = tau_deact + (tau_act - tau_deact) * sig
    tau = jnp.where(tausmooth > 0, blend, jnp.where(dctrl > 0, tau_act,
                                                    tau_deact))
    return dctrl / jnp.maximum(tau, _MINVAL)
