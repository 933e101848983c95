"""Constraint assembly + primal CG solver (SURVEY.md §7 stage 4).

Re-implements MuJoCo's soft-constraint model — position-dependent impedance
d(r), reference acceleration aref = -b*vel - k*pos, diagonal regularizer
R = (1-d)/d * diagApprox — and its projected nonlinear CG solver, as pure
vmap-friendly JAX.  All constraint rows exist *statically* (fixed shapes)
with runtime existence masks: the batched analog of MuJoCo's variable-length
efc arrays (lockstep envs cannot change shape).

Row order matches MuJoCo: equality, joint limits, contacts (pyramidal).
The reference reaches this stage through ``mj_step``
(/root/reference/src/physics.rs:44-46); with
``<option solver="CG" iterations="N" tolerance="0"/>`` CPU MuJoCo runs the
same deterministic algorithm, enabling tight golden-trajectory tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..model import EqType, JointType, Model
from ..state import Data
from .collision import contact_condims, max_contacts_per_pair
from . import maths
from . import smooth

_BIG = 1e12

# ---------------------------------------------------------------------------
# static row layout
# ---------------------------------------------------------------------------


def _limit_joints(model: Model) -> list[int]:
    if model.opt.disable_limit:
        return []
    out = []
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        if model.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            raise NotImplementedError("ball/free joint limits not supported yet")
        out.append(j)
    return out


def _friction_dofs(model: Model) -> list[int]:
    """Dofs with positive friction loss (one efc row each)."""
    if getattr(model.opt, "disable_frictionloss", False):
        return []
    fl = np.asarray(jax.device_get(model.dof_frictionloss))
    return [int(i) for i in np.flatnonzero(fl > 0)]


def _lane_bodies(model: Model) -> list[tuple[int, int]]:
    """Static (body1, body2) per contact lane, flattened in pair order."""
    out = []
    for (t1, t2, pairs) in model.pair_groups:
        k = max_contacts_per_pair(t1, t2)
        for (g1, g2) in pairs:
            out.extend([(model.geom_bodyid[g1], model.geom_bodyid[g2])] * k)
    return out


def nefc(model: Model) -> int:
    """Static efc row count (rows may be inactive at runtime)."""
    n = 0
    for t in model.eq_type:
        n += {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1}[EqType(t)]
    n += len(_friction_dofs(model))
    n += len(_limit_joints(model))
    for condim in contact_condims(model):
        n += {1: 1, 3: 4, 4: 6, 6: 10}[condim]
    return n


# ---------------------------------------------------------------------------
# impedance / reference acceleration
# ---------------------------------------------------------------------------


def _impedance(solimp, pos):
    """d(r) from solimp = [dmin, dmax, width, midpoint, power]."""
    dmin, dmax, width = solimp[..., 0], solimp[..., 1], solimp[..., 2]
    mid = jnp.clip(solimp[..., 3], 0.0001, 0.9999)
    power = jnp.maximum(solimp[..., 4], 1.0)
    x = jnp.abs(pos) / jnp.where(width > 0, width, 1.0)
    x = jnp.clip(x, 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(
        x < mid, a * jnp.power(x, power), 1.0 - b * jnp.power(1.0 - x, power)
    )
    imp = dmin + y * (dmax - dmin)
    imp = jnp.where(width > 0, imp, dmin)
    return jnp.clip(imp, 0.0001, 0.9999)


def _kbi(model: Model, solref, solimp, pos):
    """(k, b, impedance) per MuJoCo's solver-parameter transformation."""
    dmax = solimp[..., 1]
    imp = _impedance(solimp, pos)
    tc = jnp.maximum(solref[..., 0], 2.0 * model.opt.timestep)
    dr = solref[..., 1]
    b = 2.0 / (dmax * tc)
    k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
    direct = (solref[..., 0] <= 0) & (solref[..., 1] <= 0)
    k = jnp.where(direct, -solref[..., 0], k)
    b = jnp.where(direct, -solref[..., 1], b)
    return k, b, imp


# ---------------------------------------------------------------------------
# efc assembly
# ---------------------------------------------------------------------------


def _point_jac(model: Model, d: Data, point: jax.Array, body: int) -> jax.Array:
    """(3, nv) translational Jacobian of world `point` on `body` (mj_jac)."""
    origin = d.subtree_com[model.body_rootid[body]]
    mask = smooth.body_dof_mask(model)[body]  # static numpy (nv,)
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:]
    jacp = lin + jnp.cross(ang, point - origin)
    m = jnp.asarray(mask, dtype=d.qpos.dtype)[:, None]
    return (jacp * m).T


class _Rows:
    """Accumulator for efc row *blocks* (trace-time python; fixed count).

    Rows are appended in blocks of shape (n, ...) so vectorized categories
    (limits, contacts) stay a single fused computation each.

    Every row's constraint force is ``clip(-D * jar, lo, hi)`` with the
    matching piecewise cost (quadratic in-band, linear continuation
    outside): equality rows have (lo, hi) = (-inf, inf), unilateral rows
    (0, inf), dof-friction rows (-frictionloss, +frictionloss) — MuJoCo's
    three constraint classes in one formula."""

    def __init__(self, dtype, nv):
        self.dtype = dtype
        self.nv = nv
        self.J, self.pos, self.aref, self.D = [], [], [], []
        self.exists, self.unilateral, self.floss = [], [], []
        self.is_friction = []

    def add_block(self, model, J, pos, solref, solimp, diag_approx, exists,
                  unilateral, vel, floss=None):
        """J: (n, nv); pos/diag_approx/exists/vel: (n,); solref: (n, 2);
        solimp: (n, 5); unilateral: static bool for the whole block;
        floss: (n,) friction-loss bound or None (non-friction rows)."""
        k, b, imp = _kbi(model, solref, solimp, pos)
        aref = -b * vel - k * imp * pos
        dd = imp / (1.0 - imp) / jnp.maximum(diag_approx, 1e-12)
        n = J.shape[0]
        self.J.append(J)
        self.pos.append(jnp.asarray(pos, dtype=self.dtype))
        self.aref.append(jnp.asarray(aref, dtype=self.dtype))
        self.D.append(jnp.asarray(dd, dtype=self.dtype))
        self.exists.append(jnp.broadcast_to(jnp.asarray(exists), (n,)))
        self.unilateral.extend([bool(unilateral)] * n)
        self.is_friction.extend([floss is not None] * n)
        if floss is None:
            self.floss.append(jnp.zeros((n,), dtype=self.dtype))
        else:
            self.floss.append(
                jnp.broadcast_to(jnp.asarray(floss, dtype=self.dtype), (n,))
            )

    def add(self, model, J, pos, solref, solimp, diag_approx, exists,
            unilateral, vel):
        self.add_block(
            model, J[None], jnp.asarray(pos)[None], jnp.asarray(solref)[None],
            jnp.asarray(solimp)[None], jnp.asarray(diag_approx)[None],
            jnp.asarray(exists)[None], unilateral, jnp.asarray(vel)[None],
        )


def make_efc(model: Model, d: Data):
    """Assemble all constraint rows. Returns None if the model can have no
    constraints, else a dict of (nefc, ...) arrays + static unilateral mask.
    """
    dtype = d.qpos.dtype
    nv = model.nv
    rows = _Rows(dtype, nv)
    iw_dof = model.dof_invweight0

    # ----- equality -----
    for e in range(model.neq):
        et = EqType(model.eq_type[e])
        solref, solimp = model.eq_solref[e], model.eq_solimp[e]
        active = d.eq_active[e]
        if et == EqType.JOINT:
            j1, j2 = model.eq_obj1id[e], model.eq_obj2id[e]
            a1, v1 = model.jnt_qposadr[j1], model.jnt_dofadr[j1]
            poly = model.eq_data[e][:5]
            if j2 >= 0:
                a2, v2 = model.jnt_qposadr[j2], model.jnt_dofadr[j2]
                dif = d.qpos[a2] - model.qpos0[a2]
                powers = jnp.stack([dif**i for i in range(5)])
                pos = (d.qpos[a1] - model.qpos0[a1]) - jnp.dot(poly, powers)
                dpoly = jnp.dot(
                    poly[1:],
                    jnp.stack([(i + 1.0) * dif**i for i in range(4)]),
                )
                J = jnp.zeros(nv, dtype=dtype).at[v1].set(1.0).at[v2].add(-dpoly)
                dap = iw_dof[v1] + iw_dof[v2]
            else:
                pos = (d.qpos[a1] - model.qpos0[a1]) - poly[0]
                J = jnp.zeros(nv, dtype=dtype).at[v1].set(1.0)
                dap = iw_dof[v1]
            rows.add(model, J, pos, solref, solimp, dap, active, False,
                     vel=jnp.dot(J, d.qvel))
        elif et == EqType.CONNECT:
            b1 = model.eq_obj1id[e]
            b2 = max(model.eq_obj2id[e], 0)
            p1 = d.xpos[b1] + d.xmat[b1] @ model.eq_data[e][:3]
            p2 = d.xpos[b2] + d.xmat[b2] @ model.eq_data[e][3:6]
            jdiff = _point_jac(model, d, p1, b1) - _point_jac(model, d, p2, b2)
            cpos = p1 - p2
            dap = model.body_invweight0[b1][0] + model.body_invweight0[b2][0]
            for i in range(3):
                rows.add(model, jdiff[i], cpos[i], solref, solimp, dap,
                         active, False, vel=jnp.dot(jdiff[i], d.qvel))
        else:
            raise NotImplementedError("weld equality not yet implemented")

    # ----- dof friction loss (mjCNSTR_FRICTION_DOF; row order matches
    # MuJoCo: equality -> friction -> limits -> contacts) -----
    fr_dofs = _friction_dofs(model)
    if fr_dofs:
        idx = np.array(fr_dofs)
        onehot = np.zeros((len(fr_dofs), nv))
        onehot[np.arange(len(fr_dofs)), idx] = 1.0
        J = jnp.asarray(onehot, dtype=dtype)
        zero = jnp.zeros((len(fr_dofs),), dtype=dtype)
        rows.add_block(
            model, J, zero, model.dof_solref[idx], model.dof_solimp[idx],
            iw_dof[idx], jnp.ones((len(fr_dofs),), dtype=bool), False,
            vel=d.qvel[idx], floss=model.dof_frictionloss[idx],
        )

    # ----- joint limits (vectorized over limited joints) -----
    lim = _limit_joints(model)
    if lim:
        qadr = np.array([model.jnt_qposadr[j] for j in lim])
        vadr = np.array([model.jnt_dofadr[j] for j in lim])
        lo = model.jnt_range[np.array(lim), 0]
        hi = model.jnt_range[np.array(lim), 1]
        q = d.qpos[qadr]
        dist_lo = q - lo
        dist_hi = hi - q
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0).astype(dtype)
        margin = model.jnt_margin[np.array(lim)]
        exists = dist < margin
        pos = jnp.where(exists, dist - margin, 0.0)
        onehot = np.zeros((len(lim), nv))
        onehot[np.arange(len(lim)), vadr] = 1.0
        J = jnp.asarray(onehot, dtype=dtype) * sign[:, None]
        rows.add_block(
            model, J, pos, model.jnt_solref[np.array(lim)],
            model.jnt_solimp[np.array(lim)], iw_dof[vadr], exists, True,
            vel=sign * d.qvel[vadr],
        )

    # ----- contacts (pyramidal; vectorized over lanes per condim) -----
    condims = contact_condims(model)
    bodies = _lane_bodies(model)
    con = d.contact
    bdm = smooth.body_dof_mask(model)  # static (nbody, nv)
    rootid = np.array(model.body_rootid)

    def lane_jacobians(lanes):
        """(len(lanes), 3, nv) relative translational jacobians (b2 - b1)."""
        b1 = np.array([bodies[i][0] for i in lanes])
        b2 = np.array([bodies[i][1] for i in lanes])
        pos_l = con.pos[np.array(lanes)]  # (L, 3)
        ang = d.cdof[:, :3]  # (nv, 3)
        lin = d.cdof[:, 3:]

        def side_jac(bids):
            origin = d.subtree_com[rootid[bids]]  # (L, 3)
            arm = pos_l[:, None, :] - origin[:, None, :]  # (L, 1, 3)
            jacp = lin[None] + jnp.cross(
                jnp.broadcast_to(ang[None], (len(lanes), nv, 3)), arm
            )  # (L, nv, 3)
            mask = jnp.asarray(bdm[bids], dtype=dtype)[:, :, None]
            return (jacp * mask).transpose(0, 2, 1)  # (L, 3, nv)

        return side_jac(b2) - side_jac(b1), b1, b2

    lanes3 = [i for i, c in enumerate(condims) if c == 3]
    lanes1 = [i for i, c in enumerate(condims) if c == 1]
    bad = [c for c in condims if c not in (1, 3)]
    if bad:
        raise NotImplementedError(f"condim {bad[0]} not yet supported")

    for lanes, condim in ((lanes1, 1), (lanes3, 3)):
        if not lanes:
            continue
        idx = np.array(lanes)
        jdiff, b1, b2 = lane_jacobians(lanes)  # (L, 3, nv)
        frame = con.frame[idx]  # (L, 3, 3) world rows [n, t1, t2]
        dist = con.dist[idx]
        margin = con.includemargin[idx]
        exists = dist < margin
        pos = jnp.where(exists, dist - margin, 0.0)
        iw = model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0]
        jn = jnp.einsum("lk,lkv->lv", frame[:, 0], jdiff)  # (L, nv)
        if condim == 1:
            rows.add_block(
                model, jn, pos, con.solref[idx], con.solimp[idx], iw, exists,
                True, vel=jn @ d.qvel,
            )
        else:
            jt = jnp.einsum("ltk,lkv->ltv", frame[:, 1:3], jdiff)  # (L, 2, nv)
            mu = con.friction[idx][:, :2]  # (L, 2)
            signs = jnp.asarray([1.0, -1.0], dtype=dtype)
            # rows ordered (t1+, t1-, t2+, t2-) to match MuJoCo
            J4 = (
                jn[:, None, None, :]
                + signs[None, None, :, None] * mu[:, :, None, None] * jt[:, :, None, :]
            )  # (L, 2, 2, nv)
            L = len(lanes)
            J4 = J4.reshape(L * 4, nv)
            mu2 = (mu * mu).astype(dtype)  # (L, 2)
            # mj_diagApprox pyramidal factor (verified vs efc_D):
            # 2 * mu^2 * (1 + mu^2)
            dap = (iw[:, None] * 2.0 * mu2 * (1.0 + mu2))[:, :, None]
            dap = jnp.broadcast_to(dap, (L, 2, 2)).reshape(L * 4)
            rep = lambda x: jnp.repeat(x, 4, axis=0)
            rows.add_block(
                model, J4, rep(pos), rep(con.solref[idx]), rep(con.solimp[idx]),
                dap, rep(exists), True, vel=J4 @ d.qvel,
            )

    if not rows.J:
        return None
    return dict(
        J=jnp.concatenate(rows.J),
        pos=jnp.concatenate(rows.pos),
        aref=jnp.concatenate(rows.aref),
        D=jnp.concatenate(rows.D),
        exists=jnp.concatenate(rows.exists),
        unilateral=np.array(rows.unilateral),      # static (nefc,)
        floss=jnp.concatenate(rows.floss),         # (nefc,) 0 if non-friction
        is_friction=np.array(rows.is_friction),    # static (nefc,)
    )


# ---------------------------------------------------------------------------
# primal CG solver (mj_solCG analog, fixed iteration count)
# ---------------------------------------------------------------------------


def _force_bounds(efc):
    """Per-row force clamp (lo, hi): equality (-BIG, BIG), unilateral
    (0, BIG), dof-friction (-floss, +floss)."""
    uni = jnp.asarray(efc["unilateral"])
    fri = jnp.asarray(efc["is_friction"])
    fl = efc["floss"]
    lo = jnp.where(fri, -fl, jnp.where(uni, 0.0, -_BIG))
    hi = jnp.where(fri, fl, _BIG)
    return lo, hi


def _efc_force(efc, jar):
    lo, hi = _force_bounds(efc)
    f = jnp.clip(-efc["D"] * jar, lo, hi)
    return jnp.where(efc["exists"], f, 0.0)


def _cost(efc, x, qacc_smooth, jar, qM):
    """Convex solver cost: Gauss term + per-row piecewise cost — quadratic
    0.5*D*jar^2 while the force -D*jar is inside its clamp band, linear
    continuation outside (constant-slope zone of clipped force)."""
    dx = x - qacc_smooth
    gauss = 0.5 * jnp.dot(dx, qM @ dx)
    lo, hi = _force_bounds(efc)
    D = efc["D"]
    gc = jnp.clip(D * jar, -hi, -lo)  # = -force
    cons = gc * jar - 0.5 * gc * gc / jnp.maximum(D, 1e-30)
    return gauss + jnp.sum(jnp.where(efc["exists"], cons, 0.0))


def _linesearch(efc, jar, jp, d0_gauss, slope_gauss):
    """Exact minimization of the piecewise-quadratic cost along direction p.

    phi'(alpha) = d0_gauss + alpha*slope_gauss
                  + sum_i Jp_i * clip(D_i * jar_i(alpha), glo_i, ghi_i)
    with (glo, ghi) = (-hi, -lo) the clamp band of g = D*jar = -force.
    phi' is nondecreasing (convex cost); find its zero crossing exactly by
    scanning the sorted clamp-crossing breakpoints (each row has up to two:
    one per finite band edge)."""
    exists = efc["exists"]
    D = efc["D"]
    lo, hi = _force_bounds(efc)
    glo, ghi = -hi, -lo

    def dphi(alpha):
        jar_a = jar + alpha * jp
        gc = jnp.clip(D * jar_a, glo, ghi)
        return (
            d0_gauss
            + alpha * slope_gauss
            + jnp.sum(jnp.where(exists, jp * gc, 0.0))
        )

    # breakpoints where D*jar(alpha) crosses a finite band edge
    valid = exists & (jnp.abs(jp) > 1e-15)
    safe_jp = jnp.where(valid, jp, 1.0)
    safe_d = jnp.maximum(D, 1e-30)
    b_lo = jnp.where(
        valid & (glo > -_BIG), (glo / safe_d - jar) / safe_jp, _BIG
    )
    b_hi = jnp.where(
        valid & (ghi < _BIG), (ghi / safe_d - jar) / safe_jp, _BIG
    )
    alpha_b = jnp.concatenate([b_lo, b_hi])
    alpha_b = jnp.where(alpha_b > 0, alpha_b, _BIG)
    alpha_s = jnp.sort(alpha_b)
    # clip evaluation points to avoid inf in low precision; crossing at _BIG
    # is handled by the extrapolation branch
    alpha_eval = jnp.minimum(alpha_s, 1e8)
    d_at = jax.vmap(dphi)(alpha_eval)

    d_0 = dphi(jnp.zeros((), dtype=jar.dtype))

    # first index where derivative is >= 0
    crossed = d_at >= 0
    any_crossed = jnp.any(crossed)
    k = jnp.argmax(crossed)  # first True (0 if none, guarded below)

    prev_alpha = jnp.where(k > 0, alpha_eval[jnp.maximum(k - 1, 0)], 0.0)
    prev_d = jnp.where(k > 0, d_at[jnp.maximum(k - 1, 0)], d_0)
    cur_alpha = alpha_eval[k]
    cur_d = d_at[k]
    denom = cur_d - prev_d
    frac = jnp.where(jnp.abs(denom) > 1e-30, -prev_d / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0), 0.0)
    alpha_seg = prev_alpha + frac * (cur_alpha - prev_alpha)

    # extrapolation when no breakpoint crossing: slope at +inf comes from
    # rows whose g never clamps in the direction of travel
    act_inf = exists & (
        ((jp > 0) & (ghi >= _BIG)) | ((jp < 0) & (glo <= -_BIG))
    )
    slope_inf = slope_gauss + jnp.sum(jnp.where(act_inf, D * jp * jp, 0.0))
    last_alpha = jnp.max(jnp.where(alpha_b < _BIG, alpha_eval, 0.0))
    d_last = dphi(last_alpha)
    alpha_ext = last_alpha - d_last / jnp.maximum(slope_inf, 1e-30)

    alpha = jnp.where(any_crossed, alpha_seg, alpha_ext)
    alpha = jnp.where(d_0 >= 0, 0.0, alpha)
    return jnp.maximum(alpha, 0.0)


def _solve_cg(model: Model, d: Data, efc):
    """Nonlinear CG with exact line search and Polak-Ribiere restarts."""
    qM = d.qM
    if model.nv <= maths.UNROLL_CHOLESKY_MAX_N:
        chol = maths.cholesky_unrolled(qM)
        solve_m = lambda v: maths.cho_solve_unrolled(chol, v)
    else:
        chol = jnp.linalg.cholesky(qM)
        solve_m = lambda v: jax.scipy.linalg.cho_solve((chol, True), v)
    J = efc["J"]
    aref = efc["aref"]
    qacc_smooth = d.qacc_smooth
    qfrc_smooth = d.qfrc_smooth

    def cost_of(x):
        jar = J @ x - aref
        return _cost(efc, x, qacc_smooth, jar, qM), jar

    # warmstart: better of (qacc_warmstart, qacc_smooth)
    c_ws, jar_ws = cost_of(d.qacc_warmstart)
    c_sm, jar_sm = cost_of(qacc_smooth)
    use_ws = c_ws < c_sm
    x0 = jnp.where(use_ws, d.qacc_warmstart, qacc_smooth)
    jar0 = jnp.where(use_ws, jar_ws, jar_sm)

    def grad_of(x, jar):
        f = _efc_force(efc, jar)
        return qM @ x - qfrc_smooth - J.T @ f

    g0 = grad_of(x0, jar0)
    mg0 = solve_m(g0)
    p0 = -mg0

    def body(_, carry):
        x, jar, g, mg, p = carry
        jp = J @ p
        mp = qM @ p
        d0_gauss = jnp.dot(p, qM @ x - qfrc_smooth)
        slope_gauss = jnp.dot(p, mp)
        alpha = _linesearch(efc, jar, jp, d0_gauss, slope_gauss)
        x = x + alpha * p
        jar = jar + alpha * jp
        g_new = grad_of(x, jar)
        mg_new = solve_m(g_new)
        denom = jnp.dot(g, mg)
        beta = jnp.dot(g_new, mg_new - mg) / jnp.where(denom > 1e-30, denom, 1.0)
        beta = jnp.maximum(beta, 0.0)
        p = -mg_new + beta * p
        return x, jar, g_new, mg_new, p

    x, jar, *_ = jax.lax.fori_loop(
        0, model.opt.iterations, body, (x0, jar0, g0, mg0, p0)
    )
    f = _efc_force(efc, jar)
    qfrc_constraint = J.T @ f
    # MuJoCo reports the solver iterate itself as qacc (not re-derived from
    # the forces), so match that for step-for-step parity.
    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=x,
        nefc_active=jnp.sum(efc["exists"], dtype=jnp.int32),
    )


def _solve_newton(model: Model, d: Data, efc):
    """Newton solver (mj_solNewton analog): exact Hessian of the convex cost
    H = M + J^T diag(D * active) J, Cholesky solve for the search direction,
    exact line search.  Converges in a handful of iterations, so a small
    fixed iteration count reaches the unique optimum — which is also why the
    golden tests can hold tightly: CPU MuJoCo lands on the same optimum.
    """
    qM = d.qM
    J = efc["J"]
    aref = efc["aref"]
    qacc_smooth = d.qacc_smooth
    qfrc_smooth = d.qfrc_smooth
    lo, hi = _force_bounds(efc)
    glo, ghi = -hi, -lo

    def cost_of(x):
        jar = J @ x - aref
        return _cost(efc, x, qacc_smooth, jar, qM), jar

    c_ws, jar_ws = cost_of(d.qacc_warmstart)
    c_sm, jar_sm = cost_of(qacc_smooth)
    use_ws = c_ws < c_sm
    x0 = jnp.where(use_ws, d.qacc_warmstart, qacc_smooth)
    jar0 = jnp.where(use_ws, jar_ws, jar_sm)

    def body(_, carry):
        x, jar = carry
        f = _efc_force(efc, jar)
        grad = qM @ x - qfrc_smooth - J.T @ f
        # Hessian rows: quadratic only while the force is inside its band
        g = efc["D"] * jar
        in_band = (g > glo) & (g < ghi) & efc["exists"]
        w = jnp.where(in_band, efc["D"], 0.0)
        hess = qM + (J.T * w) @ J
        p = -maths.solve_pd_unrolled(hess, grad)
        jp = J @ p
        d0_gauss = jnp.dot(p, qM @ x - qfrc_smooth)
        slope_gauss = jnp.dot(p, qM @ p)
        alpha = _linesearch(efc, jar, jp, d0_gauss, slope_gauss)
        return x + alpha * p, jar + alpha * jp

    x, jar = jax.lax.fori_loop(0, model.opt.iterations, body, (x0, jar0))
    f = _efc_force(efc, jar)
    return d.replace(
        qacc=x,
        qfrc_constraint=J.T @ f,
        qacc_warmstart=x,
        nefc_active=jnp.sum(efc["exists"], dtype=jnp.int32),
    )


def _solve_pgs(model: Model, d: Data, efc):
    """Dual projected Gauss-Seidel (mj_solPGS analog, pyramidal cone).

    Solves min 0.5 f^T A f + f^T b over f >= 0 (unilateral rows) with
    A = J M^-1 J^T + diag(R), b = J qacc_smooth - aref.  The sweep is
    sequential over rows (unrolled: nefc is static and small) but fully
    vectorized over the env batch.
    """
    qM = d.qM
    chol = jnp.linalg.cholesky(qM)
    J = efc["J"]
    aref = efc["aref"]
    exists = efc["exists"]
    uni = jnp.asarray(efc["unilateral"]) & exists
    ne = J.shape[0]
    r_diag = 1.0 / jnp.maximum(efc["D"], 1e-15)

    minv_jt = jax.scipy.linalg.cho_solve((chol, True), J.T)  # (nv, ne)
    a_mat = J @ minv_jt + jnp.diag(r_diag)
    # inactive rows: make them inert (f stays 0, diagonal 1)
    a_mat = jnp.where(exists[:, None] & exists[None, :], a_mat, 0.0)
    diag = jnp.where(exists, jnp.diagonal(a_mat), 1.0)
    b_vec = jnp.where(exists, J @ d.qacc_smooth - aref, 0.0)

    # init from the better of warmstart/smooth (as the primal solvers do)
    def cost_of(x):
        jar = J @ x - aref
        return _cost(efc, x, d.qacc_smooth, jar, qM), jar

    c_ws, jar_ws = cost_of(d.qacc_warmstart)
    c_sm, jar_sm = cost_of(d.qacc_smooth)
    jar0 = jnp.where(c_ws < c_sm, jar_ws, jar_sm)
    f0 = _efc_force(efc, jar0)

    uni_static = np.asarray(efc["unilateral"])
    fri_static = np.asarray(efc["is_friction"])

    def sweep(_, f):
        for i in range(ne):
            resid = jnp.dot(a_mat[i], f) + b_vec[i]
            fi = f[i] - resid / diag[i]
            if fri_static[i]:
                fi = jnp.clip(fi, -efc["floss"][i], efc["floss"][i])
            elif uni_static[i]:
                fi = jnp.maximum(fi, 0.0)
            fi = jnp.where(exists[i], fi, 0.0)
            f = f.at[i].set(fi)
        return f

    f = jax.lax.fori_loop(0, model.opt.iterations, sweep, f0)
    qfrc_constraint = J.T @ f
    qacc = d.qacc_smooth + minv_jt @ f
    return d.replace(
        qacc=qacc,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=qacc,
        nefc_active=jnp.sum(exists, dtype=jnp.int32),
    )


def fwd_constraint(model: Model, d: Data) -> Data:
    """mj_fwdConstraint analog: assemble rows, solve, store qacc + forces."""
    efc = make_efc(model, d)
    if efc is None:
        return d.replace(
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(d.qvel),
            qacc_warmstart=d.qacc_smooth,
            nefc_active=jnp.zeros((), dtype=jnp.int32),
        )
    from ..model import SolverType

    if model.opt.solver == SolverType.NEWTON:
        return _solve_newton(model, d, efc)
    if model.opt.solver == SolverType.PGS:
        return _solve_pgs(model, d, efc)
    return _solve_cg(model, d, efc)
