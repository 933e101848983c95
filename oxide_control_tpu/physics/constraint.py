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
    """Limited scalar (hinge/slide) joints; ball limits are separate rows."""
    if model.opt.disable_limit:
        return []
    out = []
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        if model.jnt_type[j] == JointType.FREE:
            # MuJoCo's compiler rejects limited free joints; mirror that
            raise NotImplementedError("free joints cannot be limited")
        if model.jnt_type[j] in (JointType.HINGE, JointType.SLIDE):
            out.append(j)
    return out


def _ball_limit_joints(model: Model) -> list[int]:
    if model.opt.disable_limit:
        return []
    return [
        j for j in range(model.njnt)
        if model.jnt_limited[j] and model.jnt_type[j] == JointType.BALL
    ]


def _friction_dofs(model: Model) -> list[int]:
    """Dofs that get a friction-loss efc row (static row layout).

    When the model's numeric leaves are concrete (the normal case: the
    model is closed over by jit), only dofs with frictionloss > 0 get a
    row.  When the model itself is a traced jit argument the values are
    unknown at trace time, so every dof gets a row and activation falls to
    the runtime `exists` mask (frictionloss > 0)."""
    if getattr(model.opt, "disable_frictionloss", False):
        return []
    fl = model.dof_frictionloss
    if isinstance(fl, jax.core.Tracer):
        return list(range(model.nv))
    fl = np.asarray(jax.device_get(fl))
    return [int(i) for i in np.flatnonzero(fl > 0)]


def _lane_bodies(model: Model) -> list[tuple[int, int]]:
    """Static (body1, body2) per contact lane, flattened in pair order."""
    out = []
    for (t1, t2, pairs) in model.pair_groups:
        k = max_contacts_per_pair(t1, t2)
        for (g1, g2) in pairs:
            out.extend([(model.geom_bodyid[g1], model.geom_bodyid[g2])] * k)
    return out


def _friction_tendons(model: Model) -> list[int]:
    if getattr(model.opt, "disable_frictionloss", False) or not model.ntendon:
        return []
    fl = model.tendon_frictionloss
    if isinstance(fl, jax.core.Tracer):
        return list(range(model.ntendon))
    fl = np.asarray(jax.device_get(fl))
    return [int(i) for i in np.flatnonzero(fl > 0)]


def _limit_tendons(model: Model) -> list[int]:
    if model.opt.disable_limit:
        return []
    return [t for t in range(model.ntendon) if model.tendon_limited[t]]


def nefc(model: Model) -> int:
    """Static efc row count (rows may be inactive at runtime)."""
    from ..model import ConeType

    n = 0
    for t in model.eq_type:
        n += {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1}[EqType(t)]
    n += len(_friction_dofs(model))
    n += len(_friction_tendons(model))
    n += len(_limit_joints(model))
    n += len(_ball_limit_joints(model))
    n += len(_limit_tendons(model))
    elliptic = model.opt.cone == ConeType.ELLIPTIC
    for condim in contact_condims(model):
        if elliptic:
            n += condim
        else:
            n += {1: 1, 3: 4, 4: 6, 6: 10}[condim]
    return n


def limit_row_map(model: Model) -> dict:
    """Static ordered map ('joint'|'tendon', objid) -> efc row index of its
    limit row.  The jointlimit*/tendonlimit* sensors read these rows; the
    value order here defines the layout of ``Data.efc_limit``."""
    n = 0
    for t in model.eq_type:
        n += {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1}[EqType(t)]
    n += len(_friction_dofs(model))
    n += len(_friction_tendons(model))
    out = {}
    for j in _limit_joints(model):
        out[("joint", j)] = n
        n += 1
    for j in _ball_limit_joints(model):
        out[("joint", j)] = n
        n += 1
    for t in _limit_tendons(model):
        out[("tendon", t)] = n
        n += 1
    return out


def n_limit_rows(model: Model) -> int:
    """Static number of limit rows (= rows of ``Data.efc_limit``);
    independent of the trace-dependent friction-row layout."""
    return (len(_limit_joints(model)) + len(_ball_limit_joints(model))
            + len(_limit_tendons(model)))


def _needs_limit_sensor(model: Model) -> bool:
    from ..model import SensorType

    lim_types = (
        SensorType.JOINTLIMITPOS, SensorType.JOINTLIMITVEL,
        SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITPOS,
        SensorType.TENDONLIMITVEL, SensorType.TENDONLIMITFRC,
    )
    return any(SensorType(t) in lim_types for t in model.sensor_type)


# ---------------------------------------------------------------------------
# impedance / reference acceleration
# ---------------------------------------------------------------------------


def _impedance(solimp, pos):
    """d(r) from solimp = [dmin, dmax, width, midpoint, power].

    MuJoCo clamps dmin/dmax into [mjMINIMP, mjMAXIMP] = [1e-4, 0.9999]
    BEFORE interpolating (not the interpolated output), which matters when
    a model sets dmin = 0: the whole curve is shifted by (1-y)*1e-4."""
    dmin = jnp.clip(solimp[..., 0], 0.0001, 0.9999)
    dmax = jnp.clip(solimp[..., 1], 0.0001, 0.9999)
    width = solimp[..., 2]
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
    return jnp.where(width > 0, imp, dmin)


def _kbi(model: Model, solref, solimp, pos):
    """(k, b, impedance) per MuJoCo's solver-parameter transformation."""
    dmax = jnp.clip(solimp[..., 1], 0.0001, 0.9999)
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


def _rot_jac(model: Model, d: Data, body: int) -> jax.Array:
    """(3, nv) rotational Jacobian of `body` (mj_jac's jacr): maps qvel to
    the body's world angular velocity (point-independent)."""
    mask = smooth.body_dof_mask(model)[body]
    m = jnp.asarray(mask, dtype=d.qpos.dtype)[:, None]
    return (d.cdof[:, :3] * m).T


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
        self.is_cone = []        # static: row belongs to an elliptic contact
        self.cone_groups = []    # static (start_row, condim) per cone contact
        self.cone_mu = []        # traced (5,) friction per cone contact

    def add_cone_block(self, J, pos, aref, D, exists, mu):
        """One elliptic contact: J (condim, nv), pos/aref/D/exists (condim,),
        mu (5,) friction vector.  Rows are contiguous; the solver treats the
        whole block through the cone force/cost (not the per-row clip)."""
        dim = J.shape[0]
        self.cone_groups.append((len(self.unilateral), dim))
        self.cone_mu.append(jnp.asarray(mu, dtype=self.dtype))
        self.J.append(J)
        self.pos.append(jnp.asarray(pos, dtype=self.dtype))
        self.aref.append(jnp.asarray(aref, dtype=self.dtype))
        self.D.append(jnp.asarray(D, dtype=self.dtype))
        self.exists.append(jnp.broadcast_to(jnp.asarray(exists), (dim,)))
        self.unilateral.extend([True] * dim)
        self.is_friction.extend([False] * dim)
        self.is_cone.extend([True] * dim)
        self.floss.append(jnp.zeros((dim,), dtype=self.dtype))

    def add_block(self, model, J, pos, solref, solimp, diag_approx, exists,
                  unilateral, vel, floss=None, acc0=0.0, imp_pos=None):
        """J: (n, nv); pos/diag_approx/exists/vel: (n,); solref: (n, 2);
        solimp: (n, 5); unilateral: static bool for the whole block;
        floss: (n,) friction-loss bound or None (non-friction rows);
        acc0: (n,) bias acceleration Jdot@qvel (equality rows only —
        MuJoCo folds this Gauss-Newton term into equality aref);
        imp_pos: (n,) position used for the impedance evaluation when it
        differs from `pos` (multi-row equality constraints use the norm of
        the whole residual vector, per MuJoCo)."""
        k, b, imp = _kbi(
            model, solref, solimp, pos if imp_pos is None else imp_pos
        )
        aref = -b * vel - k * imp * pos - acc0
        dd = imp / (1.0 - imp) / jnp.maximum(diag_approx, 1e-12)
        n = J.shape[0]
        self.J.append(J)
        self.pos.append(jnp.asarray(pos, dtype=self.dtype))
        self.aref.append(jnp.asarray(aref, dtype=self.dtype))
        self.D.append(jnp.asarray(dd, dtype=self.dtype))
        self.exists.append(jnp.broadcast_to(jnp.asarray(exists), (n,)))
        self.unilateral.extend([bool(unilateral)] * n)
        self.is_friction.extend([floss is not None] * n)
        self.is_cone.extend([False] * n)
        if floss is None:
            self.floss.append(jnp.zeros((n,), dtype=self.dtype))
        else:
            self.floss.append(
                jnp.broadcast_to(jnp.asarray(floss, dtype=self.dtype), (n,))
            )

    def add(self, model, J, pos, solref, solimp, diag_approx, exists,
            unilateral, vel, acc0=0.0, imp_pos=None):
        self.add_block(
            model, J[None], jnp.asarray(pos)[None], jnp.asarray(solref)[None],
            jnp.asarray(solimp)[None], jnp.asarray(diag_approx)[None],
            jnp.asarray(exists)[None], unilateral, jnp.asarray(vel)[None],
            acc0=jnp.asarray(acc0)[None],
            imp_pos=None if imp_pos is None else jnp.asarray(imp_pos)[None],
        )


def _eq_cw_rows(model: Model, dd: Data):
    """Connect/weld equality rows from kinematic state `dd`: a list (in
    equality-id order) of (J (nv,), pos, dap) tuples per constraint.

    Semantics verified row-for-row against MuJoCo mj_forward (efc_pos /
    efc_J / efc_vel / efc_diagA), see tests/test_golden.py:
      connect: pos = p1_anchor - p2_anchor, J = jacp1 - jacp2
      weld:    3 translation rows with the anchor applied on body2 and
               relpose-pos on body1, plus 3 rotation rows
               pos = -ts * vec(conj(q1*relquat) x q2),
               J = -ts/2 * V (jacr2 - jacr1), V[:,k] = vec(conj(A) e_k q2)
    """
    dtype = dd.qpos.dtype
    out = {}
    for e in range(model.neq):
        et = EqType(model.eq_type[e])
        if et in (EqType.JOINT, EqType.TENDON):
            continue
        b1 = model.eq_obj1id[e]
        b2 = max(model.eq_obj2id[e], 0)
        rows_e = []
        if et == EqType.CONNECT:
            p1 = dd.xpos[b1] + dd.xmat[b1] @ model.eq_data[e][:3]
            p2 = dd.xpos[b2] + dd.xmat[b2] @ model.eq_data[e][3:6]
            jdiff = _point_jac(model, dd, p1, b1) - _point_jac(model, dd, p2, b2)
            cpos = p1 - p2
            dap = model.body_invweight0[b1][0] + model.body_invweight0[b2][0]
            for i in range(3):
                rows_e.append((jdiff[i], cpos[i], dap))
        else:  # WELD
            anchor = model.eq_data[e][:3]
            relpos = model.eq_data[e][3:6]
            relquat = maths.quat_normalize(model.eq_data[e][6:10])
            ts = model.eq_data[e][10]
            p1 = dd.xpos[b1] + dd.xmat[b1] @ relpos
            p2 = dd.xpos[b2] + dd.xmat[b2] @ anchor
            jdiff = _point_jac(model, dd, p1, b1) - _point_jac(model, dd, p2, b2)
            cpos = p1 - p2
            dap_t = model.body_invweight0[b1][0] + model.body_invweight0[b2][0]
            for i in range(3):
                rows_e.append((jdiff[i], cpos[i], dap_t))
            q1 = dd.xquat[b1]
            q2 = dd.xquat[b2]
            conj_a = maths.quat_conj(maths.quat_mul(q1, relquat))
            crot = -ts * maths.quat_mul(conj_a, q2)[1:4]
            basis = jnp.eye(4, dtype=dtype)[1:4]  # e_k as pure quats
            v_mat = jax.vmap(
                lambda e_k: maths.quat_mul(maths.quat_mul(conj_a, e_k), q2)[1:4],
                out_axes=1,
            )(basis)  # (3, 3): column k = vec(conj(A) e_k q2)
            jr = _rot_jac(model, dd, b2) - _rot_jac(model, dd, b1)
            jrot = (-0.5 * ts) * (v_mat @ jr)
            dap_r = model.body_invweight0[b1][1] + model.body_invweight0[b2][1]
            for i in range(3):
                rows_e.append((jrot[i], crot[i], dap_r))
        out[e] = rows_e
    return out


def _qpos_tangent(model: Model, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
    """d(qpos)/dt on the configuration manifold: scalar joints copy qvel;
    quaternion joints map local angular velocity via qdot = 0.5 * q * (0, w)."""
    if model.nq == model.nv:
        return qvel
    out = jnp.zeros_like(qpos)
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        vadr = model.jnt_dofadr[j]
        if jt in (JointType.HINGE, JointType.SLIDE):
            out = out.at[qadr].set(qvel[vadr])
        elif jt == JointType.BALL:
            w = jnp.concatenate([jnp.zeros(1, qpos.dtype), qvel[vadr : vadr + 3]])
            out = out.at[qadr : qadr + 4].set(
                0.5 * maths.quat_mul(qpos[qadr : qadr + 4], w)
            )
        else:  # free
            out = out.at[qadr : qadr + 3].set(qvel[vadr : vadr + 3])
            w = jnp.concatenate(
                [jnp.zeros(1, qpos.dtype), qvel[vadr + 3 : vadr + 6]]
            )
            out = out.at[qadr + 3 : qadr + 7].set(
                0.5 * maths.quat_mul(qpos[qadr + 3 : qadr + 7], w)
            )
    return out


def make_efc(model: Model, d: Data):
    """Assemble all constraint rows. Returns None if the model can have no
    constraints, else a dict of (nefc, ...) arrays + static unilateral mask.
    """
    dtype = d.qpos.dtype
    nv = model.nv
    rows = _Rows(dtype, nv)
    iw_dof = model.dof_invweight0

    # ----- equality -----
    # connect/weld rows need the Gauss-Newton bias Jdot@qvel in aref
    # (verified against MuJoCo; joint equality does NOT get it).  Obtain it
    # exactly as the jvp of qpos -> J(qpos) @ qvel along the manifold
    # tangent qdot(qpos, qvel); this re-runs kinematics once under jvp,
    # only for models that have connect/weld constraints.
    cw = _eq_cw_rows(model, d)
    if cw:
        def cw_vels(qp):
            dd = d.replace(qpos=qp)
            dd = smooth.kinematics(model, dd)
            dd = smooth.com_pos(model, dd)
            rr = _eq_cw_rows(model, dd)
            return jnp.stack(
                [jnp.dot(J, d.qvel) for e in sorted(rr) for (J, _, _) in rr[e]]
            )

        qdot = _qpos_tangent(model, d.qpos, d.qvel)
        cw_vel, cw_jdotv = jax.jvp(cw_vels, (d.qpos,), (qdot,))
    ri = 0
    ten_lm = None
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
        elif et == EqType.TENDON:
            # tendon length coupling: pos = (L1 - L1_0) - poly(L2 - L2_0),
            # J = ten_J1 - dpoly * ten_J2 (mj_instantiateEquality
            # mjEQ_TENDON); works for fixed AND spatial (wrapped) tendons
            # through the unified length/moment
            t1, t2 = model.eq_obj1id[e], model.eq_obj2id[e]
            if ten_lm is None:
                ten_lm = smooth.tendon_length_moment(model, d)
            tlen, tmom = ten_lm
            len0_all = model.tendon_length0
            poly = model.eq_data[e][:5]
            if t2 >= 0:
                dif = tlen[t2] - len0_all[t2]
                powers = jnp.stack([dif**i for i in range(5)])
                pos = (tlen[t1] - len0_all[t1]) - jnp.dot(poly, powers)
                dpoly = jnp.dot(
                    poly[1:],
                    jnp.stack([(i + 1.0) * dif**i for i in range(4)]),
                )
                J = tmom[t1] - dpoly * tmom[t2]
                dap = (model.tendon_invweight0[t1]
                       + model.tendon_invweight0[t2])
            else:
                pos = (tlen[t1] - len0_all[t1]) - poly[0]
                J = tmom[t1]
                dap = model.tendon_invweight0[t1]
            rows.add(model, J, pos, solref, solimp, dap, active, False,
                     vel=jnp.dot(J, d.qvel))
        else:  # CONNECT / WELD rows prebuilt above
            # impedance is evaluated on the norm of the constraint's whole
            # residual vector (3 rows for connect, 6 for weld), per MuJoCo
            res_norm = jnp.linalg.norm(jnp.stack([p for (_, p, _) in cw[e]]))
            for (J, pos, dap) in cw[e]:
                rows.add(model, J, pos, solref, solimp, dap, active, False,
                         vel=cw_vel[ri], acc0=cw_jdotv[ri], imp_pos=res_norm)
                ri += 1

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
            iw_dof[idx], model.dof_frictionloss[idx] > 0, False,
            vel=d.qvel[idx], floss=model.dof_frictionloss[idx],
        )

    # ----- tendon friction loss (mjCNSTR_FRICTION_TENDON) -----
    fr_tens = _friction_tendons(model)
    if fr_tens:
        if ten_lm is None:
            ten_lm = smooth.tendon_length_moment(model, d)
        idx = np.array(fr_tens)
        J = ten_lm[1][idx]
        zero = jnp.zeros((len(fr_tens),), dtype=dtype)
        rows.add_block(
            model, J, zero, model.tendon_solref_fri[idx],
            model.tendon_solimp_fri[idx], model.tendon_invweight0[idx],
            model.tendon_frictionloss[idx] > 0, False,
            vel=J @ d.qvel, floss=model.tendon_frictionloss[idx],
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

    # ----- ball joint limits (one row per limited ball joint) -----
    # MuJoCo: value = |rotation angle| of the joint quat (wrapped to [0, pi]),
    # limit = max(jnt_range), J = -unit rotation axis on the 3 ball dofs.
    # Verified against mj_forward efc rows (tests/test_golden.py).
    for j in _ball_limit_joints(model):
        qadr = model.jnt_qposadr[j]
        vadr = model.jnt_dofadr[j]
        q = maths.quat_normalize(d.qpos[qadr : qadr + 4])
        sin_half = jnp.linalg.norm(q[1:4])
        angle = 2.0 * jnp.arctan2(sin_half, q[0])
        angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
        safe = jnp.where(sin_half > 1e-12, sin_half, 1.0)
        axis = jnp.where(
            sin_half > 1e-12, q[1:4] / safe,
            jnp.array([0.0, 0, 1], dtype=dtype),
        )
        axis = axis * jnp.sign(jnp.where(angle == 0, 1.0, angle))
        value = jnp.abs(angle)
        limit = jnp.max(model.jnt_range[j])
        dist = limit - value
        margin = model.jnt_margin[j]
        exists_b = dist < margin
        pos_b = jnp.where(exists_b, dist - margin, 0.0)
        J = jnp.zeros((nv,), dtype=dtype).at[vadr : vadr + 3].set(-axis)
        rows.add(
            model, J, pos_b, model.jnt_solref[j], model.jnt_solimp[j],
            iw_dof[vadr], exists_b, True, vel=jnp.dot(J, d.qvel),
        )

    # ----- tendon limits (mjCNSTR_LIMIT_TENDON: same shape as scalar
    # joint limits, J = +-tendon jacobian row) -----
    lim_tens = _limit_tendons(model)
    if lim_tens:
        if ten_lm is None:
            ten_lm = smooth.tendon_length_moment(model, d)
        tv = ten_lm[1]
        idx = np.array(lim_tens)
        length = ten_lm[0][idx]
        lo = model.tendon_range[idx, 0]
        hi = model.tendon_range[idx, 1]
        dist_lo = length - lo
        dist_hi = hi - length
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0).astype(dtype)
        margin = model.tendon_margin[idx]
        exists_t = dist < margin
        pos_t = jnp.where(exists_t, dist - margin, 0.0)
        J = tv[idx] * sign[:, None]
        rows.add_block(
            model, J, pos_t, model.tendon_solref_lim[idx],
            model.tendon_solimp_lim[idx], model.tendon_invweight0[idx],
            exists_t, True, vel=J @ d.qvel,
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

    def lane_rot_jacobians(lanes):
        """(len(lanes), 3, nv) relative rotational jacobians (b2 - b1)."""
        b1 = np.array([bodies[i][0] for i in lanes])
        b2 = np.array([bodies[i][1] for i in lanes])
        ang = d.cdof[:, :3]  # (nv, 3)

        def side_jacr(bids):
            mask = jnp.asarray(bdm[bids], dtype=dtype)[:, :, None]
            jr = jnp.broadcast_to(ang[None], (len(lanes), nv, 3)) * mask
            return jr.transpose(0, 2, 1)  # (L, 3, nv)

        return side_jacr(b2) - side_jacr(b1)

    bad = [c for c in condims if c not in (1, 3, 4, 6)]
    if bad:
        raise NotImplementedError(f"condim {bad[0]} not supported")

    from ..model import ConeType

    elliptic = model.opt.cone == ConeType.ELLIPTIC
    # static map from efc rows back to contact lanes, for per-lane force
    # reconstruction (mj_contactForce analog; feeds touch/force/torque
    # sensors): entries (lane, start_row, condim, nrow, is_cone)
    contact_layout = []

    for condim in (1, 3, 4, 6):
        lanes = [i for i, c in enumerate(condims) if c == condim]
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
            start = len(rows.unilateral)
            for li, lane in enumerate(lanes):
                contact_layout.append((lane, start + li, 1, 1, False))
            rows.add_block(
                model, jn, pos, con.solref[idx], con.solimp[idx], iw, exists,
                True, vel=jn @ d.qvel,
            )
            continue
        if elliptic:
            # one condim-row block per contact: [normal; friction axes],
            # plain (un-mu-scaled) axis jacobians.  Friction rows: pos = 0,
            # aref = -b*vel, D_i = D0 * impratio * (mu_i/mu_1)^2 — verified
            # row-for-row vs MuJoCo (efc_J/efc_D/efc_aref/efc_diagA).
            jr = lane_rot_jacobians(lanes) if condim >= 4 else None
            for li, lane in enumerate(lanes):
                # build (condim, nv) jacobian: n, t1, t2 translation, then
                # n/t1/t2 rotation for condim 4/6
                jrows = [jn[li],
                         jnp.einsum("k,kv->v", frame[li, 1], jdiff[li]),
                         jnp.einsum("k,kv->v", frame[li, 2], jdiff[li])]
                if condim >= 4:
                    jrows.append(jnp.einsum("k,kv->v", frame[li, 0], jr[li]))
                if condim == 6:
                    jrows.append(jnp.einsum("k,kv->v", frame[li, 1], jr[li]))
                    jrows.append(jnp.einsum("k,kv->v", frame[li, 2], jr[li]))
                Jc = jnp.stack(jrows)  # (condim, nv)
                k, b, imp = _kbi(
                    model, con.solref[idx][li], con.solimp[idx][li], pos[li]
                )
                d0 = imp / (1.0 - imp) / jnp.maximum(iw[li], 1e-12)
                mu = con.friction[idx][li]  # (5,)
                s2 = (mu[: condim - 1] / mu[0]) ** 2
                D_c = jnp.concatenate(
                    [d0[None], d0 * model.opt.impratio * s2]
                )
                vel_c = Jc @ d.qvel
                aref_c = -b * vel_c - jnp.concatenate(
                    [(k * imp * pos[li])[None],
                     jnp.zeros((condim - 1,), dtype=dtype)]
                )
                pos_c = jnp.concatenate(
                    [pos[li][None], jnp.zeros((condim - 1,), dtype=dtype)]
                )
                contact_layout.append(
                    (lane, len(rows.unilateral), condim, condim, True)
                )
                rows.add_cone_block(Jc, pos_c, aref_c, D_c, exists[li], mu)
            continue
        # friction directions (MuJoCo order): tangential t1/t2 translation,
        # then torsional (n) and rolling (t1/t2) rotation for condim 4/6.
        # Each direction scales the pyramid by its own mu; the diagApprox
        # for ALL pyramid rows uses friction[0] (verified vs efc_diagA).
        jt = jnp.einsum("ltk,lkv->ltv", frame[:, 1:3], jdiff)  # (L, 2, nv)
        axes = [jt[:, 0], jt[:, 1]]
        mu_all = con.friction[idx]  # (L, 5)
        mus = [mu_all[:, 0], mu_all[:, 1]]
        if condim >= 4:
            jr = lane_rot_jacobians(lanes)  # (L, 3, nv)
            axes.append(jnp.einsum("lk,lkv->lv", frame[:, 0], jr))
            mus.append(mu_all[:, 2])
        if condim == 6:
            axes.append(jnp.einsum("lk,lkv->lv", frame[:, 1], jr))
            mus.append(mu_all[:, 3])
            axes.append(jnp.einsum("lk,lkv->lv", frame[:, 2], jr))
            mus.append(mu_all[:, 4])
        ndir = len(axes)
        nrow = 2 * ndir
        L = len(lanes)
        ax = jnp.stack(axes, axis=1)  # (L, ndir, nv)
        mu = jnp.stack(mus, axis=1).astype(dtype)  # (L, ndir)
        signs = jnp.asarray([1.0, -1.0], dtype=dtype)
        # rows ordered (d1+, d1-, d2+, d2-, ...) to match MuJoCo
        jp = (
            jn[:, None, None, :]
            + signs[None, None, :, None] * mu[:, :, None, None] * ax[:, :, None, :]
        )  # (L, ndir, 2, nv)
        jp = jp.reshape(L * nrow, nv)
        mu02 = (mu_all[:, 0] ** 2).astype(dtype)  # (L,)
        dap = jnp.repeat(iw * 2.0 * mu02 * (1.0 + mu02), nrow, axis=0)
        rep = lambda x: jnp.repeat(x, nrow, axis=0)
        start = len(rows.unilateral)
        for li, lane in enumerate(lanes):
            contact_layout.append(
                (lane, start + li * nrow, condim, nrow, False)
            )
        rows.add_block(
            model, jp, rep(pos), rep(con.solref[idx]), rep(con.solimp[idx]),
            dap, rep(exists), True, vel=jp @ d.qvel,
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
        is_cone=np.array(rows.is_cone),            # static (nefc,)
        cone_groups=tuple(rows.cone_groups),       # static (start, condim)
        cone_mu=(jnp.stack(rows.cone_mu)
                 if rows.cone_mu else None),       # (ncone, 5)
        impratio=float(model.opt.impratio),        # static
        contact_layout=tuple(contact_layout),      # static row->lane map
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


def _cone_force_cost(efc, jar):
    """Elliptic-cone contacts: force + cost contributions.

    The force is the projection of g = -D*jar onto the friction cone
    {f : f_0 >= ||f_tail / mu_tail||} in the D^{-1}-weighted metric
    (impratio enters only through the friction-row D); the cost is the
    matching Moreau envelope, so grad cost = -force.  In circularized
    coordinates (y_0 = f_0, y_i = f_i / mu_i) the tail metric becomes
    isotropic, giving the closed form below.  Verified against MuJoCo
    efc_force / efc_state in all three zones (tests/test_golden.py)."""
    dtype = jar.dtype
    force = jnp.zeros_like(jar)
    cost = jnp.zeros((), dtype)
    for gi, (start, dim) in enumerate(efc["cone_groups"]):
        sl = slice(start, start + dim)
        D_c = efc["D"][sl]
        g = -D_c * jar[sl]
        mu = efc["cone_mu"][gi][: dim - 1]
        ghat = g[1:] / mu
        gT = jnp.linalg.norm(ghat)
        mu1 = efc["cone_mu"][gi][0]
        # metric weights: a = 1/D0 (normal), b = mu1^2/(D0*impratio) (tail)
        mub2 = mu1 * mu1 / efc["impratio"]
        wa = 1.0 / (1.0 + mub2)
        wb = mub2 / (1.0 + mub2)
        t = wa * g[0] + wb * gT  # boundary apex coordinate
        bottom = g[0] >= gT      # unclamped force already inside the cone
        zero = t <= 0.0          # inside the polar cone: no force
        safe_t = jnp.where(gT > 1e-15, gT, 1.0)
        f0 = jnp.where(bottom, g[0], jnp.where(zero, 0.0, t))
        ft = jnp.where(
            bottom, g[1:], jnp.where(zero, 0.0, mu * t * ghat / safe_t)
        )
        f_c = jnp.concatenate([f0[None], ft])
        exists = efc["exists"][start]  # one flag per contact
        f_c = jnp.where(exists, f_c, 0.0)
        force = force.at[sl].set(f_c)
        dinv = 1.0 / jnp.maximum(D_c, 1e-30)
        c = 0.5 * jnp.sum(g * g * dinv) - 0.5 * jnp.sum((g - f_c) ** 2 * dinv)
        cost = cost + jnp.where(exists, c, 0.0)
    return force, cost


def _efc_force(efc, jar):
    lo, hi = _force_bounds(efc)
    f = jnp.clip(-efc["D"] * jar, lo, hi)
    f = jnp.where(efc["exists"], f, 0.0)
    if efc["cone_groups"]:
        cone_f, _ = _cone_force_cost(efc, jar)
        f = jnp.where(jnp.asarray(efc["is_cone"]), cone_f, f)
    return f


def _cost(efc, x, qacc_smooth, jar, qM):
    """Convex solver cost: Gauss term + per-row piecewise cost — quadratic
    0.5*D*jar^2 while the force -D*jar is inside its clamp band, linear
    continuation outside (constant-slope zone of clipped force); elliptic
    contacts contribute their cone Moreau envelope instead."""
    dx = x - qacc_smooth
    gauss = 0.5 * jnp.dot(dx, qM @ dx)
    lo, hi = _force_bounds(efc)
    D = efc["D"]
    gc = jnp.clip(D * jar, -hi, -lo)  # = -force
    cons = gc * jar - 0.5 * gc * gc / jnp.maximum(D, 1e-30)
    keep = efc["exists"]
    if efc["cone_groups"]:
        keep = keep & jnp.asarray(~efc["is_cone"])
        _, cone_cost = _cone_force_cost(efc, jar)
        gauss = gauss + cone_cost
    return gauss + jnp.sum(jnp.where(keep, cons, 0.0))


def _linesearch_bisect(efc, jar, jp, d0_gauss, slope_gauss):
    """Monotone root-find on phi'(alpha) for cost families without simple
    activity breakpoints (elliptic cones): doubling bracket + bisection.
    phi'(alpha) = d0 + alpha*slope - jp . force(jar + alpha*jp) is
    nondecreasing (convex cost), so the bracket always converges."""

    def dphi(alpha):
        return (
            d0_gauss
            + alpha * slope_gauss
            - jnp.dot(jp, _efc_force(efc, jar + alpha * jp))
        )

    hi = jnp.ones_like(d0_gauss)
    for _ in range(16):
        hi = jnp.where(dphi(hi) < 0, hi * 4.0, hi)
    lo = jnp.zeros_like(hi)
    for _ in range(44):
        mid = 0.5 * (lo + hi)
        neg = dphi(mid) < 0
        lo = jnp.where(neg, mid, lo)
        hi = jnp.where(neg, hi, mid)
    alpha = 0.5 * (lo + hi)
    return jnp.where(dphi(jnp.zeros_like(alpha)) >= 0, 0.0, alpha)


def _linesearch(efc, jar, jp, d0_gauss, slope_gauss):
    """Exact minimization of the piecewise-quadratic cost along direction p.

    phi'(alpha) = d0_gauss + alpha*slope_gauss
                  + sum_i Jp_i * clip(D_i * jar_i(alpha), glo_i, ghi_i)
    with (glo, ghi) = (-hi, -lo) the clamp band of g = D*jar = -force.
    phi' is nondecreasing (convex cost); find its zero crossing exactly by
    scanning the sorted clamp-crossing breakpoints (each row has up to two:
    one per finite band edge).  Elliptic cones have curved zone boundaries
    (no breakpoints), so their presence switches to the bisection search."""
    if efc["cone_groups"]:
        return _linesearch_bisect(efc, jar, jp, d0_gauss, slope_gauss)
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
        x, jar, g, mg, p, cost, niter = carry
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
        # observability (SURVEY.md §5.5): like the Newton solver, count only
        # iterations that still improved the cost beyond tolerance, so
        # solver_niter is a measured iterations-to-convergence figure
        new_cost = _cost(efc, x, qacc_smooth, jar, qM)
        improved = (cost - new_cost) > model.opt.tolerance * jnp.maximum(
            1.0, jnp.abs(cost)
        )
        return x, jar, g_new, mg_new, p, new_cost, niter + improved.astype(
            jnp.int32
        )

    c0 = jnp.minimum(c_ws, c_sm)
    x, jar, _, _, _, cost, niter = jax.lax.fori_loop(
        0, model.opt.iterations, body,
        (x0, jar0, g0, mg0, p0, c0, jnp.zeros((), dtype=jnp.int32)),
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
        solver_cost=cost,
        solver_gradnorm=jnp.linalg.norm(grad_of(x, jar)),
        solver_niter=niter,
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

    def cone_hess(gi, start, dim, jar):
        """(dim, dim) cost Hessian block of one elliptic contact wrt its
        jar slice: diag(D) in the bottom zone, 0 in the zero zone, and the
        curved-cone Hessian of 0.5*(a+b)*t^2 mapped through g = -D*jar."""
        D_c = efc["D"][start : start + dim]
        g = -D_c * jar[start : start + dim]
        mu = efc["cone_mu"][gi][: dim - 1]
        mu1 = efc["cone_mu"][gi][0]
        q = g[1:] / mu
        Q = jnp.linalg.norm(q)
        safe_q = jnp.where(Q > 1e-15, Q, 1.0)
        mub2 = mu1 * mu1 / efc["impratio"]
        a = 1.0 / D_c[0]
        b = mub2 / D_c[0]
        wa = 1.0 / (1.0 + mub2)
        wb = mub2 / (1.0 + mub2)
        t = wa * g[0] + wb * Q
        hpp = a * a / (a + b)
        hpq = (a * b / (a + b)) * q / safe_q
        qq = jnp.outer(q, q) / (safe_q * safe_q)
        eye = jnp.eye(dim - 1, dtype=jar.dtype)
        hqq = (b * b / (a + b)) * qq + (t * b / safe_q) * (eye - qq)
        s0 = -D_c[0]
        st = -D_c[1:] / mu
        h = jnp.zeros((dim, dim), dtype=jar.dtype)
        h = h.at[0, 0].set(s0 * s0 * hpp)
        h = h.at[0, 1:].set(s0 * st * hpq)
        h = h.at[1:, 0].set(s0 * st * hpq)
        h = h.at[1:, 1:].set(jnp.outer(st, st) * hqq)
        bottom = g[0] >= Q
        zero = t <= 0.0
        h = jnp.where(bottom, jnp.diag(D_c), jnp.where(zero, 0.0, h))
        return jnp.where(efc["exists"][start], h, 0.0)

    def body(_, carry):
        x, jar, cost, niter = carry
        f = _efc_force(efc, jar)
        grad = qM @ x - qfrc_smooth - J.T @ f
        # Hessian rows: quadratic only while the force is inside its band
        g = efc["D"] * jar
        in_band = (g > glo) & (g < ghi) & efc["exists"]
        w = jnp.where(in_band, efc["D"], 0.0)
        if efc["cone_groups"]:
            # elliptic rows get a per-contact block instead of diagonal w
            w = jnp.where(jnp.asarray(efc["is_cone"]), 0.0, w)
        hess = qM + (J.T * w) @ J
        for gi, (start, dim) in enumerate(efc["cone_groups"]):
            J_c = J[start : start + dim]
            hess = hess + J_c.T @ cone_hess(gi, start, dim, jar) @ J_c
        p = -maths.solve_pd_unrolled(hess, grad)
        jp = J @ p
        d0_gauss = jnp.dot(p, qM @ x - qfrc_smooth)
        slope_gauss = jnp.dot(p, qM @ p)
        alpha = _linesearch(efc, jar, jp, d0_gauss, slope_gauss)
        x = x + alpha * p
        jar = jar + alpha * jp
        # observability (SURVEY.md §5.5): count iterations that still made
        # progress beyond the solver tolerance
        new_cost = _cost(efc, x, qacc_smooth, jar, qM)
        improved = (cost - new_cost) > model.opt.tolerance * jnp.maximum(
            1.0, jnp.abs(cost)
        )
        return x, jar, new_cost, niter + improved.astype(jnp.int32)

    c0 = jnp.minimum(c_ws, c_sm)
    x, jar, cost, niter = jax.lax.fori_loop(
        0, model.opt.iterations, body,
        (x0, jar0, c0, jnp.zeros((), dtype=jnp.int32)),
    )
    f = _efc_force(efc, jar)
    grad = qM @ x - qfrc_smooth - J.T @ f
    return d.replace(
        qacc=x,
        qfrc_constraint=J.T @ f,
        qacc_warmstart=x,
        nefc_active=jnp.sum(efc["exists"], dtype=jnp.int32),
        solver_cost=cost,
        solver_gradnorm=jnp.linalg.norm(grad),
        solver_niter=niter,
    )


def _solve_pgs(model: Model, d: Data, efc):
    """Dual projected Gauss-Seidel (mj_solPGS analog, pyramidal cone).

    Solves min 0.5 f^T A f + f^T b over f >= 0 (unilateral rows) with
    A = J M^-1 J^T + diag(R), b = J qacc_smooth - aref.  The sweep is
    sequential over rows (unrolled: nefc is static and small) but fully
    vectorized over the env batch.
    """
    if efc["cone_groups"]:
        raise NotImplementedError(
            "PGS with elliptic cones is not implemented (per-contact cone "
            "projection sweep); use the Newton or CG solver"
        )
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

    # row masks as arrays so the sweep is a fori_loop with dynamic indexing:
    # trace/compile time stays O(1) in nefc instead of unrolling the rows
    # (contact-rich models have hundreds; VERDICT r1 weak #6)
    uni_arr = jnp.asarray(efc["unilateral"])
    fri_arr = jnp.asarray(efc["is_friction"])
    floss = efc["floss"]

    def row_update(i, f):
        resid = jnp.dot(a_mat[i], f) + b_vec[i]
        fi = f[i] - resid / diag[i]
        fi = jnp.where(uni_arr[i], jnp.maximum(fi, 0.0), fi)
        fi = jnp.where(fri_arr[i], jnp.clip(fi, -floss[i], floss[i]), fi)
        fi = jnp.where(exists[i], fi, 0.0)
        return f.at[i].set(fi)

    def sweep(_, carry):
        f, niter = carry
        f_new = jax.lax.fori_loop(0, ne, row_update, f)
        # observability: count sweeps that still moved the iterate beyond
        # tolerance (sup-norm of the force change), like the primal solvers
        moved = jnp.max(jnp.abs(f_new - f)) > model.opt.tolerance
        return f_new, niter + moved.astype(jnp.int32)

    f, niter = jax.lax.fori_loop(
        0, model.opt.iterations, sweep,
        (f0, jnp.zeros((), dtype=jnp.int32)),
    )
    qfrc_constraint = J.T @ f
    qacc = d.qacc_smooth + minv_jt @ f
    # dual solver: report the primal cost at the returned qacc and the dual
    # complementarity residual (projected-gradient norm of the sweep)
    resid = a_mat @ f + b_vec
    proj = jnp.where(uni, jnp.minimum(resid, jnp.where(f > 0, resid, 0.0)),
                     resid)
    return d.replace(
        qacc=qacc,
        qfrc_constraint=qfrc_constraint,
        qacc_warmstart=qacc,
        nefc_active=jnp.sum(exists, dtype=jnp.int32),
        solver_cost=_cost(efc, qacc, d.qacc_smooth, J @ qacc - aref, qM),
        solver_gradnorm=jnp.linalg.norm(jnp.where(exists, proj, 0.0)),
        solver_niter=niter,
    )


def contact_forces(model: Model, d: Data, efc, qacc) -> jax.Array:
    """(ncon, 6) world-frame [torque; force] acting on geom2's body at each
    contact point, reconstructed from the solved efc forces
    (mj_contactForce analog).  Pyramidal facets recombine as
    normal = sum(facets), tangent_k = mu_k * (f_k+ - f_k-); elliptic rows
    are the frame-axis forces directly."""
    dtype = d.qpos.dtype
    ncon = d.contact.dist.shape[0]
    out = jnp.zeros((ncon, 6), dtype=dtype)
    if efc is None or not efc.get("contact_layout"):
        return out
    jar = efc["J"] @ qacc - efc["aref"]
    f = _efc_force(efc, jar)
    z3 = jnp.zeros(3, dtype=dtype)
    for (lane, start, condim, nrow, is_cone) in efc["contact_layout"]:
        frame = d.contact.frame[lane]  # rows [n, t1, t2]
        mu = d.contact.friction[lane]
        torque = z3
        if condim == 1:
            force = frame[0] * f[start]
        elif is_cone:
            fc = f[start : start + condim]
            force = frame.T @ fc[:3]
            if condim >= 4:
                torque = frame[0] * fc[3]
            if condim == 6:
                torque = torque + frame[1] * fc[4] + frame[2] * fc[5]
        else:
            ndir = nrow // 2
            fr = f[start : start + nrow].reshape(ndir, 2)
            fn = jnp.sum(fr)
            diff = fr[:, 0] - fr[:, 1]
            force = (frame[0] * fn + frame[1] * mu[0] * diff[0]
                     + frame[2] * mu[1] * diff[1])
            if condim >= 4:
                torque = frame[0] * mu[2] * diff[2]
            if condim == 6:
                torque = (torque + frame[1] * mu[3] * diff[3]
                          + frame[2] * mu[4] * diff[4])
        out = out.at[lane].set(jnp.concatenate([torque, force]))
    return out


def _needs_contact_force(model: Model) -> bool:
    from ..model import SensorType

    want = (SensorType.TOUCH, SensorType.FORCE, SensorType.TORQUE)
    return any(SensorType(t) in want for t in model.sensor_type)


def fwd_constraint(model: Model, d: Data) -> Data:
    """mj_fwdConstraint analog: assemble rows, solve, store qacc + forces."""
    efc = make_efc(model, d)
    if efc is None:
        zero = jnp.zeros((), dtype=d.qpos.dtype)
        return d.replace(
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(d.qvel),
            qacc_warmstart=d.qacc_smooth,
            nefc_active=jnp.zeros((), dtype=jnp.int32),
            solver_cost=zero,
            solver_gradnorm=zero,
            solver_niter=jnp.zeros((), dtype=jnp.int32),
        )
    from ..model import SolverType

    if model.opt.solver == SolverType.NEWTON:
        d = _solve_newton(model, d, efc)
    elif model.opt.solver == SolverType.PGS:
        d = _solve_pgs(model, d, efc)
    else:
        d = _solve_cg(model, d, efc)
    if _needs_contact_force(model):
        d = d.replace(contact_force=contact_forces(model, d, efc, d.qacc))
    if _needs_limit_sensor(model) and n_limit_rows(model):
        # per-limit-row (pos - margin, vel, force) snapshot for the
        # jointlimit*/tendonlimit* sensors (efc_pos/efc_vel/efc_force
        # analogs restricted to limit rows; inactive rows report 0)
        rows_idx = np.array(list(limit_row_map(model).values()))
        jar = efc["J"] @ d.qacc - efc["aref"]
        f = _efc_force(efc, jar)
        vel = efc["J"] @ d.qvel
        trip = jnp.stack([efc["pos"], vel, f], axis=-1)
        trip = jnp.where(efc["exists"][:, None], trip, 0.0)
        d = d.replace(efc_limit=trip[rows_idx])
    return d
