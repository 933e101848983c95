"""Smooth (unconstrained) dynamics pipeline.

TPU-native re-implementation of the smooth-dynamics stages MuJoCo's
``mj_step`` runs inside the C engine (invoked by the reference at
/root/reference/src/physics.rs:44-46): kinematics, com-based quantities,
CRB inertia, velocity quantities, RNE bias forces, passive forces,
actuation, and smooth acceleration.

Everything is a pure function of ``(Model, Data)`` on a *single* env;
batching is applied with ``jax.vmap`` at the environment layer.  Loops over
bodies/joints are Python loops over the model's static structure — they
unroll at trace time into a fixed fused XLA graph (models are small:
nbody <= ~20 for the control suite).

Spatial quantities follow MuJoCo's convention: motion/force vectors are
``[angular; linear]`` referenced at the kinematic tree root's subtree
center of mass (``subtree_com[body_rootid[b]]``), in world orientation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..model import GeomType, JointType, Model, TrnType, GainType, BiasType, DynType
from ..state import Data
from . import maths


# ---------------------------------------------------------------------------
# static structure helpers (trace-time numpy; derived from static tuples)
# ---------------------------------------------------------------------------


def body_joints(model: Model, body: int) -> list[int]:
    adr, num = model.body_jntadr[body], model.body_jntnum[body]
    return list(range(adr, adr + num)) if adr >= 0 else []


def dof_ancestor_mask(model: Model) -> np.ndarray:
    """(nv, nv) bool: mask[i, j] = dof j is an ancestor of dof i (or i==j)."""
    nv = model.nv
    mask = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = model.dof_parentid[j]
    return mask


def body_dof_mask(model: Model) -> np.ndarray:
    """(nbody, nv) bool: mask[b, j] = dof j is in the ancestor chain of b."""
    nbody, nv = model.nbody, model.nv
    mask = np.zeros((nbody, nv), dtype=bool)
    for b in range(nbody):
        # last dof of b or nearest ancestor with dofs
        body = b
        last = -1
        while body != 0:
            if model.body_dofnum[body] > 0:
                last = model.body_dofadr[body] + model.body_dofnum[body] - 1
                break
            body = model.body_parentid[body]
        j = last
        while j >= 0:
            mask[b, j] = True
            j = model.dof_parentid[j]
    return mask


def tendon_jacobians(model: Model, dtype):
    """Fixed-tendon coupling matrices: (ntendon, nv) over dofs for
    velocity/force mapping and (ntendon, nq) over qpos for length.  The
    sparsity is static (wrap tables); the coefficients stay traced.
    Spatial tendons have zero rows here — use :func:`tendon_length_moment`
    for the unified (state-dependent) quantities."""
    tv = jnp.zeros((model.ntendon, model.nv), dtype=dtype)
    tq = jnp.zeros((model.ntendon, model.nq), dtype=dtype)
    coefs = model.tendon_wrap_coef
    for t in range(model.ntendon):
        adr, num = model.tendon_adr[t], model.tendon_num[t]
        for w in range(adr, adr + num):
            j = model.tendon_wrap_jnt[w]
            tv = tv.at[t, model.jnt_dofadr[j]].add(coefs[w])
            tq = tq.at[t, model.jnt_qposadr[j]].add(coefs[w])
    return tv, tq


def has_spatial_tendon(model: Model) -> bool:
    return any(k == 1 for k in getattr(model, "tendon_kind", ()))


def _site_point_jac(model: Model, d: Data, s: int, bdm, dtype):
    """(nv, 3) translational jacobian of site ``s`` (world frame)."""
    b = model.site_bodyid[s]
    origin = d.subtree_com[model.body_rootid[b]]
    mask = jnp.asarray(bdm[b], dtype=dtype)[:, None]
    ang = d.cdof[:, :3] * mask
    lin = d.cdof[:, 3:] * mask
    return lin + jnp.cross(
        ang, jnp.broadcast_to(d.site_xpos[s] - origin, ang.shape)
    )


def _point_jac(model: Model, d: Data, point, body, bdm, dtype):
    """(nv, 3) translational jacobian of world `point` rigidly attached to
    `body`."""
    origin = d.subtree_com[model.body_rootid[body]]
    mask = jnp.asarray(bdm[body], dtype=dtype)[:, None]
    ang = d.cdof[:, :3] * mask
    lin = d.cdof[:, 3:] * mask
    return lin + jnp.cross(ang, jnp.broadcast_to(point - origin, ang.shape))


def wrap_circle2d(d0, d1, sd, radius, xp=jnp, sd_inside=None):
    """2D circle wrap (mju_wrap's planar core, semantics verified against
    MuJoCo 3.10 wrap_xpos/ten_length): circle of `radius` at the origin,
    path endpoints d0/d1 (2,), side reference sd (2,) or None.

    Returns (active, t0, t1, arc): wrap tangent points and arc length,
    with ``active`` False when the path stays straight — the straight
    segment clears the circle on the side of `sd` (or at all, when no
    sidesite), or an endpoint is inside the circle.
    """
    tiny = 1e-14
    sq0 = xp.dot(d0, d0)
    sq1 = xp.dot(d1, d1)
    r2 = radius * radius
    seg = d1 - d0
    ss = xp.maximum(xp.dot(seg, seg), tiny)
    tpar = xp.clip(-xp.dot(d0, seg) / ss, 0.0, 1.0)
    pnt = d0 + tpar * seg
    dist2 = xp.dot(pnt, pnt)
    crosses = dist2 < r2
    ends_out = (sq0 > r2) & (sq1 > r2)

    # wrap orientation (which way around the circle): the natural direction
    # is sign(cross2(d0, d1)) — exact vs MuJoCo with no sidesite — flipped
    # when the sidesite sits on the opposite side of the straight path
    # (dot(pnt, sd) < 0: forced wraps and contrary crossings go the other
    # way; matches MuJoCo on 97.3% of adversarially random side configs,
    # residual mismatches are deep forced wraps with near-antipodal sides)
    ccw_nat = (d0[0] * d1[1] - d0[1] * d1[0]) > 0
    if sd is None:
        active = crosses & ends_out
        use_ccw = ccw_nat
        sd_in = None
    else:
        # inside-ness is a 3D property of the sidesite vs the geom (sphere:
        # full distance, cylinder: radial), precomputed by wrap_segment —
        # the in-plane projection of an outside sphere sidesite can land
        # inside the great circle and must NOT trigger the inside regime
        sd_in = (xp.dot(sd, sd) < r2) if sd_inside is None else sd_inside
        flip = xp.dot(pnt, sd) < 0
        # outside sidesite: wrap when crossing or forced to the other side;
        # inside sidesite (projection inside the circle): the tendon must
        # pass THROUGH the disc — wrap (single touch point) exactly when
        # the straight segment misses it (both rules exact vs MuJoCo)
        active = xp.where(sd_in, ~crosses, crosses | flip) & ends_out
        use_ccw = xp.where(flip & ~sd_in, ~ccw_nat, ccw_nat)

    def tangents(dv, sq):
        """Both circle tangent points of external point dv, ordered so the
        first has positive cross2(dv, t) (counterclockwise side)."""
        sq = xp.maximum(sq, r2 + tiny)
        root = xp.sqrt(xp.maximum(sq - r2, 0.0))
        base = (r2 / sq) * dv
        off = (radius * root / sq) * xp.stack([-dv[1], dv[0]])
        return base + off, base - off

    t0p, t0m = tangents(d0, sq0)
    t1p, t1m = tangents(d1, sq1)
    # rotationally consistent pairs: a CCW wrap leaves d0 via its CCW
    # tangent and reaches d1 via d1's CW tangent, and vice versa
    t0 = xp.where(use_ccw, t0p, t0m)
    t1 = xp.where(use_ccw, t1m, t1p)
    # always the short arc between the tangent points (MuJoCo convention,
    # verified: a crossing chord with an opposite-side sidesite still gets
    # acos, not the reflex arc)
    cosang = xp.clip(xp.dot(t0, t1) / r2, -1.0, 1.0)
    ang = xp.arccos(cosang)
    arc = radius * ang

    if sd is not None:
        # inside-sidesite regime: single touch point T = argmin over the
        # circle of |d0-T| + |T-d1| (MuJoCo wrap_inside; verified: the
        # reported wrap points coincide and equal the global minimizer).
        # Coarse 32-angle scan + golden-section refinement, all traced.
        angs = xp.arange(32) * (2.0 * xp.pi / 32.0)
        cand = radius * xp.stack([xp.cos(angs), xp.sin(angs)], axis=1)
        fvals = (xp.sqrt(xp.sum((cand - d0) ** 2, axis=1))
                 + xp.sqrt(xp.sum((cand - d1) ** 2, axis=1)))
        k = xp.argmin(fvals)
        th0 = angs[k]
        lo = th0 - 2.0 * xp.pi / 32.0
        hi = th0 + 2.0 * xp.pi / 32.0

        def f_of(th):
            T = radius * xp.stack([xp.cos(th), xp.sin(th)])
            return (xp.sqrt(xp.sum((T - d0) ** 2))
                    + xp.sqrt(xp.sum((T - d1) ** 2)))

        gr = 0.6180339887498949
        a_, b_ = lo, hi
        c_ = b_ - gr * (b_ - a_)
        e_ = a_ + gr * (b_ - a_)
        fc, fe = f_of(c_), f_of(e_)
        for _ in range(60):
            take_c = fc < fe
            b_ = xp.where(take_c, e_, b_)
            a_ = xp.where(take_c, a_, c_)
            c_new = b_ - gr * (b_ - a_)
            e_new = a_ + gr * (b_ - a_)
            c_, e_ = c_new, e_new
            fc, fe = f_of(c_), f_of(e_)
        th = 0.5 * (a_ + b_)
        T = radius * xp.stack([xp.cos(th), xp.sin(th)])
        t0 = xp.where(sd_in, T, t0)
        t1 = xp.where(sd_in, T, t1)
        arc = xp.where(sd_in, 0.0, arc)
    return active, t0, t1, arc


def wrap_segment(p0, p1, gpos, gmat, radius, is_cylinder, side_world,
                 xp=jnp):
    """mju_wrap analog, world-frame: path p0 -> p1 possibly wrapping the
    sphere/cylinder (gpos, gmat, radius).  Returns (active, t0w, t1w,
    wlen): world tangent points and on-surface path length (helical for
    cylinders: sqrt(arc2d^2 + dz^2), z interpolated by 2D path length —
    both verified against MuJoCo 3.10 wrap_xpos / ten_length)."""
    l0 = gmat.T @ (p0 - gpos)
    l1 = gmat.T @ (p1 - gpos)
    ls = None if side_world is None else gmat.T @ (side_world - gpos)
    if is_cylinder:
        d0, z0 = l0[:2], l0[2]
        d1, z1 = l1[:2], l1[2]
        sd = None if ls is None else ls[:2]
        sd_inside = None if ls is None else (
            ls[0] * ls[0] + ls[1] * ls[1] < radius * radius
        )
        active, t0, t1, arc = wrap_circle2d(d0, d1, sd, radius, xp=xp,
                                            sd_inside=sd_inside)
        len0 = xp.linalg.norm(d0 - t0)
        len1 = xp.linalg.norm(d1 - t1)
        tot = xp.maximum(len0 + arc + len1, 1e-12)
        zt0 = z0 + (z1 - z0) * len0 / tot
        zt1 = z0 + (z1 - z0) * (len0 + arc) / tot
        wlen = xp.sqrt(arc * arc + (zt1 - zt0) ** 2)
        t0w = gpos + gmat @ xp.concatenate([t0, zt0[None]])
        t1w = gpos + gmat @ xp.concatenate([t1, zt1[None]])
        return active, t0w, t1w, wlen
    # sphere: 2D problem in the plane through l0, l1 and the center
    n0 = xp.linalg.norm(l0)
    e1 = l0 / xp.maximum(n0, 1e-12)
    t_vec = l1 - e1 * xp.dot(l1, e1)
    tn = xp.linalg.norm(t_vec)
    # degenerate (collinear with center): any orthogonal of e1
    alt = xp.stack([e1[1] - e1[2], e1[2] - e1[0], e1[0] - e1[1]])
    altn = xp.linalg.norm(alt)
    alt2 = xp.stack([-e1[1], e1[0], xp.zeros_like(e1[0])])
    alt = xp.where(altn > 1e-9, alt / xp.maximum(altn, 1e-12),
                   alt2 / xp.maximum(xp.linalg.norm(alt2), 1e-12))
    e2 = xp.where(tn > 1e-9, t_vec / xp.maximum(tn, 1e-12), alt)
    d0 = xp.stack([n0, xp.zeros_like(n0)])
    d1 = xp.stack([xp.dot(l1, e1), xp.dot(l1, e2)])
    sd = None if ls is None else xp.stack(
        [xp.dot(ls, e1), xp.dot(ls, e2)]
    )
    sd_inside = None if ls is None else (
        xp.dot(ls, ls) < radius * radius
    )
    active, t0, t1, arc = wrap_circle2d(d0, d1, sd, radius, xp=xp,
                                        sd_inside=sd_inside)
    t0w = gpos + gmat @ (e1 * t0[0] + e2 * t0[1])
    t1w = gpos + gmat @ (e1 * t1[0] + e2 * t1[1])
    return active, t0w, t1w, arc


def _tendon_path(model: Model, t: int):
    """Generalized path entries for tendon t: prefers model.tendon_path,
    falls back to the legacy site-only arrays."""
    if getattr(model, "tendon_path", ()):
        return model.tendon_path[t]
    adr, num = model.tendon_site_adr[t], model.tendon_site_num[t]
    return tuple(
        (0, model.tendon_sites[adr + k], -1)
        + tuple(model.tendon_site_div[adr + k])
        for k in range(num)
    )


def tendon_length_moment(model: Model, d: Data):
    """(ntendon,) lengths + (ntendon, nv) moments dL/dq for fixed AND
    spatial tendons (mj_tendon analog).

    Fixed tendons are linear couplings of scalar joints; spatial tendons
    are site-routed paths with optional sphere/cylinder wrap geoms and
    pulley branch divisors: straight segments contribute |p2 - p1|/div and
    u^T (Jp2 - Jp1)/div; a wrap contributes the two tangent segments, the
    on-surface arc (helical for cylinders), and Jacobian terms with the
    tangent points rigidly attached to the wrap geom's body (exactly
    mj_tendon's wpnt chain).  Requires position-stage Data (site_xpos /
    subtree_com / cdof)."""
    dtype = d.qpos.dtype
    tv, tq = tendon_jacobians(model, dtype)
    length = tq @ d.qpos
    moment = tv
    if not has_spatial_tendon(model):
        return length, moment
    bdm = body_dof_mask(model)

    def seg_term(p1, j1, p2, j2, div):
        dvec = p2 - p1
        n = jnp.linalg.norm(dvec)
        u = dvec / jnp.maximum(n, 1e-12)
        return n / div, ((j2 - j1) @ u) / div

    for t in range(model.ntendon):
        if model.tendon_kind[t] != 1:
            continue
        path = _tendon_path(model, t)
        L = jnp.zeros((), dtype=dtype)
        row = jnp.zeros((model.nv,), dtype=dtype)
        k = 0
        while k < len(path) - 1:
            kind1, obj1, _, br1, div = path[k]
            assert kind1 == 0, "path segments start at sites"
            nxt = path[k + 1]
            if nxt[3] != br1:
                k += 1
                continue  # pulley between: no segment
            s1 = obj1
            p1 = d.site_xpos[s1]
            j1 = _site_point_jac(model, d, s1, bdm, dtype)
            if nxt[0] == 0:  # plain site-site segment
                s2 = nxt[1]
                p2 = d.site_xpos[s2]
                j2 = _site_point_jac(model, d, s2, bdm, dtype)
                dl, dr = seg_term(p1, j1, p2, j2, div)
                L = L + dl
                row = row + dr
                k += 1
                continue
            # wrap geom between this site and the next
            g = nxt[1]
            side = nxt[2]
            s2 = path[k + 2][1]
            assert path[k + 2][0] == 0, "wrap geom bracketed by sites"
            p2 = d.site_xpos[s2]
            j2 = _site_point_jac(model, d, s2, bdm, dtype)
            gb = model.geom_bodyid[g]
            gpos = d.geom_xpos[g]
            gmat = d.geom_xmat[g]
            is_cyl = GeomType(model.geom_type[g]) == GeomType.CYLINDER
            radius = model.geom_size[g][0]
            side_w = None if side < 0 else d.site_xpos[side]
            active, t0w, t1w, wlen = wrap_segment(
                p1, p2, gpos, gmat, radius, is_cyl, side_w
            )
            jt0 = _point_jac(model, d, t0w, gb, bdm, dtype)
            jt1 = _point_jac(model, d, t1w, gb, bdm, dtype)
            dl0, dr0 = seg_term(p1, j1, t0w, jt0, div)
            dla, dra = seg_term(t0w, jt0, t1w, jt1, div)
            dl1, dr1 = seg_term(t1w, jt1, p2, j2, div)
            dls, drs = seg_term(p1, j1, p2, j2, div)
            # wrapped: tangent segments + on-surface arc length (the
            # moment uses the chord direction between tangent points,
            # matching mj_tendon's straight-segment sum over wpnt)
            L = L + jnp.where(active, dl0 + wlen / div + dl1, dls)
            row = row + jnp.where(active, dr0 + dra + dr1, drs)
            k += 2
        length = length.at[t].set(L)
        moment = moment.at[t].set(row)
    return length, moment


def subtree_mask(model: Model) -> np.ndarray:
    """(nbody, nbody) bool: mask[b, c] = c is in the subtree rooted at b."""
    nbody = model.nbody
    mask = np.zeros((nbody, nbody), dtype=bool)
    for c in range(nbody):
        b = c
        while True:
            mask[b, c] = True
            if b == 0:
                break
            b = model.body_parentid[b]
    return mask


# ---------------------------------------------------------------------------
# mj_kinematics analog
# ---------------------------------------------------------------------------


def kinematics(model: Model, d: Data) -> Data:
    """Forward kinematics: body/geom/site poses + joint anchors/axes."""
    dtype = d.qpos.dtype
    xpos = [jnp.zeros(3, dtype=dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype=dtype)]
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt

    for b in range(1, model.nbody):
        p = model.body_parentid[b]
        mid = model.body_mocapid[b]
        if mid >= 0:
            pos = d.mocap_pos[mid]
            quat = maths.quat_normalize(d.mocap_quat[mid])
        else:
            pos = xpos[p] + maths.quat_rotate(xquat[p], model.body_pos[b])
            quat = maths.quat_mul(xquat[p], model.body_quat[b])

        jids = body_joints(model, b)
        if len(jids) == 1 and model.jnt_type[jids[0]] == JointType.FREE:
            j = jids[0]
            qadr = model.jnt_qposadr[j]
            pos = d.qpos[qadr : qadr + 3]
            quat = maths.quat_normalize(d.qpos[qadr + 3 : qadr + 7])
            xanchor[j] = pos
            # MuJoCo keeps the free joint's axis unrotated (global z)
            xaxis[j] = model.jnt_axis[j]
        else:
            for j in jids:
                jt = model.jnt_type[j]
                qadr = model.jnt_qposadr[j]
                anchor = pos + maths.quat_rotate(quat, model.jnt_pos[j])
                axis = maths.quat_rotate(quat, model.jnt_axis[j])
                if jt == JointType.SLIDE:
                    pos = pos + axis * (d.qpos[qadr] - model.qpos0[qadr])
                elif jt == JointType.BALL:
                    qloc = maths.quat_normalize(d.qpos[qadr : qadr + 4])
                    quat = maths.quat_mul(quat, qloc)
                    # keep anchor fixed: recompute body origin
                    pos = anchor - maths.quat_rotate(quat, model.jnt_pos[j])
                elif jt == JointType.HINGE:
                    angle = d.qpos[qadr] - model.qpos0[qadr]
                    qloc = maths.axis_angle_to_quat(model.jnt_axis[j], angle)
                    quat = maths.quat_mul(quat, qloc)
                    pos = anchor - maths.quat_rotate(quat, model.jnt_pos[j])
                else:
                    raise NotImplementedError(f"joint type {jt}")
                xanchor[j] = anchor
                xaxis[j] = axis

        quat = maths.quat_normalize(quat)
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = maths.quat_to_mat(xquat)

    if model.njnt:
        xanchor = jnp.stack(xanchor)
        xaxis = jnp.stack(xaxis)
    else:
        xanchor = jnp.zeros((0, 3), dtype=dtype)
        xaxis = jnp.zeros((0, 3), dtype=dtype)

    # inertial frames
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, model.body_ipos)
    ximat = jnp.einsum("bij,bjk->bik", xmat, maths.quat_to_mat(model.body_iquat))

    # geoms / sites
    gb = np.array(model.geom_bodyid, dtype=np.int32)
    geom_xpos = xpos[gb] + jnp.einsum("gij,gj->gi", xmat[gb], model.geom_pos)
    geom_xmat = jnp.einsum(
        "gij,gjk->gik", xmat[gb], maths.quat_to_mat(model.geom_quat)
    )
    if model.nsite:
        sb = np.array(model.site_bodyid, dtype=np.int32)
        site_xpos = xpos[sb] + jnp.einsum("sij,sj->si", xmat[sb], model.site_pos)
        site_xmat = jnp.einsum(
            "sij,sjk->sik", xmat[sb], maths.quat_to_mat(model.site_quat)
        )
    else:
        site_xpos = jnp.zeros((0, 3), dtype=dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype=dtype)

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


# ---------------------------------------------------------------------------
# mj_comPos analog: subtree com, cinert, cdof
# ---------------------------------------------------------------------------


def com_pos(model: Model, d: Data) -> Data:
    sub = jnp.asarray(subtree_mask(model))  # (nbody, nbody)
    mass = model.body_mass
    wsum = jnp.einsum("bc,c,ci->bi", sub.astype(d.qpos.dtype), mass, d.xipos)
    total = jnp.einsum("bc,c->b", sub.astype(d.qpos.dtype), mass)
    safe_total = jnp.where(total > 0, total, 1.0)
    subtree_com = wsum / safe_total[:, None]
    # bodies with zero subtree mass: fall back to body frame origin
    subtree_com = jnp.where((total > 0)[:, None], subtree_com, d.xpos)

    # per-body spatial inertia about subtree_com[rootid[b]]
    rootid = np.array(model.body_rootid, dtype=np.int32)
    origin = subtree_com[rootid]
    i0, h, m = maths.spatial_inertia(
        model.body_mass, model.body_inertia, d.xipos, d.ximat, origin
    )

    # cdof per dof
    cdof = [None] * model.nv
    for j in range(model.njnt):
        jt = model.jnt_type[j]
        vadr = model.jnt_dofadr[j]
        b = model.jnt_bodyid[j]
        com = subtree_com[model.body_rootid[b]]
        if jt == JointType.FREE:
            for i in range(3):
                e = jnp.zeros(6, dtype=d.qpos.dtype).at[3 + i].set(1.0)
                cdof[vadr + i] = e
            offset = com - d.xpos[b]
            for i in range(3):
                ax = d.xmat[b][:, i]
                cdof[vadr + 3 + i] = jnp.concatenate(
                    [ax, jnp.cross(ax, offset)]
                )
        elif jt == JointType.BALL:
            offset = com - d.xanchor[j]
            for i in range(3):
                ax = d.xmat[b][:, i]
                cdof[vadr + i] = jnp.concatenate([ax, jnp.cross(ax, offset)])
        elif jt == JointType.SLIDE:
            cdof[vadr] = jnp.concatenate(
                [jnp.zeros(3, dtype=d.qpos.dtype), d.xaxis[j]]
            )
        else:  # hinge
            offset = com - d.xanchor[j]
            ax = d.xaxis[j]
            cdof[vadr] = jnp.concatenate([ax, jnp.cross(ax, offset)])
    cdof = (
        jnp.stack(cdof)
        if model.nv
        else jnp.zeros((0, 6), dtype=d.qpos.dtype)
    )

    return d.replace(subtree_com=subtree_com, cinert_i=i0, cinert_h=h, cdof=cdof)


# ---------------------------------------------------------------------------
# mj_crb analog: composite rigid body -> dense qM
# ---------------------------------------------------------------------------


def crb(model: Model, d: Data) -> Data:
    sub = subtree_mask(model)  # (nbody, nbody) numpy bool
    subf = jnp.asarray(sub, dtype=d.qpos.dtype)
    # composite inertias: crb[b] = sum over subtree of cinert
    crb_i = jnp.einsum("bc,cij->bij", subf, d.cinert_i)
    crb_h = jnp.einsum("bc,ci->bi", subf, d.cinert_h)
    crb_m = jnp.einsum("bc,c->b", subf, model.body_mass)

    if model.nv == 0:
        return d

    dof_body = np.array(model.dof_bodyid, dtype=np.int32)
    # F[i] = crb[body(i)] * cdof[i]
    f = maths.inertia_mul_motion(
        crb_i[dof_body], crb_h[dof_body], crb_m[dof_body], d.cdof
    )  # (nv, 6)
    # M[i, j] = cdof[j] . F[i] for j ancestor-or-self of i
    m_full = jnp.einsum("jk,ik->ij", d.cdof, f)
    anc = jnp.asarray(dof_ancestor_mask(model))
    qm = jnp.where(anc, m_full, 0.0)
    qm = jnp.where(anc.T, m_full.T, qm)  # symmetrize via transpose mask
    qm = qm + jnp.diag(model.dof_armature)
    return d.replace(qM=qm)


# ---------------------------------------------------------------------------
def camera_lookat_mat(pos, target, xp=jnp):
    """Orientation of a target-mode camera (mj_camlight look-at): camera
    -z axis points at ``target``; x chosen orthogonal to world z (the
    verified MuJoCo construction: z = normalize(pos - target),
    x = normalize(cross(world_z, z)), y = z x x).  Returns a 3x3 matrix
    with columns (x, y, z)."""
    vec = pos - target
    z = vec / xp.maximum(xp.linalg.norm(vec), 1e-15)
    up = xp.array([0.0, 0.0, 1.0], dtype=z.dtype)
    x = xp.cross(up, z)
    xn = xp.linalg.norm(x)
    # degenerate (camera directly above/below target): any horizontal x
    alt = xp.array([1.0, 0.0, 0.0], dtype=z.dtype)
    x = xp.where(xn > 1e-9, x / xp.maximum(xn, 1e-15), alt)
    y = xp.cross(z, x)
    return xp.stack([x, y, z], axis=-1)


def cam_light(model: Model, d: Data) -> Data:
    """Camera poses per mode (mj_camlight analog): fixed / track /
    trackcom / targetbody / targetbodycom.  Track modes ride the
    compile-time qpos0 offsets (cam_pos0 / cam_poscom0 / cam_mat0);
    target modes re-aim at the target body every step."""
    from ..model import CamMode

    if not model.ncam:
        return d
    dtype = d.qpos.dtype
    poss, mats = [], []
    for i in range(model.ncam):
        mode = CamMode(model.cam_mode[i])
        b = model.cam_bodyid[i]
        if mode == CamMode.TRACK:
            pos = d.xpos[b] + jnp.asarray(model.cam_pos0[i], dtype=dtype)
            mat = jnp.asarray(model.cam_mat0[i], dtype=dtype)
        elif mode == CamMode.TRACKCOM:
            pos = d.subtree_com[b] + jnp.asarray(model.cam_poscom0[i],
                                                 dtype=dtype)
            mat = jnp.asarray(model.cam_mat0[i], dtype=dtype)
        else:  # FIXED / TARGETBODY / TARGETBODYCOM: rigid position
            pos = d.xpos[b] + d.xmat[b] @ model.cam_pos[i]
            mat = d.xmat[b] @ maths.quat_to_mat(model.cam_quat[i])
            if mode in (CamMode.TARGETBODY, CamMode.TARGETBODYCOM):
                tb = model.cam_targetbodyid[i]
                target = (d.xpos[tb] if mode == CamMode.TARGETBODY
                          else d.subtree_com[tb])
                mat = camera_lookat_mat(pos, target)
        poss.append(pos)
        mats.append(mat)
    return d.replace(cam_xpos=jnp.stack(poss), cam_xmat=jnp.stack(mats))


# mj_comVel analog: cvel, cdof_dot
# ---------------------------------------------------------------------------


def com_vel(model: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype=dtype)] * model.nbody
    cdof_dot = [jnp.zeros(6, dtype=dtype)] * model.nv

    for b in range(1, model.nbody):
        p = model.body_parentid[b]
        v = cvel[p]
        for j in body_joints(model, b):
            jt = model.jnt_type[j]
            vadr = model.jnt_dofadr[j]
            if jt == JointType.FREE:
                # translation dofs: cdof constant -> cdof_dot = 0
                v = v + jnp.einsum(
                    "i,ij->j", d.qvel[vadr : vadr + 3], d.cdof[vadr : vadr + 3]
                )
                # rotation dofs: cdof_dot = v_trans x cdof
                for i in range(3):
                    cdof_dot[vadr + 3 + i] = maths.motion_cross(
                        v, d.cdof[vadr + 3 + i]
                    )
                v = v + jnp.einsum(
                    "i,ij->j",
                    d.qvel[vadr + 3 : vadr + 6],
                    d.cdof[vadr + 3 : vadr + 6],
                )
            elif jt == JointType.BALL:
                for i in range(3):
                    cdof_dot[vadr + i] = maths.motion_cross(v, d.cdof[vadr + i])
                v = v + jnp.einsum(
                    "i,ij->j", d.qvel[vadr : vadr + 3], d.cdof[vadr : vadr + 3]
                )
            else:
                cdof_dot[vadr] = maths.motion_cross(v, d.cdof[vadr])
                v = v + d.qvel[vadr] * d.cdof[vadr]
        cvel[b] = v

    cvel = jnp.stack(cvel) if model.nbody else jnp.zeros((0, 6), dtype=dtype)
    cdof_dot = (
        jnp.stack(cdof_dot) if model.nv else jnp.zeros((0, 6), dtype=dtype)
    )
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# mj_rne analog (flg_acc=0): qfrc_bias
# ---------------------------------------------------------------------------


def rne(model: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    gravity = jnp.asarray(model.opt.gravity, dtype=dtype)
    if model.opt.disable_gravity:
        gravity = jnp.zeros(3, dtype=dtype)

    cacc = [jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity])]
    for b in range(1, model.nbody):
        p = model.body_parentid[b]
        a = cacc[p]
        adr, num = model.body_dofadr[b], model.body_dofnum[b]
        if num:
            a = a + jnp.einsum(
                "i,ij->j", d.qvel[adr : adr + num], d.cdof_dot[adr : adr + num]
            )
        cacc.append(a)
    cacc = jnp.stack(cacc)

    # cfrc_body = cinert * cacc + cvel x* (cinert * cvel)
    iv = maths.inertia_mul_motion(d.cinert_i, d.cinert_h, model.body_mass, d.cvel)
    ia = maths.inertia_mul_motion(d.cinert_i, d.cinert_h, model.body_mass, cacc)
    cfrc = ia + maths.force_cross(d.cvel, iv)

    # backward accumulation over subtrees, then project on dofs
    subf = jnp.asarray(subtree_mask(model), dtype=dtype)
    cfrc_total = jnp.einsum("bc,ck->bk", subf, cfrc)
    dof_body = np.array(model.dof_bodyid, dtype=np.int32)
    qfrc_bias = jnp.einsum("ik,ik->i", d.cdof, cfrc_total[dof_body])
    return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# mj_fwdVelocity extras: passive forces
# ---------------------------------------------------------------------------


def passive(model: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    qfrc = jnp.zeros(model.nv, dtype=dtype)
    # joint springs
    for j in range(model.njnt):
        stiff = model.jnt_stiffness[j]
        jt = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        vadr = model.jnt_dofadr[j]
        if jt in (JointType.HINGE, JointType.SLIDE):
            force = -stiff * (d.qpos[qadr] - model.qpos_spring[qadr])
            qfrc = qfrc.at[vadr].add(force)
        elif jt == JointType.BALL:
            dif = maths.quat_sub(
                d.qpos[qadr : qadr + 4], model.qpos_spring[qadr : qadr + 4]
            )
            qfrc = qfrc.at[vadr : vadr + 3].add(-stiff * dif)
        else:  # free
            dif = d.qpos[qadr : qadr + 3] - model.qpos_spring[qadr : qadr + 3]
            qfrc = qfrc.at[vadr : vadr + 3].add(-stiff * dif)
            difq = maths.quat_sub(
                d.qpos[qadr + 3 : qadr + 7], model.qpos_spring[qadr + 3 : qadr + 7]
            )
            qfrc = qfrc.at[vadr + 3 : vadr + 6].add(-stiff * difq)
    # dof damping
    qfrc = qfrc - model.dof_damping * d.qvel
    # tendon springs (dead-band) and dampers (fixed + spatial)
    if model.ntendon:
        length, moment = tendon_length_moment(model, d)
        vel = moment @ d.qvel
        lo = model.tendon_lengthspring[:, 0]
        hi = model.tendon_lengthspring[:, 1]
        disp = jnp.where(
            length < lo, lo - length, jnp.where(length > hi, hi - length, 0.0)
        )
        frc = model.tendon_stiffness * disp - model.tendon_damping * vel
        qfrc = qfrc + moment.T @ frc
    # fluid forces (mj_fluid inertia-box model): density/viscosity/wind
    if (model.opt.density != 0.0 or model.opt.viscosity != 0.0
            or any(w != 0.0 for w in model.opt.wind)):
        qfrc = qfrc + _fluid_forces(model, d)
    return d.replace(qfrc_passive=qfrc)


def _fluid_forces(model: Model, d: Data) -> jax.Array:
    """mj_fluid analog: per-body drag from the equivalent inertia box.

    Constants verified empirically against MuJoCo qfrc_passive (box probe):
    half-sizes r_i = sqrt(1.5 (I_j + I_k - I_i) / m); viscous (low-Re)
    F = -6 pi eta rbar v, tau = -8 pi eta rbar^3 omega with rbar = mean(r);
    quadratic (density) F_i = -2 rho r_j r_k |v_i| v_i,
    tau_i = -rho/2 r_i (r_j^4 + r_k^4) |w_i| w_i — all in the body's
    inertial frame at xipos, wind subtracted from the linear velocity."""
    dtype = d.qpos.dtype
    rho = model.opt.density
    eta = model.opt.viscosity
    wind = jnp.asarray(model.opt.wind, dtype=dtype)
    rootid = np.array(model.body_rootid, dtype=np.int32)
    origin = d.subtree_com[rootid]

    wrench = jnp.zeros((model.nbody, 6), dtype=dtype)  # world [force; torque]
    mass_np = np.asarray(jax.device_get(model.body_mass))
    for b in range(1, model.nbody):
        if mass_np[b] <= 0:
            continue
        I = jnp.asarray(model.body_inertia[b])
        m_b = model.body_mass[b]
        I_j = jnp.stack([I[1], I[2], I[0]])
        I_k = jnp.stack([I[2], I[0], I[1]])
        rbox = jnp.sqrt(jnp.maximum(1.5 * (I_j + I_k - I) / m_b, 1e-12))
        # local (inertial-frame) 6D velocity at xipos, wind-relative
        w_w = d.cvel[b, :3]
        v_w = d.cvel[b, 3:] + jnp.cross(w_w, d.xipos[b] - origin[b]) - wind
        R = d.ximat[b]
        w_l = R.T @ w_w
        v_l = R.T @ v_w
        rbar = jnp.mean(rbox)
        f_l = jnp.zeros(3, dtype=dtype)
        t_l = jnp.zeros(3, dtype=dtype)
        if eta != 0.0:
            f_l = f_l - 6.0 * jnp.pi * eta * rbar * v_l
            t_l = t_l - 8.0 * jnp.pi * eta * rbar ** 3 * w_l
        if rho != 0.0:
            rj = jnp.stack([rbox[1], rbox[2], rbox[0]])
            rk = jnp.stack([rbox[2], rbox[0], rbox[1]])
            f_l = f_l - 2.0 * rho * rj * rk * jnp.abs(v_l) * v_l
            t_l = t_l - 0.5 * rho * rbox * (rj ** 4 + rk ** 4) * (
                jnp.abs(w_l) * w_l
            )
        wrench = wrench.at[b].set(jnp.concatenate([R @ f_l, R @ t_l]))

    force = wrench[:, :3]
    torque = wrench[:, 3:]
    arm = d.xipos - origin
    spatial = jnp.concatenate([torque + jnp.cross(arm, force), force], axis=-1)
    mask = jnp.asarray(body_dof_mask(model), dtype=dtype)
    proj = jnp.einsum("ik,bk->bi", d.cdof, spatial)
    return jnp.einsum("bi,bi->i", mask, proj)


# ---------------------------------------------------------------------------
# mj_fwdActuation analog
# ---------------------------------------------------------------------------


def actuator_moments(model: Model, d: Data):
    """(nu, nv) transmission moment matrix + actuator lengths."""
    dtype = d.qpos.dtype
    moments = jnp.zeros((model.nu, model.nv), dtype=dtype)
    lengths = jnp.zeros((model.nu,), dtype=dtype)
    bdm = None
    tjac = None
    for u in range(model.nu):
        if model.actuator_trntype[u] == TrnType.TENDON:
            # tendon transmission: moment = gear[0] * tendon moment,
            # length = gear[0] * tendon length (mj_transmission, mjTRN_TENDON)
            t = model.actuator_trnid[u]
            if tjac is None:
                tjac = tendon_length_moment(model, d)
            tlen, tmom = tjac
            gear0 = model.actuator_gear[u][0]
            moments = moments.at[u].set(gear0 * tmom[t])
            lengths = lengths.at[u].set(gear0 * tlen[t])
            continue
        if model.actuator_trntype[u] == TrnType.BODY:
            # adhesion: moment = -(average of active contact normal rows)
            # over contacts involving the body (mj_transmission mjTRN_BODY,
            # verified: 2-lane capsule contact averages to one unit row;
            # active = dist < includemargin, so margin lets adhesion act
            # before touching)
            b = model.actuator_trnid[u]
            if bdm is None:
                bdm = body_dof_mask(model)
            from .collision import max_contacts_per_pair as _mcpp

            row = jnp.zeros((model.nv,), dtype=dtype)
            nactive = jnp.zeros((), dtype=dtype)
            lane = 0
            for (t1, t2, prs) in model.pair_groups:
                k = _mcpp(t1, t2)
                for (ga, gb) in prs:
                    b1 = model.geom_bodyid[ga]
                    b2 = model.geom_bodyid[gb]
                    if b not in (b1, b2):
                        lane += k
                        continue
                    for kk in range(k):
                        li = lane + kk
                        n = d.contact.frame[li, 0]
                        p = d.contact.pos[li]
                        j1 = _point_jac(model, d, p, b1, bdm, dtype)
                        j2 = _point_jac(model, d, p, b2, bdm, dtype)
                        jn = (j2 - j1) @ n
                        act = (d.contact.dist[li]
                               < d.contact.includemargin[li])
                        row = row + jnp.where(act, jn, 0.0)
                        nactive = nactive + act.astype(dtype)
                    lane += k
            moments = moments.at[u].set(-row / jnp.maximum(nactive, 1.0))
            continue
        if model.actuator_trntype[u] == TrnType.SITE:
            s = model.actuator_trnid[u]
            b = model.site_bodyid[s]
            if bdm is None:
                bdm = body_dof_mask(model)
            origin = d.subtree_com[model.body_rootid[b]]
            mask = jnp.asarray(bdm[b], dtype=dtype)[:, None]
            ang = d.cdof[:, :3] * mask
            lin = d.cdof[:, 3:] * mask
            jacp = lin + jnp.cross(
                ang, jnp.broadcast_to(d.site_xpos[s] - origin, ang.shape)
            )  # (nv, 3)
            gear = model.actuator_gear[u]
            refid = (model.actuator_refid[u]
                     if getattr(model, "actuator_refid", ()) else -1)
            if refid < 0:
                # no refsite: gear is a 6D wrench in the site frame;
                # moment = J_site^T (R_site gear[:3]; R_site gear[3:]),
                # length = 0 (mj_transmission, mjTRN_SITE)
                wrench_f = d.site_xmat[s] @ gear[:3]
                wrench_t = d.site_xmat[s] @ gear[3:]
                moments = moments.at[u].set(jacp @ wrench_f + ang @ wrench_t)
                continue
            # refsite: length = pose difference of site relative to refsite
            # projected on gear, in the REFSITE frame (mj_transmission with
            # refid): translation R_r^T (p_s - p_r) . gear[:3] +
            # rotation mju_subQuat(q_s, q_r) . gear[3:6].  Moment rows:
            # d/dt[R_r^T dp] = R_r^T (dv + dp x w_r), rotation
            # R_r^T (w_s - w_r) — velocity-exact, matching mj_transmission.
            rb = model.site_bodyid[refid]
            rmask = jnp.asarray(bdm[rb], dtype=dtype)[:, None]
            rorigin = d.subtree_com[model.body_rootid[rb]]
            rang = d.cdof[:, :3] * rmask
            rlin = d.cdof[:, 3:] * rmask
            rjacp = rlin + jnp.cross(
                rang,
                jnp.broadcast_to(d.site_xpos[refid] - rorigin, rang.shape),
            )
            rmat = d.site_xmat[refid]
            dp = d.site_xpos[s] - d.site_xpos[refid]
            qs = maths.mat_to_quat(d.site_xmat[s])
            qr = maths.mat_to_quat(rmat)
            length_u = jnp.dot(rmat.T @ dp, gear[:3]) + jnp.dot(
                maths.quat_sub(qs, qr), gear[3:]
            )
            # translational rows: R_r^T (jacp_s - jacp_r + dp x jacr_r)
            jac_t = (jacp - rjacp + jnp.cross(
                jnp.broadcast_to(dp, rang.shape), rang
            )) @ rmat  # (nv,3) each row R_r^T v == v @ R_r
            jac_r = (ang - rang) @ rmat
            moments = moments.at[u].set(jac_t @ gear[:3] + jac_r @ gear[3:])
            lengths = lengths.at[u].set(length_u)
            continue
        if model.actuator_trntype[u] != TrnType.JOINT:
            raise NotImplementedError("only joint/site transmission supported")
        j = model.actuator_trnid[u]
        jt = model.jnt_type[j]
        qadr, vadr = model.jnt_qposadr[j], model.jnt_dofadr[j]
        gear = model.actuator_gear[u]
        if jt in (JointType.HINGE, JointType.SLIDE):
            moments = moments.at[u, vadr].set(gear[0])
            lengths = lengths.at[u].set(d.qpos[qadr] * gear[0])
        elif jt == JointType.BALL:
            # torque = gear[0:3] in joint (child body) frame
            moments = moments.at[u, vadr : vadr + 3].set(gear[:3])
            q = maths.quat_normalize(d.qpos[qadr : qadr + 4])
            expmap = maths.quat_sub(
                q, jnp.array([1.0, 0, 0, 0], dtype=dtype)
            )
            lengths = lengths.at[u].set(jnp.dot(expmap, gear[:3]))
        else:  # free
            moments = moments.at[u, vadr : vadr + 6].set(gear[:6])
    return moments, lengths


def actuation(model: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    if model.nu == 0:
        return d.replace(qfrc_actuator=jnp.zeros(model.nv, dtype=dtype))
    moments, lengths = actuator_moments(model, d)
    velocity = moments @ d.qvel

    ctrl = d.ctrl
    limited = jnp.asarray(model.actuator_ctrllimited)
    lo = model.actuator_ctrlrange[:, 0]
    hi = model.actuator_ctrlrange[:, 1]
    ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)

    # activation dynamics (mj_fwdActuation): stateful actuators drive force
    # from their activation state; act_dot integrates in mj_advance
    actadr = np.array(model.actuator_actadr)
    stateful = actadr >= 0
    if model.na:
        act_u = d.act[np.maximum(actadr, 0)]  # per-actuator act (garbage when stateless)
        dyntype = np.array(model.actuator_dyntype)
        tau = jnp.maximum(model.actuator_dynprm[:, 0], 1e-15)
        act_dot_u = jnp.where(
            jnp.asarray(dyntype == DynType.INTEGRATOR),
            ctrl,
            (ctrl - act_u) / tau,  # FILTER / FILTEREXACT
        )
        # muscle activation dynamics (mju_muscleDynamics analog)
        for u in np.flatnonzero(dyntype == DynType.MUSCLE):
            from . import muscle as _muscle

            act_dot_u = act_dot_u.at[u].set(_muscle.muscle_dynamics(
                ctrl[u], act_u[u], model.actuator_dynprm[u]
            ))
        act_dot = (
            jnp.zeros(model.na, dtype=dtype)
            .at[actadr[stateful]]
            .set(act_dot_u[np.flatnonzero(stateful)])
        )
        force_input = jnp.where(jnp.asarray(stateful), act_u, ctrl)
    else:
        act_dot = jnp.zeros(0, dtype=dtype)
        force_input = ctrl

    # gain
    gaintype = np.array(model.actuator_gaintype)
    gain = jnp.where(
        jnp.asarray(gaintype == GainType.FIXED),
        model.actuator_gainprm[:, 0],
        model.actuator_gainprm[:, 0]
        + model.actuator_gainprm[:, 1] * lengths
        + model.actuator_gainprm[:, 2] * velocity,
    )
    # bias
    biastype = np.array(model.actuator_biastype)
    bias = jnp.where(
        jnp.asarray(biastype == BiasType.NONE),
        jnp.zeros(model.nu, dtype=dtype),
        model.actuator_biasprm[:, 0]
        + model.actuator_biasprm[:, 1] * lengths
        + model.actuator_biasprm[:, 2] * velocity,
    )
    # muscle FLV gain/bias (mju_muscleGain / mju_muscleBias analogs)
    if np.any(gaintype == GainType.MUSCLE) or np.any(
        np.array(model.actuator_biastype) == BiasType.MUSCLE
    ):
        from . import muscle as _muscle

        for u in np.flatnonzero(gaintype == GainType.MUSCLE):
            gain = gain.at[u].set(_muscle.muscle_gain(
                lengths[u], velocity[u], model.actuator_lengthrange[u],
                model.actuator_acc0[u], model.actuator_gainprm[u],
            ))
        for u in np.flatnonzero(
            np.array(model.actuator_biastype) == BiasType.MUSCLE
        ):
            bias = bias.at[u].set(_muscle.muscle_bias(
                lengths[u], model.actuator_lengthrange[u],
                model.actuator_acc0[u], model.actuator_biasprm[u],
            ))
    force = gain * force_input + bias
    flimited = jnp.asarray(model.actuator_forcelimited)
    force = jnp.where(
        flimited,
        jnp.clip(force, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]),
        force,
    )
    qfrc_actuator = moments.T @ force
    return d.replace(
        actuator_length=lengths,
        actuator_velocity=velocity,
        actuator_force=force,
        act_dot=act_dot,
        qfrc_actuator=qfrc_actuator,
    )


# ---------------------------------------------------------------------------
# mj_fwdAcceleration analog
# ---------------------------------------------------------------------------


def xfrc_accumulate(model: Model, d: Data) -> jax.Array:
    """Map per-body Cartesian wrenches (xfrc_applied, [force; torque] at the
    body com) into generalized forces (mj_xfrcAccumulate / mj_applyFT)."""
    dtype = d.qpos.dtype
    rootid = np.array(model.body_rootid, dtype=np.int32)
    origin = d.subtree_com[rootid]
    force = d.xfrc_applied[:, :3]
    torque = d.xfrc_applied[:, 3:]
    # spatial force at the com-centered frame: [t + (p - O) x f ; f]
    arm = d.xipos - origin
    spatial = jnp.concatenate([torque + jnp.cross(arm, force), force], axis=-1)
    mask = jnp.asarray(body_dof_mask(model), dtype=dtype)  # (nbody, nv)
    # qfrc[i] = sum_b mask[b, i] * cdof[i] . spatial[b]
    proj = jnp.einsum("ik,bk->bi", d.cdof, spatial)  # (nbody, nv)
    return jnp.einsum("bi,bi->i", mask, proj)


def fwd_acceleration(model: Model, d: Data) -> Data:
    qfrc_smooth = (
        d.qfrc_passive
        - d.qfrc_bias
        + d.qfrc_actuator
        + d.qfrc_applied
        + xfrc_accumulate(model, d)
    )
    qacc_smooth = maths.solve_pd_unrolled(d.qM, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
