"""Sensor evaluation: the TPU-native ``mj_sensorPos`` / ``mj_sensorVel`` /
``mj_sensorAcc`` analogs.

The reference delegates sensor evaluation to MuJoCo's ``mj_step``
(/root/reference/src/physics.rs:44-46): every loaded model's ``<sensor>``
block is evaluated into ``mjData.sensordata`` at the matching pipeline
stage.  Here each stage is a pure function writing into ``Data.sensordata``;
the per-sensor dispatch is a trace-time Python loop over the *static* sensor
table (type/objid/adr), so a model without sensors compiles to nothing and
the suite hot path pays zero cost.

Conventions (identical to the rest of the engine): spatial vectors are
``[angular(3); linear(3)]`` referenced at ``subtree_com[body_rootid[b]]``;
sensor enum values match MuJoCo's ``mjtSensor`` so golden tests can compare
``sensordata`` element-for-element against the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import Model, ObjType, SensorType
from ..state import Data
from . import maths

_POS = (
    SensorType.JOINTPOS, SensorType.TENDONPOS, SensorType.ACTUATORPOS,
    SensorType.BALLQUAT, SensorType.FRAMEPOS, SensorType.FRAMEQUAT,
    SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS,
    SensorType.SUBTREECOM, SensorType.MAGNETOMETER, SensorType.CLOCK,
    SensorType.RANGEFINDER, SensorType.E_POTENTIAL,
    SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO,
    SensorType.INSIDESITE, SensorType.CAMPROJECTION,
)
_VEL = (
    SensorType.VELOCIMETER, SensorType.GYRO, SensorType.JOINTVEL,
    SensorType.TENDONVEL, SensorType.ACTUATORVEL, SensorType.BALLANGVEL,
    SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL,
    SensorType.SUBTREELINVEL, SensorType.SUBTREEANGMOM,
    SensorType.E_KINETIC,
)
_ACC = (
    SensorType.TOUCH, SensorType.ACCELEROMETER, SensorType.FORCE,
    SensorType.TORQUE, SensorType.ACTUATORFRC, SensorType.JOINTACTFRC,
    SensorType.TENDONACTFRC,
    SensorType.FRAMELINACC, SensorType.FRAMEANGACC,
    # limit sensors read the post-solve Data.efc_limit snapshot, so all six
    # evaluate in the acc stage here (MuJoCo stages pos/vel variants
    # earlier, but the values agree after a full forward: same qpos/qvel)
    SensorType.JOINTLIMITPOS, SensorType.JOINTLIMITVEL,
    SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITPOS,
    SensorType.TENDONLIMITVEL, SensorType.TENDONLIMITFRC,
)

# sensors whose value is nonnegative by construction (mjDATATYPE_POSITIVE):
# cutoff clamps the top only.  NOTE rangefinder is datatype REAL in MuJoCo
# (its miss value -1 gets clipped to -cutoff), verified empirically.
_POSITIVE = (SensorType.TOUCH,)
_LIMIT_SENSORS = (
    SensorType.JOINTLIMITPOS, SensorType.JOINTLIMITVEL,
    SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITPOS,
    SensorType.TENDONLIMITVEL, SensorType.TENDONLIMITFRC,
)

# sensors whose datatype exempts them from cutoff clamping: quaternions
# (mjDATATYPE_QUATERNION) and unit axes (mjDATATYPE_AXIS) — MuJoCo skips
# the cutoff for both, so a user cutoff < 1 must not corrupt a unit axis
_NO_CUTOFF = (
    SensorType.BALLQUAT, SensorType.FRAMEQUAT,
    SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS,
    # the geom-distance family folds its cutoff into the value itself
    # (min(dist, cutoff); zeros beyond), and insidesite is a boolean
    SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO,
    SensorType.INSIDESITE,
)


def _limit_row_map(model: Model):
    from .constraint import limit_row_map

    return limit_row_map(model)


def _has_stage(model: Model, types) -> bool:
    return any(t in types for t in model.sensor_type)


def _cutoff(model: Model, i: int, val: jax.Array) -> jax.Array:
    st = SensorType(model.sensor_type[i])
    if st in _NO_CUTOFF:
        return val
    c = model.sensor_cutoff[i]
    if st in _POSITIVE:
        return jnp.where(c > 0, jnp.minimum(val, c), val)
    return jnp.where(c > 0, jnp.clip(val, -c, c), val)


def _obj_pose(model: Model, d: Data, objtype: int, objid: int):
    """(pos, mat, bodyid) of a frame-sensor attachment object."""
    ot = ObjType(objtype)
    if ot == ObjType.SITE:
        return d.site_xpos[objid], d.site_xmat[objid], model.site_bodyid[objid]
    if ot == ObjType.GEOM:
        return d.geom_xpos[objid], d.geom_xmat[objid], model.geom_bodyid[objid]
    if ot == ObjType.BODY:
        return d.xipos[objid], d.ximat[objid], objid
    # XBODY: the body frame itself
    return d.xpos[objid], d.xmat[objid], objid


def _obj_quat(model: Model, d: Data, objtype: int, objid: int) -> jax.Array:
    ot = ObjType(objtype)
    if ot == ObjType.SITE:
        b = model.site_bodyid[objid]
        return maths.quat_mul(d.xquat[b], model.site_quat[objid])
    if ot == ObjType.GEOM:
        b = model.geom_bodyid[objid]
        return maths.quat_mul(d.xquat[b], model.geom_quat[objid])
    if ot == ObjType.BODY:
        return maths.quat_mul(d.xquat[objid], model.body_iquat[objid])
    return d.xquat[objid]


def _point_vel(model: Model, d: Data, body: int, p: jax.Array):
    """(omega, v) world-frame velocity of point ``p`` on ``body``
    (mj_objectVelocity analog, flg_local=0)."""
    o = d.subtree_com[model.body_rootid[body]]
    w = d.cvel[body, :3]
    v = d.cvel[body, 3:] + jnp.cross(w, p - o)
    return w, v


def _cacc(model: Model, d: Data) -> jax.Array:
    """Body com-based spatial accelerations including gravity
    (mj_rnePostConstraint cacc analog, smooth+constraint qacc, no
    contact-force terms needed — those only enter cfrc, not cacc)."""
    dtype = d.qpos.dtype
    if model.opt.disable_gravity:
        a0 = jnp.zeros(6, dtype=dtype)
    else:
        g = jnp.asarray(model.opt.gravity, dtype=dtype)
        a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -g])
    cacc = [a0] * model.nbody
    for b in range(1, model.nbody):
        p = model.body_parentid[b]
        a = cacc[p]
        adr, num = model.body_dofadr[b], model.body_dofnum[b]
        for i in range(adr, adr + num):
            a = a + d.cdof_dot[i] * d.qvel[i] + d.cdof[i] * d.qacc[i]
        cacc[b] = a
    return jnp.stack(cacc)


def _point_acc(model: Model, d: Data, cacc: jax.Array, body: int,
               p: jax.Array):
    """(alpha, a) world-frame acceleration of point ``p`` on ``body``
    (mj_objectAcceleration analog: spatial transform + the omega x v
    convective correction)."""
    o = d.subtree_com[model.body_rootid[body]]
    alpha = cacc[body, :3]
    a = cacc[body, 3:] + jnp.cross(alpha, p - o)
    w, v = _point_vel(model, d, body, p)
    return alpha, a + jnp.cross(w, v)


def _subtree_vel(model: Model, d: Data):
    """(linvel, angmom) per body: subtree momentum / subtree mass and
    angular momentum about the subtree com (mj_subtreeVel analog)."""
    from .smooth import subtree_mask

    dtype = d.qpos.dtype
    sub = jnp.asarray(subtree_mask(model), dtype=dtype)  # (nbody, nbody)
    rootid = np.array(model.body_rootid, dtype=np.int32)
    o = d.subtree_com[rootid]
    w = d.cvel[:, :3]
    v = d.cvel[:, 3:] + jnp.cross(w, d.xipos - o)  # velocity at body com
    m = jnp.asarray(model.body_mass, dtype=dtype)
    msub = sub @ m
    mom = m[:, None] * v
    linvel = (sub @ mom) / jnp.maximum(msub, 1e-12)[:, None]

    # world-frame rotational inertia of each body about its own com
    inertia = jnp.asarray(model.body_inertia, dtype=dtype)
    iw = jnp.einsum("bij,bj,bkj->bik", d.ximat, inertia, d.ximat)
    spin = jnp.einsum("bij,bj->bi", iw, w)  # (nbody, 3)
    # L_b = sum_c in subtree [ spin_c + m_c r_c x v_c ] - com_b x (sum m v)
    rxv = jnp.cross(d.xipos, mom)
    angmom = sub @ (spin + rxv) - jnp.cross(d.subtree_com, sub @ mom)
    return linvel, angmom


# ---------------------------------------------------------------------------
# ray casting (mj_ray analog) for rangefinder sensors
# ---------------------------------------------------------------------------

_RAY_BIG = 1e10


def _ray_quadratic(a, b, c):
    """Smallest nonnegative root of a t^2 + 2 b t + c = 0, else BIG."""
    disc = b * b - a * c
    ok = (disc >= 0) & (a > 1e-15)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / jnp.where(a > 1e-15, a, 1.0)
    t1 = (-b + sq) / jnp.where(a > 1e-15, a, 1.0)
    t = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, _RAY_BIG))
    return jnp.where(ok, t, _RAY_BIG)


def _ray_sphere_at(center, r, p, v):
    q = p - center
    return _ray_quadratic(jnp.dot(v, v), jnp.dot(q, v), jnp.dot(q, q) - r * r)


def _ray_geom(gtype: int, gpos, gmat, gsize, p, v, dtype):
    """Distance along unit ray (p, v) to the geom surface, BIG if missed
    (mju_ray* analogs; local-frame slab/quadratic forms)."""
    from ..model import GeomType

    gt = GeomType(gtype)
    pl = gmat.T @ (p - gpos)  # ray origin in geom frame
    vl = gmat.T @ v
    if gt == GeomType.SPHERE:
        return _ray_sphere_at(gpos, gsize[0], p, v)
    if gt == GeomType.PLANE:
        # top face of the z<=0 halfspace; respect finite size if given.
        # gsize may be a traced leaf (model passed as a jit argument), so
        # the finite-size checks must be logical ops, not python branches.
        t = jnp.where(jnp.abs(vl[2]) > 1e-15, -pl[2] / vl[2], _RAY_BIG)
        hit = pl + t * vl
        ok = (t >= 0) & (vl[2] < 0)
        ok = ok & ((gsize[0] <= 0) | (jnp.abs(hit[0]) <= gsize[0]))
        ok = ok & ((gsize[1] <= 0) | (jnp.abs(hit[1]) <= gsize[1]))
        return jnp.where(ok, t, _RAY_BIG)
    if gt == GeomType.CAPSULE:
        r, h = gsize[0], gsize[1]
        # infinite cylinder part, clamped to |z| <= h
        a = vl[0] * vl[0] + vl[1] * vl[1]
        b = pl[0] * vl[0] + pl[1] * vl[1]
        c = pl[0] * pl[0] + pl[1] * pl[1] - r * r
        t_cyl = _ray_quadratic(a, b, c)
        z = pl[2] + t_cyl * vl[2]
        t_cyl = jnp.where(jnp.abs(z) <= h, t_cyl, _RAY_BIG)
        cap_hi = _ray_sphere_at(jnp.array([0, 0, 1.0], dtype=dtype) * h,
                                r, pl, vl)
        cap_lo = _ray_sphere_at(jnp.array([0, 0, -1.0], dtype=dtype) * h,
                                r, pl, vl)
        return jnp.minimum(t_cyl, jnp.minimum(cap_hi, cap_lo))
    if gt == GeomType.CYLINDER:
        r, h = gsize[0], gsize[1]
        a = vl[0] * vl[0] + vl[1] * vl[1]
        b = pl[0] * vl[0] + pl[1] * vl[1]
        c = pl[0] * pl[0] + pl[1] * pl[1] - r * r
        t_side = _ray_quadratic(a, b, c)
        z = pl[2] + t_side * vl[2]
        t_side = jnp.where(jnp.abs(z) <= h, t_side, _RAY_BIG)
        # end caps
        t_cap = _RAY_BIG
        for sign in (1.0, -1.0):
            t = jnp.where(jnp.abs(vl[2]) > 1e-15,
                          (sign * h - pl[2]) / vl[2], _RAY_BIG)
            hit = pl + t * vl
            ok = (t >= 0) & (hit[0] ** 2 + hit[1] ** 2 <= r * r)
            t_cap = jnp.minimum(t_cap, jnp.where(ok, t, _RAY_BIG))
        return jnp.minimum(t_side, t_cap)
    if gt == GeomType.ELLIPSOID:
        s = jnp.asarray(gsize, dtype=dtype)
        ps, vs = pl / s, vl / s
        t = _ray_quadratic(jnp.dot(vs, vs), jnp.dot(ps, vs),
                           jnp.dot(ps, ps) - 1.0)
        return t
    if gt == GeomType.BOX:
        # slab method on the smallest positive face hit
        t_best = jnp.asarray(_RAY_BIG, dtype=dtype)
        for axis in range(3):
            for sign in (1.0, -1.0):
                denom = vl[axis]
                t = jnp.where(jnp.abs(denom) > 1e-15,
                              (sign * gsize[axis] - pl[axis]) / denom,
                              _RAY_BIG)
                hit = pl + t * vl
                o1, o2 = (axis + 1) % 3, (axis + 2) % 3
                ok = ((t >= 0)
                      & (jnp.abs(hit[o1]) <= gsize[o1])
                      & (jnp.abs(hit[o2]) <= gsize[o2]))
                t_best = jnp.minimum(t_best, jnp.where(ok, t, _RAY_BIG))
        return t_best
    return jnp.asarray(_RAY_BIG, dtype=dtype)  # mesh/hfield: no ray support


def _rangefinder(model: Model, d: Data, site: int) -> jax.Array:
    """mjSENS_RANGEFINDER: distance along the site's +Z axis to the nearest
    geom surface, excluding geoms on the site's own body; -1 if no hit."""
    dtype = d.qpos.dtype
    p = d.site_xpos[site]
    v = d.site_xmat[site][:, 2]
    own = model.site_bodyid[site]
    t_min = jnp.asarray(_RAY_BIG, dtype=dtype)
    for g in range(model.ngeom):
        if model.geom_bodyid[g] == own:
            continue
        t = _ray_geom(model.geom_type[g], d.geom_xpos[g], d.geom_xmat[g],
                      model.geom_size[g], p, v, dtype)
        t_min = jnp.minimum(t_min, t)
    return jnp.where(t_min >= _RAY_BIG, -1.0, t_min)


def _energy_pos(model: Model, d: Data) -> jax.Array:
    """mj_energyPos analog: gravity potential + joint/tendon spring energy
    (the exact potentials whose gradients are smooth.passive's forces)."""
    from ..model import JointType
    from .smooth import tendon_length_moment

    dtype = d.qpos.dtype
    e = jnp.zeros((), dtype=dtype)
    if not model.opt.disable_gravity:
        g = jnp.asarray(model.opt.gravity, dtype=dtype)
        mass = jnp.asarray(model.body_mass, dtype=dtype)
        e = e - jnp.sum(mass * (d.xipos @ g))
    for j in range(model.njnt):
        stiff = model.jnt_stiffness[j]
        jt = model.jnt_type[j]
        qadr = model.jnt_qposadr[j]
        if jt in (JointType.HINGE, JointType.SLIDE):
            dq = d.qpos[qadr] - model.qpos_spring[qadr]
            e = e + 0.5 * stiff * dq * dq
        elif jt == JointType.BALL:
            dif = maths.quat_sub(
                d.qpos[qadr : qadr + 4], model.qpos_spring[qadr : qadr + 4]
            )
            e = e + 0.5 * stiff * jnp.dot(dif, dif)
        else:  # free
            dp = d.qpos[qadr : qadr + 3] - model.qpos_spring[qadr : qadr + 3]
            dq = maths.quat_sub(
                d.qpos[qadr + 3 : qadr + 7],
                model.qpos_spring[qadr + 3 : qadr + 7],
            )
            e = e + 0.5 * stiff * (jnp.dot(dp, dp) + jnp.dot(dq, dq))
    if model.ntendon:
        length, _ = tendon_length_moment(model, d)
        lo = model.tendon_lengthspring[:, 0]
        hi = model.tendon_lengthspring[:, 1]
        disp = jnp.where(
            length < lo, lo - length, jnp.where(length > hi, length - hi, 0.0)
        )
        e = e + jnp.sum(0.5 * model.tendon_stiffness * disp * disp)
    return e


def sensor_pos(model: Model, d: Data) -> Data:
    """Position-stage sensors (mj_sensorPos analog)."""
    if not _has_stage(model, _POS):
        return d
    from .smooth import actuator_moments, tendon_length_moment

    dtype = d.qpos.dtype
    sd = d.sensordata
    ten_len = None
    act_len = None
    if _has_stage(model, (SensorType.ACTUATORPOS,)):
        # actuator lengths are a position-stage quantity (mj_transmission
        # runs in fwd_position); d.actuator_length is only refreshed later
        # in fwd_actuation, so recompute from the current pose here
        _, act_len = actuator_moments(model, d)
    for i in range(model.nsensor):
        st = SensorType(model.sensor_type[i])
        if st not in _POS:
            continue
        adr = model.sensor_adr[i]
        oid = model.sensor_objid[i]
        rid = model.sensor_refid[i]
        rt = model.sensor_reftype[i]
        if st == SensorType.JOINTPOS:
            val = d.qpos[model.jnt_qposadr[oid]][None]
        elif st == SensorType.TENDONPOS:
            if ten_len is None:
                ten_len, _ = tendon_length_moment(model, d)
            val = ten_len[oid][None]
        elif st == SensorType.ACTUATORPOS:
            val = act_len[oid][None]
        elif st == SensorType.BALLQUAT:
            q = model.jnt_qposadr[oid]
            val = maths.quat_normalize(d.qpos[q : q + 4])
        elif st == SensorType.FRAMEPOS:
            pos, _, _ = _obj_pose(model, d, model.sensor_objtype[i], oid)
            if rid >= 0:
                rpos, rmat, _ = _obj_pose(model, d, rt, rid)
                val = rmat.T @ (pos - rpos)
            else:
                val = pos
        elif st == SensorType.FRAMEQUAT:
            q = _obj_quat(model, d, model.sensor_objtype[i], oid)
            if rid >= 0:
                rq = _obj_quat(model, d, rt, rid)
                q = maths.quat_mul(maths.quat_conj(rq), q)
            val = maths.quat_normalize(q)
        elif st in (SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS,
                    SensorType.FRAMEZAXIS):
            col = int(st) - int(SensorType.FRAMEXAXIS)
            _, mat, _ = _obj_pose(model, d, model.sensor_objtype[i], oid)
            axis = mat[:, col]
            if rid >= 0:
                _, rmat, _ = _obj_pose(model, d, rt, rid)
                axis = rmat.T @ axis
            val = axis
        elif st == SensorType.SUBTREECOM:
            val = d.subtree_com[oid]
        elif st == SensorType.MAGNETOMETER:
            mag = jnp.asarray(model.opt.magnetic, dtype=dtype)
            val = d.site_xmat[oid].T @ mag
        elif st == SensorType.RANGEFINDER:
            val = _rangefinder(model, d, oid)[None]
        elif st == SensorType.E_POTENTIAL:
            val = _energy_pos(model, d)[None]
        elif st in (SensorType.GEOMDIST, SensorType.GEOMNORMAL,
                    SensorType.GEOMFROMTO):
            val = _geom_distance_family(model, d, i, st, dtype)
        elif st == SensorType.INSIDESITE:
            val = _insidesite_sensor(model, d, i, dtype)[None]
        elif st == SensorType.CAMPROJECTION:
            # pixel coordinates of the target site through a camera
            # (mjSENS_CAMPROJECTION; both projection models verified
            # exactly vs MuJoCo): t = R_cam^T (p - c);
            # x = -t0/t2 * fx + W/2, y = t1/t2 * fy + H/2 with
            # fovy model:       fx = fy = H / (2 tan(fovy/2))
            # intrinsics model: fx = focal_x / sensorsize_x * W (same y);
            # the principal-point entries of cam_intrinsic are NOT used by
            # the sensor (verified: principal="0.001 -0.002" leaves the
            # projection centered).  Camera pose from cam_xpos/cam_xmat,
            # so tracking/target cameras project correctly.
            cid = model.sensor_refid[i]
            cpos = d.cam_xpos[cid]
            cmat = d.cam_xmat[cid]
            t = cmat.T @ (d.site_xpos[oid] - cpos)
            w_res, h_res = model.cam_resolution[cid]
            ssx, ssy = model.cam_sensorsize[cid]
            if ssx != 0.0 or ssy != 0.0:
                fx = model.cam_intrinsic[cid][0] / ssx * w_res
                fy = model.cam_intrinsic[cid][1] / ssy * h_res
            else:
                fovy = model.cam_fovy[cid]
                fx = fy = 0.5 * h_res / jnp.tan(
                    fovy * (jnp.pi / 180.0) * 0.5
                )
            val = jnp.stack([
                -t[0] / t[2] * fx + 0.5 * w_res,
                t[1] / t[2] * fy + 0.5 * h_res,
            ])
        elif st == SensorType.USER:
            # no mjcb_sensor analog: user sensors stay zero (matches
            # MuJoCo without a callback)
            val = jnp.zeros((model.sensor_dim[i],), dtype=dtype)
        else:  # CLOCK
            val = d.time[None].astype(dtype)
        sd = jax.lax.dynamic_update_slice(
            sd, _cutoff(model, i, val.astype(dtype)), (adr,)
        )
    return d.replace(sensordata=sd)


def sensor_vel(model: Model, d: Data) -> Data:
    """Velocity-stage sensors (mj_sensorVel analog)."""
    if not _has_stage(model, _VEL):
        return d
    from .smooth import actuator_moments, tendon_length_moment

    dtype = d.qpos.dtype
    sd = d.sensordata
    act_vel = None
    if _has_stage(model, (SensorType.ACTUATORVEL,)):
        # velocity-stage in MuJoCo; d.actuator_velocity is refreshed later
        mom, _ = actuator_moments(model, d)
        act_vel = mom @ d.qvel
    sub_lin = sub_mom = None
    if _has_stage(model, (SensorType.SUBTREELINVEL,
                          SensorType.SUBTREEANGMOM)):
        sub_lin, sub_mom = _subtree_vel(model, d)
    for i in range(model.nsensor):
        st = SensorType(model.sensor_type[i])
        if st not in _VEL:
            continue
        adr = model.sensor_adr[i]
        oid = model.sensor_objid[i]
        rid = model.sensor_refid[i]
        rt = model.sensor_reftype[i]
        if st == SensorType.JOINTVEL:
            val = d.qvel[model.jnt_dofadr[oid]][None]
        elif st == SensorType.TENDONVEL:
            _, tmom = tendon_length_moment(model, d)
            val = (tmom @ d.qvel)[oid][None]
        elif st == SensorType.ACTUATORVEL:
            val = act_vel[oid][None]
        elif st == SensorType.BALLANGVEL:
            v = model.jnt_dofadr[oid]
            val = d.qvel[v : v + 3]
        elif st == SensorType.VELOCIMETER:
            b = model.site_bodyid[oid]
            _, v = _point_vel(model, d, b, d.site_xpos[oid])
            val = d.site_xmat[oid].T @ v
        elif st == SensorType.GYRO:
            b = model.site_bodyid[oid]
            w, _ = _point_vel(model, d, b, d.site_xpos[oid])
            val = d.site_xmat[oid].T @ w
        elif st in (SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL):
            pos, _, b = _obj_pose(model, d, model.sensor_objtype[i], oid)
            w, v = _point_vel(model, d, b, pos)
            if rid >= 0:
                rpos, rmat, rb = _obj_pose(model, d, rt, rid)
                rw, rv = _point_vel(model, d, rb, rpos)
                if st == SensorType.FRAMELINVEL:
                    # relative velocity of the object point as seen from the
                    # (moving, rotating) reference frame
                    rel = v - rv - jnp.cross(rw, pos - rpos)
                    val = rmat.T @ rel
                else:
                    val = rmat.T @ (w - rw)
            else:
                val = v if st == SensorType.FRAMELINVEL else w
        elif st == SensorType.SUBTREELINVEL:
            val = sub_lin[oid]
        elif st == SensorType.E_KINETIC:
            val = (0.5 * jnp.dot(d.qvel, d.qM @ d.qvel))[None]
        else:  # SUBTREEANGMOM
            val = sub_mom[oid]
        sd = jax.lax.dynamic_update_slice(
            sd, _cutoff(model, i, val.astype(dtype)), (adr,)
        )
    return d.replace(sensordata=sd)


def sensor_acc(model: Model, d: Data, kinematic_only: bool = False) -> Data:
    """Acceleration/force-stage sensors (mj_sensorAcc analog).  Runs after
    the constraint solve, reading the constrained ``qacc``.

    ``kinematic_only=True`` re-evaluates just the kinematic acc family
    (accelerometer / framelinacc / frameangacc) — used by the env layer's
    post-step sensor refresh, where force-stage sensors must keep the
    values tied to the step's constraint solve."""
    if not _has_stage(model, _ACC):
        return d
    dtype = d.qpos.dtype
    sd = d.sensordata
    _KINEMATIC_ACC = (SensorType.ACCELEROMETER, SensorType.FRAMELINACC,
                      SensorType.FRAMEANGACC)
    if kinematic_only and not _has_stage(model, _KINEMATIC_ACC):
        return d
    cacc = None
    if _has_stage(model, _KINEMATIC_ACC) or (
            not kinematic_only
            and _has_stage(model, (SensorType.FORCE, SensorType.TORQUE))):
        cacc = _cacc(model, d)
    cfrc_int = None
    if not kinematic_only and _has_stage(
            model, (SensorType.FORCE, SensorType.TORQUE)):
        cfrc_int = _cfrc_int(model, d, cacc)
    touch = None
    if not kinematic_only and _has_stage(model, (SensorType.TOUCH,)):
        touch = _touch_forces(model, d)
    for i in range(model.nsensor):
        st = SensorType(model.sensor_type[i])
        if st not in _ACC:
            continue
        if kinematic_only and st not in _KINEMATIC_ACC:
            continue
        adr = model.sensor_adr[i]
        oid = model.sensor_objid[i]
        if st in _LIMIT_SENSORS:
            kind = "tendon" if st in (
                SensorType.TENDONLIMITPOS, SensorType.TENDONLIMITVEL,
                SensorType.TENDONLIMITFRC,
            ) else "joint"
            col = {
                SensorType.JOINTLIMITPOS: 0, SensorType.TENDONLIMITPOS: 0,
                SensorType.JOINTLIMITVEL: 1, SensorType.TENDONLIMITVEL: 1,
                SensorType.JOINTLIMITFRC: 2, SensorType.TENDONLIMITFRC: 2,
            }[st]
            keys = list(_limit_row_map(model).keys())
            if (kind, oid) in keys:
                val = d.efc_limit[keys.index((kind, oid)), col][None]
            else:  # unlimited joint/tendon: no limit row, always 0
                val = jnp.zeros((1,), dtype=dtype)
        elif st == SensorType.ACTUATORFRC:
            val = d.actuator_force[oid][None]
        elif st == SensorType.JOINTACTFRC:
            val = d.qfrc_actuator[model.jnt_dofadr[oid]][None]
        elif st == SensorType.TENDONACTFRC:
            # total actuator force acting on the tendon: sum of raw
            # scalar actuator forces of tendon-transmission actuators —
            # NOT gear-scaled (mjSENS_TENDONACTFRC, verified: gear=1.5
            # model reports actuator_force unscaled)
            from ..model import TrnType as _TRN

            acc = jnp.zeros((), dtype=dtype)
            for u in range(model.nu):
                if (_TRN(model.actuator_trntype[u]) == _TRN.TENDON
                        and model.actuator_trnid[u] == oid):
                    acc = acc + d.actuator_force[u]
            val = acc[None]
        elif st == SensorType.ACCELEROMETER:
            b = model.site_bodyid[oid]
            _, a = _point_acc(model, d, cacc, b, d.site_xpos[oid])
            val = d.site_xmat[oid].T @ a
        elif st == SensorType.FRAMELINACC:
            pos, _, b = _obj_pose(model, d, model.sensor_objtype[i], oid)
            _, a = _point_acc(model, d, cacc, b, pos)
            val = a
        elif st == SensorType.FRAMEANGACC:
            _, _, b = _obj_pose(model, d, model.sensor_objtype[i], oid)
            val = cacc[b, :3]
        elif st == SensorType.FORCE:
            b = model.site_bodyid[oid]
            f = _site_wrench(model, d, cfrc_int, b, d.site_xpos[oid])
            val = d.site_xmat[oid].T @ f[3:]
        elif st == SensorType.TORQUE:
            b = model.site_bodyid[oid]
            f = _site_wrench(model, d, cfrc_int, b, d.site_xpos[oid])
            val = d.site_xmat[oid].T @ f[:3]
        else:  # TOUCH
            val = touch[oid][None]
        sd = jax.lax.dynamic_update_slice(
            sd, _cutoff(model, i, val.astype(dtype)), (adr,)
        )
    return d.replace(sensordata=sd)


# ---------------------------------------------------------------------------
# cfrc machinery for force/torque/touch sensors
# ---------------------------------------------------------------------------


def _lane_bodies(model: Model):
    """Static (b1, b2) body pair per contact lane (mirrors the constraint
    assembler's lane order)."""
    from .collision import max_contacts_per_pair

    out = []
    for (t1, t2, pairs) in model.pair_groups:
        mc = max_contacts_per_pair(t1, t2)
        for (ga, gb) in pairs:
            out.extend(
                [(model.geom_bodyid[ga], model.geom_bodyid[gb])] * mc
            )
    return out


def _body_ext_wrench(model: Model, d: Data) -> jax.Array:
    """Per-body external wrench [torque; force] at subtree_com[rootid[b]]:
    contact + xfrc_applied contributions (mj_rnePostConstraint cfrc_ext
    analog, restricted to the force terms our pipeline produces)."""
    dtype = d.qpos.dtype
    w = jnp.zeros((model.nbody, 6), dtype=dtype)

    # xfrc_applied: wrench given at body com (xipos), world axes
    rootid = np.array(model.body_rootid, dtype=np.int32)
    origin = d.subtree_com[rootid]
    frc = d.xfrc_applied[:, :3]
    trq = d.xfrc_applied[:, 3:] + jnp.cross(d.xipos - origin, frc)
    w = w + jnp.concatenate([trq, frc], axis=1)

    # contact wrenches from the solver's per-lane reconstruction:
    # d.contact_force[li] = world [torque; force] on body2 at contact pos
    cf = d.contact_force
    con = d.contact
    for li, (b1, b2) in enumerate(_lane_bodies(model)):
        t, f = cf[li, :3], cf[li, 3:]
        t2 = t + jnp.cross(con.pos[li] - d.subtree_com[rootid[b2]], f)
        t1 = -t + jnp.cross(con.pos[li] - d.subtree_com[rootid[b1]], -f)
        w = w.at[b2].add(jnp.concatenate([t2, f]))
        w = w.at[b1].add(jnp.concatenate([t1, -f]))
    return w


def _cfrc_int(model: Model, d: Data, cacc: jax.Array) -> jax.Array:
    """Interaction wrench [torque; force] each body receives from its
    parent, at subtree_com[rootid[b]] (cfrc_int analog)."""
    ext = _body_ext_wrench(model, d)
    mass = jnp.asarray(model.body_mass, dtype=d.qpos.dtype)
    # net inertial wrench per body: I a + v x* (I v)
    iv = maths.inertia_mul_motion(d.cinert_i, d.cinert_h, mass, d.cvel)
    ia = maths.inertia_mul_motion(d.cinert_i, d.cinert_h, mass, cacc)
    net = ia + maths.force_cross(d.cvel, iv)
    cfrc = [net[b] - ext[b] for b in range(model.nbody)]
    # children push their interaction force up to the parent
    for b in range(model.nbody - 1, 0, -1):
        p = model.body_parentid[b]
        cfrc[p] = cfrc[p] + cfrc[b]
    return jnp.stack(cfrc)


def _site_wrench(model: Model, d: Data, cfrc_int: jax.Array, body: int,
                 p: jax.Array) -> jax.Array:
    """cfrc_int of ``body`` translated to point ``p`` (world axes):
    returns [torque; force]."""
    o = d.subtree_com[model.body_rootid[body]]
    f = cfrc_int[body]
    trq = f[:3] - jnp.cross(p - o, f[3:])
    return jnp.concatenate([trq, f[3:]])


def _inside_site(model: Model, d: Data, sid: int, p: jax.Array) -> jax.Array:
    """True if world point ``p`` lies inside site ``sid``'s volume
    (mju_insideGeom analog for the site shapes touch sensors use)."""
    from ..model import GeomType

    lp = d.site_xmat[sid].T @ (p - d.site_xpos[sid])
    s = model.site_size[sid]
    st = GeomType(model.site_type[sid])
    if st == GeomType.SPHERE:
        return jnp.dot(lp, lp) <= s[0] * s[0]
    if st == GeomType.CAPSULE:
        zc = jnp.clip(lp[2], -s[1], s[1])
        dv = lp - jnp.array([0.0, 0.0, 1.0], dtype=lp.dtype) * zc
        return jnp.dot(dv, dv) <= s[0] * s[0]
    if st == GeomType.ELLIPSOID:
        q = lp / jnp.maximum(s, 1e-12)
        return jnp.dot(q, q) <= 1.0
    if st == GeomType.CYLINDER:
        return (jnp.abs(lp[2]) <= s[1]) & (
            lp[0] * lp[0] + lp[1] * lp[1] <= s[0] * s[0]
        )
    if st == GeomType.BOX:
        return jnp.all(jnp.abs(lp) <= s)
    return jnp.asarray(True)  # plane/mesh sites: no volume test


def _touch_forces(model: Model, d: Data) -> jax.Array:
    """Per-site summed normal contact force for touch sensors: contacts
    whose point lies inside the site volume and whose geoms touch the
    site's body contribute their normal-force magnitude (mjSENS_TOUCH
    analog with MuJoCo's site-volume clipping)."""
    dtype = d.qpos.dtype
    cf = d.contact_force
    con = d.contact
    out = jnp.zeros((model.nsite,), dtype=dtype)
    site_bodies = {
        model.sensor_objid[i]: model.site_bodyid[model.sensor_objid[i]]
        for i in range(model.nsensor)
        if SensorType(model.sensor_type[i]) == SensorType.TOUCH
    }
    have_size = model.site_size is not None and len(model.site_type) > 0
    for li, (b1, b2) in enumerate(_lane_bodies(model)):
        normal = con.frame[li, 0]
        fn = jnp.abs(jnp.dot(cf[li, 3:], normal))
        for sid, sb in site_bodies.items():
            if sb in (b1, b2):
                if have_size:
                    inside = _inside_site(model, d, sid, con.pos[li])
                    out = out.at[sid].add(jnp.where(inside, fn, 0.0))
                else:
                    out = out.at[sid].add(fn)
    return out


def _sensor_geoms(model: Model, objtype, objid):
    """Geom ids of a geom-distance sensor object (a single geom or all of
    a body's geoms)."""
    if objtype == ObjType.GEOM:
        return [objid]
    adr, num = model.body_geomadr[objid], model.body_geomnum[objid]
    return list(range(adr, adr + num))


def _geom_distance_family(model: Model, d: Data, i: int, st, dtype):
    """geomdist / geomnormal / geomfromto (mj_geomDistance semantics,
    verified against MuJoCo 3.10): dist = min over geom pairs, clamped to
    cutoff from above; normal = normalize(p2 - p1) (sign of dist built
    in); fromto = witness points; normal/fromto are zero when no pair
    comes under the cutoff."""
    from . import collision as _coll

    g1s = _sensor_geoms(model, model.sensor_objtype[i],
                        model.sensor_objid[i])
    g2s = _sensor_geoms(model, model.sensor_reftype[i],
                        model.sensor_refid[i])
    cutoff = model.sensor_cutoff[i].astype(dtype)
    best = cutoff
    bp1 = jnp.zeros(3, dtype=dtype)
    bp2 = jnp.zeros(3, dtype=dtype)
    for ga in g1s:
        for gb in g2s:
            dist, p1, p2 = _coll.geom_distance(model, d, ga, gb)
            better = dist < best
            best = jnp.where(better, dist.astype(dtype), best)
            bp1 = jnp.where(better, p1.astype(dtype), bp1)
            bp2 = jnp.where(better, p2.astype(dtype), bp2)
    found = best < cutoff
    if st == SensorType.GEOMDIST:
        return jnp.minimum(best, cutoff)[None]
    if st == SensorType.GEOMNORMAL:
        delta = bp2 - bp1
        nrm = jnp.linalg.norm(delta)
        n = jnp.where(nrm > 1e-15, delta / jnp.maximum(nrm, 1e-15), 0.0)
        return jnp.where(found, n, 0.0)
    return jnp.where(found, jnp.concatenate([bp1, bp2]), 0.0)


def _insidesite_sensor(model: Model, d: Data, i: int, dtype):
    """insidesite sensor: 1.0 when the object's position is inside the
    site's volume (sphere/capsule/ellipsoid/cylinder/box site types).
    Distinct from the touch-sensor helper _inside_site (different
    signature/use)."""
    from ..model import GeomType as _GT

    sid = model.sensor_refid[i]
    pos, _, _ = _obj_pose(model, d, model.sensor_objtype[i],
                          model.sensor_objid[i])
    local = d.site_xmat[sid].T @ (pos - d.site_xpos[sid])
    stype = _GT(model.site_type[sid])
    size = jnp.asarray(model.site_size[sid], dtype=dtype)
    if stype == _GT.SPHERE:
        inside = jnp.linalg.norm(local) <= size[0]
    elif stype == _GT.CAPSULE:
        z = jnp.clip(local[2], -size[1], size[1])
        inside = jnp.linalg.norm(local - jnp.array([0.0, 0, 1],
                                                   dtype=dtype) * z) <= size[0]
    elif stype == _GT.ELLIPSOID:
        inside = jnp.sum((local / size) ** 2) <= 1.0
    elif stype == _GT.CYLINDER:
        inside = (jnp.abs(local[2]) <= size[1]) & (
            jnp.linalg.norm(local[:2]) <= size[0]
        )
    else:  # BOX
        inside = jnp.all(jnp.abs(local) <= size)
    return inside.astype(dtype)
