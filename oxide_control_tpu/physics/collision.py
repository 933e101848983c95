"""Narrowphase collision detection, vmap-friendly.

TPU-native replacement for MuJoCo's collision stage inside ``mj_step``
(reference delegates via /root/reference/src/physics.rs:44-46).  Candidate
geom pairs are enumerated *statically* at model-compile time (no broadphase,
no data-dependent shapes — SURVEY.md §7 hard part #3): every candidate pair
owns a fixed number of contact lanes; lanes with ``dist > includemargin``
are inactive and masked out downstream.

Contact conventions match MuJoCo: ``dist`` is the signed surface separation
(negative = penetration), ``pos`` the midpoint between surfaces, and
``frame`` rows are [normal (geom1 -> geom2), tangent1, tangent2].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..model import GeomType, Model
from ..state import Contact, Data


def max_contacts_per_pair(t1: int, t2: int) -> int:
    """Fixed contact-lane count per candidate pair of geom types."""
    pair = (GeomType(t1), GeomType(t2))
    if pair == (GeomType.PLANE, GeomType.CAPSULE):
        return 2
    if pair == (GeomType.PLANE, GeomType.BOX):
        return 4
    if pair == (GeomType.CAPSULE, GeomType.CAPSULE):
        return 1
    return 1


def make_frame(normal: jax.Array) -> jax.Array:
    """Build a right-handed contact frame [n; t1; t2] from a unit normal.

    Matches mju_makeFrame (verified empirically against mjContact.frame):
    t1 is the world Y axis projected onto the tangent plane when |n.y| < 0.5,
    otherwise the world Z axis projected; t2 = n x t1.
    """
    n = normal
    use_y = jnp.abs(n[..., 1]) < 0.5
    seed = jnp.where(
        use_y[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1, 0], dtype=n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 0, 1], dtype=n.dtype), n.shape),
    )
    t1 = seed - n * jnp.sum(n * seed, axis=-1, keepdims=True)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


# ---------------------------------------------------------------------------
# primitive narrowphase functions; each takes world-frame geometry for a
# single pair and returns (dist (k,), pos (k,3), normal (k,3))
# ---------------------------------------------------------------------------


def _plane_sphere(ppos, pmat, psize, cpos, cmat, csize):
    n = pmat[:, 2]
    r = csize[0]
    dist = jnp.dot(n, cpos - ppos) - r
    pos = cpos - n * (r + 0.5 * dist)
    return dist[None], pos[None], make_frame(n)[None]


def _plane_capsule(ppos, pmat, psize, cpos, cmat, csize):
    n = pmat[:, 2]
    r, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    ends = jnp.stack([cpos + axis * hl, cpos - axis * hl])  # (2, 3)
    dist = ends @ n - jnp.dot(n, ppos) - r
    pos = ends - n[None, :] * (r + 0.5 * dist)[:, None]
    # mjc_PlaneCapsule frame: t1 along the capsule axis projected onto the
    # plane (sign-preserving); degenerate (vertical) fallback: the capsule
    # frame's x axis projected.
    t1 = axis - n * jnp.dot(n, axis)
    nrm = jnp.linalg.norm(t1)
    alt = cmat[:, 0] - n * jnp.dot(n, cmat[:, 0])
    t1 = jnp.where(nrm > 1e-10, t1 / jnp.where(nrm > 1e-10, nrm, 1.0),
                   alt / jnp.linalg.norm(alt))
    t2 = jnp.cross(n, t1)
    frame = jnp.broadcast_to(jnp.stack([n, t1, t2]), (2, 3, 3))
    return dist, pos, frame


def _plane_box(ppos, pmat, psize, bpos, bmat, bsize):
    n = pmat[:, 2]
    # 4 deepest corners: choose the 4 corners on the lower side per axis sign
    # enumerate all 8 corners, take 4 smallest distances via top_k
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=bpos.dtype,
    )  # (8, 3)
    corners = bpos[None, :] + (signs * bsize[None, :]) @ bmat.T  # (8, 3)
    dist8 = corners @ n - jnp.dot(n, ppos)
    neg_top, idx = jax.lax.top_k(-dist8, 4)
    dist = -neg_top
    pos = corners[idx] - n[None, :] * (0.5 * dist)[:, None]
    return dist, pos, jnp.broadcast_to(make_frame(n), (4, 3, 3))


def _sphere_sphere_raw(p1, r1, p2, r2, dtype):
    delta = p2 - p1
    d = jnp.linalg.norm(delta)
    safe = jnp.where(d > 1e-12, d, 1.0)
    n = jnp.where(d > 1e-12, delta / safe, jnp.array([0.0, 0, 1], dtype=dtype))
    dist = d - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)
    return dist, pos, n


def _sphere_sphere(p1pos, p1mat, s1, p2pos, p2mat, s2):
    dist, pos, n = _sphere_sphere_raw(p1pos, s1[0], p2pos, s2[0], p1pos.dtype)
    return dist[None], pos[None], make_frame(n)[None]


def _closest_on_segment(a, b, p):
    ab = b - a
    denom = jnp.dot(ab, ab)
    t = jnp.where(denom > 1e-16, jnp.dot(p - a, ab) / jnp.where(denom > 1e-16, denom, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t * ab


def _sphere_capsule(spos, smat, ssize, cpos, cmat, csize):
    r1 = ssize[0]
    r2, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    a, b = cpos - axis * hl, cpos + axis * hl
    closest = _closest_on_segment(a, b, spos)
    dist, pos, n = _sphere_sphere_raw(spos, r1, closest, r2, spos.dtype)
    return dist[None], pos[None], make_frame(n)[None]


def _segment_segment(a1, b1, a2, b2):
    """Closest points between two segments (robust clamped form)."""
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-14, jnp.clip((b * f - c * e) / jnp.where(denom > 1e-14, denom, 1.0), 0.0, 1.0), 0.0)
    t = jnp.where(e > 1e-14, (b * s + f) / jnp.where(e > 1e-14, e, 1.0), 0.0)
    # re-clamp
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        jnp.abs(t - t_cl) > 0,
        jnp.clip(jnp.where(a > 1e-14, (b * t_cl - c) / jnp.where(a > 1e-14, a, 1.0), 0.0), 0.0, 1.0),
        s,
    )
    t = t_cl
    p1 = a1 + s * d1
    p2 = a2 + t * d2
    return p1, p2


def _capsule_capsule(c1pos, c1mat, s1, c2pos, c2mat, s2):
    r1, hl1 = s1[0], s1[1]
    r2, hl2 = s2[0], s2[1]
    ax1, ax2 = c1mat[:, 2], c2mat[:, 2]
    p1, p2 = _segment_segment(
        c1pos - ax1 * hl1, c1pos + ax1 * hl1, c2pos - ax2 * hl2, c2pos + ax2 * hl2
    )
    dist, pos, n = _sphere_sphere_raw(p1, r1, p2, r2, c1pos.dtype)
    return dist[None], pos[None], make_frame(n)[None]


def _sphere_box(spos, smat, ssize, bpos, bmat, bsize):
    r = ssize[0]
    local = bmat.T @ (spos - bpos)
    clamped = jnp.clip(local, -bsize, bsize)
    inside = jnp.all(jnp.abs(local) < bsize)
    # outside: closest point on box surface
    closest_out = bpos + bmat @ clamped
    delta = spos - closest_out
    dn = jnp.linalg.norm(delta)
    n_out = jnp.where(dn > 1e-12, delta / jnp.where(dn > 1e-12, dn, 1.0),
                      bmat[:, 2])
    dist_out = dn - r
    # inside: push out along the nearest face
    depth = bsize - jnp.abs(local)
    ax = jnp.argmin(depth)
    sign = jnp.sign(local[ax])
    n_in = sign * bmat[:, ax]
    dist_in = -(depth[ax] + r)
    dist = jnp.where(inside, dist_in, dist_out)
    # normal points from geom1 (sphere) to geom2 (box): outside that is
    # -delta/|delta|; inside, the sphere is pushed out along the nearest
    # face's outward normal, so n = -outward.
    n = jnp.where(inside, -n_in, -n_out)
    pos = spos + n * (r + 0.5 * dist)
    return dist[None], pos[None], make_frame(n)[None]


_PRIMS = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
}


def collision(model: Model, d: Data) -> Data:
    """Run narrowphase over all candidate pairs, filling fixed contact lanes
    in the model's flattened pair order."""
    if model.npair == 0 or model.opt.disable_contact:
        return d

    dists, poss, frames = [], [], []
    offset = 0
    for (t1, t2, pairs) in model.pair_groups:
        key = (GeomType(t1), GeomType(t2))
        if key not in _PRIMS:
            raise NotImplementedError(f"collision {key[0].name}-{key[1].name}")
        fn = _PRIMS[key]
        g1 = np.array([p[0] for p in pairs], dtype=np.int32)
        g2 = np.array([p[1] for p in pairs], dtype=np.int32)
        dist, pos, frame = jax.vmap(fn)(
            d.geom_xpos[g1], d.geom_xmat[g1], model.geom_size[g1],
            d.geom_xpos[g2], d.geom_xmat[g2], model.geom_size[g2],
        )  # (npairs, k), (npairs, k, 3), (npairs, k, 3, 3)
        k = dist.shape[1]
        dists.append(dist.reshape(-1))
        poss.append(pos.reshape(-1, 3))
        frames.append(frame.reshape(-1, 3, 3))
        offset += len(pairs) * k

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    frame = jnp.concatenate(frames)

    # replicate per-pair params onto their lanes
    reps = []
    for (t1, t2, pairs) in model.pair_groups:
        k = max_contacts_per_pair(t1, t2)
        reps.extend([k] * len(pairs))
    reps = np.array(reps, dtype=np.int32)
    lane_of_pair = np.repeat(np.arange(model.npair, dtype=np.int32), reps)

    includemargin = (model.pair_margin - model.pair_gap)[lane_of_pair]
    contact = Contact(
        dist=dist,
        pos=pos,
        frame=frame,
        includemargin=includemargin,
        friction=model.pair_friction[lane_of_pair],
        solref=model.pair_solref[lane_of_pair],
        solimp=model.pair_solimp[lane_of_pair],
        geom1=jnp.asarray(model.pair_geom1)[lane_of_pair],
        geom2=jnp.asarray(model.pair_geom2)[lane_of_pair],
    )
    return d.replace(contact=contact)


def contact_condims(model: Model) -> list[int]:
    """Static per-lane condim list, flattened in pair order."""
    out = []
    idx = 0
    for (t1, t2, pairs) in model.pair_groups:
        k = max_contacts_per_pair(t1, t2)
        for _ in pairs:
            out.extend([model.pair_condim[idx]] * k)
            idx += 1
    return out
