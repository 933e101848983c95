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
        return 8
    if pair == (GeomType.PLANE, GeomType.CYLINDER):
        return 4
    if pair == (GeomType.CAPSULE, GeomType.CAPSULE):
        return 1
    if pair == (GeomType.CAPSULE, GeomType.BOX):
        return 3
    if pair == (GeomType.BOX, GeomType.BOX):
        return 8
    if pair == (GeomType.PLANE, GeomType.MESH):
        return 4
    if pair == (GeomType.HFIELD, GeomType.CAPSULE):
        return 3
    if pair in ((GeomType.HFIELD, GeomType.BOX),
                (GeomType.HFIELD, GeomType.ELLIPSOID),
                (GeomType.HFIELD, GeomType.CYLINDER)):
        # 3x3 cell window x 2 triangle prisms, each with an MPR witness +
        # 4 perturbed-support manifold lanes (flat-face/ridge restings)
        return 90
    if (pair[0] in _CONVEX_TYPES and pair[1] in _CONVEX_TYPES
            and pair not in _PRIMS):
        return 5  # MPR + 4 perturbed-support manifold lanes
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
    # all 8 corners as static lanes, gated downstream by dist < margin (at
    # most 4 box corners can be coplanar with the plane, so the active set
    # matches the former deepest-4 top_k selection without the data
    # movement — and the scalar-graph kernel can mirror the lanes exactly)
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=bpos.dtype,
    )  # (8, 3)
    corners = bpos[None, :] + (signs * bsize[None, :]) @ bmat.T  # (8, 3)
    dist = corners @ n - jnp.dot(n, ppos)
    pos = corners - n[None, :] * (0.5 * dist)[:, None]
    return dist, pos, jnp.broadcast_to(make_frame(n), (8, 3, 3))


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


def _plane_ellipsoid(ppos, pmat, psize, epos, emat, esize):
    """Single contact at the ellipsoid's support point opposite the plane
    normal: x = c - R (s^2 a)/sqrt(a^T s^2 a), a = R^T n (matches MuJoCo's
    mjc_PlaneConvex support exactly, verified numerically)."""
    n = pmat[:, 2]
    a = emat.T @ n
    w = (esize * esize) * a
    denom = jnp.sqrt(jnp.maximum(jnp.dot(a, w), 1e-20))
    x = epos - emat @ (w / denom)
    dist = jnp.dot(n, x - ppos)
    pos = x - n * (0.5 * dist)
    return dist[None], pos[None], make_frame(n)[None]


def _plane_cylinder(ppos, pmat, psize, cpos, cmat, csize):
    """Up to 4 contacts (matches MuJoCo's emission pattern, verified
    empirically): deepest rim point of the lower cap, the two rim points at
    +-120 degrees on the same cap, and the deepest rim point of the other
    cap — each gated downstream by its own dist < includemargin, which
    reproduces the flat (3 contacts) / lying (2) / tilted (1) cases."""
    n = pmat[:, 2]
    r, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    c = jnp.dot(n, axis)
    # radial downslope direction (unit, perpendicular to axis)
    perp = n - c * axis
    plen = jnp.linalg.norm(perp)
    # degenerate (axis || n): fall back to the cylinder x axis projected
    alt = cmat[:, 0] - n * jnp.dot(n, cmat[:, 0])
    alt = alt / jnp.maximum(jnp.linalg.norm(alt), 1e-12)
    dir0 = jnp.where(plen > 1e-10, -perp / jnp.maximum(plen, 1e-12), alt)
    s = jnp.where(c > 0, -1.0, 1.0)  # lower cap along s*axis
    cap_a = cpos + s * hl * axis
    cap_b = cpos - s * hl * axis
    cross = jnp.cross(axis, dir0)
    dir120 = dir0 * (-0.5) + cross * (jnp.sqrt(3.0) / 2.0)
    dir240 = dir0 * (-0.5) - cross * (jnp.sqrt(3.0) / 2.0)
    points = jnp.stack([
        cap_a + r * dir0,
        cap_a + r * dir120,
        cap_a + r * dir240,
        cap_b + r * dir0,
    ])
    dist = points @ n - jnp.dot(n, ppos)
    pos = points - n[None, :] * (0.5 * dist)[:, None]
    return dist, pos, jnp.broadcast_to(make_frame(n), (4, 3, 3))


def _sphere_cylinder(spos, smat, ssize, cpos, cmat, csize):
    """Sphere vs solid cylinder: clamp the sphere center into the cylinder
    (axial to the caps, radial to the side), then sphere-vs-point; centers
    inside the cylinder push out through the nearest face."""
    rs = ssize[0]
    r, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    rel = spos - cpos
    z = jnp.dot(rel, axis)
    radial = rel - z * axis
    rd = jnp.linalg.norm(radial)
    rhat = jnp.where(
        rd > 1e-12, radial / jnp.maximum(rd, 1e-12), cmat[:, 0]
    )
    inside = (jnp.abs(z) < hl) & (rd < r)
    # outside: closest point on the cylinder surface
    closest = cpos + jnp.clip(z, -hl, hl) * axis + jnp.minimum(rd, r) * rhat
    delta = spos - closest
    dn = jnp.linalg.norm(delta)
    n_out = jnp.where(dn > 1e-12, delta / jnp.maximum(dn, 1e-12), axis)
    dist_out = dn - rs
    # inside: push through the nearest of (side wall, nearer cap)
    side_pen = r - rd
    cap_pen = hl - jnp.abs(z)
    use_cap = cap_pen < side_pen
    n_in = jnp.where(use_cap, jnp.sign(z) * axis, rhat)
    dist_in = -(jnp.where(use_cap, cap_pen, side_pen) + rs)
    dist = jnp.where(inside, dist_in, dist_out)
    # normal points from geom1 (sphere) toward geom2 (cylinder)
    n_vec = jnp.where(inside, -n_in, -n_out)
    pos = spos + n_vec * (rs + 0.5 * dist)
    return dist[None], pos[None], make_frame(n_vec)[None]


def _capsule_box(cpos, cmat, csize, bpos, bmat, bsize):
    """Capsule vs box: sphere-vs-box at each capsule end plus one at the
    segment point nearest the box (covers mid-segment edge crossings).
    Matches MuJoCo's 2-contact emission for the dominant end-sphere cases;
    mid-segment poses use the same sphere-box contact at the nearest
    segment point (a MuJoCo-compatible approximation)."""
    r, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    a = cpos - axis * hl
    b = cpos + axis * hl
    # nearest segment point to the box (box-local coordinate descent: clamp
    # the box point to the segment's AABB... use 8 fixed iterations of
    # alternating closest-point projection, convex so it converges)
    t = jnp.asarray(0.5, dtype=cpos.dtype)
    for _ in range(8):
        p = a + t * (b - a)
        q_local = jnp.clip(bmat.T @ (p - bpos), -bsize, bsize)
        q = bpos + bmat @ q_local
        seg = b - a
        denom = jnp.maximum(jnp.dot(seg, seg), 1e-12)
        t = jnp.clip(jnp.dot(q - a, seg) / denom, 0.0, 1.0)
    mid = a + t * (b - a)

    dists, poss, frames = [], [], []
    for point in (a, b, mid):
        d1, p1, f1 = _sphere_box(point, cmat, jnp.stack([r, r, r]), bpos,
                                 bmat, bsize)
        dists.append(d1)
        poss.append(p1)
        frames.append(f1)
    dist = jnp.concatenate(dists)
    # the mid lane only fires when it is strictly deeper than both end
    # lanes (segment crossing an edge); otherwise it would duplicate an
    # endpoint contact and double the force relative to MuJoCo
    redundant = dist[2] >= jnp.minimum(dist[0], dist[1]) - 1e-10
    dist = dist.at[2].set(jnp.where(redundant, 1e10, dist[2]))
    return dist, jnp.concatenate(poss), jnp.concatenate(frames)


def _box_box(p1, m1, s1, p2, m2, s2):
    """Box-box narrowphase: SAT over the 6 face axes (edge-cross axes get
    the ODE-style 0.95 preference factor), then the incident face is
    clipped against the reference face rectangle.  The clipped polygon has
    at most 8 vertices = 8 static lanes; candidates are the incident-face
    corners inside the rectangle, the rectangle corners inside the incident
    quad, and quad-edge x rect-edge intersections, compacted with top_k.
    Face-resting configurations reproduce MuJoCo's contact positions and
    per-vertex depths (verified in tests); an additional deepest-corner
    fallback covers edge-dominant poses so penetration never goes blind.
    """
    dtype = p1.dtype
    d12 = p2 - p1

    # ----- SAT over face axes -----
    # axes: columns of m1 (k=0,1,2) and m2 (k=3,4,5)
    axes = jnp.concatenate([m1.T, m2.T], axis=0)  # (6, 3)
    r1 = jnp.abs(axes @ m1) @ s1  # (6,) projection radius of box1
    r2 = jnp.abs(axes @ m2) @ s2
    sep = jnp.abs(axes @ d12)
    overlap = r1 + r2 - sep  # (6,) penetration depth per axis
    k = jnp.argmin(overlap)
    ref_is_1 = k < 3
    nref = axes[k]
    # normal points from the reference box toward the other box
    sgn = jnp.sign(jnp.where(ref_is_1, jnp.dot(nref, d12),
                             -jnp.dot(nref, d12)))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    nref = nref * sgn

    # reference frame quantities (select box1 or box2 as reference)
    pr = jnp.where(ref_is_1, p1, p2)
    mr = jnp.where(ref_is_1, m1, m2)
    sr = jnp.where(ref_is_1, s1, s2)
    pi_ = jnp.where(ref_is_1, p2, p1)
    mi = jnp.where(ref_is_1, m2, m1)
    si = jnp.where(ref_is_1, s2, s1)

    kr = jnp.where(ref_is_1, k, k - 3)
    # in-plane axes of the reference face (the other two columns):
    # kr=0 -> (1,2), kr=1 -> (0,2), kr=2 -> (0,1)
    iu = jnp.where(kr == 0, 1, 0)
    iv = jnp.where(kr == 2, 1, 2)
    u = mr[:, iu]
    v = mr[:, iv]
    su = sr[iu]
    sv = sr[iv]
    face_c = pr + nref * sr[kr]

    # incident face of the other box: outward normal most anti-parallel to n
    dots = mi.T @ nref  # (3,)
    ji = jnp.argmax(jnp.abs(dots))
    jsgn = -jnp.sign(dots[ji])
    jsgn = jnp.where(jsgn == 0, 1.0, jsgn)
    inc_n = mi[:, ji] * jsgn
    inc_c = pi_ + inc_n * si[ji]
    # the incident face's two edge axes
    ju = jnp.where(ji == 0, 1, 0)
    jv = jnp.where(ji == 2, 1, 2)
    e1 = mi[:, ju] * si[ju]
    e2 = mi[:, jv] * si[jv]
    signs = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=dtype)
    corners = inc_c[None, :] + signs[:, :1] * e1[None, :] + signs[:, 1:] * e2[None, :]

    # project to the reference-face 2D frame; h = height above the face
    rel = corners - face_c[None, :]
    qu = rel @ u
    qv = rel @ v
    qh = rel @ nref
    quad = jnp.stack([qu, qv], axis=1)  # (4, 2) convex quad, h affine in uv

    # affine h(u, v) = h0 + gu*u + gv*v from three corners
    du1 = quad[1] - quad[0]
    du2 = quad[3] - quad[0]
    dh1 = qh[1] - qh[0]
    dh2 = qh[3] - qh[0]
    det = du1[0] * du2[1] - du1[1] * du2[0]
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    gu = (dh1 * du2[1] - dh2 * du1[1]) / safe_det
    gv = (dh2 * du1[0] - dh1 * du2[0]) / safe_det
    h0 = qh[0] - gu * quad[0, 0] - gv * quad[0, 1]

    def h_of(pt):
        return h0 + gu * pt[..., 0] + gv * pt[..., 1]

    # candidate 1: incident corners inside the rectangle (4)
    c1_valid = (jnp.abs(qu) <= su + 1e-10) & (jnp.abs(qv) <= sv + 1e-10)
    c1_pts = quad

    # candidate 2: rectangle corners inside the quad (4)
    rect = jnp.stack([
        jnp.stack([su, sv]), jnp.stack([su, -sv]),
        jnp.stack([-su, -sv]), jnp.stack([-su, sv]),
    ])
    # convex quad winding: cross products must share sign
    def inside_quad(p):
        c = []
        for i in range(4):
            a = quad[i]
            b = quad[(i + 1) % 4]
            c.append((b[0] - a[0]) * (p[1] - a[1])
                     - (b[1] - a[1]) * (p[0] - a[0]))
        c = jnp.stack(c)
        return jnp.all(c >= -1e-10) | jnp.all(c <= 1e-10)

    c2_valid = jax.vmap(inside_quad)(rect)
    c2_pts = rect

    # candidate 3: quad edges x rect edges (16)
    c3_pts = []
    c3_valid = []
    rect_edges = [(rect[i], rect[(i + 1) % 4]) for i in range(4)]
    for i in range(4):
        a = quad[i]
        b = quad[(i + 1) % 4]
        ab = b - a
        for (c, dd) in rect_edges:
            cd = dd - c
            den = ab[0] * cd[1] - ab[1] * cd[0]
            safe = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
            t = ((c[0] - a[0]) * cd[1] - (c[1] - a[1]) * cd[0]) / safe
            sly = ((c[0] - a[0]) * ab[1] - (c[1] - a[1]) * ab[0]) / safe
            ok = (jnp.abs(den) > 1e-12) & (t >= 0) & (t <= 1) & (sly >= 0) & (sly <= 1)
            c3_pts.append(a + t * ab)
            c3_valid.append(ok)
    c3_pts = jnp.stack(c3_pts)
    c3_valid = jnp.stack(c3_valid)

    pts = jnp.concatenate([c1_pts, c2_pts, c3_pts])       # (24, 2)
    valid = jnp.concatenate([c1_valid, c2_valid, c3_valid])
    # dedup coincident candidates (a corner exactly on the rectangle edge
    # appears as inside-corner AND edge intersection; a perfectly aligned
    # stack triples every vertex) — keep the first valid representative
    diff = pts[:, None, :] - pts[None, :, :]
    close = jnp.sum(diff * diff, axis=-1) < 1e-16
    earlier = jnp.tril(jnp.ones((24, 24), dtype=bool), k=-1)
    dup = jnp.any(close & earlier & valid[None, :], axis=1)
    valid = valid & ~dup
    hs = h_of(pts)

    # compact to 8 lanes: a convex quad/rect intersection has <= 8 vertices
    score = jnp.where(valid, 1.0, 0.0) - jnp.arange(24) * 1e-6
    _, idx = jax.lax.top_k(score, 8)
    pts8 = pts[idx]
    hs8 = hs[idx]
    val8 = valid[idx]

    # world positions: point on the incident face, shifted to the midpoint
    world = (face_c[None, :] + pts8[:, :1] * u[None, :]
             + pts8[:, 1:] * v[None, :] + hs8[:, None] * nref[None, :])
    dist = jnp.where(val8, hs8, 1e10)
    pos = world - nref[None, :] * (0.5 * hs8)[:, None]

    # normal must point geom1 -> geom2
    n_contact = jnp.where(ref_is_1, 1.0, -1.0) * nref
    frame = jnp.broadcast_to(make_frame(n_contact), (8, 3, 3))

    # edge-dominant fallback: if every candidate is invalid but the boxes
    # overlap on the face axis, emit the deepest incident corner so
    # penetration is never invisible to the solver
    none_valid = ~jnp.any(val8)
    deep = jnp.argmin(qh)
    deep_pt = jnp.stack([
        jnp.clip(qu[deep], -su, su), jnp.clip(qv[deep], -sv, sv)
    ])
    deep_h = qh[deep]
    deep_world = (face_c + deep_pt[0] * u + deep_pt[1] * v
                  + deep_h * nref)
    dist = dist.at[0].set(jnp.where(none_valid, deep_h, dist[0]))
    pos = pos.at[0].set(
        jnp.where(none_valid, deep_world - nref * 0.5 * deep_h, pos[0])
    )
    return dist, pos, frame


_PRIMS = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.PLANE, GeomType.CYLINDER): _plane_cylinder,
    (GeomType.PLANE, GeomType.ELLIPSOID): _plane_ellipsoid,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.SPHERE, GeomType.CYLINDER): _sphere_cylinder,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
    (GeomType.CAPSULE, GeomType.BOX): _capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box,
}


# ---------------------------------------------------------------------------
# convex-convex narrowphase: Minkowski Portal Refinement over support
# functions.  One routine covers every convex-convex pairing
# (sphere/capsule/ellipsoid/cylinder/box/mesh cross pairs) that has no
# bespoke function above, with a static iteration count and masked updates
# so it stays jit/vmap-friendly (VERDICT r2 item 5).
# ---------------------------------------------------------------------------

_CONVEX_TYPES = (
    GeomType.SPHERE, GeomType.CAPSULE, GeomType.ELLIPSOID,
    GeomType.CYLINDER, GeomType.BOX, GeomType.MESH,
)


def _support_local(gtype: GeomType, size, verts, dl):
    """Support point of the geom in its local frame for local direction
    ``dl`` (need not be unit)."""
    eps = 1e-12
    if gtype == GeomType.SPHERE:
        n = dl / jnp.maximum(jnp.linalg.norm(dl), eps)
        return size[0] * n
    if gtype == GeomType.CAPSULE:
        n = dl / jnp.maximum(jnp.linalg.norm(dl), eps)
        cap = jnp.array([0.0, 0.0, 1.0], dtype=dl.dtype) * (
            jnp.sign(dl[2]) * size[1]
        )
        return size[0] * n + cap
    if gtype == GeomType.BOX:
        return jnp.sign(dl) * size
    if gtype == GeomType.ELLIPSOID:
        sd = size * dl
        return size * sd / jnp.maximum(jnp.linalg.norm(sd), eps)
    if gtype == GeomType.CYLINDER:
        r_xy = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1])
        safe = jnp.maximum(r_xy, eps)
        radial = jnp.array([dl[0], dl[1], 0.0]) / safe * size[0]
        radial = jnp.where(r_xy > eps, radial, 0.0)
        axial = jnp.array([0.0, 0.0, 1.0], dtype=dl.dtype) * (
            jnp.sign(dl[2]) * size[1]
        )
        return radial + axial
    if gtype == GeomType.MESH:
        return verts[jnp.argmax(verts @ dl)]
    raise NotImplementedError(gtype)


def _mpr(sup1, sup2, c1, c2, dtype, n_discover=8, n_refine=14):
    """Minkowski Portal Refinement on the CSO A - B.

    sup_i(d): world support point of geom i in world direction d; c_i:
    interior points (geom centers).  Returns (dist, pos, normal) with
    dist < 0 on penetration (depth along the converged portal normal),
    pos the witness midpoint, and normal pointing from geom1 into geom2
    (MuJoCo contact frame convention)."""

    def cso(d):
        a = sup1(d)
        b = sup2(-d)
        return a - b, a, b

    v0 = c1 - c2
    v0 = jnp.where(jnp.linalg.norm(v0) < 1e-10,
                   jnp.array([1e-5, 0.0, 0.0], dtype=dtype), v0)

    v1, a1, b1 = cso(-v0)
    d2 = jnp.cross(v1, v0)
    # origin colinear with v0-v1: any direction perpendicular to v0 works
    alt = jnp.cross(v0, jnp.where(
        jnp.abs(v0[0]) < 0.9 * jnp.linalg.norm(v0),
        jnp.array([1.0, 0.0, 0.0], dtype=dtype),
        jnp.array([0.0, 1.0, 0.0], dtype=dtype),
    ))
    d2 = jnp.where(jnp.linalg.norm(d2) < 1e-12, alt, d2)
    v2, a2, b2 = cso(d2)
    d3 = jnp.cross(v1 - v0, v2 - v0)
    flip = jnp.dot(d3, v0) > 0
    d3 = jnp.where(flip, -d3, d3)
    v1, v2 = (jnp.where(flip, v2, v1), jnp.where(flip, v1, v2))
    a1, a2 = (jnp.where(flip, a2, a1), jnp.where(flip, a1, a2))
    b1, b2 = (jnp.where(flip, b2, b1), jnp.where(flip, b1, b2))
    v3, a3, b3 = cso(d3)

    # ----- portal discovery (masked fixed-iteration) -----
    found = jnp.asarray(False)
    for _ in range(n_discover):
        out13 = jnp.dot(jnp.cross(v1, v3), v0) < 0  # origin outside v0-v1-v3
        out32 = jnp.dot(jnp.cross(v3, v2), v0) < 0  # origin outside v0-v3-v2
        step13 = (~found) & out13
        step32 = (~found) & (~out13) & out32
        found = found | ((~out13) & (~out32))
        # step13: v2 <- v3, re-support towards origin side of (v0,v1,v3)
        # step32: v1 <- v3, re-support
        v2, a2, b2 = (jnp.where(step13, v3, v2), jnp.where(step13, a3, a2),
                      jnp.where(step13, b3, b2))
        v1, a1, b1 = (jnp.where(step32, v3, v1), jnp.where(step32, a3, a1),
                      jnp.where(step32, b3, b1))
        d = jnp.cross(v1 - v0, v2 - v0)
        d = jnp.where(jnp.dot(d, v0) > 0, -d, d)
        vn, an, bn = cso(d)
        keep = found
        v3 = jnp.where(keep, v3, vn)
        a3 = jnp.where(keep, a3, an)
        b3 = jnp.where(keep, b3, bn)

    # ----- portal refinement -----
    for _ in range(n_refine):
        n = jnp.cross(v2 - v1, v3 - v1)
        n = jnp.where(jnp.dot(n, v1 - v0) < 0, -n, n)  # outward from v0
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        v4, a4, b4 = cso(n)
        # which sub-portal contains the v0->origin ray
        c41 = jnp.dot(jnp.cross(v4, v1), v0) < 0
        c42 = jnp.dot(jnp.cross(v4, v2), v0) < 0
        c43 = jnp.dot(jnp.cross(v4, v3), v0) < 0
        r1 = c41 & c42            # replace v1
        r3 = c41 & (~c42)         # replace v3
        r2 = (~c41) & c43         # replace v2
        r1b = (~c41) & (~c43)     # replace v1
        rep1 = r1 | r1b
        v1, a1, b1 = (jnp.where(rep1, v4, v1), jnp.where(rep1, a4, a1),
                      jnp.where(rep1, b4, b1))
        v2, a2, b2 = (jnp.where(r2, v4, v2), jnp.where(r2, a4, a2),
                      jnp.where(r2, b4, b2))
        v3, a3, b3 = (jnp.where(r3, v4, v3), jnp.where(r3, a4, a3),
                      jnp.where(r3, b4, b3))

    n = jnp.cross(v2 - v1, v3 - v1)
    n = jnp.where(jnp.dot(n, v1 - v0) < 0, -n, n)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)

    # ----- normal polish -----
    # MPR's depth is measured along the ray-exit normal, which overestimates
    # the true minimum translation when the ray is far from the MTV
    # direction (e.g. sphere against a mesh vertex).  Polish by minimizing
    # s(n) = n . support(n) over the unit sphere with projected support
    # descent (envelope theorem: grad s = support point), keeping the best
    # iterate.
    v4, _, _ = cso(n)
    s_best = jnp.dot(n, v4)
    n_best = n
    eta = 0.5
    for _ in range(16):
        v4, _, _ = cso(n)
        s = jnp.dot(n, v4)
        better = s < s_best
        s_best = jnp.where(better, s, s_best)
        n_best = jnp.where(better, n, n_best)
        tang = v4 - jnp.dot(v4, n) * n
        scale = jnp.maximum(jnp.linalg.norm(v4), 1e-9)
        n = n - (eta / scale) * tang
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        eta = eta * 0.85
    v4, _, _ = cso(n)
    s = jnp.dot(n, v4)
    better = s < s_best
    s_best = jnp.where(better, s, s_best)
    n_best = jnp.where(better, n, n_best)
    n = n_best
    v4, a4, b4 = cso(n)
    # signed separation of the CSO boundary along n: > 0 when the origin is
    # inside (penetration depth), < 0 when separated
    dist = -s_best

    # witness point: intersect the v0->origin ray with the portal plane,
    # then clamped barycentrics in (v1, v2, v3)
    denom = jnp.dot(n, -v0)
    t = jnp.dot(n, v1 - v0) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    t = jnp.clip(t, 0.0, 2.0)
    q = v0 + t * (-v0)
    nn = jnp.cross(v2 - v1, v3 - v1)
    area = jnp.dot(nn, nn)
    l1 = jnp.dot(jnp.cross(v2 - q, v3 - q), nn)
    l2 = jnp.dot(jnp.cross(v3 - q, v1 - q), nn)
    l3 = jnp.dot(jnp.cross(v1 - q, v2 - q), nn)
    lam = jnp.stack([l1, l2, l3]) / jnp.where(area > 1e-18, area, 1.0)
    lam = jnp.clip(lam, 0.0, 1.0)
    lam = lam / jnp.maximum(jnp.sum(lam), 1e-12)
    pa = lam[0] * a1 + lam[1] * a2 + lam[2] * a3
    pb = lam[0] * b1 + lam[1] * b2 + lam[2] * b3
    pos = 0.5 * (pa + pb)
    # n is the outward portal normal on A - B at the near-origin boundary
    # (the ray from v0 = c1 - c2 through the origin exits on the side
    # opposite geom1's center), which IS the MuJoCo contact normal from
    # geom1 into geom2 — verified against mjContact.frame on overlapping
    # ellipsoid-box / sphere-mesh states
    return dist, pos, n


def _hfield_prism_mpr(model: Model, d, gh: int, gg: int, hsize, nrow,
                      ncol, data):
    """Convex geom vs height field through MuJoCo's prism decomposition:
    the 3x3 cell window around the geom center splits into 18 triangle
    prisms, each run through the MPR narrowphase against the geom (the
    same per-prism convex collision MuJoCo's mjc_HFieldConvex performs,
    with a static lane count instead of its dynamic contact list).
    Returns (18,), (18, 3), (18, 3, 3)."""
    dtype = d.qpos.dtype
    hpos, hmat = d.geom_xpos[gh], d.geom_xmat[gh]
    gpos, gmat = d.geom_xpos[gg], d.geom_xmat[gg]
    gt = GeomType(model.geom_type[gg])
    size = model.geom_size[gg]

    sx, sy, sz = hsize[0], hsize[1], hsize[2]
    zbot = -hsize[3]
    dx = 2 * sx / (ncol - 1)
    dy = 2 * sy / (nrow - 1)
    pl = hmat.T @ (gpos - hpos)
    fx = (pl[0] + sx) / (2 * sx) * (ncol - 1)
    fy = (pl[1] + sy) / (2 * sy) * (nrow - 1)
    i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - 1, 0,
                  max(ncol - 4, 0))
    j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32) - 1, 0,
                  max(nrow - 4, 0))

    def geom_sup(dw):
        dl = gmat.T @ dw
        return gpos + gmat @ _support_local(gt, size, None, dl)

    # manifold extent gate: the smaller of the prism cell scale and the
    # geom's largest half-size (same rule as _mpr_pair's scale_min).
    # Static values from the model (the hsize ARG may be traced here).
    sizes_np = np.asarray(jax.device_get(model.geom_size))
    hs_np = np.asarray(jax.device_get(model.hfield_size)).reshape(-1, 4)[
        model.geom_dataid[gh]
    ]
    cell = max(2.0 * hs_np[0] / (ncol - 1), 2.0 * hs_np[1] / (nrow - 1))
    prism_scale = float(max(
        min(cell, float(np.max(sizes_np[gg]))), 1e-6
    ))

    ds, ps, fs = [], [], []
    for dj in range(3):
        for di in range(3):
            i = jnp.minimum(i0 + di, ncol - 2)
            j = jnp.minimum(j0 + dj, nrow - 2)
            x0 = -sx + i.astype(dtype) * dx
            y0 = -sy + j.astype(dtype) * dy
            z00 = data[j, i] * sz
            z10 = data[j, i + 1] * sz
            z01 = data[j + 1, i] * sz
            z11 = data[j + 1, i + 1] * sz
            tris = (
                ((x0, y0, z00), (x0 + dx, y0, z10),
                 (x0 + dx, y0 + dy, z11)),
                ((x0, y0, z00), (x0 + dx, y0 + dy, z11),
                 (x0, y0 + dy, z01)),
            )
            for tri in tris:
                top = jnp.stack([jnp.stack(v) for v in tri])  # (3, 3)
                bot = top.at[:, 2].set(zbot)
                verts_l = jnp.concatenate([top, bot])          # (6, 3)
                verts_w = (hmat @ verts_l.T).T + hpos

                def prism_sup(dw, vw=verts_w):
                    return vw[jnp.argmax(vw @ dw)]

                center = jnp.mean(verts_w, axis=0)
                dist, pos, n = _mpr(prism_sup, geom_sup, center, gpos,
                                    dtype)
                frame = make_frame(n)
                ds.append(dist)
                ps.append(pos)
                fs.append(frame)
                # multi-witness manifold per prism (VERDICT r4 next #6):
                # a flat prism top under a box/cylinder face needs the
                # same perturbed-support corners the free convex pairs
                # get, or ridge restings tip about the single witness
                mds, mps, mfs = _manifold_lanes(
                    prism_sup, geom_sup, pos, n, frame, prism_scale
                )
                ds += mds
                ps += mps
                fs += mfs
    return jnp.stack(ds), jnp.stack(ps), jnp.stack(fs)


def _mpr_pair(model: Model, d, g1: int, g2: int):
    """(1,), (1, 3), (1, 3, 3) contact lane for one convex-convex pair."""
    dtype = d.qpos.dtype
    t1, t2 = GeomType(model.geom_type[g1]), GeomType(model.geom_type[g2])

    def mk_sup(g, gt):
        size = model.geom_size[g]
        verts = None
        if gt == GeomType.MESH:
            mid = model.geom_dataid[g]
            adr, num = model.mesh_vertadr[mid], model.mesh_vertnum[mid]
            verts = jnp.asarray(model.mesh_vert[adr : adr + num], dtype=dtype)
        pos, mat = d.geom_xpos[g], d.geom_xmat[g]

        def sup(dw):
            dl = mat.T @ dw
            return pos + mat @ _support_local(gt, size, verts, dl)

        return sup

    sup1 = mk_sup(g1, t1)
    sup2 = mk_sup(g2, t2)
    dist, pos, n = _mpr(
        sup1, sup2, d.geom_xpos[g1], d.geom_xpos[g2], dtype,
    )

    # manifold sampling (MuJoCo multiCCD analog, VERDICT r3 next #6)
    sizes = np.asarray(jax.device_get(model.geom_size))
    scale_min = float(max(min(np.max(sizes[g1]), np.max(sizes[g2])), 1e-6))
    frame = make_frame(n)
    mds, mps, mfs = _manifold_lanes(sup1, sup2, pos, n, frame, scale_min)
    return (jnp.stack([dist] + mds), jnp.stack([pos] + mps),
            jnp.stack([frame] + mfs))


def _manifold_lanes(sup1, sup2, pos, n, frame, scale_min, eps=0.05):
    """Perturbed-support manifold probes around an MPR witness: flat-face
    restings are under-constrained with one contact, so probe both support
    maps under normals tilted toward the SAME tangent direction t — on
    flat faces the supports jump to the faces' extreme points along t, and
    the overlap region extends to the SMALLER of the two tangential
    extents; on curved surfaces the supports barely move (extent ~ eps *
    radius), which the extent gate rejects, leaving the single-point
    contact a curved pairing should have.  Returns 4 (dist, pos, frame)
    lanes (inactive ones at dist 1e10)."""
    tan1, tan2 = frame[1], frame[2]
    min_extent = 2.0 * eps * scale_min  # > curved-support drift
    ds, ps, fs = [], [], []
    for t in (tan1, -tan1, tan2, -tan2):
        da = n + eps * t
        da = da / jnp.linalg.norm(da)
        db = eps * t - n
        db = db / jnp.linalg.norm(db)
        a = sup1(da)
        b = sup2(db)
        depth = jnp.dot(n, b - a)
        ta = jnp.dot(t, a - pos)
        tb = jnp.dot(t, b - pos)
        ext = jnp.maximum(jnp.minimum(ta, tb), 0.0)
        posk = pos + ext * t
        flat = ext > min_extent
        ds.append(jnp.where(flat, depth, 1e10))
        ps.append(posk)
        fs.append(frame)
    return ds, ps, fs


def _hfield_surface(hsize, nrow, ncol, data, pl):
    """Signed distance of a local point to the height-field surface.

    ``data`` is the (nrow, ncol) normalized [0,1] elevation grid spanning
    x in [-sx, sx] (cols) and y in [-sy, sy] (rows), surface height
    z = data * hsize[2].  Each grid cell splits into two triangles (the
    MuJoCo prism convention); the triangle under the query point supplies
    the contact plane.  Returns (signed distance, upward unit normal).
    """
    sx, sy, sz = hsize[0], hsize[1], hsize[2]
    dtype = pl.dtype
    fx = (pl[0] + sx) / (2 * sx) * (ncol - 1)
    fy = (pl[1] + sy) / (2 * sy) * (nrow - 1)
    eps = 1e-6
    fx = jnp.clip(fx, 0.0, ncol - 1 - eps)
    fy = jnp.clip(fy, 0.0, nrow - 1 - eps)
    i = jnp.floor(fx).astype(jnp.int32)
    j = jnp.floor(fy).astype(jnp.int32)
    u = fx - i
    v = fy - j

    dx = 2 * sx / (ncol - 1)
    dy = 2 * sy / (nrow - 1)
    x0 = -sx + i.astype(dtype) * dx
    y0 = -sy + j.astype(dtype) * dy
    z00 = data[j, i] * sz
    z10 = data[j, i + 1] * sz
    z01 = data[j + 1, i] * sz
    z11 = data[j + 1, i + 1] * sz

    lower = u >= v
    # MuJoCo's prism triangulation splits each cell along the (00)->(11)
    # diagonal (verified vs settled contacts): lower triangle
    # (00, 10, 11) for u >= v, upper triangle (00, 11, 01) for u < v
    a = jnp.stack([x0, y0, z00])
    b = jnp.where(
        lower,
        jnp.stack([x0 + dx, y0, z10]),
        jnp.stack([x0 + dx, y0 + dy, z11]),
    )
    cc = jnp.where(
        lower,
        jnp.stack([x0 + dx, y0 + dy, z11]),
        jnp.stack([x0, y0 + dy, z01]),
    )
    n = jnp.cross(b - a, cc - a)
    n = n * jnp.sign(n[2])  # upward
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    return jnp.dot(n, pl - a), n


def _hfield_sphere_at(hpos, hmat, hsize, nrow, ncol, data, center, r):
    pl = hmat.T @ (center - hpos)
    sd, nl = _hfield_surface(hsize, nrow, ncol, data, pl)
    dist = sd - r
    n = hmat @ nl
    pos = center - n * (r + 0.5 * dist)
    return dist, pos, n


def _hfield_sphere(hpos, hmat, hsize, nrow, ncol, data, cpos, cmat, csize):
    dist, pos, n = _hfield_sphere_at(
        hpos, hmat, hsize, nrow, ncol, data, cpos, csize[0]
    )
    return dist[None], pos[None], make_frame(n)[None]


def _hfield_capsule(hpos, hmat, hsize, nrow, ncol, data, cpos, cmat, csize):
    """Capsule vs height field: sphere queries at the two end caps plus the
    segment midpoint, so a capsule bridging a ridge or peak between its
    endpoints still collides (a midpoint-only gap remains for features
    narrower than half the capsule length — finer terrain needs a denser
    grid or shorter capsules)."""
    r, h = csize[0], csize[1]
    axis = cmat[:, 2]
    out_d, out_p, out_f = [], [], []
    for t in (1.0, -1.0, 0.0):
        end = cpos + t * h * axis
        dist, pos, n = _hfield_sphere_at(
            hpos, hmat, hsize, nrow, ncol, data, end, r
        )
        out_d.append(dist)
        out_p.append(pos)
        out_f.append(make_frame(n))
    return jnp.stack(out_d), jnp.stack(out_p), jnp.stack(out_f)


def _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data, point):
    """(signed distance, world-up normal) of a world point vs the field."""
    pl = hmat.T @ (point - hpos)
    sd, nl = _hfield_surface(hsize, nrow, ncol, data, pl)
    return sd, hmat @ nl


def _hfield_box(hpos, hmat, hsize, nrow, ncol, data, bpos, bmat, bsize):
    """Box vs height field: per-corner surface queries, deepest 4 corners
    become the contact lanes (the terrain analog of _plane_box; each lane
    uses its own local triangle normal, so ridged fields tilt the frames
    correctly)."""
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=bpos.dtype,
    )
    corners = bpos[None, :] + (signs * bsize[None, :]) @ bmat.T  # (8, 3)
    ds, ps, ns = [], [], []
    for k in range(8):
        sd, n = _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data,
                                 corners[k])
        ds.append(sd)
        ps.append(corners[k] - n * (0.5 * sd))
        ns.append(n)
    dist8 = jnp.stack(ds)
    neg_top, idx = jax.lax.top_k(-dist8, 4)
    dist = -neg_top
    pos = jnp.stack(ps)[idx]
    frame = jnp.stack([make_frame(n) for n in ns])[idx]
    return dist, pos, frame


def _hfield_ellipsoid(hpos, hmat, hsize, nrow, ncol, data, epos, emat,
                      esize):
    """Ellipsoid vs height field: support point opposite the local surface
    normal, iterated 3 times so the normal converges on ridged cells (the
    terrain analog of _plane_ellipsoid)."""
    sd, n = _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data, epos)
    x = epos
    for _ in range(3):
        a = emat.T @ n
        w = (esize * esize) * a
        denom = jnp.sqrt(jnp.maximum(jnp.dot(a, w), 1e-20))
        x = epos - emat @ (w / denom)
        sd, n = _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data, x)
    pos = x - n * (0.5 * sd)
    return sd[None], pos[None], make_frame(n)[None]


def _hfield_cylinder(hpos, hmat, hsize, nrow, ncol, data, cpos, cmat,
                     csize):
    """Cylinder vs height field: rim points of the downhill cap (deepest
    rim point, its +-120-degree companions, and the other cap's deepest
    rim), each queried against its own local triangle (the terrain analog
    of _plane_cylinder)."""
    r, hl = csize[0], csize[1]
    axis = cmat[:, 2]
    _, n0 = _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data, cpos)
    c = jnp.dot(n0, axis)
    perp = n0 - c * axis
    plen = jnp.linalg.norm(perp)
    alt = cmat[:, 0] - n0 * jnp.dot(n0, cmat[:, 0])
    alt = alt / jnp.maximum(jnp.linalg.norm(alt), 1e-12)
    dir0 = jnp.where(plen > 1e-10, -perp / jnp.maximum(plen, 1e-12), alt)
    s = jnp.where(c > 0, -1.0, 1.0)
    cap_a = cpos + s * hl * axis
    cap_b = cpos - s * hl * axis
    cross = jnp.cross(axis, dir0)
    dir120 = dir0 * (-0.5) + cross * (jnp.sqrt(3.0) / 2.0)
    dir240 = dir0 * (-0.5) - cross * (jnp.sqrt(3.0) / 2.0)
    points = [cap_a + r * dir0, cap_a + r * dir120, cap_a + r * dir240,
              cap_b + r * dir0]
    ds, ps, fs = [], [], []
    for p in points:
        sd, n = _hfield_point_at(hpos, hmat, hsize, nrow, ncol, data, p)
        ds.append(sd)
        ps.append(p - n * (0.5 * sd))
        fs.append(make_frame(n))
    return jnp.stack(ds), jnp.stack(ps), jnp.stack(fs)


def _plane_mesh(ppos, pmat, mpos, mmat, verts):
    """Plane vs convex mesh: contact lanes on the 4 deepest hull vertices.

    TPU-native design note: MuJoCo's plane-convex narrowphase emits a
    state-dependent subset of penetrating vertices; here the lane count is
    static (top-4 by depth, inactive lanes masked by dist > margin), which
    keeps shapes fixed under jit/vmap.  For hulls resting on a face this
    reproduces the physically meaningful support polygon.
    """
    n = pmat[:, 2]
    vw = mpos + verts @ mmat.T  # (nvert, 3) world-frame hull vertices
    dist = (vw - ppos) @ n
    negd, idx = jax.lax.top_k(-dist, 4)
    dsel = -negd
    pos = vw[idx] - 0.5 * dsel[:, None] * n
    frame = jnp.broadcast_to(make_frame(n), (4, 3, 3))
    return dsel, pos, frame


def collision(model: Model, d: Data) -> Data:
    """Run narrowphase over all candidate pairs, filling fixed contact lanes
    in the model's flattened pair order."""
    if model.npair == 0 or model.opt.disable_contact:
        return d

    dists, poss, frames = [], [], []
    offset = 0
    for (t1, t2, pairs) in model.pair_groups:
        key = (GeomType(t1), GeomType(t2))
        if key == (GeomType.PLANE, GeomType.MESH):
            # meshes carry per-geom vertex sets, so this group runs one
            # narrowphase call per pair (meshes are few; the deepest-4
            # vertex selection keeps the lane count static)
            for (g1, g2) in pairs:
                mid = model.geom_dataid[g2]
                adr, num = model.mesh_vertadr[mid], model.mesh_vertnum[mid]
                verts = jnp.asarray(
                    model.mesh_vert[adr : adr + num], dtype=d.qpos.dtype
                )
                dist, pos, frame = _plane_mesh(
                    d.geom_xpos[g1], d.geom_xmat[g1],
                    d.geom_xpos[g2], d.geom_xmat[g2], verts,
                )
                dists.append(dist)
                poss.append(pos)
                frames.append(frame)
                offset += dist.shape[0]
            continue
        _HF = {
            GeomType.SPHERE: _hfield_sphere,
            GeomType.CAPSULE: _hfield_capsule,
        }
        _HF_PRISM = (GeomType.BOX, GeomType.ELLIPSOID, GeomType.CYLINDER)
        if key[0] == GeomType.HFIELD and (key[1] in _HF
                                          or key[1] in _HF_PRISM):
            for (g1, g2) in pairs:
                hid = model.geom_dataid[g1]
                nrow = model.hfield_nrow[hid]
                ncol = model.hfield_ncol[hid]
                adr = model.hfield_adr[hid]
                data = jnp.asarray(
                    model.hfield_data[adr : adr + nrow * ncol],
                    dtype=d.qpos.dtype,
                ).reshape(nrow, ncol)
                hsize = jnp.asarray(model.hfield_size[hid],
                                    dtype=d.qpos.dtype)
                if key[1] in _HF_PRISM:
                    dist, pos, frame = _hfield_prism_mpr(
                        model, d, g1, g2, hsize, nrow, ncol, data
                    )
                else:
                    dist, pos, frame = _HF[key[1]](
                        d.geom_xpos[g1], d.geom_xmat[g1], hsize, nrow,
                        ncol, data, d.geom_xpos[g2], d.geom_xmat[g2],
                        model.geom_size[g2],
                    )
                dists.append(dist)
                poss.append(pos)
                frames.append(frame)
                offset += dist.shape[0]
            continue
        if key not in _PRIMS:
            if key[0] in _CONVEX_TYPES and key[1] in _CONVEX_TYPES:
                # generic convex-convex narrowphase (MPR over supports)
                for (g1, g2) in pairs:
                    dist, pos, frame = _mpr_pair(model, d, g1, g2)
                    dists.append(dist)
                    poss.append(pos)
                    frames.append(frame)
                    offset += dist.shape[0]
                continue
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


def geom_distance(model: Model, d: Data, g1: int, g2: int):
    """(dist, p1, p2): smallest signed distance between two geoms plus the
    witness points on each surface (mj_geomDistance analog, serving the
    geomdist/geomnormal/geomfromto sensors).  Uses the bespoke narrowphase
    for supported type pairs and the MPR routine for other convex-convex
    pairs; multi-lane narrowphases report their minimum-distance lane."""
    t1 = GeomType(model.geom_type[g1])
    t2 = GeomType(model.geom_type[g2])
    flip = False
    if (t1, t2) not in _PRIMS and (t2, t1) in _PRIMS:
        g1, g2 = g2, g1
        t1, t2 = t2, t1
        flip = True
    if (t1, t2) in _PRIMS:
        fn = _PRIMS[(t1, t2)]
        dist, pos, frame = fn(
            d.geom_xpos[g1], d.geom_xmat[g1], model.geom_size[g1],
            d.geom_xpos[g2], d.geom_xmat[g2], model.geom_size[g2],
        )
    elif t1 in _CONVEX_TYPES and t2 in _CONVEX_TYPES:
        dist, pos, frame = _mpr_pair(model, d, g1, g2)
    else:
        raise NotImplementedError(
            f"geom distance for pair {t1.name}-{t2.name}"
        )
    k = jnp.argmin(dist)
    dmin = dist[k]
    p = pos[k]
    n = frame[k, 0]
    p1 = p - 0.5 * dmin * n
    p2 = p + 0.5 * dmin * n
    if flip:
        p1, p2 = p2, p1
    return dmin, p1, p2
