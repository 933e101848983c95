"""Quaternion and 6D spatial-vector algebra (MuJoCo conventions).

Conventions (matching the MuJoCo C engine the reference delegates to via
``rusty_mujoco::mj_step`` — /root/reference/src/physics.rs:44-46):

* Quaternions are ``(w, x, y, z)`` scalar-first unit quaternions.
* Rotation matrices map body frame -> world frame.
* 6D spatial (motion/force) vectors are ``[angular(3); linear(3)]``, the
  layout MuJoCo uses for ``cvel`` / ``cdof`` / ``cacc``.
* Spatial inertias are expressed about a chosen frame origin in world
  orientation as the triple ``(I0: 3x3, h: 3, m: scalar)`` with
  ``h = m * (com - origin)``.

All functions are pure, trace-safe, and shape-polymorphic over leading batch
axes only where noted; the engine applies batching with ``jax.vmap`` at the
environment layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u * v for (w, x, y, z) quaternions."""
    w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 0.0) -> jax.Array:
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Guard the zero quaternion: return identity instead of NaN.
    safe = jnp.where(norm > eps, norm, 1.0)
    out = q / safe
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(norm > eps, out, ident)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (body->world if q is a body quat)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (body->world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (w, x, y, z).

    Branch-free Shepperd-style construction: compute all four candidate
    quaternions and select the numerically best by largest pivot.
    """
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Candidate 0: pivot on trace
    q0 = jnp.stack(
        [
            1.0 + tr,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    q2 = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    q3 = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    pivots = jnp.stack(
        [tr, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1
    )
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0 (MuJoCo convention for mju_mat2Quat output sign
    # is not guaranteed; canonicalize for test stability).
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion (mju_axisAngle2Quat)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jax.Array, w_local: jax.Array, dt) -> jax.Array:
    """mju_quatIntegrate: q_new = q * exp(0.5 * w_local * dt).

    ``w_local`` is the angular velocity expressed in the local (joint/body)
    frame, matching MuJoCo's qvel convention for ball and free joints.
    """
    angle = jnp.linalg.norm(w_local, axis=-1)
    # Safe normalization for near-zero angular velocity.
    safe = jnp.where(angle > 0, angle, 1.0)
    axis = w_local / safe[..., None]
    theta = angle * dt
    dq = axis_angle_to_quat(axis, theta)
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    dq = jnp.where((angle > 0)[..., None], dq, ident)
    return quat_normalize(quat_mul(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """mju_subQuat: 3D velocity v such that qb * exp(v/2) = qa (local frame)."""
    qdif = quat_mul(quat_conj(qb), qa)
    # log map
    qdif = qdif * jnp.where(qdif[..., :1] < 0, -1.0, 1.0)
    sin_a_2 = jnp.linalg.norm(qdif[..., 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(sin_a_2, qdif[..., 0])
    safe = jnp.where(sin_a_2 > 0, sin_a_2, 1.0)
    axis = qdif[..., 1:] / safe[..., None]
    return jnp.where((sin_a_2 > 0)[..., None], axis * angle[..., None], jnp.zeros_like(qdif[..., 1:]))


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> 3x3 cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# 6D spatial vectors: [angular; linear]
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial cross product v x m for motion vectors (mju_crossMotion)."""
    w, l = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(l, mw)], axis=-1
    )


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial cross product v x* f for force vectors (mju_crossForce)."""
    w, l = v[..., :3], v[..., 3:]
    fa, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fa) + jnp.cross(l, fl), jnp.cross(w, fl)], axis=-1
    )


def inertia_mul_motion(
    i0: jax.Array, h: jax.Array, m: jax.Array, v: jax.Array
) -> jax.Array:
    """Apply spatial inertia (I0, h, m) to motion [w; v] -> force [t; f].

    t = I0 w + h x v_lin ;  f = m v_lin - h x w
    """
    w, vl = v[..., :3], v[..., 3:]
    t = jnp.einsum("...ij,...j->...i", i0, w) + jnp.cross(h, vl)
    f = m[..., None] * vl - jnp.cross(h, w)
    return jnp.concatenate([t, f], axis=-1)


def spatial_inertia(
    mass: jax.Array, inert_diag: jax.Array, ipos: jax.Array, imat: jax.Array,
    origin: jax.Array,
):
    """Build (I0, h, m) about `origin` (world) for a body.

    mass: scalar; inert_diag: (3,) principal inertia; ipos: world com
    position; imat: world orientation of the principal-inertia frame.
    Uses the parallel-axis theorem: I0 = R diag(i) R^T + m (c.c 1 - c c^T).
    """
    c = ipos - origin
    i_c = jnp.einsum(
        "...ij,...j,...kj->...ik", imat, inert_diag, imat
    )
    cc = jnp.einsum("...i,...j->...ij", c, c)
    c2 = jnp.sum(c * c, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=i_c.dtype)
    i0 = i_c + mass[..., None, None] * (c2 * eye - cc)
    h = mass[..., None] * c
    return i0, h, mass


def transform_motion(v: jax.Array, offset: jax.Array) -> jax.Array:
    """Shift the reference origin of a motion vector to new = old + offset.

    The linear part of a spatial motion vector is the velocity of the
    body-fixed point coincident with the origin, so
    lin' = lin + ang x (new - old) = lin + ang x offset.
    """
    w, l = v[..., :3], v[..., 3:]
    return jnp.concatenate([w, l + jnp.cross(w, offset)], axis=-1)


def cholesky_unrolled(a: jax.Array) -> jax.Array:
    """Lower-Cholesky factor of a small SPD matrix, fully unrolled.

    XLA's native Cholesky lowers to a While loop with ~ms latency per call
    on TPU — catastrophic inside the Newton iteration chain.  For the small
    static nv of control models (<= ~30) an unrolled scalar graph fuses into
    a handful of elementwise kernels over the env batch under vmap.
    """
    n = a.shape[-1]
    assert a.ndim == 2, "unbatched (n, n); batch via vmap"
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        l[j][j] = jnp.sqrt(s)
        inv = 1.0 / l[j][j]
        for i in range(j + 1, n):
            s = a[i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
        for i in range(j):
            l[i][j] = jnp.zeros((), dtype=a.dtype)
    return jnp.stack([jnp.stack(row) for row in l])


def cho_solve_unrolled(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given the unrolled lower-Cholesky factor of A."""
    n = l.shape[-1]
    assert b.ndim == 1
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i, k] * y[k]
        y[i] = s / l[i, i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k, i] * x[k]
        x[i] = s / l[i, i]
    return jnp.stack(x)


# Above this size the unrolled scalar graph bloats trace/compile time more
# than it saves at runtime; fall back to the library factorization.
UNROLL_CHOLESKY_MAX_N = 16


def solve_pd_unrolled(a: jax.Array, b: jax.Array) -> jax.Array:
    """x = A^-1 b for small SPD A; unrolled below UNROLL_CHOLESKY_MAX_N."""
    if a.shape[-1] <= UNROLL_CHOLESKY_MAX_N:
        return cho_solve_unrolled(cholesky_unrolled(a), b)
    return jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(a), True), b
    )


def transform_force(f: jax.Array, offset: jax.Array) -> jax.Array:
    """Shift the reference origin of a force vector to new = old + offset.

    torque' = torque + (old - new) x force = torque - offset x force.
    """
    t, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([t - jnp.cross(offset, fl), fl], axis=-1)
