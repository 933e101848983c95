"""Quaternion / spatial algebra vs MuJoCo's mju_* reference implementations."""

import mujoco
import numpy as np
import pytest

from oxide_control_tpu.physics import maths

RNG = np.random.default_rng(0)


def rand_quat(n=1):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul():
    for _ in range(10):
        a, b = rand_quat()[0], rand_quat()[0]
        ref = np.zeros(4)
        mujoco.mju_mulQuat(ref, a, b)
        np.testing.assert_allclose(maths.quat_mul(a, b), ref, atol=1e-12)


def test_quat_rotate():
    for _ in range(10):
        q = rand_quat()[0]
        v = RNG.normal(size=3)
        ref = np.zeros(3)
        mujoco.mju_rotVecQuat(ref, v, q)
        np.testing.assert_allclose(maths.quat_rotate(q, v), ref, atol=1e-12)
        # inverse rotation round-trips
        np.testing.assert_allclose(
            maths.quat_rotate_inv(q, maths.quat_rotate(q, v)), v, atol=1e-12
        )


def test_quat_to_mat():
    for _ in range(10):
        q = rand_quat()[0]
        ref = np.zeros(9)
        mujoco.mju_quat2Mat(ref, q)
        np.testing.assert_allclose(
            np.asarray(maths.quat_to_mat(q)).ravel(), ref, atol=1e-12
        )


def test_mat_to_quat_roundtrip():
    for _ in range(20):
        q = rand_quat()[0]
        q = q * np.sign(q[0]) if q[0] != 0 else q
        m = maths.quat_to_mat(q)
        q2 = maths.mat_to_quat(np.asarray(m))
        np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-10)


def test_axis_angle():
    for _ in range(10):
        axis = RNG.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = RNG.uniform(-np.pi, np.pi)
        ref = np.zeros(4)
        mujoco.mju_axisAngle2Quat(ref, axis, angle)
        np.testing.assert_allclose(
            maths.axis_angle_to_quat(axis, angle), ref, atol=1e-12
        )


def test_quat_integrate():
    for _ in range(10):
        q = rand_quat()[0]
        w = RNG.normal(size=3)
        dt = 0.01
        ref = q.copy()
        mujoco.mju_quatIntegrate(ref, w, dt)
        np.testing.assert_allclose(maths.quat_integrate(q, w, dt), ref, atol=1e-10)
    # zero velocity: identity
    q = rand_quat()[0]
    np.testing.assert_allclose(maths.quat_integrate(q, np.zeros(3), 0.01), q, atol=1e-12)


def test_quat_sub():
    for _ in range(10):
        qa, qb = rand_quat()[0], rand_quat()[0]
        ref = np.zeros(3)
        mujoco.mju_subQuat(ref, qa, qb)
        np.testing.assert_allclose(maths.quat_sub(qa, qb), ref, atol=1e-10)


def test_motion_force_cross():
    # reference formulas (Featherstone, [ang; lin] layout — same as MuJoCo's
    # mju_crossMotion / mju_crossForce, which are not exposed in the bindings)
    for _ in range(5):
        v = RNG.normal(size=6)
        m = RNG.normal(size=6)
        ref_motion = np.concatenate(
            [np.cross(v[:3], m[:3]), np.cross(v[:3], m[3:]) + np.cross(v[3:], m[:3])]
        )
        np.testing.assert_allclose(maths.motion_cross(v, m), ref_motion, atol=1e-12)
        ref_force = np.concatenate(
            [np.cross(v[:3], m[:3]) + np.cross(v[3:], m[3:]), np.cross(v[:3], m[3:])]
        )
        np.testing.assert_allclose(maths.force_cross(v, m), ref_force, atol=1e-12)


def test_transform_roundtrip():
    v = RNG.normal(size=6)
    off = RNG.normal(size=3)
    v2 = maths.transform_motion(maths.transform_motion(v, off), -off)
    np.testing.assert_allclose(v2, v, atol=1e-12)
    f2 = maths.transform_force(maths.transform_force(v, off), -off)
    np.testing.assert_allclose(f2, v, atol=1e-12)


def test_spatial_inertia_energy():
    # kinetic energy 0.5 v^T I v must be invariant to the reference origin
    mass = np.array(2.5)
    inert = np.array([0.1, 0.2, 0.3])
    ipos = RNG.normal(size=3)
    imat = maths.quat_to_mat(rand_quat()[0])
    v_com = RNG.normal(size=6)

    def energy(origin):
        i0, h, m = maths.spatial_inertia(mass, inert, ipos, np.asarray(imat), origin)
        # motion vector referenced at `origin`
        v = maths.transform_motion(v_com, origin - ipos)
        f = maths.inertia_mul_motion(i0, h, m, v)
        return 0.5 * np.dot(np.asarray(v), np.asarray(f))

    e1 = energy(np.zeros(3))
    e2 = energy(RNG.normal(size=3))
    np.testing.assert_allclose(e1, e2, rtol=1e-10)
