"""Mesh geom support: asset compilation, exact hull mass properties, and
plane-mesh collision.

Model-level quantities (volume -> mass, com, principal inertia) are exact
integrals over the convex hull and are asserted against the MuJoCo oracle.
Trajectories are NOT golden-compared: MuJoCo's plane-convex narrowphase
emits a state-dependent vertex subset while ours uses static top-4-depth
lanes (documented in collision._plane_mesh), so contact timing differs by
design; the tests assert the physical invariants instead.
"""

import struct
import tempfile

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from oxide_control_tpu import load_model_from_xml
from oxide_control_tpu.api.errors import UnsupportedFeatureError
from oxide_control_tpu.physics import forward as fwd
from oxide_control_tpu.state import make_data

TETRA_VERTS = "0 0 0  0.2 0 0  0 0.2 0  0.07 0.07 0.2"

MESH_XML = f"""
<mujoco>
  <asset><mesh name="tetra" vertex="{TETRA_VERTS}"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="b" pos="0 0 0.3">
      <freejoint/>
      <geom name="g" type="mesh" mesh="tetra" mass="0.3"
            friction="0.8 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_mesh_mass_properties_golden():
    """Hull volume/com/principal inertia are exact integrals; must match
    the oracle to f64 precision (mjCMesh::Process analog)."""
    ref = mujoco.MjModel.from_xml_string(MESH_XML)
    m = load_model_from_xml(MESH_XML)
    np.testing.assert_allclose(float(m.body_mass[1]), ref.body_mass[1],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_inertia[1]),
                               ref.body_inertia[1], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(m.body_ipos[1]), ref.body_ipos[1],
                               atol=1e-10)
    assert m.nmesh == 1 and m.geom_dataid == (-1, 0)
    assert m.mesh_vertnum == (4,)
    # canonical vertices are com-centered: mass-weighted centroid at origin
    assert np.linalg.norm(np.mean(np.asarray(m.mesh_vert), axis=0)) < 0.2


def test_mesh_drop_settles():
    """Tetra dropped on the plane comes to rest on a face: finite state,
    small penetration, vanishing velocity (physical invariants; see module
    docstring for why this is not a golden trajectory)."""
    m = load_model_from_xml(MESH_XML)
    d = make_data(m)
    d = d.replace(qvel=d.qvel.at[:3].set(jnp.array([0.2, -0.1, -0.5])))
    step = jax.jit(lambda dd: fwd.step(m, dd))
    for _ in range(600):
        d = step(d)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    assert np.all(np.isfinite(qpos)) and np.all(np.isfinite(qvel))
    assert np.max(np.abs(qvel)) < 0.05, qvel
    # resting height: com above the plane by less than the hull radius,
    # and no deep penetration on the support vertices
    verts = np.asarray(m.mesh_vert)
    from oxide_control_tpu.physics import smooth

    d2 = smooth.kinematics(m, d)
    vw = np.asarray(d2.geom_xpos[1]) + verts @ np.asarray(d2.geom_xmat[1]).T
    assert vw[:, 2].min() > -5e-3, vw[:, 2].min()


def test_mesh_stl_roundtrip():
    """Binary STL loading produces the same hull as inline vertices."""
    verts = np.array([v for v in np.fromstring(TETRA_VERTS, sep=" ")]
                     ).reshape(-1, 3)
    # write a binary STL of the tetra's 4 faces
    faces = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    with tempfile.NamedTemporaryFile(suffix=".stl", delete=False) as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(faces)))
        for (a, b, c) in faces:
            f.write(struct.pack("<3f", 0, 0, 1))
            for vi in (a, b, c):
                f.write(struct.pack("<3f", *verts[vi]))
            f.write(struct.pack("<H", 0))
        path = f.name
    xml = f"""
<mujoco>
  <asset><mesh name="t" file="{path}"/></asset>
  <worldbody>
    <body name="b" pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="t" mass="0.3"/></body>
  </worldbody>
</mujoco>
"""
    m_stl = load_model_from_xml(xml)
    m_inl = load_model_from_xml(MESH_XML)
    np.testing.assert_allclose(np.asarray(m_stl.body_inertia[1]),
                               np.asarray(m_inl.body_inertia[1]), rtol=1e-6)


def test_mesh_nonplane_pair_supported():
    """Mesh-vs-sphere pairs compile and get an MPR contact lane (r3: the
    generic convex-convex narrowphase replaced the old compile-time
    rejection; dynamics goldens live in tests/test_mpr.py)."""
    xml = f"""
<mujoco>
  <asset><mesh name="t" vertex="{TETRA_VERTS}"/></asset>
  <worldbody>
    <body name="a" pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="t" mass="0.3"/></body>
    <body name="s" pos="0 0 2"><freejoint/>
      <geom type="sphere" size="0.1" mass="0.1"/></body>
  </worldbody>
</mujoco>
"""
    m = load_model_from_xml(xml)
    assert m.npair == 1
