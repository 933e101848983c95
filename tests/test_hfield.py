"""Height-field geom support: inline-elevation assets + sphere/capsule
narrowphase over the triangulated grid.

Contact-lane design (documented in collision._hfield_surface): one lane
per sphere / capsule end-cap against the triangle under the query point,
vs MuJoCo's prism decomposition emitting a state-dependent contact set —
so resting heights are compared loosely and dynamics tests assert the
physical invariants.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from oxide_control_tpu import load_model_from_xml
from oxide_control_tpu.api.errors import UnsupportedFeatureError
from oxide_control_tpu.physics import forward as fwd
from oxide_control_tpu.state import make_data

FLAT_XML = """
<mujoco>
  <asset>
    <hfield name="terrain" nrow="5" ncol="5" size="2 2 0.5 0.1"
            elevation="0 0 0 0 0  0 0 0 0 0  0 0 0 0 0  0 0 0 0 0  0 0 0 0 0"/>
  </asset>
  <worldbody>
    <geom name="ground" type="hfield" hfield="terrain"/>
    <body name="ball" pos="0.3 0.2 0.5">
      <freejoint/>
      <geom name="bg" type="sphere" size="0.1" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""

# a valley along the x axis: high at |x| edges, low in the middle
VALLEY_XML = """
<mujoco>
  <asset>
    <hfield name="valley" nrow="3" ncol="5" size="2 2 0.4 0.1"
            elevation="1 0.5 0 0.5 1  1 0.5 0 0.5 1  1 0.5 0 0.5 1"/>
  </asset>
  <worldbody>
    <geom name="ground" type="hfield" hfield="valley"
          friction="0.01 0.001 0.0001"/>
    <body name="ball" pos="-1.2 0 0.8">
      <freejoint/>
      <geom name="bg" type="sphere" size="0.1" mass="0.5"
            friction="0.01 0.001 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""

CAPSULE_XML = """
<mujoco>
  <asset>
    <hfield name="terrain" nrow="5" ncol="5" size="2 2 0.5 0.1"
            elevation="0 0 0 0 0  0 0 0 0 0  0 0 0 0 0  0 0 0 0 0  0 0 0 0 0"/>
  </asset>
  <worldbody>
    <geom name="ground" type="hfield" hfield="terrain"/>
    <body name="pill" pos="0 0 0.4">
      <freejoint/>
      <geom name="pg" type="capsule" size="0.08 0.2" mass="0.5"
            euler="0 90 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _settle(xml, nsteps):
    m = load_model_from_xml(xml)
    d = make_data(m)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    for _ in range(nsteps):
        d = step(d)
    return m, d


def test_hfield_compiles_and_normalizes():
    m = load_model_from_xml(VALLEY_XML)
    assert m.nhfield == 1
    assert m.hfield_nrow == (3,) and m.hfield_ncol == (5,)
    data = np.asarray(m.hfield_data).reshape(3, 5)
    assert data.max() == 1.0 and data.min() == 0.0
    assert m.geom_dataid[0] == 0
    # oracle agreement on the stored normalized grid
    ref = mujoco.MjModel.from_xml_string(VALLEY_XML)
    np.testing.assert_allclose(
        data.reshape(-1), ref.hfield_data, atol=1e-12
    )


def test_hfield_sphere_resting_height():
    """Flat hfield behaves as a plane at z=0: the sphere rests at ~r, and
    the oracle agrees within the contact-count-dependent penetration."""
    m, d = _settle(FLAT_XML, 500)
    assert np.all(np.isfinite(np.asarray(d.qpos)))
    z = float(d.qpos[2])
    assert abs(z - 0.1) < 5e-3, z

    ref = mujoco.MjModel.from_xml_string(FLAT_XML)
    rd = mujoco.MjData(ref)
    for _ in range(500):
        mujoco.mj_step(ref, rd)
    assert abs(z - rd.qpos[2]) < 5e-3, (z, rd.qpos[2])


def test_hfield_ball_rolls_to_valley():
    """A low-friction ball released on the valley wall ends up near the
    valley floor (x ~ 0) at the floor height — gradient and normal
    directions of the triangulated surface must be right for this."""
    m, d = _settle(VALLEY_XML, 3000)
    qpos = np.asarray(d.qpos)
    assert np.all(np.isfinite(qpos))
    assert abs(qpos[0]) < 0.6, qpos[:3]     # near the valley center line
    assert qpos[2] < 0.35, qpos[:3]         # down from the 0.8 drop height


def test_hfield_capsule_rests():
    m, d = _settle(CAPSULE_XML, 500)
    qpos = np.asarray(d.qpos)
    qvel = np.asarray(d.qvel)
    assert np.all(np.isfinite(qpos))
    assert abs(qpos[2] - 0.08) < 5e-3, qpos[:3]
    assert np.max(np.abs(qvel)) < 0.05


def test_hfield_unsupported_pair_rejected():
    # box/ellipsoid/cylinder joined the supported set in r4 (prism MPR);
    # mesh-vs-hfield remains the loud rejection
    xml = """
<mujoco>
  <asset>
    <hfield name="h" nrow="3" ncol="3" size="1 1 0.2 0.1"
            elevation="0 0 0 0 1 0 0 0 0"/>
    <mesh name="tet" vertex="0 0 0  0.1 0 0  0 0.1 0  0 0 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="h"/>
    <body pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="tet" mass="0.2"/></body>
  </worldbody>
</mujoco>
"""
    with pytest.raises(UnsupportedFeatureError):
        load_model_from_xml(xml)


# ---------------------------------------------------------------------------
# r4: trajectory goldens vs MuJoCo's prism narrowphase (VERDICT r3 next #5)
# ---------------------------------------------------------------------------

_GENTLE_ELEV = " ".join(
    str(round(0.5 + 0.5 * np.sin(i / 16 * 2 * np.pi)
              * np.cos(j / 16 * np.pi), 3))
    for j in range(17) for i in range(17)
)

_RIDGE_XML = """
<mujoco>
  <option timestep="0.002" solver="Newton" iterations="30" tolerance="0"/>
  <asset>
    <hfield name="terrain" nrow="9" ncol="9" size="1.5 1.5 0.18 0.1"
            elevation="0 .2 .4 .5 .4 .3 .2 .1 0
                       .1 .3 .5 .6 .5 .4 .3 .2 .1
                       .2 .4 .6 .8 .7 .5 .4 .3 .2
                       .3 .5 .8 1  .8 .6 .5 .4 .3
                       .2 .4 .7 .8 .6 .5 .4 .3 .2
                       .1 .3 .5 .6 .5 .4 .3 .2 .1
                       0 .2 .4 .5 .4 .3 .2 .1 0
                       0 .1 .2 .3 .2 .2 .1 0 0
                       0 0 .1 .2 .1 .1 0 0 0"/>
  </asset>
  <worldbody>
    <geom name="hf" type="hfield" hfield="terrain"/>
    <body name="box" pos="0.3 0.2 0.6">
      <joint type="free"/>
      <geom name="bx" type="box" size="0.12 0.1 0.08" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_hfield_storage_convention_golden():
    """Inline elevation rows are stored reversed (first line = max y) and
    cells triangulate along the (00)->(11) diagonal — both verified against
    mjModel.hfield_data and settled-contact positions.  This pins the
    storage so a silent regression cannot re-flip the field."""
    import mujoco

    ref = mujoco.MjModel.from_xml_string(_RIDGE_XML)
    m = load_model_from_xml(_RIDGE_XML)
    np.testing.assert_allclose(
        np.asarray(m.hfield_data),
        ref.hfield_data.ravel(), atol=1e-12,
    )


def test_hfield_box_gentle_golden():
    """Box + sphere on smooth terrain: windowed golden vs MuJoCo's prism
    narrowphase.  The prism-MPR lanes track MuJoCo to a few mm per
    25-step window on gentle fields."""
    import test_golden as tg

    xml = f"""
    <mujoco>
      <option timestep="0.002" solver="Newton" iterations="30"
              tolerance="0"/>
      <asset><hfield name="terrain" nrow="17" ncol="17"
              size="2 2 0.08 0.1" elevation="{_GENTLE_ELEV}"/></asset>
      <worldbody>
        <geom name="hf" type="hfield" hfield="terrain"/>
        <body name="box" pos="0.3 0.2 0.5">
          <joint type="free"/>
          <geom name="bx" type="box" size="0.12 0.1 0.08" mass="1"/>
        </body>
        <body name="ball" pos="-0.5 -0.5 0.5">
          <joint type="free"/>
          <geom type="sphere" size="0.1" mass="0.5"/>
        </body>
      </worldbody>
    </mujoco>
    """
    tg.compare_windowed(xml, 300, window=25, seed=3, tol=6e-3, vel_tol=1.0)


def test_hfield_box_ridged_golden():
    """Box dropped onto a sharp ridged field: windowed golden vs MuJoCo.
    The per-prism MPR lane matches MuJoCo's penetration depths to a few mm
    but reports a single deepest witness per prism where MuJoCo's multiCCD
    emits a contact polygon, so resting torques differ on sharp ridges —
    the bound reflects that documented gap (tests/ORACLE.md)."""
    import test_golden as tg

    tg.compare_windowed(_RIDGE_XML, 300, window=25, seed=3, tol=0.12,
                        vel_tol=8.0)


def test_hfield_capsule_ridge_golden():
    """Capsule bridging a ridge: windowed golden vs MuJoCo (the capsule
    endpoint+midpoint sampling vs MuJoCo's prism manifold)."""
    import test_golden as tg

    xml = _RIDGE_XML.replace(
        '<geom name="bx" type="box" size="0.12 0.1 0.08" mass="1"/>',
        '<geom name="bx" type="capsule" fromto="-0.3 0 0 0.3 0 0" '
        'size="0.06" mass="1"/>',
    )
    tg.compare_windowed(xml, 300, window=25, seed=5, tol=0.12, vel_tol=8.0)
