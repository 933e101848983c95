"""Auxiliary subsystems: checkpoint/resume, divergence flags + auto-reset
recovery (fault injection), profiling meter (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from oxide_control_tpu import suite
from oxide_control_tpu.physics import forward as fwd
from oxide_control_tpu.state import make_data
from oxide_control_tpu.utils import checkpoint as ckpt
from oxide_control_tpu.utils.divergence import divergence_flags


def test_checkpoint_exact_resume(tmp_path):
    env = suite.load("cartpole", "swingup")
    data, _ = env.reset(jax.random.PRNGKey(0))
    for i in range(5):
        data, _ = env.step(data, jnp.ones(1) * 0.3)

    path = os.path.join(tmp_path, "ck.npz")
    ckpt.save(path, data, rng=jax.random.PRNGKey(42))
    restored, rng = ckpt.load(path, env.model)
    assert rng is not None

    # continuation must be bit-identical
    d1, ts1 = env.step(data, jnp.ones(1) * -0.2)
    d2, ts2 = env.step(restored, jnp.ones(1) * -0.2)
    np.testing.assert_array_equal(np.asarray(d1.qpos), np.asarray(d2.qpos))
    np.testing.assert_array_equal(np.asarray(d1.qvel), np.asarray(d2.qvel))
    np.testing.assert_array_equal(
        np.asarray(ts1.observation), np.asarray(ts2.observation)
    )


def test_divergence_flags_and_recovery():
    """Fault injection: force NaN into selected env lanes; the batched step
    must flag them and auto-reset recovers them (SURVEY.md §5.3)."""
    benv = suite.load_batched("pendulum", "swingup", 4, dtype=np.float64)
    rng = jax.random.PRNGKey(0)
    data, _ = benv.reset(rng)
    # inject NaN into lane 2
    bad_qvel = np.asarray(data.qvel).copy()
    bad_qvel[2] = np.nan
    data = data.replace(qvel=jnp.asarray(bad_qvel))

    flags = jax.vmap(lambda d: divergence_flags(benv.model, d))(data)
    np.testing.assert_array_equal(np.asarray(flags), [False, False, True, False])

    data, ts = benv.step(data, jnp.zeros((4, 1)), jax.random.PRNGKey(1))
    done = np.asarray(ts.done)
    assert done[2]
    # recovered lane is reinitialized with finite state
    assert np.all(np.isfinite(np.asarray(data.qvel)))
    # healthy lanes unaffected
    assert not done[0] and not done[1] and not done[3]


def test_divergence_maxval_bounds():
    env = suite.load("pendulum", "swingup")
    data, _ = env.reset(jax.random.PRNGKey(0))
    data = data.replace(qvel=jnp.full_like(data.qvel, 1e12))
    assert bool(divergence_flags(env.model, data))


def test_step_rate_meter():
    from oxide_control_tpu.utils.profiling import StepRateMeter

    m = StepRateMeter()
    m.add(1000)
    assert m.rate > 0


def test_reset_data_batched_shapes():
    """reset_data on a batched Data must keep the batch shape (VERDICT r1
    weak #4: it used to return an unbatched fresh state)."""
    import jax.numpy as jnp
    from oxide_control_tpu.state import make_data, reset_data
    from oxide_control_tpu.suite.common import load_asset

    m = load_asset("cheetah")
    d = make_data(m)
    dB = jax.vmap(lambda _: d)(jnp.arange(5))
    dB = dB.replace(qpos=dB.qpos + 1.0, time=dB.time + 3.0)
    out = reset_data(m, dB)
    assert out.qpos.shape == dB.qpos.shape
    assert out.time.shape == (5,)
    np.testing.assert_allclose(
        np.asarray(out.qpos), np.tile(np.asarray(m.qpos0), (5, 1))
    )
    np.testing.assert_allclose(np.asarray(out.time), 0.0)
    # unbatched stays unbatched
    out1 = reset_data(m, d.replace(qvel=d.qvel + 2.0))
    assert out1.qvel.shape == d.qvel.shape
    np.testing.assert_allclose(np.asarray(out1.qvel), 0.0)


def test_checked_step_flags_nan():
    """checkify sanitizer (SURVEY.md §5.2): a NaN injected into qvel must
    surface as a checkify error naming the stage, not propagate silently."""
    from oxide_control_tpu.utils.debug import checked_step
    from oxide_control_tpu.suite.common import load_asset

    # pendulum: checkify rewrites every primitive in the step graph, so
    # keep the guarded model small (cheetah takes minutes to transform)
    m = load_asset("pendulum")
    d = make_data(m)
    fn = jax.jit(checked_step(m))
    err, out = fn(d)
    err.throw()  # clean state: no error
    bad = d.replace(qvel=d.qvel.at[0].set(jnp.nan))
    err, out = fn(bad)
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised, "checkify did not flag an injected NaN"


def test_dtype_matrix_f32_vs_f64():
    """Precision matrix (SURVEY.md §5.2): the f32 step must track the f64
    step within single-precision tolerances over a short contact-rich
    rollout (walker)."""
    from oxide_control_tpu.suite.common import load_asset

    results = {}
    for dtype in (np.float64, np.float32):
        m = load_asset("walker", dtype=dtype)
        d = make_data(m)
        d = d.replace(
            qpos=d.qpos.at[0].add(jnp.asarray(-0.3, dtype=d.qpos.dtype))
        )
        step = jax.jit(lambda dd, mm=m: fwd.step(mm, dd))
        for _ in range(50):
            d = step(d)
        results[np.dtype(dtype).name] = np.asarray(d.qpos, np.float64)
        assert d.qpos.dtype == dtype
    err = np.max(np.abs(results["float32"] - results["float64"]))
    assert err < 5e-3, err  # contact-rich f32 noise floor


def test_solver_observability_stats():
    """SURVEY.md §5.5: the constraint solve reports iterations-to-tolerance
    and the residual norm on Data; Newton on a contact-rich state uses at
    least one productive iteration and no more than opt.iterations."""
    from oxide_control_tpu.suite.common import load_asset

    m = load_asset("walker")
    d = make_data(m)
    d = d.replace(qpos=d.qpos.at[0].add(jnp.asarray(-0.3, dtype=d.qpos.dtype)))
    d = jax.jit(lambda dd: fwd.step(mm := m, dd))(d)
    niter = int(d.solver_niter)
    assert 1 <= niter <= m.opt.iterations
    assert np.isfinite(float(d.solver_cost))
    assert np.isfinite(float(d.solver_gradnorm))


def test_efc_layout_traced_vs_concrete():
    """The efc row layout is trace-dependent (constraint._friction_dofs
    gives every dof a row when the model leaves are traced, only >0 dofs
    when concrete), but the physics must be identical: the extra traced
    rows are deactivated by the runtime exists mask (VERDICT r2 weak #5)."""
    from oxide_control_tpu import load_model_from_xml

    xml = """
    <mujoco>
      <option solver="Newton" iterations="8" tolerance="0"/>
      <worldbody>
        <body pos="0 0 1">
          <joint name="j1" type="hinge" axis="0 1 0" frictionloss="0.4"/>
          <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0" mass="1"/>
          <body pos="0.4 0 0">
            <joint name="j2" type="hinge" axis="0 1 0"/>
            <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0" mass="1"/>
          </body>
        </body>
      </worldbody>
    </mujoco>
    """
    m = load_model_from_xml(xml)
    d0 = make_data(m)
    d0 = d0.replace(qvel=jnp.asarray([0.7, -1.3], dtype=d0.qvel.dtype))

    closed = jax.jit(lambda d: fwd.forward(m, d))(d0)
    as_arg = jax.jit(lambda mm, d: fwd.forward(mm, d))(m, d0)
    np.testing.assert_allclose(
        np.asarray(closed.qacc), np.asarray(as_arg.qacc), rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(closed.qfrc_constraint),
        np.asarray(as_arg.qfrc_constraint), rtol=0, atol=1e-10,
    )


def test_rangefinder_plane_traced_model():
    """Regression (ADVICE r2 high): a rangefinder sensor plus a plane geom
    must not crash when the model is a traced jit argument (the finite-
    plane check used a python branch on a traced leaf)."""
    from oxide_control_tpu import load_model_from_xml

    xml = """
    <mujoco>
      <worldbody>
        <geom name="floor" type="plane" size="5 5 0.1"/>
        <body pos="0 0 1">
          <joint type="hinge" axis="0 1 0"/>
          <geom type="sphere" size="0.1" mass="1"/>
          <site name="rf" pos="0 0 0" euler="180 0 0"/>
        </body>
      </worldbody>
      <sensor><rangefinder site="rf"/></sensor>
    </mujoco>
    """
    m = load_model_from_xml(xml)
    d0 = make_data(m)
    out = jax.jit(lambda mm, d: fwd.forward(mm, d))(m, d0)  # must not raise
    # pointing straight down from z=1 at an infinite-extent check: the
    # plane has finite half-sizes 5x5, hit at (0,0) is inside
    np.testing.assert_allclose(np.asarray(out.sensordata)[0], 1.0, atol=1e-6)
