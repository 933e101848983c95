"""Simulation state: the TPU-native analog of MuJoCo's ``mjData``.

The reference owns one mutable ``mjData`` per environment
(/root/reference/src/physics.rs:6-9) and mutates it through ``mj_step``.
Here the state is an immutable pytree updated functionally; a batch of
environments is the same pytree with a leading env axis (via ``jax.vmap``),
sharded across devices with ``NamedSharding`` on that axis.

``make_data`` is the analog of ``mj_makeData`` (physics.rs:14,22) and
``reset_data`` of ``mj_resetData`` (physics.rs:52-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .model import Model
from .utils.struct import pytree_dataclass


@pytree_dataclass
class Contact:
    """Active contact slots (fixed-size: one lane per candidate pair point).

    ``dist > includemargin`` lanes are inactive (mask), the batched analog of
    MuJoCo's variable-length mjContact list.
    """

    dist: jax.Array          # (ncon,)
    pos: jax.Array           # (ncon, 3)
    frame: jax.Array         # (ncon, 3, 3) rows: normal, tangent1, tangent2
    includemargin: jax.Array # (ncon,)
    friction: jax.Array      # (ncon, 5)
    solref: jax.Array        # (ncon, 2)
    solimp: jax.Array        # (ncon, 5)
    geom1: jax.Array         # (ncon,) int32 (static per model, kept for API)
    geom2: jax.Array         # (ncon,) int32


@pytree_dataclass
class Data:
    """Complete per-env simulation state + derived quantities.

    Core (carried) fields come first; everything below `xpos` is derived by
    the forward pipeline and can be recomputed from the core fields.
    """

    # ----- core state (the checkpoint surface; SURVEY.md §5.4) -----
    time: jax.Array            # ()
    qpos: jax.Array            # (nq,)
    qvel: jax.Array            # (nv,)
    act: jax.Array             # (na,)
    ctrl: jax.Array            # (nu,)
    qacc_warmstart: jax.Array  # (nv,)
    qfrc_applied: jax.Array    # (nv,)
    xfrc_applied: jax.Array    # (nbody, 6) [force; torque] at body com
    mocap_pos: jax.Array       # (nmocap, 3)
    mocap_quat: jax.Array      # (nmocap, 4)
    eq_active: jax.Array       # (neq,) bool

    # ----- position stage -----
    xpos: jax.Array            # (nbody, 3)
    xquat: jax.Array           # (nbody, 4)
    xmat: jax.Array            # (nbody, 3, 3)
    xipos: jax.Array           # (nbody, 3)
    ximat: jax.Array           # (nbody, 3, 3)
    xanchor: jax.Array         # (njnt, 3)
    xaxis: jax.Array           # (njnt, 3)
    geom_xpos: jax.Array       # (ngeom, 3)
    geom_xmat: jax.Array       # (ngeom, 3, 3)
    site_xpos: jax.Array       # (nsite, 3)
    site_xmat: jax.Array       # (nsite, 3, 3)
    cam_xpos: jax.Array        # (ncam, 3)
    cam_xmat: jax.Array        # (ncam, 3, 3)
    subtree_com: jax.Array     # (nbody, 3)
    cinert_i: jax.Array        # (nbody, 3, 3) spatial inertia (rot part)
    cinert_h: jax.Array        # (nbody, 3)    spatial inertia (m * com offset)
    cdof: jax.Array            # (nv, 6)
    qM: jax.Array              # (nv, nv) dense joint-space inertia

    # ----- velocity stage -----
    cvel: jax.Array            # (nbody, 6)
    cdof_dot: jax.Array        # (nv, 6)
    qfrc_bias: jax.Array       # (nv,)
    qfrc_passive: jax.Array    # (nv,)

    # ----- actuation -----
    actuator_length: jax.Array   # (nu,)
    actuator_velocity: jax.Array # (nu,)
    actuator_force: jax.Array    # (nu,)
    act_dot: jax.Array           # (na,) activation-state derivative
    qfrc_actuator: jax.Array     # (nv,)

    # ----- acceleration -----
    qfrc_smooth: jax.Array     # (nv,)
    qacc_smooth: jax.Array     # (nv,)

    # ----- constraints -----
    contact: Contact
    nefc_active: jax.Array     # () int32: number of active efc rows
    qfrc_constraint: jax.Array # (nv,)
    qacc: jax.Array            # (nv,)
    # per-lane world [torque; force] on geom2's body at the contact point;
    # populated only when the model has touch/force/torque sensors
    contact_force: jax.Array   # (ncon, 6)

    # ----- sensors -----
    sensordata: jax.Array      # (nsensordata,)
    # per-limit-row (pos - margin, vel, force); populated only when the
    # model has jointlimit*/tendonlimit* sensors (constraint.limit_row_map
    # defines the row order)
    efc_limit: jax.Array       # (nlimitrow, 3)

    # ----- solver observability (SURVEY.md §5.5) -----
    solver_cost: jax.Array     # () final constraint-solver cost
    solver_gradnorm: jax.Array # () |grad| at the returned iterate
    solver_niter: jax.Array    # () int32 iterations-to-tolerance (Newton)

    @property
    def ncon(self) -> int:
        return self.contact.dist.shape[-1]


def _n_limit_rows(model: Model) -> int:
    from .physics.constraint import n_limit_rows

    return n_limit_rows(model)


def _ncon_slots(model: Model) -> int:
    """Fixed number of contact lanes: sum of max contacts per candidate pair."""
    from .physics.collision import max_contacts_per_pair

    return sum(
        max_contacts_per_pair(t1, t2) * len(pairs)
        for (t1, t2, pairs) in model.pair_groups
    )


def make_data(model: Model) -> Data:
    """Allocate a zero-initialized state with qpos = qpos0 (mj_makeData +
    mj_resetData semantics; reference physics.rs:14,52-54)."""
    dtype = model.qpos0.dtype
    z = lambda *shape: jnp.zeros(shape, dtype=dtype)
    nbody, nv, njnt = model.nbody, model.nv, model.njnt
    ncon = _ncon_slots(model)

    # mocap bodies initialize to their model pose
    mocap_pos = []
    mocap_quat = []
    for b in range(nbody):
        if model.body_mocapid[b] >= 0:
            mocap_pos.append(model.body_pos[b])
            mocap_quat.append(model.body_quat[b])
    mocap_pos = (
        jnp.stack(mocap_pos) if mocap_pos else jnp.zeros((0, 3), dtype=dtype)
    )
    mocap_quat = (
        jnp.stack(mocap_quat) if mocap_quat else jnp.zeros((0, 4), dtype=dtype)
    )

    ident = jnp.zeros((nbody, 4), dtype=dtype).at[:, 0].set(1.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nbody, 3, 3))

    contact = Contact(
        dist=jnp.full((ncon,), 1e10, dtype=dtype),
        pos=z(ncon, 3),
        frame=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (ncon, 3, 3)),
        includemargin=z(ncon),
        friction=jnp.ones((ncon, 5), dtype=dtype),
        solref=z(ncon, 2),
        solimp=z(ncon, 5),
        geom1=jnp.zeros((ncon,), dtype=jnp.int32),
        geom2=jnp.zeros((ncon,), dtype=jnp.int32),
    )

    return Data(
        time=jnp.zeros((), dtype=dtype),
        qpos=jnp.asarray(model.qpos0, dtype=dtype),
        qvel=z(nv),
        act=z(model.na),
        ctrl=z(model.nu),
        qacc_warmstart=z(nv),
        qfrc_applied=z(nv),
        xfrc_applied=z(nbody, 6),
        mocap_pos=mocap_pos,
        mocap_quat=mocap_quat,
        eq_active=jnp.array(model.eq_active0, dtype=bool).reshape(model.neq),
        xpos=z(nbody, 3),
        xquat=ident,
        xmat=eye,
        xipos=z(nbody, 3),
        ximat=eye,
        xanchor=z(njnt, 3),
        xaxis=z(njnt, 3),
        geom_xpos=z(model.ngeom, 3),
        geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (model.ngeom, 3, 3)),
        site_xpos=z(model.nsite, 3),
        site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (model.nsite, 3, 3)),
        cam_xpos=z(model.ncam, 3),
        cam_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (model.ncam, 3, 3)),
        subtree_com=z(nbody, 3),
        cinert_i=z(nbody, 3, 3),
        cinert_h=z(nbody, 3),
        cdof=z(nv, 6),
        qM=z(nv, nv),
        cvel=z(nbody, 6),
        cdof_dot=z(nv, 6),
        qfrc_bias=z(nv),
        qfrc_passive=z(nv),
        actuator_length=z(model.nu),
        actuator_velocity=z(model.nu),
        actuator_force=z(model.nu),
        act_dot=z(model.na),
        qfrc_actuator=z(nv),
        qfrc_smooth=z(nv),
        qacc_smooth=z(nv),
        contact=contact,
        nefc_active=jnp.zeros((), dtype=jnp.int32),
        qfrc_constraint=z(nv),
        qacc=z(nv),
        contact_force=z(ncon, 6),
        sensordata=z(model.nsensordata),
        efc_limit=z(_n_limit_rows(model), 3),
        solver_cost=jnp.zeros((), dtype=dtype),
        solver_gradnorm=jnp.zeros((), dtype=dtype),
        solver_niter=jnp.zeros((), dtype=jnp.int32),
    )


def reset_data(model: Model, data: Data) -> Data:
    """Restore model defaults, preserving nothing but the batch shape and
    dtype of `data` (mj_resetData semantics: qpos <- qpos0,
    qvel/ctrl/time/warmstart <- 0; reference physics.rs:52-54).  Called on a
    batched Data (leading env axes), every env lane is reset.
    """
    fresh = make_data(model)
    return jax.tree.map(
        lambda f, d: jnp.broadcast_to(f.astype(d.dtype), d.shape), fresh, data
    )


def reset_data_keyframe(model: Model, data: Data, key: int | str) -> Data:
    """mj_resetDataKeyframe analog: reset, then load qpos/qvel/act/ctrl/time
    from model keyframe ``key`` (index or name).  Batched Data resets every
    env lane to the keyframe."""
    if isinstance(key, str):
        idx = model.name2id("keyframe", key)
        if idx < 0:
            from .api.errors import NameNotFoundError

            raise NameNotFoundError(f"keyframe {key!r} not found")
        key = idx
    if not 0 <= key < model.nkey:
        raise IndexError(f"keyframe index {key} out of range [0, {model.nkey})")
    d = reset_data(model, data)
    dtype = d.qpos.dtype

    def bc(arr, like):
        return jnp.broadcast_to(jnp.asarray(arr, dtype=like.dtype), like.shape)

    return d.replace(
        time=bc(jnp.asarray(model.key_time[key], dtype=dtype), d.time),
        qpos=bc(model.key_qpos[key], d.qpos),
        qvel=bc(model.key_qvel[key], d.qvel),
        act=bc(model.key_act[key], d.act),
        ctrl=bc(model.key_ctrl[key], d.ctrl),
    )
