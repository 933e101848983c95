"""Physics handle: the TPU-native analog of the reference's L2 wrapper
(``struct Physics {model, data}``, /root/reference/src/physics.rs:6-9).

The hot path of this engine is the *functional* API
(``physics.forward.step(model, data)``); this class is the ergonomic
object-style surface matching the reference contract: constructors from MJCF
(physics.rs:12-24), simulation verbs step/forward/reset (physics.rs:44-54),
name<->id lookup (physics.rs:56-62), the ``Actuators`` write-proxy
(physics.rs:65-79), and the full family of typed state accessors
(physics.rs:81-171) with the same failure vocabulary (error.rs:3-15).

The handle holds an immutable ``Data`` pytree and replaces it on mutation —
a thin mutable shell over pure functions, safe to use interactively and in
host-side loops.  It operates on a single unbatched env; batched lockstep
simulation goes through ``oxide_control_tpu.api.environment``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..model import JointType, Model
from ..physics import forward as _forward
from ..physics import maths
from ..state import Data, make_data
from .errors import (
    ActuatorStatelessError,
    BodyNotMocapError,
    JointTypeError,
    NameNotFoundError,
    PluginStatelessError,
)

# divergence bounds, mirroring the mjMAXVAL/mjMINVAL re-export at
# /root/reference/src/physics.rs:2
MAXVAL = 1e10
MINVAL = 1e-15


class Actuators:
    """Write-proxy over a Physics exposing only control writes — the sole
    capability handed to Action.apply (reference physics.rs:65-72,
    lib.rs:23-26)."""

    def __init__(self, physics: "Physics"):
        self._physics = physics

    def set(self, actuator, control) -> None:
        """Set one actuator's control by name or index
        (reference Actuators::set, physics.rs:69-71)."""
        idx = self._physics._resolve("actuator", actuator)
        d = self._physics.data
        self._physics._data = d.replace(ctrl=d.ctrl.at[idx].set(control))

    def set_all(self, controls) -> None:
        """Vector write of the full ctrl array."""
        d = self._physics.data
        self._physics._data = d.replace(
            ctrl=jnp.asarray(controls, dtype=d.ctrl.dtype)
        )


class Physics:
    """Single-env physics handle over (Model, Data)."""

    def __init__(self, model: Model, data: Data | None = None):
        self._model = model
        self._data = data if data is not None else make_data(model)
        self._step_fn = jax.jit(_forward.step)
        self._forward_fn = jax.jit(_forward.forward)

    # -- constructors (reference physics.rs:12-24) --------------------------

    @classmethod
    def from_xml(cls, path: str | os.PathLike, dtype=np.float64) -> "Physics":
        from ..mjcf.compile import load_model  # deferred: avoids import cycle

        return cls(load_model(path, dtype=dtype))

    @classmethod
    def from_xml_string(cls, xml: str, dtype=np.float64) -> "Physics":
        from ..mjcf.compile import load_model_from_xml

        return cls(load_model_from_xml(xml, dtype=dtype))

    # -- raw access (reference physics.rs:26-42) ----------------------------

    @property
    def model(self) -> Model:
        return self._model

    @property
    def data(self) -> Data:
        return self._data

    @data.setter
    def data(self, value: Data) -> None:
        self._data = value

    # -- simulation verbs (reference physics.rs:44-54) ----------------------

    def step(self) -> None:
        """Advance one timestep (mj_step analog; physics.rs:44-46)."""
        self._data = self._step_fn(self._model, self._data)

    def forward(self) -> None:
        """Recompute derived quantities without advancing time (mj_forward
        analog; physics.rs:48-50). Use after manual state writes."""
        self._data = self._forward_fn(self._model, self._data)

    def reset(self, keyframe: int | str | None = None) -> None:
        """Restore model defaults (mj_resetData analog; physics.rs:52-54),
        or load a model keyframe (mj_resetDataKeyframe analog) when
        ``keyframe`` names one."""
        if keyframe is None:
            self._data = make_data(self._model)
        else:
            from ..state import reset_data_keyframe

            self._data = reset_data_keyframe(
                self._model, make_data(self._model), keyframe
            )

    # -- name <-> id (reference physics.rs:56-62) ---------------------------

    def object_id(self, objtype: str, name: str) -> int | None:
        idx = self._model.name2id(objtype, name)
        return idx if idx >= 0 else None

    def object_name(self, objtype: str, idx: int) -> str:
        return self._model.id2name(objtype, idx)

    def _resolve(self, objtype: str, key) -> int:
        if isinstance(key, str):
            idx = self._model.name2id(objtype, key)
            if idx < 0:
                raise NameNotFoundError(objtype, key)
            return idx
        return int(key)

    # -- actuators proxy (reference physics.rs:65-79) -----------------------

    def actuators(self) -> Actuators:
        return Actuators(self)

    # -- typed accessors (reference physics.rs:81-171) ----------------------
    # time

    @property
    def time(self):
        return self._data.time

    def set_time(self, value) -> None:
        self._data = self._data.replace(
            time=jnp.asarray(value, dtype=self._data.time.dtype)
        )

    # ctrl (physics.rs:89-94)

    def ctrl(self, actuator):
        return self._data.ctrl[self._resolve("actuator", actuator)]

    def set_ctrl(self, actuator, value) -> None:
        idx = self._resolve("actuator", actuator)
        self._data = self._data.replace(ctrl=self._data.ctrl.at[idx].set(value))

    # act (physics.rs:96-102): None/raise for stateless actuators

    def act(self, actuator):
        idx = self._resolve("actuator", actuator)
        if self._model.actuator_actadr[idx] < 0:
            raise ActuatorStatelessError(
                f"actuator {actuator!r} has no activation state"
            )
        adr = self._model.actuator_actadr[idx]
        return self._data.act[adr]

    def set_act(self, actuator, value) -> None:
        idx = self._resolve("actuator", actuator)
        if self._model.actuator_actadr[idx] < 0:
            raise ActuatorStatelessError(
                f"actuator {actuator!r} has no activation state"
            )
        adr = self._model.actuator_actadr[idx]
        self._data = self._data.replace(act=self._data.act.at[adr].set(value))

    # qpos / qvel, typed per joint (physics.rs:104-116)

    def _joint_slices(self, joint):
        j = self._resolve("joint", joint)
        jt = JointType(self._model.jnt_type[j])
        qadr = self._model.jnt_qposadr[j]
        vadr = self._model.jnt_dofadr[j]
        from ..model import DOF_WIDTH, QPOS_WIDTH

        return j, jt, slice(qadr, qadr + QPOS_WIDTH[jt]), slice(
            vadr, vadr + DOF_WIDTH[jt]
        )

    def qpos(self, joint, expect: str | None = None):
        """Typed generalized position: scalar (hinge/slide), quat (ball),
        7-vector (free).  `expect` asserts the joint type, raising
        JointTypeError on mismatch (reference error.rs:8)."""
        j, jt, qsl, _ = self._joint_slices(joint)
        if expect is not None and jt.name.lower() != expect.lower():
            raise JointTypeError(expect, jt.name.lower(), str(joint))
        val = self._data.qpos[qsl]
        return val[0] if jt in (JointType.HINGE, JointType.SLIDE) else val

    def set_qpos(self, joint, value) -> None:
        j, jt, qsl, _ = self._joint_slices(joint)
        val = jnp.atleast_1d(jnp.asarray(value, dtype=self._data.qpos.dtype))
        width = qsl.stop - qsl.start
        if val.shape != (width,):
            raise JointTypeError(
                f"qpos width {width}", f"shape {val.shape}", str(joint)
            )
        self._data = self._data.replace(qpos=self._data.qpos.at[qsl].set(val))

    def qvel(self, joint):
        _, jt, _, vsl = self._joint_slices(joint)
        val = self._data.qvel[vsl]
        return val[0] if jt in (JointType.HINGE, JointType.SLIDE) else val

    def set_qvel(self, joint, value) -> None:
        _, jt, _, vsl = self._joint_slices(joint)
        val = jnp.atleast_1d(jnp.asarray(value, dtype=self._data.qvel.dtype))
        width = vsl.stop - vsl.start
        if val.shape != (width,):
            raise JointTypeError(
                f"qvel width {width}", f"shape {val.shape}", str(joint)
            )
        self._data = self._data.replace(qvel=self._data.qvel.at[vsl].set(val))

    # plugin_state (physics.rs:125-131): this engine has no plugin system
    # (the MJCF compiler rejects <extension>), so the accessors exist for
    # API parity but always raise — the strict analog of the reference's
    # Option::None / Error::PluginStateless (error.rs:10).

    def plugin_state(self, plugin):
        raise PluginStatelessError(
            f"plugin {plugin!r}: engine plugins are not supported "
            "(no plugin is ever compiled, so none has state)"
        )

    def set_plugin_state(self, plugin, value) -> None:
        raise PluginStatelessError(
            f"plugin {plugin!r}: engine plugins are not supported "
            "(no plugin is ever compiled, so none has state)"
        )

    # qacc_warmstart per dof (physics.rs:118-123)

    def qacc_warmstart(self, dof: int):
        return self._data.qacc_warmstart[dof]

    def set_qacc_warmstart(self, dof: int, value) -> None:
        self._data = self._data.replace(
            qacc_warmstart=self._data.qacc_warmstart.at[dof].set(value)
        )

    # qfrc_applied per dof (physics.rs:133-138)

    def qfrc_applied(self, dof: int):
        return self._data.qfrc_applied[dof]

    def set_qfrc_applied(self, dof: int, value) -> None:
        self._data = self._data.replace(
            qfrc_applied=self._data.qfrc_applied.at[dof].set(value)
        )

    # xfrc_applied per body (physics.rs:140-145)

    def xfrc_applied(self, body):
        return self._data.xfrc_applied[self._resolve("body", body)]

    def set_xfrc_applied(self, body, wrench) -> None:
        idx = self._resolve("body", body)
        val = jnp.asarray(wrench, dtype=self._data.xfrc_applied.dtype)
        self._data = self._data.replace(
            xfrc_applied=self._data.xfrc_applied.at[idx].set(val)
        )

    # eq_active per equality (physics.rs:147-152)

    def eq_active(self, eq) -> bool:
        return bool(self._data.eq_active[self._resolve("equality", eq)])

    def set_eq_active(self, eq, value: bool) -> None:
        idx = self._resolve("equality", eq)
        self._data = self._data.replace(
            eq_active=self._data.eq_active.at[idx].set(bool(value))
        )

    # mocap accessors (physics.rs:154-170)

    def _mocap_id(self, body) -> int:
        idx = self._resolve("body", body)
        mid = self._model.body_mocapid[idx]
        if mid < 0:
            raise BodyNotMocapError(f"body {body!r} is not a mocap body")
        return mid

    def mocap_pos(self, body):
        return self._data.mocap_pos[self._mocap_id(body)]

    def set_mocap_pos(self, body, pos) -> None:
        mid = self._mocap_id(body)
        val = jnp.asarray(pos, dtype=self._data.mocap_pos.dtype)
        self._data = self._data.replace(
            mocap_pos=self._data.mocap_pos.at[mid].set(val)
        )

    def mocap_quat(self, body):
        return self._data.mocap_quat[self._mocap_id(body)]

    def set_mocap_quat(self, body, quat) -> None:
        mid = self._mocap_id(body)
        val = jnp.asarray(quat, dtype=self._data.mocap_quat.dtype)
        self._data = self._data.replace(
            mocap_quat=self._data.mocap_quat.at[mid].set(val)
        )

    # -- derived conveniences ----------------------------------------------

    def body_xpos(self, body):
        return self._data.xpos[self._resolve("body", body)]

    def body_xquat(self, body):
        return self._data.xquat[self._resolve("body", body)]

    def geom_xpos(self, geom):
        return self._data.geom_xpos[self._resolve("geom", geom)]

    def site_xpos(self, site):
        return self._data.site_xpos[self._resolve("site", site)]

    def sensordata(self, sensor=None):
        """Full sensordata vector, or the named/indexed sensor's slice
        (mjData.sensordata analog; evaluated by forward/step)."""
        if sensor is None:
            return self._data.sensordata
        idx = self._resolve("sensor", sensor)
        adr = self._model.sensor_adr[idx]
        return self._data.sensordata[adr : adr + self._model.sensor_dim[idx]]

    def diverged(self) -> bool:
        """Host-side divergence check (analog of the mjMAXVAL bounds the
        reference re-exports for user-side checks, physics.rs:2)."""
        from ..utils.divergence import divergence_flags

        return bool(divergence_flags(self._model, self._data))
