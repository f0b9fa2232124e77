"""URDF front-end widening tests (round-1 VERDICT item 9): rotated
inertial frames, prismatic joints, fixed-base (world-rooted) models, and
multi-collision-geometry links including export round-trips."""
import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.multibody.kinematics import (body_kinematics,
                                               configuration_rate)
from dair_pll_tpu.state_space import FixedBaseSpace
from dair_pll_tpu.urdf import build_multibody_model

_BOX_INERTIAL = """
      <inertial>
        <origin xyz="0 0 0" rpy="0 0 0"/>
        <mass value="0.5"/>
        <inertia ixx="0.002" iyy="0.003" izz="0.004"
                 ixy="0" ixz="0" iyz="0"/>
      </inertial>
"""

_BOX_COLLISION = """
      <collision>
        <origin xyz="0 0 0" rpy="0 0 0"/>
        <geometry><box size="0.1 0.1 0.1"/></geometry>
      </collision>
"""


def _write(tmp_path, name, body):
    path = os.path.join(str(tmp_path), name)
    with open(path, "w", encoding="utf-8") as handle:
        handle.write(textwrap.dedent(body))
    return path


def test_rotated_inertial_frame(tmp_path):
    """A diagonal inertia stated in a frame rotated 90deg about z must
    parse to the link-frame tensor with Ixx and Iyy swapped."""
    rotated = _write(tmp_path, "rot.urdf", """\
    <robot name="rot">
      <link name="body">
        <inertial>
          <origin xyz="0.01 0 0" rpy="0 0 1.5707963267948966"/>
          <mass value="2.0"/>
          <inertia ixx="0.010" iyy="0.020" izz="0.030"
                   ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision>
          <geometry><box size="0.1 0.1 0.1"/></geometry>
        </collision>
      </link>
    </robot>
    """)
    model = build_multibody_model({"rot": rotated})
    pi = np.asarray(model.bodies[0].pi_cm_init)
    assert pi[0] == 2.0
    np.testing.assert_allclose(pi[1:4], [0.02, 0.0, 0.0], atol=1e-12)
    # I_link = Rz(90) diag(.01,.02,.03) Rz(90)^T = diag(.02,.01,.03)
    np.testing.assert_allclose(pi[4:7], [0.020, 0.010, 0.030], atol=1e-12)
    np.testing.assert_allclose(pi[7:], 0.0, atol=1e-12)


def _jacobian_consistency(model, q, v):
    """Checks Jv/Jw against the time derivative of the FK (the identity
    the Coriolis JVP relies on): d/dt p_WB == Jv v and
    d/dt R_WB == skew(Jw v) R_WB."""
    qdot = configuration_rate(model, q, v)
    kin, kin_dot = jax.jvp(lambda qq: body_kinematics(model, qq),
                           (q,), (qdot,))
    for b in range(model.n_bodies):
        v_b = np.asarray(kin.Jv[b] @ v)
        np.testing.assert_allclose(np.asarray(kin_dot.p_WB[b]), v_b,
                                   rtol=1e-9, atol=1e-12)
        omega = np.asarray(kin.Jw[b] @ v)
        skew = np.array([[0, -omega[2], omega[1]],
                         [omega[2], 0, -omega[0]],
                         [-omega[1], omega[0], 0]])
        np.testing.assert_allclose(np.asarray(kin_dot.R_WB[b]),
                                   skew @ np.asarray(kin.R_WB[b]),
                                   rtol=1e-9, atol=1e-12)


def test_prismatic_joint_kinematics(tmp_path):
    """Floating base + rotated prismatic slider + revolute tip: the
    Jacobians must be the exact FK time derivative."""
    urdf = _write(tmp_path, "pris.urdf", f"""\
    <robot name="pris">
      <link name="base">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <link name="slider">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <link name="tip">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <joint name="slide" type="prismatic">
        <parent link="base"/>
        <child link="slider"/>
        <origin xyz="0.1 0 0.05" rpy="0.3 0.2 0.1"/>
        <axis xyz="0 0.6 0.8"/>
      </joint>
      <joint name="swing" type="revolute">
        <parent link="slider"/>
        <child link="tip"/>
        <origin xyz="0 0.2 0" rpy="0 0 0"/>
        <axis xyz="1 0 0"/>
      </joint>
    </robot>
    """)
    model = build_multibody_model({"pris": urdf})
    assert model.n_q == 9 and model.n_v == 8
    assert model.bodies[1].joint.joint_type == "prismatic"

    rng = np.random.default_rng(0)
    quat = rng.standard_normal(4)
    quat /= np.linalg.norm(quat)
    q = jnp.asarray(np.concatenate(
        (quat, rng.standard_normal(3), rng.standard_normal(2))))
    v = jnp.asarray(rng.standard_normal(8))
    _jacobian_consistency(model, q, v)


def test_fixed_base_model(tmp_path):
    """A world-rooted URDF builds a fixed-base model: no floating
    coordinates, FixedBaseSpace, and joints hanging off the world."""
    urdf = _write(tmp_path, "fixed.urdf", f"""\
    <robot name="arm">
      <link name="world"/>
      <link name="upper">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <link name="lower">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <joint name="shoulder" type="revolute">
        <parent link="world"/>
        <child link="upper"/>
        <origin xyz="0 0 0.5" rpy="0 0 0"/>
        <axis xyz="0 1 0"/>
      </joint>
      <joint name="elbow" type="revolute">
        <parent link="upper"/>
        <child link="lower"/>
        <origin xyz="0.3 0 0" rpy="0 0 0"/>
        <axis xyz="0 1 0"/>
      </joint>
    </robot>
    """)
    model = build_multibody_model({"arm": urdf})
    assert not model.models[0].floating
    assert model.n_q == 2 and model.n_v == 2
    assert model.n_bodies == 2  # the world link is not a body
    assert model.bodies[0].joint.parent == -1
    assert isinstance(model.state_space(), FixedBaseSpace)

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(2))
    v = jnp.asarray(rng.standard_normal(2))
    _jacobian_consistency(model, q, v)

    # Dynamics terms stay well-posed (M SPD) for the fixed-base tree.
    from dair_pll_tpu.multibody.terms import multibody_terms
    params = model.initial_params(jnp.float64)
    _, M, _, _, _ = multibody_terms(model, params, q, v,
                                    jnp.zeros((0,), jnp.float64))
    eigenvalues = np.linalg.eigvalsh(np.asarray(M))
    assert eigenvalues.min() > 0


def test_multi_collision_link_parse_and_export(tmp_path):
    """Two collision boxes on one link parse into two geometries and
    export back into the SAME two <collision> elements (beyond the
    reference's one-geometry limit, urdf_utils.py:278-280)."""
    urdf = _write(tmp_path, "multi.urdf", f"""\
    <robot name="multi">
      <link name="body">{_BOX_INERTIAL}
        <collision>
          <origin xyz="0.1 0 0" rpy="0 0 0"/>
          <geometry><box size="0.1 0.2 0.3"/></geometry>
        </collision>
        <collision>
          <origin xyz="-0.1 0 0" rpy="0 0 0"/>
          <geometry><sphere radius="0.05"/></geometry>
        </collision>
      </link>
    </robot>
    """)
    model = build_multibody_model({"multi": urdf})
    body_geoms = [g for g in model.geometries if g.body == 0]
    assert [g.geom_type for g in body_geoms] == ["box", "sphere"]

    from dair_pll_tpu.urdf_export import represent_multibody_terms_as_urdfs
    params = model.initial_params(jnp.float64)
    # Perturb the learned geometry so the round trip is non-trivial.
    geometry = list(params.geometry)
    for i, spec in enumerate(model.geometries):
        if spec.geom_type == "box":
            geometry[i] = {"half_lengths":
                           geometry[i]["half_lengths"] * 1.5}
        elif spec.geom_type == "sphere":
            geometry[i] = {"radius": geometry[i]["radius"] * 2.0}
    params.geometry = tuple(geometry)

    out_dir = str(tmp_path / "export")
    urdfs = represent_multibody_terms_as_urdfs(model, params, out_dir)
    exported = os.path.join(out_dir, "multi.urdf")
    with open(exported, "w", encoding="utf-8") as handle:
        handle.write(urdfs["multi"])

    reparsed = build_multibody_model({"multi": exported})
    new_geoms = [g for g in reparsed.geometries if g.body == 0]
    assert [g.geom_type for g in new_geoms] == ["box", "sphere"]
    np.testing.assert_allclose(new_geoms[0].half_lengths_init,
                               np.asarray([0.05, 0.1, 0.15]) * 1.5,
                               rtol=1e-6)
    np.testing.assert_allclose(new_geoms[1].radius_init, 0.1, rtol=1e-6)
    # Collision origins preserved per element.
    np.testing.assert_allclose(new_geoms[0].p_BG, (0.1, 0.0, 0.0))
    np.testing.assert_allclose(new_geoms[1].p_BG, (-0.1, 0.0, 0.0))


def test_prismatic_in_fused_path(tmp_path):
    """The fused SoA loss covers prismatic trees and matches the vmapped
    path."""
    urdf = _write(tmp_path, "pris2.urdf", f"""\
    <robot name="pris2">
      <link name="base">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <link name="slider">{_BOX_INERTIAL}{_BOX_COLLISION}
      </link>
      <joint name="slide" type="prismatic">
        <parent link="base"/>
        <child link="slider"/>
        <origin xyz="0 0 0.15" rpy="0 0 0"/>
        <axis xyz="0 0 1"/>
      </joint>
    </robot>
    """)
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    model = build_multibody_model({"pris2": urdf})
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()

    rng = np.random.default_rng(3)
    B = 8
    n_x = model.n_q + model.n_v
    x = rng.standard_normal((B, n_x))
    x[:, :4] /= np.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    x[:, 6] = 0.1 + 0.05 * rng.random(B)
    xp = x + 0.005 * rng.standard_normal((B, n_x))
    xp[:, :4] /= np.linalg.norm(xp[:, :4], axis=-1, keepdims=True)
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    u = jnp.zeros((B, 0))
    params = model.initial_params(jnp.float64)
    ref = system.contactnets_loss_batch(params, x, u, xp, use_fused=False)
    fused = system.contactnets_loss_batch(params, x, u, xp,
                                          use_fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)


def test_cylinder_geometry(tmp_path):
    """Cylinder support function/witnesses (the shape the reference only
    documents as a support-function example, geometry.py:100-118):
    parse, simulate a side drop to rest at height == radius, and export
    round-trip."""
    import dair_pll_tpu.geometry as geo
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)

    urdf = _write(tmp_path, "cyl.urdf", """\
    <robot name="cyl">
      <link name="body">
        <inertial>
          <origin xyz="0 0 0" rpy="0 0 0"/>
          <mass value="0.4"/>
          <inertia ixx="0.0008" iyy="0.0008" izz="0.0005"
                   ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision>
          <geometry><cylinder radius="0.04" length="0.12"/></geometry>
        </collision>
      </link>
    </robot>
    """)
    model = build_multibody_model({"cyl": urdf})
    spec = model.geometries[1]
    assert spec.geom_type == "cylinder"
    params = model.initial_params(jnp.float64)
    gp = params.geometry[1]

    # Support values: radial, axial, diagonal.
    h = geo.support_function
    np.testing.assert_allclose(
        float(h(spec, gp, jnp.asarray([1.0, 0, 0]))), 0.04, rtol=1e-12)
    np.testing.assert_allclose(
        float(h(spec, gp, jnp.asarray([0.0, 0, 1.0]))), 0.06, rtol=1e-12)
    d = jnp.asarray([0.6, 0.0, 0.8])
    np.testing.assert_allclose(
        float(h(spec, gp, d)), 0.04 * 0.6 + 0.06 * 0.8, rtol=1e-12)

    # Side drop: cylinder with horizontal axis comes to rest at
    # height == radius.
    system = MultibodyLearnableSystem(model, 0.002)
    quat_y90 = jnp.asarray(
        [np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
    x0 = jnp.concatenate((quat_y90, jnp.asarray([0.0, 0.0, 0.08]),
                          jnp.zeros(6)))
    traj = system.simulate(params, x0, 400)
    final_height = float(traj[-1, 6])
    np.testing.assert_allclose(final_height, 0.04, atol=2e-3)
    # Settled: height stable, no vertical motion. (A horizontal cylinder
    # may keep ROLLING — rolling without slipping is dissipation-free —
    # so only require translational speed consistent with slow rolling.)
    heights = np.asarray(traj[-50:, 6])
    assert heights.std() < 1e-4
    assert abs(float(traj[-1, 12])) < 1e-3      # vertical velocity
    assert float(jnp.linalg.norm(traj[-1, 10:12])) < 0.05

    # Export round trip with perturbed learned values.
    from dair_pll_tpu.urdf_export import represent_multibody_terms_as_urdfs
    geometry = list(params.geometry)
    geometry[1] = {"radius": gp["radius"] * 1.25,
                   "half_length": gp["half_length"] * 0.5}
    params.geometry = tuple(geometry)
    out_dir = str(tmp_path / "export")
    urdfs = represent_multibody_terms_as_urdfs(model, params, out_dir)
    exported = os.path.join(out_dir, "cyl.urdf")
    with open(exported, "w", encoding="utf-8") as handle:
        handle.write(urdfs["cyl"])
    reparsed = build_multibody_model({"cyl": exported})
    new_spec = reparsed.geometries[1]
    assert new_spec.geom_type == "cylinder"
    np.testing.assert_allclose(new_spec.radius_init, 0.05, rtol=1e-6)
    np.testing.assert_allclose(new_spec.half_length_init, 0.03,
                               rtol=1e-6)
