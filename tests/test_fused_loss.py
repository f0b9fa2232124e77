"""Parity tests: fused batch-minor SoA ContactNets loss vs the vmapped
reference path (same hybrid solver), values and parameter gradients.

The fused path (``multibody/soa_terms.py`` + ``ops/soa_solver.py``)
reimplements the whole terms + solve + loss chain in TPU-native
batch-minor layout; these tests pin it to the vmapped implementation the
rest of the suite already validates against golden physics values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model


def _random_transitions(model, B, key, dtype=jnp.float64):
    n_x = model.n_q + model.n_v
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (B, n_x), dtype)
    x = x.at[:, :4].set(
        x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True))
    # Heights straddling contact so some transitions are in collision.
    height = 0.02 + 0.08 * jax.random.uniform(k2, (B,), dtype)
    x = x.at[:, 6].set(height)
    x_plus = x + 0.005 * jax.random.normal(k2, (B, n_x), dtype)
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))
    u = jnp.zeros((B, model.n_u), dtype)
    return x, u, x_plus


def _perturbed_params(model, key, dtype=jnp.float64):
    params = model.initial_params(dtype)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        leaf * (1.0 + 0.05 * jax.random.normal(k, jnp.shape(leaf),
                                               dtype))
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("asset", ["cube", "elbow"])
def test_fused_loss_matches_reference_path(asset):
    model = build_multibody_model({asset: get_asset(asset)})
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()

    key = jax.random.PRNGKey(11)
    x, u, x_plus = _random_transitions(model, 24, key)
    params = _perturbed_params(model, jax.random.PRNGKey(5))

    ref = system.contactnets_loss_batch(params, x, u, x_plus,
                                        use_fused=False)
    fused = system.contactnets_loss_batch(params, x, u, x_plus,
                                          use_fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)


def test_fused_loss_gradient_matches_reference_path():
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)

    key = jax.random.PRNGKey(7)
    x, u, x_plus = _random_transitions(model, 16, key)
    params = _perturbed_params(model, jax.random.PRNGKey(3))

    def total(p, fused):
        return jnp.sum(system.contactnets_loss_batch(
            p, x, u, x_plus, use_fused=fused))

    g_ref = jax.grad(lambda p: total(p, False))(params)
    g_fused = jax.grad(lambda p: total(p, True))(params)
    for lr, lf in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   rtol=1e-6, atol=1e-10)


def test_fused_default_selection():
    """Auto-selection: small batches route to the vmapped path (bitwise
    equal), production batches route to the fused path; both only for
    supported models."""
    from dair_pll_tpu.multibody import learnable_system as ls
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()
    key = jax.random.PRNGKey(2)
    x, u, x_plus = _random_transitions(model, 8, key)
    params = model.initial_params(jnp.float64)
    auto = system.contactnets_loss_batch(params, x, u, x_plus)
    std = system.contactnets_loss_batch(params, x, u, x_plus,
                                        use_fused=False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(std))
    assert ls.FUSED_LOSS_MIN_BATCH <= 16384  # bench batches use fused

    apgd = MultibodyLearnableSystem(model, 0.0068, solver="apgd")
    assert not apgd.supports_fused_loss()


def test_pallas_solver_kernel_matches_soa_solver():
    """The Pallas hybrid-solve kernel (interpret mode on CPU) is
    bit-identical to the XLA SoA solve — same code, same order."""
    import jax.numpy as jnp
    from dair_pll_tpu.ops.soa_pallas import solve_contact_impulse_soa_pallas
    from dair_pll_tpu.ops.soa_solver import solve_contact_impulse_soa

    B, k, n_v = 48, 4, 6
    key = jax.random.PRNGKey(0)
    kM, kJ, kq = jax.random.split(key, 3)
    A = jax.random.normal(kM, (n_v, n_v, B), jnp.float64)
    M = [[sum(A[i][l] * A[j][l] for l in range(n_v)) +
          (2.0 if i == j else 0.0) for j in range(n_v)]
         for i in range(n_v)]
    J = jax.random.normal(kJ, (3, n_v, k, B), jnp.float64)
    Jc = [[J[i, v] for v in range(n_v)] for i in range(3)]
    q = jax.random.normal(kq, (3, k, B), jnp.float64)
    qc = [q[i] for i in range(3)]

    f_ref, v_ref = solve_contact_impulse_soa(M, Jc, qc, 1e-3, 10, 6)
    # block=32 does not divide B evenly on purpose: exercises padding.
    f_pal, v_pal = solve_contact_impulse_soa_pallas(
        M, Jc, qc, 1e-3, 10, 6, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(f_pal)),
                               np.asarray(jnp.stack(f_ref)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(
        np.asarray(v_pal).reshape(-1), np.asarray(v_ref).reshape(-1))


def test_fused_batch_shape():
    """Fused path preserves leading batch shape like the reference path."""
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    key = jax.random.PRNGKey(9)
    x, u, x_plus = _random_transitions(model, 12, key)
    params = model.initial_params(jnp.float64)
    x2 = x.reshape(3, 4, -1)
    u2 = u.reshape(3, 4, -1)
    xp2 = x_plus.reshape(3, 4, -1)
    flat = system.contactnets_loss_batch(params, x, u, x_plus,
                                         use_fused=True)
    shaped = system.contactnets_loss_batch(params, x2, u2, xp2,
                                           use_fused=True)
    assert shaped.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(shaped).reshape(-1),
                               np.asarray(flat))


def test_fused_loss_polygon_geometry():
    """The fused path covers polygon (mesh-vertex) geometry: parity on
    the cube_mesh asset with the polygon representation."""
    model = build_multibody_model({"cube": get_asset("cube_mesh")},
                                  mesh_representation="polygon")
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()
    key = jax.random.PRNGKey(21)
    x, u, x_plus = _random_transitions(model, 16, key)
    params = _perturbed_params(model, jax.random.PRNGKey(22))
    ref = system.contactnets_loss_batch(params, x, u, x_plus,
                                        use_fused=False)
    fused = system.contactnets_loss_batch(params, x, u, x_plus,
                                          use_fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)


def test_fused_loss_icnn_geometry():
    """The fused path covers deep-support (ICNN) geometry — witness
    networks run batch-major on the MXU, assembly stays SoA. Loss and
    ICNN parameter gradients match the vmapped path."""
    model = build_multibody_model({"cube": get_asset("cube_mesh")})
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()
    key = jax.random.PRNGKey(31)
    x, u, x_plus = _random_transitions(model, 12, key)
    params = model.initial_params(jnp.float64)
    ref = system.contactnets_loss_batch(params, x, u, x_plus,
                                        use_fused=False)
    fused = system.contactnets_loss_batch(params, x, u, x_plus,
                                          use_fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-8, atol=1e-12)

    def total(p, fused):
        return jnp.sum(system.contactnets_loss_batch(
            p, x, u, x_plus, use_fused=fused))

    g_ref = jax.grad(lambda p: total(p, False))(params)
    g_fused = jax.grad(lambda p: total(p, True))(params)
    for lr, lf in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   rtol=1e-6, atol=1e-10)


def test_fused_rollout_actuated_model(tmp_path):
    """Regression (round-2 advisor): actuated models (n_u > 0) pass
    ``supports_fused`` and must roll out through the fused path with the
    zero-control convention instead of crashing on missing u leaves."""
    import os
    import textwrap
    urdf = os.path.join(str(tmp_path), "actuated.urdf")
    with open(urdf, "w", encoding="utf-8") as handle:
        handle.write(textwrap.dedent("""\
        <robot name="paddle">
          <link name="base">
            <inertial>
              <mass value="0.5"/>
              <inertia ixx="0.002" iyy="0.003" izz="0.004"
                       ixy="0" ixz="0" iyz="0"/>
            </inertial>
            <collision>
              <geometry><box size="0.1 0.1 0.1"/></geometry>
            </collision>
          </link>
          <link name="arm">
            <inertial>
              <mass value="0.2"/>
              <inertia ixx="0.001" iyy="0.001" izz="0.001"
                       ixy="0" ixz="0" iyz="0"/>
            </inertial>
            <collision>
              <geometry><box size="0.08 0.02 0.02"/></geometry>
            </collision>
          </link>
          <joint name="swing" type="revolute">
            <parent link="base"/>
            <child link="arm"/>
            <origin xyz="0 0 0.1" rpy="0 0 0"/>
            <axis xyz="0 1 0"/>
          </joint>
          <transmission name="swing_drive">
            <joint name="swing"/>
          </transmission>
        </robot>
        """))
    model = build_multibody_model({"paddle": urdf})
    assert model.n_u == 1
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss()

    key = jax.random.PRNGKey(17)
    n_x = model.n_q + model.n_v
    x0 = jax.random.normal(key, (8, n_x), jnp.float64)
    x0 = x0.at[:, :4].set(
        x0[:, :4] / jnp.linalg.norm(x0[:, :4], axis=-1, keepdims=True))
    x0 = x0.at[:, 6].set(0.2 + 0.05 * jnp.arange(8))
    params = model.initial_params(jnp.float64)

    fused = system.simulate_batch(params, x0, 5, use_fused=True)
    ref = system.simulate_batch(params, x0, 5, use_fused=False)
    assert fused.shape == ref.shape == (8, 6, n_x)
    assert np.all(np.isfinite(np.asarray(fused)))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-6, atol=1e-8)


def test_fused_loss_flat_shape_contract():
    """Regression (round-2 advisor): ``soa_contactnets_loss`` must return
    a flat ``(B,)`` array for direct callers, not ``(1, B)``."""
    from dair_pll_tpu.multibody.soa_terms import soa_contactnets_loss
    model = build_multibody_model({"cube": get_asset("cube")})
    key = jax.random.PRNGKey(23)
    x, u, x_plus = _random_transitions(model, 12, key)
    params = model.initial_params(jnp.float64)
    losses = soa_contactnets_loss(model, params, x, u, x_plus, 0.0068,
                                  1e-3, 10, 6, solver_backend="xla")
    assert losses.shape == (12,)
