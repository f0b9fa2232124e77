"""Mesh-mesh (deep-convex vs deep-convex) contact through the full terms
pipeline: two floating mesh bodies from separate URDF models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.multibody.terms import contact_terms, multibody_terms
from dair_pll_tpu.urdf import build_multibody_model


@pytest.fixture(scope="module")
def two_cubes():
    urdf = get_asset("cube_mesh")
    model = build_multibody_model(
        {"cube_a": urdf, "cube_b": urdf},
        mesh_representation="deep_support_convex")
    return model, model.initial_params(jnp.float64)


def test_two_mesh_model_structure(two_cubes):
    model, _ = two_cubes
    assert model.n_q == 14 and model.n_v == 12
    # ground-cubeA, ground-cubeB (4 contacts each), cubeA-cubeB (1)
    kinds = [(model.geometries[a].geom_type, model.geometries[b].geom_type)
             for a, b in model.collision_candidates]
    assert ("plane", "deep_support_convex") in kinds
    assert ("deep_support_convex", "deep_support_convex") in kinds
    assert model.n_contacts == 9


def test_two_mesh_terms_finite(two_cubes, rng):
    model, params = two_cubes
    # Widely separated bodies (the random-init deep support network
    # represents a ~0.5 m blob — matching the reference's ICNN init scale
    # — so "separated" means several meters here).
    q = jnp.asarray(np.concatenate((
        [1.0, 0, 0, 0, -1.5, 0.0, 2.0],
        [1.0, 0, 0, 0, 1.5, 0.0, 2.0])))
    v = jnp.asarray(0.1 * rng.standard_normal(12))
    D, M, J, phi, a_nc = multibody_terms(model, params, q, v,
                                         jnp.zeros(0))
    assert phi.shape == (9,)
    assert J.shape == (27, 12)
    for arr in (D, M, J, phi, a_nc):
        assert np.all(np.isfinite(np.asarray(arr)))
    # mesh-mesh separation: 3 m center distance minus both support extents
    mesh_mesh_phi = float(phi[-1])
    assert 1.0 < mesh_mesh_phi < 3.0
    # the normal direction between laterally separated bodies is lateral
    # and phi decreases as the bodies approach:
    q_close = q.at[4].set(-0.5).at[11].set(0.5)
    phi_close, _ = contact_terms(model, params, q_close)
    assert float(phi_close[-1]) < mesh_mesh_phi


def test_two_mesh_gradients(two_cubes):
    model, params = two_cubes
    q = jnp.asarray(np.concatenate((
        [1.0, 0, 0, 0, -0.06, 0.0, 0.06],
        [1.0, 0, 0, 0, 0.06, 0.0, 0.06])))
    v = jnp.zeros(12)

    def loss(p):
        phi, J = contact_terms(model, p, q)
        return jnp.sum(phi ** 2) + jnp.sum(J ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_two_mesh_simulation_step(two_cubes):
    model, params = two_cubes
    system = MultibodyLearnableSystem(model, 0.005, solver_iterations=80)
    x0 = jnp.asarray(np.concatenate((
        [1.0, 0, 0, 0, -0.06, 0.0, 0.2], [1.0, 0, 0, 0, 0.06, 0.0, 0.2],
        np.zeros(12))))
    trajectory = system.simulate(params, x0, 10)
    assert np.all(np.isfinite(np.asarray(trajectory)))
