"""Multibody engine tests: golden box-plane values, mass-matrix
properties, energy behavior (SURVEY.md §4b)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset, CUBE_MASS, CUBE_EDGE, \
    CUBE_INERTIA, CUBE_MU
from dair_pll_tpu.multibody.dynamics import lagrangian_terms
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.multibody.terms import contact_terms, multibody_terms
from dair_pll_tpu.urdf import build_multibody_model

DT = 0.0068


@pytest.fixture(scope="module")
def cube():
    model = build_multibody_model({"cube": get_asset("cube")})
    return model, model.initial_params(jnp.float64)


@pytest.fixture(scope="module")
def elbow():
    model = build_multibody_model({"elbow": get_asset("elbow")})
    return model, model.initial_params(jnp.float64)


def test_cube_model_structure(cube):
    model, _ = cube
    assert model.n_q == 7 and model.n_v == 6 and model.n_u == 0
    assert len(model.geometries) == 2  # ground + box
    assert model.collision_candidates == ((0, 1),)
    assert model.n_contacts == 4


def test_elbow_model_structure(elbow):
    model, _ = elbow
    assert model.n_q == 8 and model.n_v == 7
    # ground-link1, ground-link2 only (filter group removes link pair)
    assert len(model.collision_candidates) == 2
    assert model.n_contacts == 8


def test_cube_mass_matrix_identity_pose(cube):
    model, params = cube
    q = jnp.array([1.0, 0, 0, 0, 0, 0, 1.0])
    v = jnp.zeros(6)
    M, F = lagrangian_terms(model, params.pi_cm(), q, v, jnp.zeros(0))
    expected = np.diag([CUBE_INERTIA] * 3 + [CUBE_MASS] * 3)
    np.testing.assert_allclose(np.asarray(M), expected, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(F), [0, 0, 0, 0, 0, -CUBE_MASS * 9.81], atol=1e-12)


def test_cube_golden_phi_and_jacobian(cube):
    """Analytic box-on-plane signed distance and contact Jacobian at a flat
    pose (golden values per SURVEY.md §4b)."""
    model, params = cube
    height = 0.1
    q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, height])
    phi, J = contact_terms(model, params, q)
    half = CUBE_EDGE / 2
    np.testing.assert_allclose(np.asarray(phi), height - half, atol=1e-12)
    assert J.shape == (12, 6)
    # Normal rows: d(phi)/dv -> z-velocity of the corner. For corner r
    # (body frame) J_n = [ (R (r x .))_z? ] — check against autodiff:
    v_probe = jnp.array([0.3, -0.2, 0.5, 0.1, 0.7, -0.4])

    def corner_heights(qq):
        phi_q, _ = contact_terms(model, params, qq)
        return phi_q

    # finite-difference phi along the flow of v_probe
    from dair_pll_tpu.multibody.kinematics import configuration_rate
    qdot = configuration_rate(model, q, v_probe)
    _, dphi = jax.jvp(corner_heights, (q,), (qdot,))
    np.testing.assert_allclose(
        np.asarray(J[:4] @ v_probe), np.asarray(dphi), atol=1e-9)


def test_cube_friction_scaling(cube):
    """Tangential rows scale with the combined friction coefficient
    mu = 2 mu_a mu_b / (mu_a + mu_b) (reference multibody_terms.py:471)."""
    model, params = cube
    q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 0.1])
    _, J = contact_terms(model, params, q)
    mu_combined = 2 * 1.0 * CUBE_MU / (1.0 + CUBE_MU)
    # tangential x-row of first contact: direction = world x -> linear
    # velocity col 3 equals mu
    np.testing.assert_allclose(float(J[4, 3]), mu_combined, atol=1e-9)


def test_elbow_mass_matrix_spd(elbow, rng):
    model, params = elbow
    for _ in range(5):
        quat = rng.standard_normal(4)
        quat = quat / np.linalg.norm(quat)
        q = jnp.asarray(np.concatenate(
            (quat, rng.standard_normal(3), rng.standard_normal(1))))
        v = jnp.asarray(rng.standard_normal(7))
        M, _ = lagrangian_terms(model, params.pi_cm(), q, v, jnp.zeros(0))
        M = np.asarray(M)
        assert np.allclose(M, M.T, atol=1e-12)
        assert np.linalg.eigvalsh(M).min() > 0


def test_free_flight_conservation(cube):
    """Tumbling cube in free flight conserves energy and world angular
    momentum (no contact, small dt)."""
    model, params = cube
    system = MultibodyLearnableSystem(model, 1e-3)
    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 10.0, 3.0, 2.0, 1.0, 0.5, 0, 1.0])
    traj = system.simulate(params, x0, 100)

    def energy_momentum(x):
        from dair_pll_tpu.ops import quaternion
        quat, pos, omega_B, v_W = x[:4], x[4:7], x[7:10], x[10:13]
        R = quaternion.to_rotation_matrix(quat)
        I_B = jnp.eye(3) * CUBE_INERTIA
        ke = 0.5 * CUBE_MASS * v_W @ v_W + 0.5 * omega_B @ (I_B @ omega_B)
        pe = CUBE_MASS * 9.81 * pos[2]
        L_world = R @ (I_B @ omega_B)
        return ke + pe, L_world

    e0, L0 = energy_momentum(traj[0])
    e1, L1 = energy_momentum(traj[-1])
    assert abs(float(e1 - e0)) / float(e0) < 1e-3
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), rtol=1e-4)


def test_cube_settles_on_plane(cube):
    model, params = cube
    system = MultibodyLearnableSystem(model, DT)
    x0 = jnp.array(
        [1.0, 0, 0, 0, 0, 0, 0.15, 1.0, 0.5, 0.2, 0.2, -0.1, 0.0])
    traj = system.simulate(params, x0, 120)
    z = np.asarray(traj[:, 6])
    assert z.min() > -0.02, "cube fell through the plane"
    assert abs(z[-1]) < 0.1, "cube did not settle"
    final_speed = float(jnp.linalg.norm(traj[-1, 7:]))
    assert final_speed < 0.05


def test_contactnets_loss_consistent_transition_near_zero(cube):
    """A transition generated by the model itself yields near-zero loss."""
    model, params = cube
    system = MultibodyLearnableSystem(model, DT)
    x0 = jnp.array(
        [1.0, 0, 0, 0, 0, 0, 0.0525, 0.0, 0.0, 0.0, 0.1, 0.0, 0.0])
    traj = system.simulate(params, x0, 30)
    u = jnp.zeros(0)
    loss = system.contactnets_loss(params, traj[20], u, traj[21])
    assert float(loss) < 1e-5


def test_contactnets_loss_gradients_finite(cube):
    model, params = cube
    system = MultibodyLearnableSystem(model, DT)
    x = jnp.array([1.0, 0, 0, 0, 0, 0, 0.05, 0.3, 0.0, 0.0, 0.2, 0, -0.3])
    x_plus = jnp.array(
        [1.0, 0.001, 0, 0, 0, 0.001, 0.0505, 0.28, 0, 0, 0.19, 0, -0.25])
    g = jax.grad(lambda p: system.contactnets_loss(
        p, x, jnp.zeros(0), x_plus))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_forward_dynamics_gradients_finite(cube):
    """Simulation gradients flow through the IFT custom VJP."""
    model, params = cube
    system = MultibodyLearnableSystem(model, DT)
    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0.054, 0, 0, 0, 0.1, 0, -0.1])

    def rollout_loss(p):
        traj = system.simulate(p, x0, 5)
        return jnp.sum(traj[-1] ** 2)

    g = jax.grad(rollout_loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))



def test_warm_start_steps_match_full_hybrid(cube):
    """Warm-started rollout solves (carried SAP primal + short 4+4
    hybrid, ``solve_cone_qp_hybrid_warm``; ROADMAP #3) match the full
    (10, 6) hybrid step-by-step along a bouncing, sliding cube drop.

    The comparison is per-step along one reference trajectory (with the
    warm-start carry propagated) rather than between free rollouts:
    post-impact cube dynamics are chaotic, so trajectory-level diffs
    amplify solver noise exponentially and test nothing."""
    model, params = cube
    cold = MultibodyLearnableSystem(model, 0.0068)
    warm = MultibodyLearnableSystem(model, 0.0068, warm_start=True)
    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0.08,
                    1.0, 0.5, 0.2, 0.3, -0.2, 0.0])
    traj = cold.simulate(params, x0, 80)
    u = jnp.zeros((0,))

    def step(carry, x):
        q, v = cold.space.q_v(x)
        vp_cold = cold.forward_dynamics(params, q, v, u)
        vp_warm, carry = warm.forward_dynamics_with_state(
            params, q, v, u, carry)
        return carry, jnp.max(jnp.abs(vp_warm - vp_cold))

    _, errs = jax.lax.scan(step, warm.initial_carry(x0), traj)
    # At the (10, 6) default the warm path matches the cold hybrid to
    # machine precision everywhere, including fresh impacts.
    assert float(jnp.max(errs)) < 1e-8
    assert float(jnp.median(errs)) < 1e-12


def test_fused_rollout_matches_vmapped(cube):
    """The fused SoA batched rollout (scan of batch-minor terms +
    warm hybrid solves) matches the vmapped integrator over a short
    horizon of random tosses."""
    model, params = cube
    system = MultibodyLearnableSystem(model, 0.0068)
    rng = np.random.default_rng(0)
    B = 12
    quat = rng.standard_normal((B, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    x0 = jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((B, 2)),
         0.1 + 0.05 * rng.random((B, 1)),
         rng.standard_normal((B, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))
    ref = system.simulate_batch(params, x0, 20, use_fused=False)
    fused = system.simulate_batch(params, x0, 20, use_fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-7)
