"""Regression: the ContactNets loss gradient must be finite at exactly
resting contacts (zero tangential velocity), where a plain norm has a NaN
gradient. Found by a 4096-trajectory noiseless-simulation training run
collapsing to NaN parameters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model


@pytest.fixture(scope="module")
def cube():
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068, solver_iterations=80)
    return system, model.initial_params(jnp.float64)


def test_gradient_finite_at_rest(cube):
    """Exactly-resting transition (all velocities zero, cube on plane)."""
    system, params = cube
    x_rest = jnp.array([1.0, 0, 0, 0, 0, 0, 0.0524] + [0.0] * 6)

    def loss(p):
        return system.contactnets_loss(p, x_rest, jnp.zeros(0), x_rest)

    value = float(loss(params))
    assert np.isfinite(value)
    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf))), "NaN at rest"


def test_gradient_finite_pure_normal_motion(cube):
    """Transition with zero tangential but nonzero normal velocity."""
    system, params = cube
    x = jnp.array([1.0, 0, 0, 0, 0, 0, 0.06, 0, 0, 0, 0, 0, -0.3])
    x_plus = jnp.array(
        [1.0, 0, 0, 0, 0, 0, 0.058, 0, 0, 0, 0, 0, -0.28])

    def loss(p):
        return system.contactnets_loss(p, x, jnp.zeros(0), x_plus)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_training_on_noiseless_resting_data_stays_finite(cube):
    """Short Adam run on self-consistent data including long resting
    tails must keep parameters finite (the original failure mode)."""
    import optax
    system, params = cube
    x0 = jnp.array(
        [1.0, 0, 0, 0, 0, 0, 0.08, 0.5, 0.2, 0, 0.2, 0, -0.1])
    trajectory = system.simulate(params, x0, 60)  # settles -> resting
    xs, xps = trajectory[:-1], trajectory[1:]
    us = jnp.zeros((xs.shape[0], 0))

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(lambda q: jnp.mean(
            system.contactnets_loss_batch(q, xs, us, xps)))(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    p, s = params, opt_state
    for _ in range(25):
        p, s, loss = step(p, s)
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf))), \
            "training diverged to NaN on resting data"
    assert np.isfinite(float(loss))
