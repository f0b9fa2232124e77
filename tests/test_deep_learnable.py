"""Deep learnable baseline tests: shapes, rollouts, learning a linear
system."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dair_pll_tpu.deep_learnable import (DeepLearnableSystem,
                                         DeepLearnableSystemConfig)
from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.state_space import FixedBaseSpace
from dair_pll_tpu.system import System


class DummyBase(System):
    def __init__(self, space, dt):
        integrator = Integrator(space, lambda p, x, c: (x, c), dt, "state")
        super().__init__(space, integrator)


def make_system(model_kind, space=None, hidden=32, layers=1):
    space = space or FixedBaseSpace(2)
    base = DummyBase(space, 0.01)
    config = DeepLearnableSystemConfig(
        integrator_kind="velocity", layers=layers, hidden_size=hidden,
        model_kind=model_kind)
    system = DeepLearnableSystem(base, config, jax.random.PRNGKey(0))
    return system, system.initial_params()


def test_mlp_rollout_shapes():
    system, params = make_system("mlp")
    x0 = jnp.zeros((4,))
    trajectory = system.simulate(params, x0, 10)
    assert trajectory.shape == (11, 4)
    batch = system.simulate_batch(params, jnp.zeros((3, 4)), 5)
    assert batch.shape == (3, 6, 4)


def test_recurrent_rollout_and_preprocess():
    system, params = make_system("recurrent")
    history = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)))
    x0, carry = system.preprocess_initial_condition(
        params, history, system.initial_carry(history[-1]))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(history[-1]))
    assert carry.shape == (32,)
    assert float(jnp.abs(carry).max()) > 0  # hidden state was warmed up
    trajectory = system.simulate(params, x0, 5, carry_0=carry)
    assert trajectory.shape == (6, 4)


def test_zero_model_keeps_configuration():
    system, params = make_system("zero")
    x0 = jnp.asarray([1.0, 2.0, 0.0, 0.0])
    trajectory = system.simulate(params, x0, 3)
    # zero velocity -> configuration frozen
    np.testing.assert_allclose(np.asarray(trajectory[-1][:2]), [1.0, 2.0])


def test_mlp_learns_linear_dynamics(rng):
    """An MLP trained on v_next = A v data reduces prediction error."""
    space = FixedBaseSpace(2)
    system, params = make_system("mlp", space=space, hidden=32, layers=2)
    A = np.array([[0.9, 0.1], [-0.1, 0.9]])

    x = rng.standard_normal((512, 4)).astype(np.float64)
    v_next = x[:, 2:] @ A.T
    x_j, v_j = jnp.asarray(x), jnp.asarray(v_next)

    def loss_fn(p):
        pred = jax.vmap(
            lambda xi: system._partial_step(p, xi, None)[0])(x_j)
        return jnp.mean((pred - v_j) ** 2)

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    p, s = params, opt_state
    loss0 = float(loss_fn(p))
    for _ in range(200):
        p, s, loss = step(p, s)
    assert float(loss) < 0.1 * loss0
