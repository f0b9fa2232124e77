"""Residual physics (structured + learned correction; ROADMAP item 12)."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.residual import (ResidualPhysicsConfig,
                                   ResidualPhysicsLearnableConfig,
                                   ResidualPhysicsSystem,
                                   ResidualPhysicsExperiment)
from dair_pll_tpu.urdf import build_multibody_model

DT = 0.0068


def _cube_residual_system(residual_scale=0.1):
    model = build_multibody_model({"cube": get_asset("cube")})
    structured = MultibodyLearnableSystem(model, DT)
    config = ResidualPhysicsConfig(residual_scale=residual_scale,
                                   hidden_size=16, layers=2)
    system = ResidualPhysicsSystem(structured, config,
                                   jax.random.PRNGKey(0),
                                   dtype=jnp.float64)
    return system, structured


def test_zero_scale_matches_structured():
    """With residual_scale = 0 the composite system IS the structured
    system."""
    system, structured = _cube_residual_system(residual_scale=0.0)
    params = system.initial_params()
    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0.1,
                    1.0, 0.5, 0.2, 0.3, -0.2, 0.0], jnp.float64)
    traj = system.simulate(params, x0, 30)
    ref = structured.simulate(params["structured"], x0, 30)
    np.testing.assert_array_equal(np.asarray(traj), np.asarray(ref))


def test_residual_learns_unmodeled_drag():
    """Joint training on data from a 'true' system with linear drag (an
    effect the structured model cannot represent): the residual reduces
    the prediction error below the structured-only fit."""
    system, structured = _cube_residual_system(residual_scale=0.1)
    model = structured.model
    params_true = model.initial_params(jnp.float64)

    # "True" dynamics: structured + velocity drag.
    def true_step(x):
        q, v = structured.space.q_v(x)
        v_plus = structured.forward_dynamics(
            params_true, q, v, jnp.zeros((0,), x.dtype)) - 0.08 * v
        q_next = structured.space.euler_step(q, v_plus, DT)
        return structured.space.x(q_next, v_plus)

    rng = np.random.default_rng(0)
    B = 256
    quat = rng.standard_normal((B, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    x = jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((B, 2)),
         0.05 + 0.1 * rng.random((B, 1)),
         rng.standard_normal((B, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))
    x_plus = jax.vmap(true_step)(x)

    space = system.space

    def prediction_loss(params):
        def one(xi):
            out, _ = system._partial_step(params, xi, None)
            return out
        v_pred = jax.vmap(one)(x)
        v_true = space.v(x_plus)
        return jnp.mean((v_pred - v_true) ** 2)

    import optax
    params = system.initial_params()
    init_loss = float(prediction_loss(params))

    # Train ONLY the residual head (isolates its contribution).
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params["residual"])

    @jax.jit
    def step(residual_params, opt_state):
        def loss_fn(rp):
            return prediction_loss({"structured": params["structured"],
                                    "residual": rp})
        loss, grads = jax.value_and_grad(loss_fn)(residual_params)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              residual_params)
        return optax.apply_updates(residual_params, updates), opt_state, \
            loss

    residual_params = params["residual"]
    for _ in range(400):
        residual_params, opt_state, loss = step(residual_params,
                                                opt_state)
    final_loss = float(loss)
    assert final_loss < 0.2 * init_loss, (init_loss, final_loss)


def test_experiment_binding_config():
    """The experiment mixin builds a residual system from the learnable
    config (the composition pattern of DeepLearnableExperiment)."""
    import dataclasses as dc

    class Holder:
        pass

    exp = ResidualPhysicsExperiment()
    exp.config = Holder()
    exp.config.learnable_config = ResidualPhysicsLearnableConfig(
        urdfs={"cube": get_asset("cube")})
    exp.config.data_config = Holder()
    exp.config.data_config.dt = DT
    system, params = exp.get_learned_system()
    assert isinstance(system, ResidualPhysicsSystem)
    assert "structured" in params and "residual" in params
    summary = system.summary(params, {})
    assert "residual_weight_norm" in summary.scalars
