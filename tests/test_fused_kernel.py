"""Parity tests for the single-kernel Pallas terms+loss+grad path
(``ops/soa_loss_pallas.py``, ROADMAP 0b): interpret-mode kernel vs the
XLA fused SoA path, values and parameter/state gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.multibody.soa_terms import supports_fused_kernel
from dair_pll_tpu.ops.soa_loss_pallas import (derived_size,
                                              fused_contactnets_loss_kernel)
from dair_pll_tpu.urdf import build_multibody_model


def _transitions(model, B, key, dtype=jnp.float64):
    n_x = model.n_q + model.n_v
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (B, n_x), dtype)
    x = x.at[:, :4].set(
        x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True))
    x = x.at[:, 6].set(0.02 + 0.08 * jax.random.uniform(k2, (B,), dtype))
    x_plus = x + 0.005 * jax.random.normal(k2, (B, n_x), dtype)
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))
    u = jnp.zeros((B, model.n_u), dtype)
    return x, u, x_plus


def test_fused_kernel_gate():
    cube = build_multibody_model({"cube": get_asset("cube")})
    assert supports_fused_kernel(cube)
    assert derived_size(cube) == 10 + 2 + 3  # pi, mu(plane+box), halves
    mesh = build_multibody_model({"cube": get_asset("cube_mesh")})
    assert not supports_fused_kernel(mesh)   # ICNN geometry -> MXU path


def test_fused_kernel_loss_and_grad_parity():
    """Interpret-mode kernel forward+backward vs the XLA fused path on
    the cube: loss to 1e-9, parameter gradients to 1e-6."""
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    key = jax.random.PRNGKey(11)
    x, u, x_plus = _transitions(model, 24, key)
    params = model.initial_params(jnp.float64)

    ref = system.contactnets_loss_batch(params, x, u, x_plus,
                                        use_fused=True)
    # block=16 does not divide 24: exercises padding + grid accumulation.
    ker = fused_contactnets_loss_kernel(
        model, params, x, u, x_plus, 0.0068, 1e-3, 10, 6, block=16,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-9, atol=1e-11)

    g_ref = jax.grad(lambda p: jnp.sum(system.contactnets_loss_batch(
        p, x, u, x_plus, use_fused=True)))(params)
    g_ker = jax.grad(lambda p: jnp.sum(fused_contactnets_loss_kernel(
        model, p, x, u, x_plus, 0.0068, 1e-3, 10, 6, block=16,
        interpret=True)))(params)
    for lr, lk in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lr),
                                   rtol=1e-6, atol=1e-9)


def test_fused_kernel_state_cotangents():
    """The kernel's custom VJP also returns state cotangents (needed by
    the multi-step window loss, where x is itself a rollout function of
    the parameters)."""
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    key = jax.random.PRNGKey(5)
    x, u, x_plus = _transitions(model, 8, key)
    params = model.initial_params(jnp.float64)

    gx_ref = jax.grad(lambda xx: jnp.sum(system.contactnets_loss_batch(
        params, xx, u, x_plus, use_fused=True)))(x)
    gx_ker = jax.grad(lambda xx: jnp.sum(fused_contactnets_loss_kernel(
        model, params, xx, u, x_plus, 0.0068, 1e-3, 10, 6, block=8,
        interpret=True)))(x)
    np.testing.assert_allclose(np.asarray(gx_ker), np.asarray(gx_ref),
                               rtol=1e-6, atol=1e-9)

    gp_ref = jax.grad(lambda xx: jnp.sum(system.contactnets_loss_batch(
        params, x, u, xx, use_fused=True)))(x_plus)
    gp_ker = jax.grad(lambda xx: jnp.sum(fused_contactnets_loss_kernel(
        model, params, x, u, xx, 0.0068, 1e-3, 10, 6, block=8,
        interpret=True)))(x_plus)
    np.testing.assert_allclose(np.asarray(gp_ker), np.asarray(gp_ref),
                               rtol=1e-6, atol=1e-9)
