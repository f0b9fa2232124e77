"""Scratch parity check: fused SoA ContactNets loss + param grads vs the
vmapped reference path, cube + elbow, f64 CPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model


def random_states(key, space_dim, n_q, B, dtype):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (B, space_dim), dtype)
    quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    height = 0.06 + 0.05 * jax.random.uniform(k2, (B, 1), dtype)
    x = jnp.concatenate((quat, x[:, 4:6] * 0.1, height,
                         x[:, 7:] * 0.5), axis=-1)
    x_plus = x + 0.005 * jax.random.normal(k2, x.shape, dtype)
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))
    return x, x_plus


def check(name):
    model = build_multibody_model({name: get_asset(name)})
    system = MultibodyLearnableSystem(model, 0.0068)
    assert system.supports_fused_loss(), f"{name} should be supported"
    dtype = jnp.float64
    B = 32
    n_x = model.n_q + model.n_v
    key = jax.random.PRNGKey(3)
    x, x_plus = random_states(key, n_x, model.n_q, B, dtype)
    u = jnp.zeros((B, model.n_u), dtype)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
        model.initial_params(dtype))

    ref = jax.jit(lambda p: system.contactnets_loss_batch(
        p, x, u, x_plus, use_fused=False))(params)
    fused = jax.jit(lambda p: system.contactnets_loss_batch(
        p, x, u, x_plus, use_fused=True))(params)
    err = np.abs(np.asarray(fused) - np.asarray(ref))
    rel = err / np.maximum(np.abs(np.asarray(ref)), 1e-9)
    print(f"[{name}] loss max abs err {err.max():.3e} rel {rel.max():.3e}")

    g_ref = jax.jit(jax.grad(lambda p: jnp.sum(
        system.contactnets_loss_batch(p, x, u, x_plus, use_fused=False))))(
            params)
    g_fused = jax.jit(jax.grad(lambda p: jnp.sum(
        system.contactnets_loss_batch(p, x, u, x_plus, use_fused=True))))(
            params)
    leaves_r = jax.tree_util.tree_leaves(g_ref)
    leaves_f = jax.tree_util.tree_leaves(g_fused)
    worst = 0.0
    for lr, lf in zip(leaves_r, leaves_f):
        d = np.abs(np.asarray(lf) - np.asarray(lr))
        s = np.maximum(np.abs(np.asarray(lr)), 1e-6)
        worst = max(worst, float((d / s).max()))
    print(f"[{name}] grad max rel err {worst:.3e}")


if __name__ == "__main__":
    check("cube")
    check("elbow")
