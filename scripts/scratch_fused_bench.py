"""Fused vs standard ContactNets train-step throughput (TPU or CPU).

Usage: python scripts/scratch_fused_bench.py [batch] [fused|std|both] [cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    optimizer = optax.adam(1e-3)

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    x = jax.random.normal(k1, (batch, 13), jnp.float32)
    quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    height = 0.06 + 0.05 * jax.random.uniform(k2, (batch, 1))
    x = jnp.concatenate(
        (quat, x[:, 4:6] * 0.1, height, x[:, 7:] * 0.5), axis=-1)
    x_plus = x + 0.005 * jax.random.normal(k2, (batch, 13))
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))

    for use_fused in ([True, False] if mode == "both" else
                      [mode == "fused"]):
        def train_step(params, opt_state, x, x_plus):
            def mean_loss(p):
                u = jnp.zeros((x.shape[0], model.n_u), x.dtype)
                return jnp.mean(system.contactnets_loss_batch(
                    p, x, u, x_plus, use_fused=use_fused))

            loss, grads = jax.value_and_grad(mean_loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))
        p = model.initial_params(jnp.float32)
        s = optimizer.init(p)
        t0 = time.time()
        p, s, loss = step(p, s, x, x_plus)
        l0 = float(loss)
        t1 = time.time()
        times = []
        for _ in range(8):
            start = time.time()
            p, s, loss = step(p, s, x, x_plus)
            float(loss)
            times.append(time.time() - start)
        times.sort()
        med = times[len(times) // 2]
        print(f"fused={use_fused}: compile+first {t1-t0:.1f}s "
              f"step {med*1e3:.2f} ms -> {batch/med:,.0f} trans/s "
              f"(loss@1 {l0:.4f})", flush=True)


if __name__ == "__main__":
    main()
