"""Block-size / batch-size tuning for the fused loss kernels on TPU.

Measures the full train step (fwd kernel + bwd kernel + Adam) at
combinations of (batch, fwd block, bwd block). Usage:
    python scripts/tune_kernel_blocks.py
"""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from dair_pll_tpu.utils.cache import enable_compilation_cache
    if enable_compilation_cache():
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    import optax

    import dair_pll_tpu.ops.soa_loss_pallas as slp
    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    n_u = model.n_u
    optimizer = optax.adam(1e-3)

    def make_step(fwd_block):
        def train_step(params, opt_state, x, x_plus):
            def mean_loss(p):
                u = jnp.zeros((x.shape[0], n_u), x.dtype)
                return jnp.mean(slp.fused_contactnets_loss_kernel(
                    model, p, x, u, x_plus, 0.0068, 1e-3, 10, 6,
                    block=fwd_block))

            loss, grads = jax.value_and_grad(mean_loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    key = jax.random.PRNGKey(0)
    for batch in (1048576, 2097152):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (batch, 13), jnp.float32)
        quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1,
                                          keepdims=True)
        height = 0.06 + 0.05 * jax.random.uniform(k2, (batch, 1))
        x = jnp.concatenate(
            (quat, x[:, 4:6] * 0.1, height, x[:, 7:] * 0.5), axis=-1)
        x_plus = x + 0.005 * jax.random.normal(k2, (batch, 13))
        x_plus = x_plus.at[:, :4].set(
            x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                            keepdims=True))

        for fwd_block, bwd_block in itertools.product(
                (1024, 2048, 4096), (1024, 2048)):
            slp.DEFAULT_BWD_BLOCK = bwd_block
            step = make_step(fwd_block)
            p = model.initial_params(jnp.float32)
            s = optimizer.init(p)
            t0 = time.time()
            try:
                p, s, loss = step(p, s, x, x_plus)
                float(loss)
            except Exception as error:
                print(f"batch {batch} fwd {fwd_block} bwd {bwd_block}: "
                      f"FAILED {str(error)[:120]}")
                continue
            compile_s = time.time() - t0
            times = []
            for _ in range(6):
                t0 = time.time()
                p, s, loss = step(p, s, x, x_plus)
                float(loss)
                times.append(time.time() - t0)
            times.sort()
            med = times[len(times) // 2]
            print(f"batch {batch} fwd {fwd_block} bwd {bwd_block}: "
                  f"{med*1e3:.1f} ms, {batch/med/1e6:.2f}M trans/s "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
