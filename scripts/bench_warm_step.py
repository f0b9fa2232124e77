"""Measures EPOCH-WARM fused training-step throughput on the TPU.

Production epoch-warm training (``use_warm_loss``) runs one seed epoch
at the full (10,6) budget and every later epoch warm-started from the
previous epoch's impulses at ``DEFAULT_LOSS_WARM_BUDGET``. The solve is
the latency cost center of the train step (39.7 ms of the 44.2 ms
device step at batch 2M is the sequential-iteration forward kernel —
``bench_detail.json``), so the reduced warm budget attacks exactly the
sequential bottleneck the FLOPs analysis said mattered
(``results/flops_utilization.json``).

This measures the steady-state warm step the way ``bench.py`` measures
the cold step: an 8-step ``lax.scan`` of value_and_grad+Adam per
dispatch, the impulse cache carried through the scan (full-batch
epoch-warm regime — each step warm-starts from impulses solved one
optimizer step ago, exactly the staleness
``results/warm_loss_battery.json`` validates). Cache seeded by one cold
full-budget call before timing.

Usage: python scripts/bench_warm_step.py [ipm] [newton] [batch]
Writes results/warm_step_throughput.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    from dair_pll_tpu.utils.cache import enable_compilation_cache
    if enable_compilation_cache():
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp
    import optax

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        DEFAULT_LOSS_WARM_BUDGET, MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    ipm = int(sys.argv[1]) if len(sys.argv) > 1 else \
        DEFAULT_LOSS_WARM_BUDGET[0]
    newton = int(sys.argv[2]) if len(sys.argv) > 2 else \
        DEFAULT_LOSS_WARM_BUDGET[1]
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2097152

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    n_u = model.n_u
    k = model.n_contacts
    optimizer = optax.adam(1e-3)
    SCAN_STEPS = 8

    def warm_scan(params, opt_state, cache, x, x_plus):
        u = jnp.zeros((x.shape[0], n_u), x.dtype)

        def body(carry, _):
            params, opt_state, cache = carry

            def mean_loss(p):
                loss, new_cache = system.contactnets_loss_batch_warm(
                    p, x, u, x_plus, cache, budget=(ipm, newton))
                return jnp.mean(loss), new_cache

            (loss, cache), grads = jax.value_and_grad(
                mean_loss, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, cache), loss

        (params, opt_state, cache), losses = jax.lax.scan(
            body, (params, opt_state, cache), None, length=SCAN_STEPS)
        return params, opt_state, cache, jnp.mean(losses)

    step = jax.jit(warm_scan, donate_argnums=(0, 1, 2))

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

    p = model.initial_params(jnp.float32)
    s = optimizer.init(p)

    # Seed the cache with one cold full-budget solve (the seed epoch).
    u = jnp.zeros((batch, n_u), jnp.float32)
    _, cache = system.contactnets_loss_batch_warm(
        p, x, u, x_plus, jnp.zeros((3, k, batch), jnp.float32),
        budget=(system.ipm_iterations, system.newton_iterations))
    cache = jax.block_until_ready(cache)

    p, s, cache, loss = step(p, s, cache, x, x_plus)  # compile+warmup
    float(loss)

    times = []
    for _ in range(8):
        start = time.time()
        p, s, cache, loss = step(p, s, cache, x, x_plus)
        float(loss)
        times.append(time.time() - start)
    times.sort()
    throughput = batch * SCAN_STEPS / times[len(times) // 2]

    out = {
        "budget": [ipm, newton],
        "batch": batch,
        "scan_steps": SCAN_STEPS,
        "median_step_ms": round(
            1e3 * times[len(times) // 2] / SCAN_STEPS, 2),
        "transitions_per_sec": round(throughput, 1),
        "note": "steady-state epoch-warm train step (seed epoch cold); "
                "accuracy validation: results/warm_loss_battery.json",
    }
    path = os.path.join(REPO, "results", "warm_step_throughput.json")
    with open(path, "w", encoding="utf-8") as handle:
        json.dump(out, handle, indent=1)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
