"""Cold/warm compile-time measurement for the fused training step
(VERDICT r2 item 5: "attack the cold-compile tax" — record the number).

Times jit trace+lower+compile of the production train step (the same
step ``bench.py`` runs) at a production batch size with a FRESH
compilation-cache directory (true cold compile), then again in a second
in-process jit with the persistent cache pointed at the just-populated
directory is NOT meaningful (in-process executable cache) — warm-start
is measured by re-running this script with ``--cache``.

Writes ``results/compile_time.json``.

Usage:
    python scripts/measure_compile.py              # cold (fresh tmp cache)
    python scripts/measure_compile.py --cache      # warm (.jax_cache)
"""
import json
import os
import sys
import tempfile
import time

import click

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


@click.command()
@click.option("--batch", default=2097152)
@click.option("--cache", is_flag=True,
              help="use the persistent .jax_cache (warm) instead of a "
                   "fresh temp dir (cold)")
def main(batch, cache):
    import jax

    if cache:
        cache_dir = os.path.join(REPO_ROOT, ".jax_cache")
    else:
        cache_dir = tempfile.mkdtemp(prefix="jax_cold_cache_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp
    import optax

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    n_u = model.n_u
    optimizer = optax.adam(1e-3)

    def train_step(params, opt_state, x, x_plus):
        def mean_loss(p):
            u = jnp.zeros((x.shape[0], n_u), x.dtype)
            return jnp.mean(system.contactnets_loss_batch(p, x, u, x_plus))

        loss, grads = jax.value_and_grad(mean_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 13), jnp.float32)
    x = x.at[:, :4].set(
        x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True))
    x_plus = x
    p = model.initial_params(jnp.float32)
    s = optimizer.init(p)

    backend = jax.devices()[0].platform
    # Plain jit dispatch (NOT .lower().compile(): the explicit AOT path
    # bypasses the persistent compilation cache in this jax, so it can
    # never measure a warm start). donate_argnums matches bench.py so
    # the program hashes identically to production cache entries.
    step = jax.jit(train_step, donate_argnums=(0, 1))

    # Force the input arrays to materialize before timing the step.
    for leaf in (x, x_plus):
        float(jnp.sum(leaf))

    t0 = time.time()
    _, _, loss = step(p, s, x, x_plus)
    value = float(loss)
    t_first = time.time() - t0

    record = {
        "backend": backend,
        "batch": batch,
        "mode": "warm(.jax_cache)" if cache else "cold(fresh cache)",
        "first_step_s": round(t_first, 1),
        "loss": value,
    }
    out = os.path.join(REPO_ROOT, "results", "compile_time.json")
    existing = []
    if os.path.exists(out):
        with open(out, "r", encoding="utf-8") as handle:
            existing = json.load(handle)
            if isinstance(existing, dict):
                existing = [existing]
    existing.append(record)
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(existing, handle, indent=1)
    click.echo(json.dumps(record))
    if not cache:
        os.system(f"rm -rf {cache_dir}")


if __name__ == "__main__":
    main()
