"""Simulation (rollout) throughput: warm-started vs cold contact solves.

Batched cube-toss rollouts on the attached TPU; prints steps/sec for the
cold (10, 6) hybrid per step and the warm-started (4, 4) path
(``solve_cone_qp_hybrid_warm``), plus their trajectory agreement over the
pre-impact segment. Writes ``results/simulation_throughput.json``.

Usage: python scripts/bench_simulation.py [n_traj] [steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax

    from dair_pll_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float32)
    cold = MultibodyLearnableSystem(model, 0.0068)
    warm = MultibodyLearnableSystem(model, 0.0068, warm_start=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    quat = jax.random.normal(k1, (n_traj, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    pos = jnp.concatenate(
        (0.05 * jax.random.normal(k2, (n_traj, 2)),
         0.1 + 0.1 * jax.random.uniform(k2, (n_traj, 1))), axis=-1)
    vel = jax.random.normal(k3, (n_traj, 6)) * jnp.asarray(
        [2.0, 2.0, 2.0, 0.5, 0.5, 0.2])
    x0 = jnp.concatenate((quat, pos, vel), axis=-1)

    results = {}
    warm_name = (f"warm_hybrid_{warm.warm_ipm_iterations}_"
                 f"{warm.warm_newton_iterations}")
    variants = (
        ("vmapped_cold_hybrid_10_6",
         lambda x: cold.simulate_batch(params, x, steps,
                                       use_fused=False)),
        (f"vmapped_{warm_name}",
         lambda x: warm.simulate_batch(params, x, steps,
                                       use_fused=False)),
        ("fused_soa_scan",
         lambda x: cold.simulate_batch(params, x, steps,
                                       use_fused=True)),
    )
    for name, fn in variants:
        roll = jax.jit(fn)
        traj = roll(x0)
        float(jnp.sum(traj[:, -1]))
        times = []
        for _ in range(5):
            t0 = time.time()
            traj = roll(x0)
            float(jnp.sum(traj[:, -1]))
            times.append(time.time() - t0)
        times.sort()
        med = times[len(times) // 2]
        throughput = n_traj * steps / med
        results[name] = {"wall_ms": round(med * 1e3, 2),
                         "steps_per_sec": round(throughput)}
        print(f"{name}: {med*1e3:.1f} ms for {n_traj}x{steps} steps -> "
              f"{throughput:,.0f} contact sim steps/sec", flush=True)

    results["speedup_fused_vs_vmapped"] = round(
        results["vmapped_cold_hybrid_10_6"]["wall_ms"] /
        results["fused_soa_scan"]["wall_ms"], 3)
    results["config"] = {"n_traj": n_traj, "steps": steps,
                         "dt": 0.0068, "device": str(jax.devices()[0])}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "simulation_throughput.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(results, handle, indent=2)
    print(json.dumps({"speedup_fused_vs_vmapped":
        results["speedup_fused_vs_vmapped"]}))


if __name__ == "__main__":
    main()
