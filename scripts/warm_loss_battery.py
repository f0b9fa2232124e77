"""Accuracy battery for EPOCH-WARM-STARTED loss solves (round-4 perf
candidate).

Training re-solves every sample's ContactNets QP from cold each epoch
at the fixed (10,6) IPM/Newton budget — the whole cost center of the
fused kernel (`results/flops_utilization.json`). But between epochs the
parameters move by one optimizer step, so the previous epoch's impulse
is a near-solution. This battery asks: at REAL training parameter
deltas on REAL cube-toss data, how small can the warm budget get before
the batch parameter gradient degrades vs an f64 (30,30) referee?

Protocol:
  1. Take a batch of real cube-toss transitions; wrong-init parameters
     (same perturbation as scripts/grad_precision_real_cube.py).
  2. Simulate a training trajectory: E Adam steps (lr 1e-3) through the
     production cold (10,6) f32 loss -> params theta_0..theta_E.
  3. At each theta_t (t>=1): cache = impulses solved at theta_{t-1}
     with the production (10,6) f32 budget. Compare, against an f64
     (30,30) cold referee at theta_t:
       - cold (10,6) f32            [production today]
       - warm (0,6), (2,6), (2,4), (4,6) f32 from the cache
     on batch-gradient rel-l2/cosine and per-sample loss error.

Writes ``results/warm_loss_battery.json``. CPU x64; ~10 min.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REAL_DATA_DIR = "/root/reference/assets/contactnets_cube"
DT = 0.0068
LOSS_EPS = 1e-3  # learnable_system.LOSS_EPSILON — the LOSS QP's
# regularization (1e-4 is the DYNAMICS epsilon; a 1e-4 run makes even
# the cold f32 (10,6) production budget unresolvable vs the referee)
# Round-4 finding (first sweep, arms (0,6)/(2,6)/(2,4)/(4,6)): warm
# budgets at newton<=6 have catastrophic per-sample tails (grad rel-l2
# 0.45-46 vs cold's 0.054) — the warm iterate lands near cone creases
# where the f32 Newton polish stalls, exactly the gradient-precision
# finding's failure mode. Polish count is the lever, so sweep
# polish-heavy warm arms against the production cold (10,6).
ARMS = [(0, 8), (0, 10), (2, 8), (2, 10), (4, 8)]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.data.management import slice_trajectories
    from dair_pll_tpu.multibody import soa_terms
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.utils import file_utils

    grad_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_epoch_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    storage = "/tmp/warm_battery_storage"
    count = file_utils.import_data_to_storage(storage, REAL_DATA_DIR)
    print(f"imported {count} real trajectories")
    urdf = get_asset("cube")

    n_traj = max(8, grad_batch // 120 + 1)
    trajs = [np.asarray(file_utils.load_trajectory(
        file_utils.trajectory_path(storage, "learning", i)))
        for i in range(n_traj)]
    past, future = slice_trajectories(trajs, 1, 1, 1)
    n = min(grad_batch, past.shape[0])
    x = jnp.asarray(past[:n, -1, :], jnp.float32)
    xp = jnp.asarray(future[:n, 0, :], jnp.float32)
    u = jnp.zeros((n, 0), jnp.float32)
    x64, u64, xp64 = (x.astype(jnp.float64), u.astype(jnp.float64),
                      xp.astype(jnp.float64))

    system = MultibodyLearnableSystem.from_urdfs({"cube": urdf}, DT)
    model = system.model
    params0 = model.initial_params(jnp.float32)
    params0 = jax.tree_util.tree_map(
        lambda l: (l * 1.15 + 0.01
                   if jnp.issubdtype(l.dtype, jnp.floating) else l),
        params0)

    def cold_loss(p, ipm, newton, f64):
        if f64:
            p = jax.tree_util.tree_map(
                lambda l: l.astype(jnp.float64), p)
            return soa_terms.soa_contactnets_loss(
                model, p, x64, u64, xp64, DT, LOSS_EPS, ipm, newton,
                solver_backend="xla")
        return soa_terms.soa_contactnets_loss(
            model, p, x, u, xp, DT, LOSS_EPS, ipm, newton,
            solver_backend="xla")

    def warm_loss(p, ipm, newton, cache):
        loss, force, valid = soa_terms.soa_contactnets_loss_warm(
            model, p, x, u, xp, DT, LOSS_EPS, ipm, newton, cache,
            solver_backend="xla")
        return loss, force, valid

    # Jit each needed (fn, budget) pair exactly once — XLA:CPU
    # segfaults after ~100 distinct compiles in one process (CLAUDE.md).
    def loss_and_grad(ipm, newton, f64):
        def f(p):
            loss = cold_loss(p, ipm, newton, f64)
            return jnp.mean(loss), loss
        return jax.jit(jax.grad(f, has_aux=True))

    def warm_loss_and_grad(ipm, newton):
        def f(p, cache):
            loss, _, _ = warm_loss(p, ipm, newton, cache)
            return jnp.mean(loss), loss
        return jax.jit(jax.grad(f, has_aux=True))

    solve_cache = jax.jit(
        lambda p, zero: warm_loss(p, 10, 6, zero)[1])

    referee = loss_and_grad(30, 30, True)
    production = loss_and_grad(10, 6, False)
    warm_arms = {(i, j): warm_loss_and_grad(i, j) for i, j in ARMS}

    def flat(g):
        return np.concatenate([
            np.asarray(l, np.float64).ravel()
            for l in jax.tree_util.tree_leaves(g)])

    # --- training trajectory under production cold (10,6) f32 ----------
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params0)
    thetas = [params0]
    p = params0
    for t in range(n_epoch_steps):
        g, _ = production(p)
        updates, opt_state = optimizer.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)
        thetas.append(p)
    print(f"simulated {n_epoch_steps} Adam steps")

    # Zero cone field, sized (k, B) via shape-only tracing.
    def _qc_shapes(p):
        from dair_pll_tpu.ops import soa
        sp = soa_terms.scalarize_derived(
            model, soa_terms.derive_scalar_params(model, p))
        n_q, n_v = model.n_q, model.n_v
        xT, xpT = x.T, xp.T
        v = soa.unstack(xT[n_q:n_q + n_v])
        q_plus = soa.unstack(xpT[:n_q])
        v_plus = soa.unstack(xpT[n_q:n_q + n_v])
        _, _, _, qc, _ = soa_terms.soa_loss_parts(
            model, sp, v, q_plus, v_plus, [], DT)
        return qc

    zero_probe = jax.eval_shape(_qc_shapes, params0)
    record = {"batch": int(n), "adam_lr": 1e-3,
              "referee": "(30,30) f64 cold",
              "production": "(10,6) f32 cold",
              "loss_epsilon": LOSS_EPS, "steps": []}

    for t in range(1, len(thetas)):
        prev_p, cur_p = thetas[t - 1], thetas[t]
        zero = [jnp.zeros(c.shape, jnp.float32) for c in zero_probe]
        cache = solve_cache(prev_p, zero)

        ref_g, ref_loss = referee(cur_p)
        ref_g = flat(ref_g)
        ref_loss = np.asarray(ref_loss, np.float64)
        scale = max(1e-12, float(np.abs(ref_loss).mean()))

        def metrics(g, loss):
            loss = np.asarray(loss, np.float64)
            err = np.abs(loss - ref_loss) / scale
            return {
                "grad_rel_l2": float(np.linalg.norm(g - ref_g) /
                                     np.linalg.norm(ref_g)),
                "grad_cosine": float(np.dot(g, ref_g) / (
                    np.linalg.norm(g) * np.linalg.norm(ref_g))),
                "loss_err_median": float(np.median(err)),
                "loss_err_p99": float(np.percentile(err, 99)),
                "loss_err_max": float(err.max()),
            }

        row = {"step": t}
        g, loss = production(cur_p)
        row["cold_10_6"] = metrics(flat(g), loss)
        for (ipm, newton) in ARMS:
            g, loss = warm_arms[(ipm, newton)](cur_p, cache)
            row[f"warm_{ipm}_{newton}"] = metrics(flat(g), loss)
        record["steps"].append(row)
        print(json.dumps(row, default=float))

    out = os.path.join(REPO, "results", "warm_loss_battery.json")
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(record, handle, indent=1, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
