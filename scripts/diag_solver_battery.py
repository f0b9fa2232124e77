"""Solver-variant convergence battery on harvested contact QPs.

VERDICT-r3 items 1+4: the fused-rollout parity failure traced to the
hybrid solver stopping ~1.7e-3 short of the optimum on grazing-contact
QPs at the default (10 IPM, 6 Newton) budget (scripts/diag_hard_qp.py).
This script harvests two QP families at f64 —

  * rollout QPs: every per-step contact QP along vmapped cube-toss
    rollouts (the family behind ``simulate_batch``), and
  * loss QPs: ContactNets loss-family QPs from the bench state
    distribution (the family behind training),

referees them with a (30, 30) hybrid solve, and measures relative
suboptimality + impulse error for budget/algorithm variants:
Gondzio-style multiple centrality correctors and step-backoff values.

Writes ``results/ipm_convergence.json``. CPU f64; ~10 min.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import (
    MultibodyLearnableSystem, DYNAMICS_EPSILON, CONTACT_FILTER_EPS)
from dair_pll_tpu.multibody.terms import multibody_terms
from dair_pll_tpu.ops.sap_solver import solve_cone_qp_hybrid_warm
from dair_pll_tpu.urdf import build_multibody_model

N_ROLLOUT = 96
T_ROLLOUT = 30
N_LOSS = 4096

VARIANTS = [
    # (ipm, newton, correctors, label)
    (10, 6, 0, "current (10,6)"),
    (14, 6, 0, "(14,6)"),
    (10, 6, 2, "(10,6)+2corr"),
    (8, 4, 2, "(8,4)+2corr"),
    (8, 6, 2, "(8,6)+2corr"),
    (6, 4, 2, "(6,4)+2corr"),
    (8, 4, 1, "(8,4)+1corr"),
    (10, 4, 2, "(10,4)+2corr"),
    # Newton-only (exact-line-search SAP-Newton from the IPM init
    # point): if the loss family converges without the central path,
    # the fused kernel can drop 10 sequential IPM iterations.
    (0, 8, 0, "newton-only (0,8)"),
    (0, 10, 0, "newton-only (0,10)"),
    (0, 12, 0, "newton-only (0,12)"),
    (0, 16, 0, "newton-only (0,16)"),
    (4, 8, 0, "(4,8)"),
    (6, 8, 0, "(6,8)"),
]


def random_tosses(rng, n):
    quat = rng.standard_normal((n, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((n, 2)),
         0.1 + 0.05 * rng.random((n, 1)),
         rng.standard_normal((n, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))


def bench_states(key, batch, dtype):
    """Same state distribution as bench.py / measure_polish_accuracy."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (batch, 13), dtype)
    quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    height = 0.06 + 0.05 * jax.random.uniform(k2, (batch, 1), dtype)
    x = jnp.concatenate(
        (quat, x[:, 4:6] * 0.1, height, x[:, 7:] * 0.5), axis=-1)
    x_plus = x + 0.005 * jax.random.normal(k2, (batch, 13))
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))
    return x, x_plus


def main():
    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float64)
    system = MultibodyLearnableSystem(model, 0.0068)
    space = system.space
    dt = system.dt
    rng = np.random.default_rng(7)

    # --- family 1: rollout QPs ------------------------------------------
    x0 = random_tosses(rng, N_ROLLOUT)
    traj = system.simulate_batch(params, x0, T_ROLLOUT, use_fused=False)
    states = np.asarray(traj).reshape(-1, 13)

    def rollout_qp(xi):
        q, v = space.q_v(xi)
        u = jnp.zeros((model.n_u,), xi.dtype)
        delassus, M, J, phi, a_nc = multibody_terms(model, params, q, v, u)
        k = phi.shape[-1]
        ptz = jnp.concatenate((phi, jnp.zeros((2 * k,), phi.dtype)))
        v_minus = v + dt * a_nc
        q_full = J @ v_minus + ptz / dt
        return M, J, q_full, phi

    M_r, J_r, q_r, phi_r = jax.jit(jax.vmap(rollout_qp))(
        jnp.asarray(states))

    # --- family 2: loss QPs ---------------------------------------------
    x, x_plus = bench_states(jax.random.PRNGKey(3), N_LOSS, jnp.float64)

    def loss_qp(xi, xpi):
        u = jnp.zeros((model.n_u,), xi.dtype)
        delassus, q_vec, M, J, phi, dv = system._contactnets_qp(
            params, xi, u, xpi)
        return M, J, q_vec

    M_l, J_l, q_l = jax.jit(jax.vmap(loss_qp))(x, x_plus)

    results = {}
    for fam, (M, J, q, eps) in {
        "rollout": (M_r, J_r, q_r, DYNAMICS_EPSILON),
        "loss": (M_l, J_l, q_l, 1e-3),
    }.items():
        eps = jnp.asarray(eps, jnp.float64)
        n = q.shape[0]
        w0 = jnp.zeros((n, M.shape[-1]), q.dtype)

        def solve(ipm, newt, corr):
            fn = lambda Mi, Ji, qi, wi: solve_cone_qp_hybrid_warm(
                Mi, Ji, qi, eps, wi, ipm, newt, corr)[0]
            return jax.jit(jax.vmap(fn))(M, J, q, w0)

        def costs(gam):
            def one(Mi, Ji, qi, g):
                from dair_pll_tpu.ops.linear import spd_solve
                h = Ji @ spd_solve(Mi, Ji.T @ g)
                return 0.5 * g @ h + 0.5 * eps * g @ g + g @ qi
            return np.asarray(jax.jit(jax.vmap(one))(M, J, q, gam))

        g_ref = solve(30, 30, 0)
        c_ref = costs(g_ref)
        # normalizer: the magnitude of the optimal objective (plus floor)
        norm = np.maximum(np.abs(c_ref), 1e-9)

        fam_res = {}
        print(f"\n=== {fam} QPs (n={n}) ===")
        print(f"{'variant':>16s} | {'max rel':>9s} | {'p99 rel':>9s} | "
              f"{'max |dimp|':>10s}")
        for ipm, newt, corr, label in VARIANTS:
            g = solve(ipm, newt, corr)
            rel = (costs(g) - c_ref) / norm
            dimp = np.abs(np.asarray(g - g_ref)).max(axis=-1)
            fam_res[label] = {
                "ipm": ipm, "newton": newt, "correctors": corr,
                "max_rel_subopt": float(rel.max()),
                "p99_rel_subopt": float(np.percentile(rel, 99)),
                "max_impulse_err": float(dimp.max()),
                "p99_impulse_err": float(np.percentile(dimp, 99)),
            }
            print(f"{label:>16s} | {rel.max():9.2e} | "
                  f"{np.percentile(rel, 99):9.2e} | {dimp.max():10.2e}")
        results[fam] = fam_res

    results["meta"] = {
        "n_rollout_qps": int(q_r.shape[0]),
        "n_loss_qps": int(q_l.shape[0]),
        "grazing_rollout_qps(phi_min<5mm)": int(
            (np.asarray(phi_r).min(axis=-1) < 0.005).sum()),
        "referee": "hybrid (30 IPM, 30 Newton) f64",
    }
    os.makedirs("results", exist_ok=True)
    with open("results/ipm_convergence.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\nwrote results/ipm_convergence.json")


if __name__ == "__main__":
    main()
