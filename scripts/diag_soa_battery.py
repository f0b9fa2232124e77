"""SoA-solver convergence battery on the harvested rollout QPs.

Companion to ``diag_solver_battery.py`` (which swept the AoS
``solve_cone_qp_hybrid_warm``): runs the batch-minor SoA warm hybrid
(``ops/soa_solver.solve_warm_hybrid_soa`` — the fused-rollout kernel's
algorithm) over the SAME rollout QP family, refereed by the (30,30)
AoS hybrid at f64. Picks the (ipm, newton) budget at which BOTH solver
implementations are machine-precision, which is what the fused-vs-
vmapped rollout parity test (tests/test_multibody.py) requires.

Appends a ``"rollout_soa"`` section to ``results/ipm_convergence.json``.
CPU f64; a few minutes.
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
    MultibodyLearnableSystem, DYNAMICS_EPSILON)
from dair_pll_tpu.multibody.terms import multibody_terms
from dair_pll_tpu.ops import soa_solver
from dair_pll_tpu.ops.sap_solver import solve_cone_qp_hybrid_warm
from dair_pll_tpu.urdf import build_multibody_model

N_ROLLOUT = 96
T_ROLLOUT = 30

VARIANTS = [(10, 6), (12, 6), (14, 6), (14, 8), (16, 8)]


def aos_to_soa(M, J, q):
    """(B,6,6)/(B,3k,6)/(B,3k) AoS -> SoA leaves (M[i][j] (1,B),
    Jc[c][v] (k,B), qc[c] (k,B)). Row layout [n_1..n_k, t1x t1y ...]."""
    B, threek, n_v = J.shape
    k = threek // 3
    M_soa = [[M[:, i, j][None, :] for j in range(n_v)] for i in range(n_v)]
    Jc = [[J[:, :k, v].T for v in range(n_v)],
          [J[:, k::2, v].T for v in range(n_v)],
          [J[:, k + 1::2, v].T for v in range(n_v)]]
    qc = [q[:, :k].T, q[:, k::2].T, q[:, k + 1::2].T]
    return M_soa, Jc, qc, k


def soa_gamma_to_aos(gamma, k):
    g_n = gamma[0]                                   # (k, B)
    g_t = jnp.stack([gamma[1], gamma[2]], axis=1)    # (k, 2, B)
    return jnp.concatenate(
        [g_n.T, g_t.transpose(2, 0, 1).reshape(-1, 2 * k)], axis=-1)


def main():
    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float64)
    system = MultibodyLearnableSystem(model, 0.0068)
    space = system.space
    dt = system.dt
    rng = np.random.default_rng(7)

    quat = rng.standard_normal((N_ROLLOUT, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    x0 = jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((N_ROLLOUT, 2)),
         0.1 + 0.05 * rng.random((N_ROLLOUT, 1)),
         rng.standard_normal((N_ROLLOUT, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))
    traj = system.simulate_batch(params, x0, T_ROLLOUT, use_fused=False)
    states = jnp.asarray(np.asarray(traj).reshape(-1, 13))

    def rollout_qp(xi):
        q, v = space.q_v(xi)
        u = jnp.zeros((model.n_u,), xi.dtype)
        delassus, M, J, phi, a_nc = multibody_terms(model, params, q, v, u)
        k = phi.shape[-1]
        ptz = jnp.concatenate((phi, jnp.zeros((2 * k,), phi.dtype)))
        v_minus = v + dt * a_nc
        return M, J, J @ v_minus + ptz / dt

    M, J, q = jax.jit(jax.vmap(rollout_qp))(states)
    eps = jnp.asarray(DYNAMICS_EPSILON, jnp.float64)
    n = q.shape[0]

    # referee: AoS hybrid (30,30)
    w0 = jnp.zeros((n, M.shape[-1]), q.dtype)
    g_ref = jax.jit(jax.vmap(
        lambda Mi, Ji, qi, wi: solve_cone_qp_hybrid_warm(
            Mi, Ji, qi, eps, wi, 30, 30)[0]))(M, J, q, w0)

    def costs(gam):
        def one(Mi, Ji, qi, g):
            from dair_pll_tpu.ops.linear import spd_solve
            h = Ji @ spd_solve(Mi, Ji.T @ g)
            return 0.5 * g @ h + 0.5 * eps * g @ g + g @ qi
        return np.asarray(jax.jit(jax.vmap(one))(M, J, q, gam))

    c_ref = costs(g_ref)
    norm = np.maximum(np.abs(c_ref), 1e-9)

    M_soa, Jc, qc, k = aos_to_soa(M, J, q)
    w_cold = [jnp.zeros((1, n), q.dtype) for _ in range(M.shape[-1])]

    @jax.jit
    def soa_solve(ipm, newt):
        pass  # placeholder (static args handled below)

    out = {}
    print(f"SoA warm hybrid on rollout QPs (n={n}), referee AoS (30,30)")
    print(f"{'variant':>10s} | {'max rel':>9s} | {'p99 rel':>9s} | "
          f"{'max |dimp|':>10s} | {'p99 |dimp|':>10s}")
    for ipm, newt in VARIANTS:
        fn = jax.jit(lambda: soa_solver.solve_warm_hybrid_soa(
            M_soa, Jc, qc, w_cold, eps, ipm, newt)[0])
        g = soa_gamma_to_aos(fn(), k)
        rel = (costs(g) - c_ref) / norm
        dimp = np.abs(np.asarray(g - g_ref)).max(axis=-1)
        label = f"({ipm},{newt})"
        out[label] = {
            "ipm": ipm, "newton": newt,
            "max_rel_subopt": float(rel.max()),
            "p99_rel_subopt": float(np.percentile(rel, 99)),
            "max_impulse_err": float(dimp.max()),
            "p99_impulse_err": float(np.percentile(dimp, 99)),
        }
        print(f"{label:>10s} | {rel.max():9.2e} | "
              f"{np.percentile(rel, 99):9.2e} | {dimp.max():10.2e} | "
              f"{np.percentile(dimp, 99):10.2e}")

    path = "results/ipm_convergence.json"
    with open(path) as f:
        doc = json.load(f)
    doc["rollout_soa"] = out
    doc["meta"]["rollout_soa_referee"] = "AoS hybrid (30,30) f64, cold"
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"\nappended rollout_soa to {path}")


if __name__ == "__main__":
    main()
