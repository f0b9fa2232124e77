"""Accuracy of line-search polish-count trims on realistic loss QPs.

The SAP-Newton exact line search polishes its bracketed root with
``_POLISH_STEPS`` (=6, trimmed from 8 in round 3 on the strength of
this measurement) safeguarded Newton steps per outer iteration —
~1.2k VPU flops each, the largest single block of the solve after the
dz-recovery trim. This measures, at f32 on loss-family QPs drawn from
the bench state distribution, the relative suboptimality of the hybrid
solve at polish counts {8, 6, 5, 4, 3} against an f64 (14, 8) reference,
to decide whether the fused kernel can run a shorter polish (cf. the
iteration-count measurements under ROADMAP 0a: the (10, 6) tail is
f32-noise-dominated, so the floor is f32 rounding, not the algorithm).

Writes ``results/polish_accuracy.json``. CPU-only; ~5 min.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools

import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody import soa_terms
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.ops import soa, soa_solver
from dair_pll_tpu.urdf import build_multibody_model

B = 8192


def bench_states(key, batch, dtype):
    """Same state distribution as bench.py."""
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


def loss_qp(model, params, x, x_plus, dt, eps):
    """(M, Jc, qc) cone-field QP pieces of the ContactNets loss."""
    n_q, n_v = model.n_q, model.n_v
    xT, xpT = x.T, x_plus.T
    v = soa.unstack(xT[n_q:n_q + n_v])
    q_plus = soa.unstack(xpT[:n_q])
    v_plus = soa.unstack(xpT[n_q:n_q + n_v])
    sp = soa_terms.scalarize_derived(
        model, soa_terms.derive_scalar_params(model, params))
    M, Jc, phi, qc, dv = soa_terms.soa_loss_parts(
        model, sp, v, q_plus, v_plus, [], dt)
    return M, Jc, qc


def primal_costs(M, Jc, qc, eps, gamma):
    """Regularized dual objective value per sample (the quantity the
    solve minimizes): 0.5 g'(J M^-1 J' + eps I) g + qc'g."""
    h = soa.spd_solve(M, soa_solver.jt_dot(Jc, gamma))
    jh = soa_solver.j_dot(Jc, h)
    quad = 0.5 * jnp.sum(
        gamma[0] * (jh[0] + eps * gamma[0]) +
        gamma[1] * (jh[1] + eps * gamma[1]) +
        gamma[2] * (jh[2] + eps * gamma[2]), axis=0)
    lin = jnp.sum(qc[0] * gamma[0] + qc[1] * gamma[1] +
                  qc[2] * gamma[2], axis=0)
    return quad + lin


def main():
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    dt, eps = 0.0068, 1e-3
    params64 = model.initial_params(jnp.float64)

    x64, xp64 = bench_states(jax.random.PRNGKey(0), B, jnp.float64)
    M64, Jc64, qc64 = jax.jit(functools.partial(
        loss_qp, model, params64, dt=dt, eps=eps))(x64, xp64)

    # f64 (14, 8) reference solution and its cost.
    ref_solve = jax.jit(functools.partial(
        soa_solver.solve_contact_impulse_soa, eps=eps,
        ipm_iterations=14, newton_iterations=8))
    g_ref, _ = ref_solve(M64, Jc64, qc64)
    c_ref = jax.jit(functools.partial(primal_costs, eps=eps))(
        M64, Jc64, qc64, gamma=g_ref)
    scale = 1.0 + jnp.abs(c_ref)

    # f32 problem data (as the fused kernel sees it).
    to32 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), t)
    M32, Jc32, qc32 = to32((M64, Jc64, qc64))

    out = {"batch": B, "reference": "f64 (14,8)",
           "metric": "relative suboptimality of f32 solve vs f64 ref, "
                     "costs evaluated in f64", "sweeps": {}}
    default_polish = soa_solver._POLISH_STEPS
    for polish in (8, 6, 5, 4, 3):
        soa_solver._POLISH_STEPS = polish
        f32_solve = jax.jit(functools.partial(
            soa_solver.solve_contact_impulse_soa, eps=eps,
            ipm_iterations=10, newton_iterations=6))
        g32, valid = f32_solve(M32, Jc32, qc32)
        g64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), g32)
        c32 = jax.jit(functools.partial(primal_costs, eps=eps))(
            M64, Jc64, qc64, gamma=g64)
        sub = np.asarray((c32 - c_ref) / scale)
        sub = sub[np.asarray(valid).reshape(-1).astype(bool)]
        stats = {
            "median": float(np.median(sub)),
            "p95": float(np.percentile(sub, 95)),
            "p99": float(np.percentile(sub, 99)),
            "max": float(sub.max()),
            "valid_fraction": float(np.asarray(valid).mean()),
        }
        out["sweeps"][f"polish_{polish}"] = stats
        print(f"polish={polish}: {stats}")
    soa_solver._POLISH_STEPS = default_polish

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "polish_accuracy.json")
    with open(path, "w", encoding="utf-8") as handle:
        json.dump(out, handle, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
