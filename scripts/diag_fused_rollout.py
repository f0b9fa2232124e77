"""Diagnose the fused-rollout vs vmapped-integrator parity failure.

Three questions (VERDICT r3 item 1):
  1. Does a SINGLE fused step (cold start, w0=0) already differ from the
     vmapped step at f64?
  2. Along the 20-step trajectory, if we re-sync the fused path to the
     vmapped states each step (one-step error), how big is the per-step
     error, and at which step does it spike?
  3. At the first spiking step, what do high-budget f64 referee solves
     say — which path's impulse is closer to the converged optimum?
"""
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
from dair_pll_tpu.multibody.soa_terms import soa_forward_dynamics_batch
from dair_pll_tpu.multibody.terms import multibody_terms
from dair_pll_tpu.ops.sap_solver import solve_cone_qp_hybrid_warm
from dair_pll_tpu.urdf import build_multibody_model


def main():
    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float64)
    system = MultibodyLearnableSystem(model, 0.0068)
    rng = np.random.default_rng(0)
    B = 12
    quat = rng.standard_normal((B, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    x0 = jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((B, 2)),
         0.1 + 0.05 * rng.random((B, 1)),
         rng.standard_normal((B, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))

    space = system.space
    dt = system.dt

    def vmapped_step(x):
        def one(xi):
            q, v = space.q_v(xi)
            u = jnp.zeros((model.n_u,), xi.dtype)
            v_plus = system.forward_dynamics(params, q, v, u)
            q_next = space.euler_step(q, v_plus, dt)
            return space.x(q_next, v_plus)
        return jax.vmap(one)(x)

    def fused_step(x, w):
        v_plus, w = soa_forward_dynamics_batch(
            model, params, x, w, dt, DYNAMICS_EPSILON,
            CONTACT_FILTER_EPS, system.warm_ipm_iterations,
            system.warm_newton_iterations)
        q_next = jax.vmap(space.euler_step, (0, 0, None))(
            jax.vmap(space.q)(x), v_plus, dt)
        return jax.vmap(space.x)(q_next, v_plus), w

    vmapped_step = jax.jit(vmapped_step)
    fused_step = jax.jit(fused_step)

    # Q2: resync each step — one-step error along the vmapped trajectory.
    x = x0
    w = jnp.zeros((B, model.n_v), x0.dtype)
    print("step | one-step max|dx| (resync, cold w) | warm-carry")
    xw = x0
    wc = jnp.zeros((B, model.n_v), x0.dtype)
    worst = (0, -1.0, None)
    for t in range(20):
        x_ref = vmapped_step(x)
        x_f_cold, _ = fused_step(x, jnp.zeros_like(w))
        err_cold = np.abs(np.asarray(x_f_cold - x_ref))
        # warm path follows its own trajectory (like the real test)
        xw_ref_next = vmapped_step(xw) if False else None
        e = err_cold.max()
        b = int(np.unravel_index(err_cold.argmax(), err_cold.shape)[0])
        print(f"{t:4d} | {e:.3e} (sample {b})")
        if e > worst[1]:
            worst = (t, e, x)
        x = x_ref

    t_bad, e_bad, x_bad = worst
    print(f"\nWorst one-step error {e_bad:.3e} at step {t_bad}")

    # Q3: referee the worst state. For each sample: solve with the
    # vmapped hybrid (10,8 default), the fused warm (10,6) cold-start,
    # and a high-budget referee (40,40).
    def impulse_paths(xi):
        q, v = space.q_v(xi)
        u = jnp.zeros((model.n_u,), xi.dtype)
        delassus, M, J, phi, a_nc = multibody_terms(model, params, q, v, u)
        k = phi.shape[-1]
        phi_then_zero = jnp.concatenate((phi, jnp.zeros((2 * k,), phi.dtype)))
        v_minus = v + dt * a_nc
        q_full = J @ v_minus + phi_then_zero / dt
        eps = jnp.asarray(DYNAMICS_EPSILON, phi.dtype)
        imp_vmap, _ = system._solve_contact(delassus, M, J, q_full, eps)
        w0 = jnp.zeros((model.n_v,), xi.dtype)
        imp_warm, _ = solve_cone_qp_hybrid_warm(
            M, J, q_full, eps, w0, system.warm_ipm_iterations,
            system.warm_newton_iterations)
        imp_ref, _ = solve_cone_qp_hybrid_warm(M, J, q_full, eps, w0, 40, 40)
        cost = lambda f: 0.5 * f @ (delassus + eps * jnp.eye(3 * k)) @ f + f @ q_full
        return (imp_vmap, imp_warm, imp_ref,
                cost(imp_vmap), cost(imp_warm), cost(imp_ref), phi)

    paths = jax.jit(jax.vmap(impulse_paths))(x_bad)
    iv, iw, ir, cv, cw, cr, phi = [np.asarray(p) for p in paths]
    print("\nsample | phi_min | |imp_vmap-ref| | |imp_warm-ref| | cost_vmap-ref | cost_warm-ref")
    for b in range(B):
        print(f"{b:5d} | {phi[b].min():+.4f} | "
              f"{np.abs(iv[b]-ir[b]).max():.3e} | "
              f"{np.abs(iw[b]-ir[b]).max():.3e} | "
              f"{cv[b]-cr[b]:+.3e} | {cw[b]-cr[b]:+.3e}")

    # SoA solver on the same states: compare gamma + cost vs referee.
    from dair_pll_tpu.multibody.soa_terms import soa_multibody_terms
    from dair_pll_tpu.ops import soa, soa_solver

    def soa_paths(x):
        n_q, n_v = model.n_q, model.n_v
        xT = x.T
        q = soa.unstack(xT[:n_q])
        v = soa.unstack(xT[n_q:n_q + n_v])
        u_soa = [jnp.zeros_like(v[0]) for _ in range(model.n_u)]
        M, Jc, phi_b, a_nc = soa_multibody_terms(model, params, q, v, u_soa)
        v_minus = [v[i] + dt * a_nc[i] for i in range(n_v)]
        jv = soa_solver.j_dot(Jc, v_minus)
        qc = [jv[0] + phi_b / dt, jv[1], jv[2]]
        w_carry = [jnp.zeros_like(v[i])[None, :] for i in range(n_v)]
        eps = jnp.asarray(DYNAMICS_EPSILON, x.dtype)
        gamma, w, valid = soa_solver.solve_warm_hybrid_soa(
            M, Jc, qc, w_carry, eps, system.warm_ipm_iterations,
            system.warm_newton_iterations)
        dv = soa.spd_solve(M, soa_solver.jt_dot(Jc, gamma))
        v_plus = jnp.stack(
            [(v_minus[i] + dv[i]).reshape(-1) for i in range(n_v)], axis=-1)
        # stack gamma (n,t1,t2 per contact) into AoS layout [n_1..n_k, t...]
        g_n = gamma[0]    # (k, B)
        g_t = jnp.stack([gamma[1], gamma[2]], axis=1)  # (k,2,B)
        k = g_n.shape[0]
        g_aos = jnp.concatenate(
            [g_n.T, g_t.transpose(2, 0, 1).reshape(-1, 2 * k)], axis=-1)
        return g_aos, v_plus, valid

    g_soa, vp_soa, valid = jax.jit(soa_paths)(x_bad)
    g_soa = np.asarray(g_soa)
    print("\nsample | |imp_soa-ref| | cost_soa-ref | valid")
    k = phi.shape[-1]
    for b in range(B):
        D = None
        # recompute cost via impulse_paths pieces
        q_, v_ = space.q_v(x_bad[b])
        u_ = jnp.zeros((model.n_u,), x_bad.dtype)
        delassus, M_, J_, phi_, a_nc_ = multibody_terms(
            model, params, q_, v_, u_)
        ptz = jnp.concatenate((phi_, jnp.zeros((2 * k,), phi_.dtype)))
        v_minus_ = v_ + dt * a_nc_
        q_full_ = J_ @ v_minus_ + ptz / dt
        epsI = DYNAMICS_EPSILON * jnp.eye(3 * k)
        cost = lambda f: float(
            0.5 * f @ (delassus + epsI) @ f + f @ q_full_)
        print(f"{b:5d} | {np.abs(g_soa[b]-ir[b]).max():.3e} | "
              f"{cost(jnp.asarray(g_soa[b]))-cr[b]:+.3e} | "
              f"{np.asarray(valid).reshape(-1)[b] if np.asarray(valid).size == B else valid}")


if __name__ == "__main__":
    main()
