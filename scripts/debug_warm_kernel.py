"""Debug the warm-kernel vs XLA-warm f64 mismatch (round 4).

Instruments the primal-cost selection inside solve_warm_hybrid_soa for
both executions of the same inputs: the XLA warm path
(soa_contactnets_loss_warm, solver_backend="xla") and the Pallas warm
kernel in interpret mode. Prints per-sample losses, the selection mask,
and primal costs so we can see whether mismatched samples sit at
selection ties (branch-point ULP flips) or reveal a real layout bug.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody import soa_terms
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.urdf import build_multibody_model
from dair_pll_tpu.ops import soa, soa_solver
from tests.test_fused_loss import _perturbed_params, _random_transitions

DT = 0.0068
EPS = 1e-3
B = 16

model = build_multibody_model({"cube": get_asset("cube")})
system = MultibodyLearnableSystem(model, DT)
x, u, x_plus = _random_transitions(model, B, jax.random.PRNGKey(3),
                                   jnp.float64)
params = _perturbed_params(model, jax.random.PRNGKey(7), jnp.float64)
k = model.n_contacts

zero = [jnp.zeros((k, B), x.dtype)] * 3
xla_loss, xla_force, _ = soa_terms.soa_contactnets_loss_warm(
    model, params, x, u, x_plus, DT, EPS, 2, 6, zero,
    solver_backend="xla")

from dair_pll_tpu.ops.soa_loss_pallas import (
    fused_contactnets_loss_kernel_warm)
ker_loss, ker_force = fused_contactnets_loss_kernel_warm(
    model, params, x, u, x_plus, DT, EPS, 2, 6,
    jnp.zeros((3, k, B), x.dtype), interpret=True)

xl = np.asarray(xla_loss)
kl = np.asarray(ker_loss)
rel = np.abs(kl - xl) / (np.abs(xl) + 1e-12)
print("loss rel diff per sample:")
for i in range(B):
    flag = " <-- MISMATCH" if rel[i] > 1e-8 else ""
    print(f"  [{i:2d}] xla={xl[i]:.12e} ker={kl[i]:.12e} "
          f"rel={rel[i]:.3e}{flag}")

xf = np.asarray(jnp.stack(xla_force))
kf = np.asarray(ker_force)
frel = np.abs(kf - xf).max(axis=(0, 1)) / (np.abs(xf).max() + 1e-12)
print("\nforce rel diff per sample:", np.array2string(frel, precision=3))

# Now recompute the selection internals outside any kernel (plain SoA
# path) to see where the mismatched samples sit relative to the
# better-of tie.
n_q, n_v = model.n_q, model.n_v
xT, xpT = x.T, x_plus.T
v = soa.unstack(xT[n_q:n_q + n_v])
q_plus = soa.unstack(xpT[:n_q])
v_plus = soa.unstack(xpT[n_q:n_q + n_v])
u_soa = soa.unstack(u.T) if model.n_u > 0 else []
sp = soa_terms.scalarize_derived(
    model, soa_terms.derive_scalar_params(model, params))
M, Jc, phi, qc, dv = soa_terms.soa_loss_parts(
    model, sp, v, q_plus, v_plus, u_soa, DT)

eps = jnp.asarray(EPS, x.dtype)
w_carry = soa.spd_solve(M, soa_solver.jt_dot(Jc, zero))
x_ipm = soa_solver.solve_ipm_mj(M, Jc, qc, eps, 2)
w_ipm = soa.spd_solve(M, soa_solver.jt_dot(Jc, x_ipm))
c_carry = np.asarray(
    soa_solver.primal_cost(M, Jc, qc, eps, w_carry))[0]
c_ipm = np.asarray(soa_solver.primal_cost(M, Jc, qc, eps, w_ipm))[0]
print("\nprimal costs (carry vs ipm):")
for i in range(B):
    gap = (c_carry[i] - c_ipm[i]) / (abs(c_ipm[i]) + 1e-300)
    flag = " <-- MISMATCH" if rel[i] > 1e-8 else ""
    print(f"  [{i:2d}] carry={c_carry[i]:+.9e} ipm={c_ipm[i]:+.9e} "
          f"relgap={gap:+.3e}{flag}")

# -- phase 2: exact cache (the production steady state) ---------------------
print("\n=== exact-cache parity (cache = full-budget solve at SAME params)")
_, cache_xla, _ = soa_terms.soa_contactnets_loss_warm(
    model, params, x, u, x_plus, DT, EPS, 14, 8, zero,
    solver_backend="xla")
cache_arr = jnp.stack(cache_xla)
xla_loss2, _, _ = soa_terms.soa_contactnets_loss_warm(
    model, params, x, u, x_plus, DT, EPS, 2, 6, cache_xla,
    solver_backend="xla")
ker_loss2, _ = fused_contactnets_loss_kernel_warm(
    model, params, x, u, x_plus, DT, EPS, 2, 6, cache_arr,
    interpret=True)
xl2, kl2 = np.asarray(xla_loss2), np.asarray(ker_loss2)
rel2 = np.abs(kl2 - xl2) / (np.abs(xl2) + 1e-12)
print("max rel:", rel2.max(), " median:", np.median(rel2))

# -- phase 3: is the zero-cache (2,6) mismatch convergence chaos?  -----------
# Compare both paths' distance to an f64 (30,30) referee.
print("\n=== referee distances at zero cache (2,6)")
ref_loss = soa_terms.soa_contactnets_loss(
    model, params, x, u, x_plus, DT, EPS, 30, 30, solver_backend="xla")
rl = np.asarray(ref_loss)
print("xla->ref rel:", np.abs(xl - rl) / (np.abs(rl) + 1e-12))
print("ker->ref rel:", np.abs(kl - rl) / (np.abs(rl) + 1e-12))
