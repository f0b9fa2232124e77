"""Where does fused-loss compile time go? Trace vs compile, per stage."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.multibody import soa_terms
from dair_pll_tpu.ops import soa, soa_solver
from dair_pll_tpu.urdf import build_multibody_model

model = build_multibody_model({"cube": get_asset("cube")})
system = MultibodyLearnableSystem(model, 0.0068)
dtype = jnp.float64
B = 32
key = jax.random.PRNGKey(3)
x = jax.random.normal(key, (B, model.n_q + model.n_v), dtype)
x = x.at[:, :4].set(x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1,
                                               keepdims=True))
xp = x + 0.01
xp = xp.at[:, :4].set(xp[:, :4] / jnp.linalg.norm(xp[:, :4], axis=-1,
                                                  keepdims=True))
u = jnp.zeros((B, 0), dtype)
params = model.initial_params(dtype)


def timeit(name, fn, *args):
    t0 = time.time()
    jaxpr = jax.make_jaxpr(fn)(*args)
    t1 = time.time()
    n_eqns = len(jaxpr.jaxpr.eqns)
    compiled = jax.jit(fn).lower(*args).compile()
    t2 = time.time()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    t3 = time.time()
    print(f"{name}: trace {t1-t0:.1f}s ({n_eqns} eqns) "
          f"compile {t2-t1:.1f}s run {t3-t2:.2f}s", flush=True)


def terms_only(p, x, xp):
    n_q, n_v = model.n_q, model.n_v
    xpT = xp.T
    q_plus = soa.unstack(xpT[:n_q])
    v_plus = soa.unstack(xpT[n_q:n_q + n_v])
    M, Jc, phi, a_nc = soa_terms.soa_multibody_terms(
        model, p, q_plus, v_plus, [])
    return soa.stack_mat(M), phi, soa.stack(a_nc)


def solver_only(x, xp):
    # fixed random QP pieces in cone-field SoA form
    n_v = model.n_v
    k = model.n_contacts
    key = jax.random.PRNGKey(0)
    kM, kJ, kq = jax.random.split(key, 3)
    A = jax.random.normal(kM, (n_v, n_v, B), dtype)
    M = [[sum(A[i][l] * A[j][l] for l in range(n_v)) +
          (2.0 if i == j else 0.0) for j in range(n_v)]
         for i in range(n_v)]
    J = jax.random.normal(kJ, (3, n_v, k, B), dtype)
    Jc = [[J[i, v] for v in range(n_v)] for i in range(3)]
    q = jax.random.normal(kq, (3, k, B), dtype)
    qc = [q[i] for i in range(3)]
    gamma, valid = soa_solver.solve_contact_impulse_soa(
        M, Jc, qc, jnp.asarray(1e-3, dtype), 10, 6)
    return gamma[0]


def full_loss(p):
    return jnp.sum(system.contactnets_loss_batch(p, x, u, xp,
                                                 use_fused=True))


timeit("terms", terms_only, params, x, xp)
timeit("solver", solver_only, x, xp)
timeit("loss", full_loss, params)
timeit("grad", jax.grad(full_loss), params)
