"""Probe AoS hybrid convergence vs budget on the hard grazing QP found
by diag_fused_rollout (step 12, sample 2)."""
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
from dair_pll_tpu.ops.sap_solver import solve_cone_qp_hybrid_warm
from dair_pll_tpu.urdf import build_multibody_model


def main():
    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float64)
    system = MultibodyLearnableSystem(model, 0.0068)
    space = system.space
    dt = system.dt

    # Reproduce the rollout to step 12 via the vmapped path.
    rng = np.random.default_rng(0)
    B = 12
    quat = rng.standard_normal((B, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    x0 = jnp.asarray(np.concatenate(
        [quat, 0.02 * rng.standard_normal((B, 2)),
         0.1 + 0.05 * rng.random((B, 1)),
         rng.standard_normal((B, 6)) * [2, 2, 2, 0.5, 0.5, 0.2]],
        axis=-1))
    traj = system.simulate_batch(params, x0, 12, use_fused=False)
    x = traj[2, 12]  # sample 2, step 12

    q, v = space.q_v(x)
    u = jnp.zeros((model.n_u,), x.dtype)
    delassus, M, J, phi, a_nc = multibody_terms(model, params, q, v, u)
    k = phi.shape[-1]
    ptz = jnp.concatenate((phi, jnp.zeros((2 * k,), phi.dtype)))
    v_minus = v + dt * a_nc
    q_full = J @ v_minus + ptz / dt
    eps = jnp.asarray(DYNAMICS_EPSILON, phi.dtype)
    epsI = DYNAMICS_EPSILON * jnp.eye(3 * k)
    Q = delassus + epsI

    def cost(f):
        return float(0.5 * f @ Q @ f + f @ q_full)

    print("phi:", np.asarray(phi))
    print("eigvals(Q):", np.linalg.eigvalsh(np.asarray(Q)))
    w0 = jnp.zeros((model.n_v,), x.dtype)
    ref, _ = solve_cone_qp_hybrid_warm(M, J, q_full, eps, w0, 60, 60)
    cref = cost(ref)
    print(f"referee cost {cref:.12f}")
    for ipm in (6, 10, 14, 20, 30):
        for newt in (2, 4, 6, 8, 12, 20):
            g, _ = solve_cone_qp_hybrid_warm(M, J, q_full, eps, w0,
                                             ipm, newt)
            print(f"ipm={ipm:2d} newt={newt:2d}: "
                  f"dcost={cost(g)-cref:+.3e} "
                  f"|dimp|={np.abs(np.asarray(g - ref)).max():.3e}")


if __name__ == "__main__":
    main()
