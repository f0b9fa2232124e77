"""Scratch parity check: SoA hybrid solver vs per-sample hybrid solver."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.ops import soa
from dair_pll_tpu.ops.sap_solver import solve_contact_impulse_hybrid
from dair_pll_tpu.ops.soa_solver import solve_contact_impulse_soa


def make_problems(key, B, k, n_v, dtype=jnp.float64):
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (B, n_v, n_v), dtype)
    M = A @ jnp.swapaxes(A, 1, 2) + 2.0 * jnp.eye(n_v, dtype=dtype)
    J = jax.random.normal(k2, (B, 3 * k, n_v), dtype)
    q = jax.random.normal(k3, (B, 3 * k), dtype)
    return M, J, q


def to_soa(M, J, q, k):
    """Batch-major (B, ...) problem data -> cone-field SoA form."""
    n_v = J.shape[2]
    M_soa = [[M[:, i, j] for j in range(M.shape[2])]
             for i in range(M.shape[1])]
    rows = [[c, k + 2 * c, k + 2 * c + 1] for c in range(k)]
    # Jc[i][v] and qc[i] have shape (k, B).
    Jc = [[jnp.stack([J[:, rows[c][i], v] for c in range(k)])
           for v in range(n_v)] for i in range(3)]
    qc = [jnp.stack([q[:, rows[c][i]] for c in range(k)])
          for i in range(3)]
    return M_soa, Jc, qc


def main():
    B, k, n_v = 64, 4, 6
    eps = 1e-3
    key = jax.random.PRNGKey(0)
    M, J, q = make_problems(key, B, k, n_v)
    delassus = J @ jnp.linalg.solve(M, jnp.swapaxes(J, 1, 2))

    ref_fn = jax.jit(jax.vmap(
        lambda D, Mi, Ji, qv: solve_contact_impulse_hybrid(
            D, Mi, Ji, qv, jnp.asarray(eps, q.dtype), 10, 6)))
    ref_imp, ref_valid = ref_fn(delassus, M, J, q)

    def soa_fn(M, J, q):
        M_soa, Jc, qc = to_soa(M, J, q, k)
        gamma, valid = solve_contact_impulse_soa(
            M_soa, Jc, qc, jnp.asarray(eps, q.dtype), 10, 6)
        # back to stacked layout (B, 3k): gamma leaves are (k, B).
        normals = gamma[0].T                               # (B, k)
        tangents = jnp.stack((gamma[1], gamma[2]),
                             axis=-1).transpose(1, 0, 2).reshape(B, 2 * k)
        return jnp.concatenate((normals, tangents), axis=1), valid

    soa_imp, soa_valid = jax.jit(soa_fn)(M, J, q)

    err = np.abs(np.asarray(soa_imp) - np.asarray(ref_imp))
    scale = np.maximum(np.abs(np.asarray(ref_imp)), 1.0)
    print("max abs err:", err.max(), " max rel err:", (err / scale).max())
    print("valid agree:", bool((np.asarray(soa_valid) ==
                                np.asarray(ref_valid)).all()))

    # also check objective parity
    def obj(imp):
        Qx = jnp.einsum("bij,bj->bi", delassus, imp) + eps * imp
        return 0.5 * jnp.einsum("bi,bi->b", imp, Qx) + \
            jnp.einsum("bi,bi->b", imp, q)

    o_ref = np.asarray(obj(ref_imp))
    o_soa = np.asarray(obj(soa_imp))
    print("objective diff (soa - ref) max:",
          (o_soa - o_ref).max(), "min:", (o_soa - o_ref).min())


if __name__ == "__main__":
    main()
