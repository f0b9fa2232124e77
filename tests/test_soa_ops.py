"""Unit parity tests for the batch-minor SoA primitive layers
(``ops/soa.py``, ``ops/soa_cones.py``) against the per-sample reference
implementations (``ops/linear.py``, ``ops/cones.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from dair_pll_tpu.ops import cones, soa, soa_cones
from dair_pll_tpu.ops.linear import cho_solve_unrolled, cholesky_unrolled


def _rand_spd(key, n, B):
    A = jax.random.normal(key, (B, n, n), jnp.float64)
    return A @ jnp.swapaxes(A, 1, 2) + 3.0 * jnp.eye(n)


def _to_smat(M):
    return [[M[:, i, j] for j in range(M.shape[2])]
            for i in range(M.shape[1])]


def test_soa_cholesky_and_solve():
    key = jax.random.PRNGKey(0)
    B, n = 64, 6
    M = _rand_spd(key, n, B)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float64)

    L_ref = cholesky_unrolled(M)
    x_ref = cho_solve_unrolled(L_ref, rhs)

    L = soa.cholesky(_to_smat(M))
    x = soa.cho_solve(L, [rhs[:, i] for i in range(n)])
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in x], 1),
                               np.asarray(x_ref), rtol=1e-12, atol=1e-12)


def test_soa_ldlt_matches_cholesky_solve():
    """The division-free LDL^T path (the hot-path factorization) solves
    the same systems as the Cholesky reference."""
    key = jax.random.PRNGKey(7)
    B, n = 64, 6
    M = _rand_spd(key, n, B)
    rhs = jax.random.normal(jax.random.PRNGKey(8), (B, n), jnp.float64)

    x_ref = cho_solve_unrolled(cholesky_unrolled(M), rhs)
    fac = soa.ldlt(_to_smat(M))
    x = soa.ldlt_solve(fac, [rhs[:, i] for i in range(n)])
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in x], 1),
                               np.asarray(x_ref), rtol=1e-11, atol=1e-11)
    # spd_solve routes through ldlt.
    x2 = soa.spd_solve(_to_smat(M), [rhs[:, i] for i in range(n)])
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in x2], 1),
                               np.asarray(x_ref), rtol=1e-11, atol=1e-11)


def test_soa_sort_with_payload_matches_argsort():
    key = jax.random.PRNGKey(2)
    B, n = 128, 8
    vals = jax.random.normal(key, (n, B), jnp.float64)
    payload = vals * 2.0 + 1.0

    keys_sorted, (payload_sorted,) = soa.sort_with_payload(
        [vals[i] for i in range(n)], [[payload[i] for i in range(n)]],
        descending=True)
    ref_order = np.argsort(-np.asarray(vals), axis=0)
    ref_keys = np.take_along_axis(np.asarray(vals), ref_order, axis=0)
    ref_payload = np.take_along_axis(np.asarray(payload), ref_order,
                                     axis=0)
    np.testing.assert_allclose(np.stack(keys_sorted), ref_keys)
    np.testing.assert_allclose(np.stack(payload_sorted), ref_payload)


def _rand_cones(key, k, B, interior=False):
    u = jax.random.normal(key, (B, k, 3), jnp.float64)
    if interior:
        u = u.at[..., 0].set(
            jnp.abs(u[..., 0]) + jnp.linalg.norm(u[..., 1:], axis=-1))
    return u


def _field(u):
    """(B, k, 3) -> cone field [n, t1, t2] of (k, B)."""
    return [u[..., i].T for i in range(3)]


def test_soa_cone_primitives_match_reference():
    key = jax.random.PRNGKey(3)
    B, k = 64, 4
    z = _rand_cones(key, k, B)
    v = _rand_cones(jax.random.PRNGKey(4), k, B)

    # project
    ref = jax.vmap(cones.project)(z)
    got = soa_cones.project(_field(z))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in got], -1), np.asarray(ref),
        rtol=1e-14, atol=1e-14)

    # projection jacobian action
    ref = jax.vmap(cones.projection_jacobian_apply)(z, v)
    got = soa_cones.projection_jacobian_apply(_field(z), _field(v))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in got], -1), np.asarray(ref),
        rtol=1e-13, atol=1e-13)

    # fused projection + jacobian forms match the separate primitives
    gamma_f, du_f = soa_cones.project_and_jacobian_apply(
        _field(z), _field(v))
    gamma_s = soa_cones.project(_field(z))
    du_s = soa_cones.projection_jacobian_apply(_field(z), _field(v))
    for a, b in zip(gamma_f + du_f, gamma_s + du_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    gamma_m, mat_f = soa_cones.project_and_jacobian_matrix(_field(z))
    mat_s = jax.vmap(cones.projection_jacobian_matrix)(z)
    for a, b in zip(gamma_m, gamma_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    np.testing.assert_allclose(
        np.stack([np.stack([np.asarray(mat_f[i][j]).T for j in range(3)],
                           -1) for i in range(3)], -2),
        np.asarray(mat_s), rtol=1e-13, atol=1e-13)

    # jordan product + arrow solve (interior points for invertibility)
    x = _rand_cones(jax.random.PRNGKey(5), k, B, interior=True)
    ref = jax.vmap(cones.jordan_product)(x, v)
    got = soa_cones.jordan_product(_field(x), _field(v))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in got], -1), np.asarray(ref),
        rtol=1e-13, atol=1e-13)
    ref = jax.vmap(cones.arrow_solve)(x, v)
    got = soa_cones.arrow_solve(_field(x), _field(v))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in got], -1), np.asarray(ref),
        rtol=1e-11, atol=1e-11)


def test_soa_nt_scaling_and_step_to_boundary():
    key = jax.random.PRNGKey(6)
    B, k = 48, 4
    x = _rand_cones(key, k, B, interior=True)
    z = _rand_cones(jax.random.PRNGKey(7), k, B, interior=True)
    du = _rand_cones(jax.random.PRNGKey(8), k, B)

    scaling_ref, lam_ref = jax.vmap(cones.nt_scaling)(x, z)
    scaling, lam = soa_cones.nt_scaling(_field(x), _field(z))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in lam], -1),
        np.asarray(lam_ref), rtol=1e-11, atol=1e-11)

    # W u matches
    u = _rand_cones(jax.random.PRNGKey(9), k, B)
    wu_ref = jax.vmap(lambda s_v, s_eta, uu: cones.NTScaling(
        s_v, s_eta).apply(uu))(scaling_ref.v, scaling_ref.eta, u)
    wu = scaling.apply(_field(u))
    np.testing.assert_allclose(
        np.stack([np.asarray(g).T for g in wu], -1), np.asarray(wu_ref),
        rtol=1e-11, atol=1e-11)

    # step to boundary
    ref = jax.vmap(cones.step_to_boundary)(x, du)
    from dair_pll_tpu.ops.soa_solver import _step_to_boundary
    got = _step_to_boundary(_field(x), _field(du))
    np.testing.assert_allclose(np.asarray(got).reshape(-1),
                               np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_warm_hybrid_pallas_kernel_matches_soa_solver():
    """The warm-started Pallas hybrid-solve kernel (interpret mode on
    CPU) matches the XLA SoA warm solve — same code, same order (VERDICT
    round-2 item 4: the rollout solve through the Pallas kernel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dair_pll_tpu.ops.soa_pallas import solve_warm_hybrid_soa_pallas
    from dair_pll_tpu.ops.soa_solver import solve_warm_hybrid_soa

    B, k, n_v = 48, 4, 6
    key = jax.random.PRNGKey(3)
    kM, kJ, kq, kw = jax.random.split(key, 4)
    A = jax.random.normal(kM, (n_v, n_v, B), jnp.float64)
    M = [[sum(A[i][l] * A[j][l] for l in range(n_v)) +
          (2.0 if i == j else 0.0) for j in range(n_v)]
         for i in range(n_v)]
    J = jax.random.normal(kJ, (3, n_v, k, B), jnp.float64)
    Jc = [[J[i, v] for v in range(n_v)] for i in range(3)]
    q = jax.random.normal(kq, (3, k, B), jnp.float64)
    qc = [q[i] for i in range(3)]
    w0 = jax.random.normal(kw, (n_v, B), jnp.float64)
    w_carry = [w0[v][None, :] for v in range(n_v)]

    # Compare under jit on both sides: XLA:CPU fuses/FMAs differently in
    # eager vs compiled mode, and on these random (barely convergent)
    # QPs that 1-ulp difference amplifies through the Newton line search.
    import functools
    ref_fn = jax.jit(functools.partial(
        solve_warm_hybrid_soa, eps=1e-3, ipm_iterations=10,
        newton_iterations=6))
    f_ref, w_ref, v_ref = ref_fn(M, Jc, qc, w_carry)
    f_pal, w_pal, v_pal = solve_warm_hybrid_soa_pallas(
        M, Jc, qc, w_carry, 1e-3, 10, 6, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(f_pal)),
                               np.asarray(jnp.stack(f_ref)),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(w_pal, axis=0)),
        np.asarray(jnp.concatenate(
            [jnp.broadcast_to(w, (1, B)) for w in w_ref], axis=0)),
        rtol=1e-8, atol=1e-8)
    np.testing.assert_array_equal(
        np.asarray(v_pal).reshape(-1), np.asarray(v_ref).reshape(-1))
