"""Property tests for state spaces (inverse pairs per SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.state_space import (
    CenteredSampler, FixedBaseSpace, FloatingBaseSpace, ProductSpace,
    UniformSampler, WhiteNoiser, ZeroSampler)


def spaces():
    return [
        FloatingBaseSpace(0),
        FloatingBaseSpace(2),
        FixedBaseSpace(3),
        ProductSpace([FloatingBaseSpace(1), FixedBaseSpace(2)]),
    ]


def random_states(space, rng, n):
    sampler = CenteredSampler(
        space, jnp.ones(2 * space.n_v), kind="gaussian")
    key = jax.random.PRNGKey(rng.integers(0, 2**31))
    return sampler.get_samples(key, n, dtype=jnp.float64)


@pytest.mark.parametrize("space", spaces(), ids=lambda s: type(s).__name__ +
                         str(s.n_q))
def test_difference_exponential_roundtrip(space, rng):
    x1 = random_states(space, rng, 32)
    x2 = random_states(space, rng, 32)
    q1, q2 = space.q(x1), space.q(x2)
    dq = space.configuration_difference(q1, q2)
    q2_rec = space.exponential(q1, dq)
    np.testing.assert_allclose(
        space.project_configuration(q2_rec),
        space.project_configuration(q2), atol=1e-9)


@pytest.mark.parametrize("space", spaces(), ids=lambda s: type(s).__name__ +
                         str(s.n_q))
def test_finite_difference_euler_roundtrip(space, rng):
    x = random_states(space, rng, 16)
    q = space.q(x)
    v = jnp.asarray(rng.standard_normal((16, space.n_v)))
    dt = 0.0068
    q_plus = space.euler_step(q, v, dt)
    v_rec = space.finite_difference(q, q_plus, dt)
    np.testing.assert_allclose(v_rec, v, atol=1e-8)


@pytest.mark.parametrize("space", spaces(), ids=lambda s: type(s).__name__ +
                         str(s.n_q))
def test_state_shift_roundtrip(space, rng):
    x1 = random_states(space, rng, 16)
    x2 = random_states(space, rng, 16)
    dx = space.state_difference(x1, x2)
    x2_rec = space.shift_state(x1, dx)
    np.testing.assert_allclose(
        space.project_state(x2_rec), space.project_state(x2), atol=1e-9)


def test_zero_state_identity():
    space = FloatingBaseSpace(1)
    z = space.zero_state(jnp.float64)
    assert z.shape == (space.n_x,)
    np.testing.assert_allclose(z[0], 1.0)
    np.testing.assert_allclose(z[1:], 0.0)
    err = space.state_square_error(z[None], z[None])
    np.testing.assert_allclose(err, 0.0, atol=1e-14)


def test_project_derivative(rng):
    space = FloatingBaseSpace(0)
    dt = 0.01
    x0 = random_states(space, rng, 1)[0]
    v = jnp.asarray(rng.standard_normal((space.n_v,)))
    # Build an exactly-consistent trajectory with constant velocity.
    qs = [space.q(x0)]
    for _ in range(5):
        qs.append(space.euler_step(qs[-1], v, dt))
    traj = jnp.stack([space.x(q, jnp.zeros_like(v)) for q in qs])
    projected = space.project_derivative(traj, dt)
    assert projected.shape == (5, space.n_x)
    np.testing.assert_allclose(
        projected[:, space.n_q:], jnp.broadcast_to(v, (5, space.n_v)),
        atol=1e-8)


def test_auxiliary_comparisons(rng):
    space = FloatingBaseSpace(0)
    x = random_states(space, rng, 8)
    comps = space.auxiliary_comparisons()
    assert set(comps) == {"rot_err", "pos_err"}
    np.testing.assert_allclose(comps["rot_err"](x, x), 0.0, atol=1e-9)
    np.testing.assert_allclose(comps["pos_err"](x, x), 0.0, atol=1e-12)


def test_product_space_splits(rng):
    space = ProductSpace([FloatingBaseSpace(1), FixedBaseSpace(2)])
    assert space.n_q == 8 + 2 and space.n_v == 7 + 2
    x = random_states(space, rng, 4)
    parts = space.x_split(x)
    assert parts[0].shape == (4, 15) and parts[1].shape == (4, 4)


def test_samplers_and_noisers(rng):
    space = FloatingBaseSpace(0)
    key = jax.random.PRNGKey(0)
    zero = ZeroSampler(space).get_sample(key, jnp.float64)
    np.testing.assert_allclose(zero, space.zero_state(jnp.float64))

    ranges = jnp.full((2 * space.n_v,), 0.1)
    samples = UniformSampler(space, ranges).get_samples(
        key, 256, dtype=jnp.float64)
    # quaternions stay unit norm
    norms = jnp.linalg.norm(samples[:, :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)

    noiser = WhiteNoiser(space, "gaussian")
    noised = noiser.noise(key, samples, ranges)
    assert noised.shape == samples.shape
    cov = noiser.covariance(ranges)
    np.testing.assert_allclose(cov, jnp.diag(ranges ** 2), atol=1e-12)

    # shared (non-independent) noise distorts all states identically
    shared = noiser.noise(key, jnp.stack([zero, zero]), ranges,
                          independent=False)
    np.testing.assert_allclose(shared[0], shared[1], atol=1e-12)


def test_spaces_hashable_jit_static():
    space = FloatingBaseSpace(2)

    @jax.jit
    def op(x1, x2):
        return space.state_square_error(x1, x2)

    z = space.zero_state(jnp.float64)[None]
    assert op(z, z).shape == (1,)
