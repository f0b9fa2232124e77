"""Dataset generation tests: rollout population, noising, finite-diff
reprojection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.data.generation import (DataGenerationConfig,
                                          ExperimentDatasetGenerator)
from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.state_space import UniformSampler
from dair_pll_tpu.urdf import build_multibody_model
from dair_pll_tpu.utils import file_utils

DT = 0.01


@pytest.fixture(scope="module")
def cube_system():
    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, DT, solver_iterations=60)
    return system, model.initial_params()


def test_generate_and_noise(tmp_path, cube_system):
    system, params = cube_system
    space = system.space
    x_0 = np.array(space.zero_state(jnp.float64))
    x_0[6] = 0.2
    ranges = 0.1 * np.ones(2 * space.n_v)
    sampler = UniformSampler(space, jnp.asarray(ranges),
                             x_0=jnp.asarray(x_0))
    config = DataGenerationConfig(
        dt=DT, n_pop=6, trajectory_length=12,
        static_noise=0.001 * np.ones(2 * space.n_v),
        dynamic_noise=0.0005 * np.ones(2 * space.n_v))
    generator = ExperimentDatasetGenerator(system, sampler, params, config)
    generated = generator.generate(str(tmp_path), batch_size=4)
    assert generated == 6

    gt_paths = file_utils.list_trajectories(
        file_utils.trajectory_dir(str(tmp_path),
                                  file_utils.GROUND_TRUTH_SUBDIR))
    learn_paths = file_utils.list_trajectories(
        file_utils.trajectory_dir(str(tmp_path),
                                  file_utils.LEARNING_SUBDIR))
    assert len(gt_paths) == 6 and len(learn_paths) == 6

    gt = file_utils.load_trajectory(gt_paths[0])
    noised = file_utils.load_trajectory(learn_paths[0])
    assert gt.shape == (12, space.n_x)
    # noised trajectories are one step shorter (finite differencing)
    assert noised.shape == (11, space.n_x)

    # finite-difference consistency: v_t == diff(q)/dt in the noised copy
    q = noised[:, :space.n_q]
    v = noised[1:, space.n_q:]
    fd = np.asarray(space.finite_difference(
        jnp.asarray(q[:-1]), jnp.asarray(q[1:]), DT))
    np.testing.assert_allclose(v, fd, atol=1e-5)

    # resuming generation adds nothing (population already met)
    assert generator.generate(str(tmp_path)) == 0


class _DivergingStub:
    """Fake system: half of each batch's rows fly off to 1e8 velocity
    (the f32 contact-rollout blowup mode the max_velocity filter exists
    for), with the diverging half rotating across calls so resampling
    eventually fills the population."""

    def __init__(self, space):
        self.space = space
        self.calls = 0

    def simulate_batch(self, params, x_0, steps):
        del params
        self.calls += 1
        n = x_0.shape[0]
        base = jnp.broadcast_to(x_0[:, None, :],
                                (n, steps + 1, x_0.shape[-1]))
        diverged = ((jnp.arange(n) + self.calls) % 2 == 0)[:, None, None]
        blowup = base.at[..., self.space.n_q:].set(1e8)
        return jnp.where(diverged, blowup, base)


def test_max_velocity_filter_rejects_diverged(tmp_path, cube_system):
    system, params = cube_system
    space = system.space
    x_0 = np.array(space.zero_state(jnp.float64))
    x_0[6] = 0.2
    sampler = UniformSampler(space,
                             jnp.asarray(0.1 * np.ones(2 * space.n_v)),
                             x_0=jnp.asarray(x_0))
    config = DataGenerationConfig(dt=DT, n_pop=5, trajectory_length=8,
                                  max_velocity=100.0)
    generator = ExperimentDatasetGenerator(
        _DivergingStub(space), sampler, params, config)
    generated = generator.generate(str(tmp_path), batch_size=4)
    assert generated == 5
    assert generator.last_rejected >= 5  # half of every batch rejected

    gt_paths = file_utils.list_trajectories(
        file_utils.trajectory_dir(str(tmp_path),
                                  file_utils.GROUND_TRUTH_SUBDIR))
    assert len(gt_paths) == 5
    for path in gt_paths:
        trajectory = file_utils.load_trajectory(path)
        assert np.isfinite(trajectory).all()
        assert (np.abs(trajectory[:, space.n_q:]) <= 100.0).all()


def test_max_velocity_filter_aborts_on_unintegrable_regime(
        tmp_path, cube_system):
    """If (almost) every rollout diverges, generation must raise rather
    than loop forever."""
    system, params = cube_system
    space = system.space

    class _AllDiverge(_DivergingStub):
        def simulate_batch(self, params, x_0, steps):
            out = super().simulate_batch(params, x_0, steps)
            return out.at[..., space.n_q:].set(jnp.inf)

    sampler = UniformSampler(space,
                             jnp.asarray(0.1 * np.ones(2 * space.n_v)),
                             x_0=jnp.asarray(space.zero_state(
                                 jnp.float64)))
    config = DataGenerationConfig(dt=DT, n_pop=4, trajectory_length=8,
                                  max_velocity=100.0)
    generator = ExperimentDatasetGenerator(
        _AllDiverge(space), sampler, params, config)
    with pytest.raises(RuntimeError, match="not integrable"):
        generator.generate(str(tmp_path), batch_size=4)


def test_noise_actually_applied(tmp_path, cube_system):
    system, params = cube_system
    space = system.space
    trajectory = jnp.broadcast_to(
        space.zero_state(jnp.float64).at[6].set(0.5), (2, 10, space.n_x))
    config = DataGenerationConfig(
        dt=DT, n_pop=1, trajectory_length=10,
        static_noise=0.01 * np.ones(2 * space.n_v))
    generator = ExperimentDatasetGenerator(system, None, params, config)
    noised = generator.make_noised_trajectories(
        jax.random.PRNGKey(0), trajectory)
    # static noise: same offset within a trajectory, different across
    delta0 = np.asarray(noised[0, :, 4:7] - 0.0)
    assert np.std(delta0[:, 0]) < 1e-6  # constant shift in x within traj
    assert abs(float(noised[0, 0, 4]) - float(noised[1, 0, 4])) > 1e-6
