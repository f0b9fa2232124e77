"""Native C++ slicer vs the Python reference implementation."""
import numpy as np
import pytest

from dair_pll_tpu.data import native


def python_slices(trajectories, t_skip, t_history, t_prediction):
    pasts, futures = [], []
    for trajectory in trajectories:
        T = trajectory.shape[0]
        for t in range(t_skip, T - t_prediction):
            pasts.append(trajectory[t - t_history + 1:t + 1])
            futures.append(trajectory[t + 1:t + 1 + t_prediction])
    return np.stack(pasts), np.stack(futures)


@pytest.mark.skipif(not native.native_available(),
                    reason="native slicer not built")
def test_native_matches_python(rng):
    trajectories = [
        rng.standard_normal((T, 13)).astype(np.float32)
        for T in (20, 35, 11, 50)]
    for (t_skip, t_history, t_prediction) in ((0, 1, 1), (1, 2, 2),
                                              (3, 2, 4)):
        past_n, future_n = native.slice_trajectories_native(
            trajectories, t_skip, t_history, t_prediction)
        past_p, future_p = python_slices(
            trajectories, t_skip, t_history, t_prediction)
        np.testing.assert_array_equal(past_n, past_p)
        np.testing.assert_array_equal(future_n, future_p)


@pytest.mark.skipif(not native.native_available(),
                    reason="native slicer not built")
def test_native_short_trajectories(rng):
    """Trajectories too short to slice contribute nothing."""
    trajectories = [rng.standard_normal((2, 5)).astype(np.float32),
                    rng.standard_normal((10, 5)).astype(np.float32)]
    past, future = native.slice_trajectories_native(
        trajectories, 2, 3, 4)
    past_p, future_p = python_slices(trajectories[1:], 2, 3, 4)
    np.testing.assert_array_equal(past, past_p)
    np.testing.assert_array_equal(future, future_p)
