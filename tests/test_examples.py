"""Example-CLI smoke tests (VERDICT r4 item 8).

Each canonical example runs as a REAL subprocess (the way users invoke
them) with tiny budgets on CPU, so the CLIs cannot rot silently. The
assertions check exit status, the key progress markers, and the
artifacts the verify recipe documents (checkpoint / log / URDF export).

Reference entry point being covered: ``examples/contactnets_simple.py``
(reference ``examples/contactnets_simple.py:238-268``).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run_example(script, *args, timeout=600):
    """Runs an example CLI on CPU; returns its combined output."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    # The image's sitecustomize force-registers the TPU platform when
    # its site dir is on PYTHONPATH; the examples re-read JAX_PLATFORMS
    # because only the repo is on the path (see CLAUDE.md).
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    return proc.stdout + proc.stderr


@pytest.fixture(scope="module")
def simple_run(tmp_path_factory):
    """One tiny contactnets_simple run shared by the dependent smokes."""
    storage = str(tmp_path_factory.mktemp("examples_storage"))
    out = _run_example(
        "contactnets_simple.py", "--system", "cube", "--source",
        "simulation", "--epochs", "2", "--n-pop", "6", "--eval-samples",
        "2", "--storage", storage, "--run-name", "smoke")
    return storage, out


def test_contactnets_simple_smoke(simple_run):
    storage, out = simple_run
    assert "generated 6 trajectories" in out
    run_dir = os.path.join(storage, "runs", "smoke")
    assert os.path.exists(os.path.join(run_dir, "checkpoint.npz"))
    assert os.path.exists(os.path.join(run_dir, "urdfs", "cube.urdf"))
    log_path = os.path.join(run_dir, "log.jsonl")
    records = [json.loads(line) for line in open(log_path)]
    assert any("train_loss" in r for r in records)
    # Final statistics block printed with the reference's key scheme.
    assert "test_model_trajectory_mse_mean" in out


def test_contactnets_simple_resume(simple_run):
    """Rerunning the identical command resumes: no regeneration, cached
    statistics served (the verify recipe's resume probe)."""
    storage, _ = simple_run
    out = _run_example(
        "contactnets_simple.py", "--system", "cube", "--source",
        "simulation", "--epochs", "2", "--n-pop", "6", "--eval-samples",
        "2", "--storage", storage, "--run-name", "smoke")
    assert "generated 0 trajectories" in out


def test_contactnets_simple_rejects_bad_system():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "contactnets_simple.py"),
         "--system", "pendulum"], capture_output=True, text=True,
        timeout=120, env=env)
    assert proc.returncode != 0
    assert "pendulum" in proc.stderr


def test_deep_learnable_baseline_smoke(simple_run):
    """MLP baseline trains on the storage the simple run produced."""
    storage, _ = simple_run
    out = _run_example(
        "deep_learnable_baseline.py", "--model", "mlp", "--epochs", "2",
        "--hidden-size", "16", "--storage", storage, "--run-name",
        "deep_smoke")
    assert os.path.exists(os.path.join(
        storage, "runs", "deep_smoke", "checkpoint.npz"))
    assert "loss" in out.lower()


def test_dynamic_data_source_smoke(simple_run, tmp_path):
    """Drip-fed dynamic dataset example end to end on a tiny source."""
    storage, _ = simple_run
    source = os.path.join(storage, "data", "learning")
    assert [f for f in os.listdir(source) if f.endswith(".npy")]
    out = _run_example(
        "contactnets_cube_dynamic_data_source.py", "--source-data-dir",
        source, "--storage", str(tmp_path / "dynamic_storage"),
        "--epochs", "3", "--drip-period", "1", "--drip-size", "2")
    assert "epoch" in out.lower() or "train" in out.lower()


def test_study_cube_smoke(tmp_path):
    """Tiny hyperparameter study: trials run, best values saved."""
    storage = str(tmp_path / "study_storage")
    out = _run_example(
        "study_cube.py", "--storage", storage, "--n-trials", "2",
        "--max-epochs", "2", "--n-pop", "6", timeout=900)
    assert "best" in out.lower()


def test_residual_physics_smoke(tmp_path):
    storage = str(tmp_path / "residual_storage")
    _run_example(
        "residual_physics_cube.py", "--storage", storage, "--epochs",
        "2", "--n-pop", "6", timeout=900)
