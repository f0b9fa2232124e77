"""Tests for the experiment log manager, including the W&B attach path.

The reference's only observability sink is ``wandb_manager.py``
(reference ``wandb_manager.py:16-106``). The rebuild always logs local
JSONL and attaches wandb opportunistically; since the wandb package is
not installed in CI images, the attach path is exercised against a
minimal in-process mock injected into ``sys.modules`` — asserting run-id
minting/resume semantics and that scalars, videos, and meshes all reach
``wandb.log`` with the epoch as the step.
"""
import json
import sys
import types

import numpy as np
import pytest

from dair_pll_tpu.system import MeshSummary
from dair_pll_tpu.utils import file_utils
from dair_pll_tpu.utils.logging_manager import (ExperimentLogManager,
                                                WeightsAndBiasesManager)


class _FakeRun:
    def __init__(self):
        self.logged = []

    def log(self, payload, step=None):
        self.logged.append((step, payload))


class _FakeVideo:
    def __init__(self, frames, fps=None):
        self.frames = np.asarray(frames)
        self.fps = fps


class _FakeObject3D:
    def __init__(self, vertices):
        self.vertices = np.asarray(vertices)


@pytest.fixture()
def fake_wandb(monkeypatch):
    """Installs a minimal wandb mock into sys.modules."""
    mod = types.ModuleType("wandb")
    mod.init_calls = []
    mod.run = _FakeRun()

    def init(**kwargs):
        mod.init_calls.append(kwargs)
        return mod.run

    mod.init = init
    mod.Video = _FakeVideo
    mod.Object3D = _FakeObject3D
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def _mesh():
    vertices = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    return MeshSummary(vertices=vertices, faces=faces)


def test_wandb_attach_logs_scalars_videos_meshes(tmp_path, fake_wandb):
    manager = ExperimentLogManager(str(tmp_path), "run_a", use_wandb=True,
                                   wandb_project="proj")
    # init wired through with the minted id and resume="allow"
    assert len(fake_wandb.init_calls) == 1
    call = fake_wandb.init_calls[0]
    assert call["project"] == "proj"
    assert call["id"] == manager.run_id
    assert call["resume"] == "allow"
    assert manager.run_id.startswith("run_a_")

    video = np.zeros((1, 3, 3, 4, 4), dtype=np.uint8)  # (1, T, C, H, W)
    manager.update(7, {"train_loss": 0.5, "vector_stat": np.ones(3)},
                   videos={"rollout": (video, 30)},
                   meshes={"body": _mesh()})

    assert len(fake_wandb.run.logged) == 1
    step, payload = fake_wandb.run.logged[0]
    assert step == 7
    assert payload["train_loss"] == 0.5
    assert "vector_stat" not in payload  # non-scalars filtered
    assert isinstance(payload["rollout"], _FakeVideo)
    assert payload["rollout"].fps == 30
    assert payload["rollout"].frames.shape == (3, 3, 4, 4)
    assert isinstance(payload["body"], _FakeObject3D)
    assert payload["body"].vertices.shape == (4, 3)

    # local sinks still written alongside wandb
    with open(file_utils.log_path(str(tmp_path), "run_a")) as handle:
        record = json.loads(handle.readline())
    assert record == {"epoch": 7, "train_loss": 0.5}
    run_dir = file_utils.run_dir(str(tmp_path), "run_a")
    assert (tmp_path / run_dir.split(str(tmp_path) + "/")[-1]
            ).joinpath("meshes", "body_7.obj").exists()
    assert (tmp_path / run_dir.split(str(tmp_path) + "/")[-1]
            ).joinpath("videos", "rollout_7.npz").exists()


def test_wandb_resume_reuses_run_id(tmp_path, fake_wandb):
    first = ExperimentLogManager(str(tmp_path), "run_b", use_wandb=True)
    resumed = ExperimentLogManager(str(tmp_path), "run_b", use_wandb=True,
                                   resume_id=first.run_id)
    assert resumed.run_id == first.run_id
    assert fake_wandb.init_calls[1]["id"] == first.run_id
    assert fake_wandb.init_calls[1]["resume"] == "allow"


def test_wandb_init_failure_degrades_to_local(tmp_path, monkeypatch):
    mod = types.ModuleType("wandb")

    def init(**kwargs):
        raise RuntimeError("no network")

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    manager = ExperimentLogManager(str(tmp_path), "run_c", use_wandb=True)
    assert manager._wandb is None
    manager.update(0, {"loss": 1.0})  # must not raise
    with open(file_utils.log_path(str(tmp_path), "run_c")) as handle:
        assert json.loads(handle.readline())["loss"] == 1.0


def test_alias_is_reference_class_name():
    assert WeightsAndBiasesManager is ExperimentLogManager
