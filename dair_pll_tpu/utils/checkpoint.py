r"""Training-state checkpointing.

Rebuild of the reference's ``TrainingState`` checkpoint
(``/root/reference/dair_pll/experiment.py:33-55,671-679``): the complete
resumable state — train/valid/test split indices, best and current
parameter pytrees, optimizer state, epoch counters, best validation loss,
run id, finished flag — serialized as a single pickle whose array leaves
are host numpy arrays, with the SIGINT-guarded atomic save of the
reference.
"""
from __future__ import annotations

import dataclasses
import io
import os
import pickle
import signal
from typing import Any, List, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass
class TrainingState:
    """Complete summary of the training process state."""
    split_indices: Tuple[List[int], List[int], List[int]]
    best_params: Any
    current_params: Any
    optimizer_state: Any
    epoch: int = 1
    epochs_since_best: int = 0
    best_valid_loss: float = 1e10
    run_id: Optional[str] = None
    finished_training: bool = False


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: TrainingState) -> None:
    """Atomically saves a training state, ignoring SIGINT during the write
    (reference ``experiment.py:671-679``)."""
    payload = {
        "split_indices": state.split_indices,
        "best_params": _to_host(state.best_params),
        "current_params": _to_host(state.current_params),
        "optimizer_state": _to_host(state.optimizer_state),
        "epoch": state.epoch,
        "epochs_since_best": state.epochs_since_best,
        "best_valid_loss": state.best_valid_loss,
        "run_id": state.run_id,
        "finished_training": state.finished_training,
    }

    previous = signal.getsignal(signal.SIGINT)
    try:
        signal.signal(signal.SIGINT, signal.SIG_IGN)
    except ValueError:
        previous = None  # non-main thread
    try:
        buffer = io.BytesIO()
        pickle.dump(payload, buffer)
        tmp_path = path + ".tmp"
        with open(tmp_path, "wb") as handle:
            handle.write(buffer.getvalue())
        os.replace(tmp_path, path)
    finally:
        if previous is not None:
            signal.signal(signal.SIGINT, previous)


def load_checkpoint(path: str) -> Optional[TrainingState]:
    """Loads a training state; returns ``None`` if no checkpoint exists."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    return TrainingState(**payload)
