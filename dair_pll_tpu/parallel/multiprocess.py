r"""Multi-process / multi-host scale-out.

Single-process SPMD (``parallel/sharding.py``) covers one host's chips;
this module adds the cross-process layer (SURVEY §5 plan; round-1
VERDICT item 6):

* :func:`initialize` — ``jax.distributed.initialize`` entry: every
  process connects to the coordinator and sees the GLOBAL device set;
  afterwards the ordinary mesh/``shard_map`` machinery spans hosts (XLA
  collectives ride ICI within a slice and DCN across).
* :func:`global_batch` — ``jax.make_array_from_process_local_data``:
  each process supplies only its local shard of the batch; the result is
  a global array addressable by jitted SPMD functions (the multi-host
  data-feeding pattern for the epoch scan).
* :class:`FileTrialCoordinator` — cross-process study-trial dispatch
  over a shared filesystem with atomic claim files (the TPU-pod-friendly
  analogue of the reference's shared-optuna-RDB parallel trials,
  ``/root/reference/dair_pll/study.py:134-148``: trials are coordinated
  through shared storage rather than a database server).

Verified by a real 2-process CPU integration test
(``tests/test_multiprocess.py``): two ``jax.distributed`` processes with
4 virtual devices each train the cube ContactNets system on a global
8-device mesh and reproduce the single-process parameters.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Iterator, Optional, Sequence

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Connects this process to the distributed JAX cluster.

    Call ONCE per process, before any device use. On TPU pods the
    arguments are auto-detected (call with the defaults the launcher
    provides); on CPU/GPU they are explicit.
    """
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def global_batch(sharding, local_batch: Any):
    """Builds a global sharded array from this process's local shard.

    Args:
        sharding: a ``NamedSharding`` over the global mesh (e.g.
          ``NamedSharding(mesh, P("dp"))``).
        local_batch: pytree of host arrays holding ONLY this process's
          rows.

    Returns:
        Pytree of global ``jax.Array``s usable by jitted SPMD functions.
    """
    import jax
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf)), local_batch)


class FileTrialCoordinator:
    """Atomic cross-process trial dispatch over a shared filesystem.

    Processes race to claim trial indices by exclusive file creation
    (``O_CREAT | O_EXCL`` — atomic on POSIX and on the NFS mounts TPU
    pods share); results are JSON files next to the claims. Mirrors the
    role of the reference's parallel optuna trials backed by a shared
    RDB (``study.py:134-148``) without requiring a database server.
    """

    def __init__(self, coordination_dir: str) -> None:
        self.root = coordination_dir
        os.makedirs(self.root, exist_ok=True)

    def _claim_path(self, round_index: int, trial_index: int) -> str:
        return os.path.join(self.root,
                            f"claim_r{round_index}_t{trial_index}")

    def _result_path(self, round_index: int, trial_index: int) -> str:
        return os.path.join(self.root,
                            f"result_r{round_index}_t{trial_index}.json")

    def try_claim(self, round_index: int, trial_index: int) -> bool:
        """Atomically claims a trial; True iff this process won it."""
        try:
            fd = os.open(self._claim_path(round_index, trial_index),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return True

    def claim_iter(self, round_index: int,
                   trial_indices: Sequence[int]) -> Iterator[int]:
        """Yields the trial indices this process wins for a round."""
        for index in trial_indices:
            if self.try_claim(round_index, index):
                yield index

    def publish_result(self, round_index: int, trial_index: int,
                       payload: dict) -> None:
        """Atomically publishes a trial result (write + rename)."""
        path = self._result_path(round_index, trial_index)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as handle:
            json.dump(payload, handle)
        os.replace(tmp, path)

    def gather_results(self, round_index: int,
                       trial_indices: Sequence[int],
                       timeout_s: float = 86400.0,
                       poll_s: float = 0.25) -> dict:
        """Blocks until every trial of the round has a published result;
        returns ``{trial_index: payload}``."""
        deadline = time.time() + timeout_s
        out: dict = {}
        pending = set(trial_indices)
        while pending:
            for index in list(pending):
                path = self._result_path(round_index, index)
                if os.path.exists(path):
                    with open(path, "r", encoding="utf-8") as handle:
                        out[index] = json.load(handle)
                    pending.discard(index)
            if pending:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"trials never finished: {sorted(pending)}")
                time.sleep(poll_s)
        return out
