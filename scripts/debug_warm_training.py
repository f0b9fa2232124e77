"""Diagnose the warm-training loss rise seen in
tests/test_warm_loss.py::test_warm_training_loss_decreases: train the
same contact-rich toy cube experiment 5 epochs cold vs warm and print
per-epoch losses, plus the warm cache health.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import tempfile


class _F:
    def mktemp(self, name):
        import pathlib
        d = pathlib.Path(tempfile.mkdtemp(prefix=name))
        return d


from test_warm_loss import (_warm_experiment, warm_training_storage)

storage_fn = warm_training_storage.__wrapped__
storage = storage_fn(_F())

for tag, use_warm in (("cold", False), ("warm", True)):
    experiment = _warm_experiment(storage, f"dbg_{tag}", epochs=5,
                                  use_warm=use_warm)
    losses = []
    experiment.train(lambda e, p, tl, bv: losses.append((e, tl)))
    print(tag, [(e, round(float(t), 6)) for e, t in losses], flush=True)
