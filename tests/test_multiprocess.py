"""Multi-process scale-out integration tests (round-1 VERDICT item 6).

The heavyweight test launches TWO real ``jax.distributed`` CPU processes
(4 virtual devices each -> a global 8-device mesh), feeds per-process
local data through ``make_array_from_process_local_data``, trains the
cube ContactNets system 3 steps with the SPMD shard_map step, and checks
the parameters match the single-process 8-device result.
"""
import os
import socket
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def _single_process_reference():
    """Same 3 training steps on this process's own 8-device mesh."""
    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.parallel.sharding import (make_data_parallel_step,
                                                make_mesh, replicate,
                                                shard_batch)
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    params = model.initial_params(jnp.float64)
    optimizer = optax.adam(1e-3)

    B = 64
    rng = np.random.default_rng(20260817)
    x = rng.standard_normal((B, 13))
    x[:, :4] /= np.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    x[:, 6] = 0.03 + 0.05 * rng.random(B)
    xp = x + 0.005 * rng.standard_normal((B, 13))
    xp[:, :4] /= np.linalg.norm(xp[:, :4], axis=-1, keepdims=True)

    mesh = make_mesh()

    def loss_fn(p, x_past, x_future):
        u = jnp.zeros((x_past.shape[0], 0), x_past.dtype)
        return system.contactnets_loss_batch(p, x_past, u, x_future)

    step = make_data_parallel_step(loss_fn, optimizer, mesh)
    params = replicate(params, mesh)
    opt_state = replicate(optimizer.init(params), mesh)
    x_g = shard_batch(jnp.asarray(x), mesh)
    xp_g = shard_batch(jnp.asarray(xp), mesh)
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, x_g, xp_g)
    return [np.asarray(leaf)
            for leaf in jax.tree_util.tree_leaves(params)]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = str(tmp_path / "mp_params.npz")
    worker = os.path.join(REPO, "tests", "mp_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=900)
        outputs.append(out.decode(errors="replace"))
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, out[-3000:]
    assert os.path.exists(out_path), outputs[0][-3000:]

    stored = np.load(out_path)
    mp_leaves = [stored[key] for key in stored.files if key != "loss"]
    ref_leaves = _single_process_reference()
    assert len(mp_leaves) == len(ref_leaves)
    for got, want in zip(mp_leaves, ref_leaves):
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_concurrent_get_asset_never_tears(tmp_path):
    """Regression: concurrent ``get_asset`` callers sharing one cache dir
    must never observe a truncated file (writes are atomic via
    ``os.replace``); seen as an ElementTree ``no element found`` in the
    2-process training test."""
    cache = str(tmp_path / "assets")
    script = (
        "import sys, xml.etree.ElementTree as ET\n"
        "sys.path.insert(0, %r)\n"
        "from dair_pll_tpu.assets import get_asset\n"
        "for _ in range(50):\n"
        "    ET.parse(get_asset('cube', cache_dir=%r))\n"
        "    ET.parse(get_asset('elbow', cache_dir=%r))\n"
        "print('ok')\n" % (REPO, cache, cache))
    procs = [subprocess.Popen([sys.executable, "-c", script],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for _ in range(4)]
    for proc in procs:
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out.decode(errors="replace")[-2000:]


def test_file_trial_coordinator_claims_and_gathers(tmp_path):
    """Claim atomicity + result gathering across two concurrent
    claimants (threads suffice: O_CREAT|O_EXCL is the atomic boundary)."""
    import threading

    from dair_pll_tpu.parallel.multiprocess import FileTrialCoordinator

    root = str(tmp_path / "coord")
    a = FileTrialCoordinator(root)
    b = FileTrialCoordinator(root)
    indices = list(range(12))
    wins: dict = {"a": [], "b": []}

    def run(name, coord):
        for index in coord.claim_iter(0, indices):
            wins[name].append(index)
            coord.publish_result(0, index, {"valid_loss": float(index),
                                            "epochs_run": 2})

    threads = [threading.Thread(target=run, args=("a", a)),
               threading.Thread(target=run, args=("b", b))]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()

    # Every trial claimed exactly once across the two claimants.
    assert sorted(wins["a"] + wins["b"]) == indices
    results = a.gather_results(0, indices, timeout_s=5.0)
    assert set(results) == set(indices)
    assert results[7]["valid_loss"] == 7.0


def test_tcp_trial_coordinator_claims_and_gathers():
    """Same contract as the file coordinator, over TCP (the cross-HOST
    mechanism; no shared filesystem)."""
    import threading

    from dair_pll_tpu.parallel.multiprocess import (TcpTrialCoordinator,
                                                    TrialCoordinatorServer)

    server = TrialCoordinatorServer(host="127.0.0.1")
    address = server.start()
    try:
        a = TcpTrialCoordinator(address)
        b = TcpTrialCoordinator(address)
        indices = list(range(12))
        wins: dict = {"a": [], "b": []}

        def run(name, coord):
            for index in coord.claim_iter(0, indices):
                wins[name].append(index)
                coord.publish_result(
                    0, index, {"valid_loss": float(index),
                               "epochs_run": 2})

        threads = [threading.Thread(target=run, args=("a", a)),
                   threading.Thread(target=run, args=("b", b))]
        for thread in threads:
            thread.start()
        for thread in threads:
            thread.join()

        assert sorted(wins["a"] + wins["b"]) == indices
        results = a.gather_results(0, indices, timeout_s=5.0)
        assert set(results) == set(indices)
        assert results[7]["valid_loss"] == 7.0
        # separate rounds are independent claim spaces
        assert a.try_claim(1, 0) and not b.try_claim(1, 0)
    finally:
        server.shutdown()


def test_tcp_trial_coordinator_two_processes():
    """Two REAL worker processes race to claim trials through the TCP
    server; every trial is claimed exactly once and each result names
    its claimant."""
    from dair_pll_tpu.parallel.multiprocess import (TcpTrialCoordinator,
                                                    TrialCoordinatorServer)

    server = TrialCoordinatorServer(host="127.0.0.1")
    address = server.start()
    script = (
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        "from dair_pll_tpu.parallel.multiprocess import "
        "TcpTrialCoordinator\n"
        "coord = TcpTrialCoordinator(%r)\n"
        "for index in coord.claim_iter(0, range(16)):\n"
        "    coord.publish_result(0, index, {'pid': os.getpid()})\n"
        "print('ok')\n" % (REPO, address))
    try:
        procs = [subprocess.Popen([sys.executable, "-c", script],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT)
                 for _ in range(2)]
        for proc in procs:
            out, _ = proc.communicate(timeout=120)
            assert proc.returncode == 0, out.decode(errors="replace")[-2000:]
        results = TcpTrialCoordinator(address).gather_results(
            0, range(16), timeout_s=5.0)
        assert set(results) == set(range(16))
        assert all("pid" in payload for payload in results.values())
    finally:
        server.shutdown()


def test_tcp_coordinator_rejects_bad_token():
    """Requests without the server's shared token are refused — a
    network peer cannot claim trials or forge results (ADVICE r4)."""
    import pytest

    from dair_pll_tpu.parallel.multiprocess import (TcpTrialCoordinator,
                                                    TrialCoordinatorServer)

    server = TrialCoordinatorServer(host="127.0.0.1")
    address = server.start()
    try:
        assert "?token=" in address
        host_port = address.partition("?")[0]
        intruder = TcpTrialCoordinator(host_port)  # no token
        with pytest.raises(PermissionError):
            intruder.try_claim(0, 0)
        with pytest.raises(PermissionError):
            intruder.publish_result(0, 0, {"valid_loss": -1e9})
        # The legitimate client (full address string) still works.
        assert TcpTrialCoordinator(address).try_claim(0, 0)
    finally:
        server.shutdown()


def test_tcp_coordinator_reclaims_expired_lease():
    """A claim whose worker crashed (no published result) becomes
    re-claimable after the lease TTL; published trials never do."""
    import time as time_mod

    from dair_pll_tpu.parallel.multiprocess import (TcpTrialCoordinator,
                                                    TrialCoordinatorServer)

    server = TrialCoordinatorServer(host="127.0.0.1", claim_ttl_s=0.2)
    address = server.start()
    try:
        a = TcpTrialCoordinator(address)
        b = TcpTrialCoordinator(address)
        assert a.try_claim(0, 0) and a.try_claim(0, 1)
        a.publish_result(0, 1, {"valid_loss": 1.0})
        assert not b.try_claim(0, 0)  # lease still live
        time_mod.sleep(0.3)
        assert b.try_claim(0, 0)      # orphaned -> stolen
        assert not b.try_claim(0, 1)  # published -> never re-claimed
    finally:
        server.shutdown()


def test_file_coordinator_steals_stale_claim(tmp_path):
    """File-coordinator analogue of the lease: an old claim file with no
    result is stolen exactly once."""
    import threading

    from dair_pll_tpu.parallel.multiprocess import FileTrialCoordinator

    root = str(tmp_path / "coord")
    crashed = FileTrialCoordinator(root, claim_ttl_s=0.2)
    assert crashed.try_claim(0, 0)
    assert crashed.try_claim(0, 1)
    crashed.publish_result(0, 1, {"valid_loss": 1.0})
    # Fresh claim is not stealable.
    live = FileTrialCoordinator(root, claim_ttl_s=3600.0)
    assert not live.try_claim(0, 0)
    time.sleep(0.3)
    stealers = [FileTrialCoordinator(root, claim_ttl_s=0.2)
                for _ in range(4)]
    wins = []

    def run(coord):
        if coord.try_claim(0, 0):
            wins.append(1)

    threads = [threading.Thread(target=run, args=(c,)) for c in stealers]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    assert len(wins) == 1              # stolen exactly once
    assert not stealers[0].try_claim(0, 1)  # published -> kept


def test_study_with_tcp_coordinator(tmp_path):
    """The study runs its rung loop through the TCP coordinator
    (coordination_address) end to end."""
    from dair_pll_tpu import study as study_mod
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.parallel.multiprocess import TrialCoordinatorServer
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)

    calls = []

    class StubExperiment:
        def __init__(self, config):
            self.config = config

        def train(self, callback):
            calls.append(self.config.run_name)
            lr = float(self.config.optimizer_config.lr.value)
            return 0.0, abs(np.log10(lr) + 4.0), None

    base = SupervisedLearningExperimentConfig(
        data_config=DataConfig(dt=0.01,
                               slice_config=TrajectorySliceConfig()),
        base_config=None, learnable_config=None,
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3, log=True, low=1e-6, high=1e-1),
            wd=Float(0.0, log=False, low=0.0, high=0.1),
            patience=4, epochs=4, batch_size=Int(8)),
        storage=str(tmp_path / "storage"), run_name="stub")

    server = TrialCoordinatorServer(host="127.0.0.1")
    address = server.start()
    try:
        config = study_mod.StudyConfig(
            experiment_factory=StubExperiment, base_config=base,
            study_name="tcp_study", n_trials=4, min_epochs=2,
            coordination_address=address)
        best = study_mod.Study(config).optimize_hyperparameters()
        assert "optimizer_config.lr" in best
        assert calls
    finally:
        server.shutdown()


def test_study_with_coordinator_single_process(tmp_path, monkeypatch):
    """The study's cross-process rung loop degrades to the serial path
    when one process claims everything (deterministic suggestions)."""
    from dair_pll_tpu import study as study_mod
    from dair_pll_tpu.hyperparameter import Float, Int
    from dair_pll_tpu.data.config import DataConfig, TrajectorySliceConfig
    from dair_pll_tpu.training.config import (
        OptimizerConfig, SupervisedLearningExperimentConfig)

    calls = []

    class StubExperiment:
        def __init__(self, config):
            self.config = config

        def train(self, callback):
            calls.append(self.config.run_name)
            lr = float(self.config.optimizer_config.lr.value)
            return 0.0, abs(np.log10(lr) + 4.0), None

    base = SupervisedLearningExperimentConfig(
        data_config=DataConfig(dt=0.01,
                               slice_config=TrajectorySliceConfig()),
        base_config=None, learnable_config=None,
        optimizer_config=OptimizerConfig(
            lr=Float(1e-3, log=True, low=1e-6, high=1e-1),
            wd=Float(0.0, log=False, low=0.0, high=0.1),
            patience=4, epochs=4, batch_size=Int(8)),
        storage=str(tmp_path / "storage"), run_name="stub")

    config = study_mod.StudyConfig(
        experiment_factory=StubExperiment, base_config=base,
        study_name="coord_study", n_trials=4, min_epochs=2,
        coordination_dir=str(tmp_path / "coord"))
    best = study_mod.Study(config).optimize_hyperparameters()
    assert "optimizer_config.lr" in best
    assert calls  # trials actually ran through the coordinator path
