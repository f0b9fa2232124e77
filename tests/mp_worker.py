"""Worker for the 2-process jax.distributed integration test.

Usage: python tests/mp_worker.py <coordinator> <num_processes>
       <process_id> <out_npz>

Each process owns 4 virtual CPU devices; together they form a global
8-device data-parallel mesh. The worker feeds ONLY its local rows of a
deterministic global batch via ``make_array_from_process_local_data``,
runs 3 ContactNets training steps with the shard_map SPMD step
(gradients psum over the global mesh), and process 0 writes the final
parameters.
"""
import os
import sys

coordinator, num_processes, process_id, out_path = sys.argv[1:5]
num_processes = int(num_processes)
process_id = int(process_id)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dair_pll_tpu.parallel.multiprocess import (  # noqa: E402
    global_batch, initialize)

initialize(coordinator, num_processes, process_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dair_pll_tpu.assets import get_asset  # noqa: E402
from dair_pll_tpu.multibody.learnable_system import (  # noqa: E402
    MultibodyLearnableSystem)
from dair_pll_tpu.parallel.sharding import (  # noqa: E402
    make_data_parallel_step, make_mesh)
from dair_pll_tpu.urdf import build_multibody_model  # noqa: E402

assert len(jax.devices()) == 4 * num_processes, jax.devices()

model = build_multibody_model({"cube": get_asset("cube")})
system = MultibodyLearnableSystem(model, 0.0068)
params = model.initial_params(jnp.float64)
optimizer = optax.adam(1e-3)

# Deterministic GLOBAL batch; this process keeps only its local rows.
B = 64
rng = np.random.default_rng(20260817)
x = rng.standard_normal((B, 13))
x[:, :4] /= np.linalg.norm(x[:, :4], axis=-1, keepdims=True)
x[:, 6] = 0.03 + 0.05 * rng.random(B)
xp = x + 0.005 * rng.standard_normal((B, 13))
xp[:, :4] /= np.linalg.norm(xp[:, :4], axis=-1, keepdims=True)

rows_per_process = B // num_processes
lo = process_id * rows_per_process
hi = lo + rows_per_process

mesh = make_mesh()
sharding = NamedSharding(mesh, P("dp"))
x_g, xp_g = global_batch(sharding, (x[lo:hi], xp[lo:hi]))


def loss_fn(p, x_past, x_future):
    u = jnp.zeros((x_past.shape[0], 0), x_past.dtype)
    return system.contactnets_loss_batch(p, x_past, u, x_future)


step = make_data_parallel_step(loss_fn, optimizer, mesh)
replicated = NamedSharding(mesh, P())
params = jax.device_put(params, replicated)
opt_state = jax.device_put(optimizer.init(params), replicated)

for _ in range(3):
    params, opt_state, loss = step(params, opt_state, x_g, xp_g)

if process_id == 0:
    leaves = [np.asarray(leaf)
              for leaf in jax.tree_util.tree_leaves(params)]
    np.savez(out_path, *leaves, loss=np.asarray(loss))
    print("worker 0 done; loss", float(loss), flush=True)
