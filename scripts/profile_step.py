"""Profile one jitted ContactNets train step on the TPU and dump per-op
durations from the trace. Usage: python scripts/profile_step.py [batch]."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import jax
    import jax.numpy as jnp
    import optax

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    n_u = model.n_u
    optimizer = optax.adam(1e-3)

    def train_step(params, opt_state, x, x_plus):
        def mean_loss(p):
            u = jnp.zeros((x.shape[0], n_u), x.dtype)
            return jnp.mean(system.contactnets_loss_batch(p, x, u, x_plus))

        loss, grads = jax.value_and_grad(mean_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    x = jax.random.normal(k1, (batch, 13), jnp.float32)
    quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    height = 0.06 + 0.05 * jax.random.uniform(k2, (batch, 1))
    x = jnp.concatenate(
        (quat, x[:, 4:6] * 0.1, height, x[:, 7:] * 0.5), axis=-1)
    x_plus = x + 0.005 * jax.random.normal(k2, (batch, 13))
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))

    p = model.initial_params(jnp.float32)
    s = optimizer.init(p)
    p, s, loss = step(p, s, x, x_plus)
    float(loss)

    times = []
    for _ in range(5):
        t0 = time.time()
        p, s, loss = step(p, s, x, x_plus)
        float(loss)
        times.append(time.time() - t0)
    times.sort()
    print(f"median step: {times[len(times)//2]*1e3:.2f} ms "
          f"({batch/times[len(times)//2]:.0f} trans/s)")

    trace_dir = "/tmp/pll_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            p, s, loss = step(p, s, x, x_plus)
        float(loss)

    # Analyze: find the trace json, sum per-op durations.
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found")
        return
    with gzip.open(sorted(paths)[-1], "rt") as handle:
        trace = json.load(handle)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # Keep device-side op events (pid names containing 'TPU' / xla ops).
    by_name = {}
    for e in events:
        name = e.get("name", "")
        args = e.get("args") or {}
        lane = str(args.get("group_id", "")) + str(e.get("tid", ""))
        key2 = name
        by_name.setdefault(key2, [0.0, 0])
        by_name[key2][0] += e["dur"] / 1e3  # ms
        by_name[key2][1] += 1
    top = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:45]
    total = sum(v[0] for _, v in by_name.items())
    print(f"total event time (all lanes, 3 steps): {total:.1f} ms")
    for name, (dur, count) in top:
        print(f"{dur:9.2f} ms  x{count:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
