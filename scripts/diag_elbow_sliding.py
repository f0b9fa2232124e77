"""CPU pre-validation of a sliding-rich elbow data protocol.

``results/elbow_mu_landscape.json`` shows the toss protocol's exact
(f64, (30,30)) ContactNets loss is FLAT in friction beyond mu ~0.35
(argmin 0.4 vs truth 0.3, <1.5% variation over [0.35, 0.5]) — friction
is weakly identifiable from bouncy tosses, so the full-budget run's
mu ~0.39-0.43 is the true optimum of the objective, not solver error.

Friction is identified by SLIDING contact.  This script generates a
small population from a low-drop, high-tangential-velocity protocol on
CPU and recomputes the referee mu-landscape.  If the argmin moves to
0.3 with real curvature, the protocol is validated for the TPU rerun
(``elbow_recovery.py --protocol sliding``).

Writes ``results/elbow_mu_landscape_sliding.json``.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sliding_sampler(space, jnp):
    """Low drop height + strong horizontal velocity -> sustained sliding."""
    import numpy as np
    from dair_pll_tpu.state_space import UniformSampler
    x_0 = np.array(space.zero_state(jnp.float32))
    x_0[6] = 0.08                      # just above the plane (was 0.3)
    ranges = np.ones(2 * space.n_v, dtype=np.float32)
    ranges[:3] = 2 * np.pi             # attitude: uniform
    ranges[3:5] = 0.02                 # xy position
    ranges[5] = 0.02                   # small height spread
    ranges[space.n_v:space.n_v + 3] = 2.0      # omega (was 4.0)
    ranges[space.n_v + 3:space.n_v + 5] = 3.0  # vx, vy: +-3 m/s (was 1)
    ranges[space.n_v + 5] = 0.3                # vz: small
    return UniformSampler(space, jnp.asarray(ranges),
                          x_0=jnp.asarray(x_0))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model

    DT = 0.0068
    N_POP = 24
    T = 120
    BATCH = 2048

    model = build_multibody_model({"elbow": get_asset("elbow")})
    system = MultibodyLearnableSystem(model, DT)
    true_params = model.initial_params(jnp.float64)
    sampler = sliding_sampler(system.space, jnp)

    keys = jax.random.split(jax.random.PRNGKey(7), N_POP)
    x0 = jax.vmap(sampler.get_sample)(keys).astype(jnp.float32)
    traj = np.asarray(system.simulate_batch(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32),
                               true_params), jnp.asarray(x0), T))
    near = traj[..., 6] < 0.06         # z = state index 6 (world pos)
    print(f"generated {traj.shape} trajectories; "
          f"mean |v_xy| near the floor:",
          float(np.mean(np.linalg.norm(
              traj[..., 11:13], axis=-1)[near])))

    x = jnp.asarray(traj[:, :-1].reshape(-1, traj.shape[-1]), jnp.float64)
    x_plus = jnp.asarray(traj[:, 1:].reshape(-1, traj.shape[-1]),
                         jnp.float64)
    rng = np.random.default_rng(0)
    pick = rng.permutation(x.shape[0])[:BATCH]
    x, x_plus = x[pick], x_plus[pick]
    u = jnp.zeros((BATCH, model.n_u), jnp.float64)

    referee = MultibodyLearnableSystem(model, DT, ipm_iterations=30,
                                       newton_iterations=30)

    @jax.jit
    def loss_mean(p):
        return jnp.mean(referee.contactnets_loss_batch(
            p, x, u, x_plus, use_fused=False))

    mus = [0.2, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50, 0.60]
    losses = []
    for m in mus:
        friction = np.asarray(true_params.friction, np.float64).copy()
        friction[1:] = m
        p = dataclasses.replace(true_params,
                                friction=jnp.asarray(friction))
        losses.append(float(loss_mean(p)))
        print(f"mu={m}: {losses[-1]:.6g}", flush=True)

    out = {"protocol": "sliding (drop 0.08 m, v_xy +-3 m/s, omega +-2)",
           "n_pop": N_POP, "T": T, "batch": BATCH, "mus": mus,
           "losses_f64_30_30": losses,
           "argmin": mus[int(np.argmin(losses))]}
    path = os.path.join(REPO, "results",
                        "elbow_mu_landscape_sliding.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
