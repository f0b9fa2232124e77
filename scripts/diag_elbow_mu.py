"""Elbow friction-identifiability diagnostic (VERDICT r3 #2 follow-up).

The full-budget elbow run converges to link mu ~0.39-0.43 against a
ground truth of 0.3 (combined-mu 20-30% high) with the validation loss
stalled from epoch ~50.  Two hypotheses:

  A. **Solver-budget gradient bias** (the round-4 gradient-precision
     finding): grazing QPs at wrong parameters stall the (10, 6) f32
     Newton polish, biasing the friction gradient — a (10, 10) or f64
     budget would fix it.
  B. **Loss/data bias**: the ContactNets loss on THIS dataset genuinely
     prefers mu > 0.3 (insufficient sliding content, or the implicit
     loss's known preference near sticking), in which case no budget
     helps and the honest report is an identifiability finding.

Discriminates by sweeping link mu (all other parameters TRUE) and
computing the train-set ContactNets loss under three regimes:

  * (10, 6)  f32  — the production default,
  * (10, 10) f32  — the budget escape hatch,
  * (30, 30) f64  — the referee (exact; `grad_precision_real_cube.json`).

If the referee's argmin is ~0.3 -> hypothesis A (budget rerun will fix
it).  If the referee's argmin matches the trained result (~0.4) ->
hypothesis B (report identifiability; a budget rerun is pointless).

Runs on CPU (x64) against the dataset already in
``/tmp/elbow_recovery_storage``.  Writes
``results/elbow_mu_landscape.json``.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    from dair_pll_tpu.utils import file_utils

    storage = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/elbow_recovery_storage"
    DT = 0.0068
    BATCH = 2048

    model = build_multibody_model({"elbow": get_asset("elbow")})
    true_params = model.initial_params(jnp.float64)

    # Load the generated ground-truth trajectories directly.
    traj_dir = os.path.join(storage, "data", "ground_truth")
    files = sorted(os.listdir(traj_dir))[:64]
    slices_x, slices_xp = [], []
    for fname in files:
        traj = np.asarray(file_utils.load_trajectory(
            os.path.join(traj_dir, fname)))
        slices_x.append(traj[:-1])
        slices_xp.append(traj[1:])
    x = jnp.asarray(np.concatenate(slices_x), jnp.float64)
    x_plus = jnp.asarray(np.concatenate(slices_xp), jnp.float64)
    rng = np.random.default_rng(0)
    pick = rng.permutation(x.shape[0])[:BATCH]
    x, x_plus = x[pick], x_plus[pick]
    u = jnp.zeros((BATCH, model.n_u), jnp.float64)
    print(f"{len(files)} trajectories -> {BATCH} sampled transitions")

    regimes = {
        "f32_10_6": (jnp.float32, (10, 6)),
        "f32_10_10": (jnp.float32, (10, 10)),
        "f64_30_30": (jnp.float64, (30, 30)),
    }
    mus = [0.25, 0.30, 0.35, 0.40, 0.45, 0.50, 0.60]

    out = {"batch": BATCH, "mus": mus, "losses": {}, "argmin": {}}
    for name, (dtype, budget) in regimes.items():
        system = MultibodyLearnableSystem(
            model, DT, ipm_iterations=budget[0],
            newton_iterations=budget[1])
        xd = x.astype(dtype)
        xpd = x_plus.astype(dtype)
        ud = u.astype(dtype)

        @jax.jit
        def loss_mean(p):
            return jnp.mean(system.contactnets_loss_batch(
                p, xd, ud, xpd, use_fused=False))

        def loss_at(mu_link):
            p = true_params
            friction = np.asarray(p.friction, np.float64).copy()
            friction[1:] = mu_link          # geometry 0 = ground plane
            p = dataclasses.replace(p, friction=jnp.asarray(friction))
            p = jax.tree_util.tree_map(lambda a: a.astype(dtype), p)
            return float(loss_mean(p))

        losses = [loss_at(m) for m in mus]
        out["losses"][name] = losses
        out["argmin"][name] = mus[int(np.argmin(losses))]
        print(f"{name}: " +
              " ".join(f"{m}:{l:.6g}" for m, l in zip(mus, losses)) +
              f"  argmin={out['argmin'][name]}")

    path = os.path.join(REPO, "results", "elbow_mu_landscape.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
