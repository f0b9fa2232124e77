"""Elbow relative-inertia identifiability diagnostic (round 5).

The sliding-protocol recovery run (``/tmp/elbow_sliding_storage_r3``)
recovers friction (mu 0.31/0.34 vs truth 0.3) and geometry (boxes within
4% of truth) but drives link 2's inertial scale DOWN to m1/m0 ~ 0.45
(truth 1.0) — and the one-step velocity-MSE selection metric correctly
rejects the trained model in favor of the wrong init (which has the
right RELATIVE inertia).  Two hypotheses:

  A. **Gradient-bias artifact**: the f32 (10,10) training gradient is
     biased along body 1's inertial-scale direction (the round-4
     precision finding generalized); the exact loss's argmin is at the
     true relative scale.
  B. **Objective/data property**: the exact ContactNets loss on this
     data genuinely prefers a smaller m1 (the 1/2 dv' M dv term rewards
     shrinking inertia wherever the model misfits), i.e. relative
     inertia is misidentified by the objective itself at this protocol.

Discriminates by sweeping body 1's uniform inertial scale s (pi_cm[1]
:= s * pi_cm_true[1]; com fixed, mass+inertia scaled) with all other
parameters TRUE, under the production f32 (10,10) regime and the f64
(30,30) referee.  Also evaluates the exact loss at the r3 TRAINED
params vs trained-params-with-body-1-scale-restored, which tests
whether training sits in a basin the exact objective actually prefers.

Runs on CPU (x64) against the sliding dataset already on disk.
Writes ``results/elbow_inertia_landscape.json``.
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

    from dair_pll_tpu import inertia as inertia_mod
    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)
    from dair_pll_tpu.urdf import build_multibody_model
    from dair_pll_tpu.utils import file_utils

    storage = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/elbow_sliding_storage_r3"
    DT = 0.0068
    BATCH = 2048

    model = build_multibody_model({"elbow": get_asset("elbow")})
    true_params = model.initial_params(jnp.float64)

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

    def scale_body1(params, s):
        """params with body 1's pi_cm uniformly scaled by s."""
        pi = np.asarray(params.pi_cm(), np.float64).copy()
        pi[1] = s * pi[1]
        theta = inertia_mod.pi_cm_to_theta(jnp.asarray(pi))
        return dataclasses.replace(params, theta=theta)

    regimes = {
        "f32_10_10": (jnp.float32, (10, 10)),
        "f64_30_30": (jnp.float64, (30, 30)),
    }
    scales = [0.4, 0.6, 0.8, 0.9, 1.0, 1.1, 1.25, 1.5]

    out = {"batch": BATCH, "scales": scales, "losses": {}, "argmin": {}}
    for name, (dtype, budget) in regimes.items():
        system = MultibodyLearnableSystem(
            model, DT, ipm_iterations=budget[0],
            newton_iterations=budget[1])
        xd, xpd, ud = x.astype(dtype), x_plus.astype(dtype), u.astype(dtype)

        @jax.jit
        def loss_mean(p):
            return jnp.mean(system.contactnets_loss_batch(
                p, xd, ud, xpd, use_fused=False))

        def loss_at(params):
            p = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                else a, params)
            return float(loss_mean(p))

        losses = [loss_at(scale_body1(true_params, s)) for s in scales]
        out["losses"][name] = losses
        out["argmin"][name] = scales[int(np.argmin(losses))]
        print(f"{name}: " +
              " ".join(f"{s}:{l:.6g}" for s, l in zip(scales, losses)) +
              f"  argmin={out['argmin'][name]}")

    # --- trained-params basin check under the referee --------------------
    ckpt_path = os.path.join(storage, "runs", "elbow_recovery",
                             "checkpoint.npz")
    if os.path.exists(ckpt_path):
        from dair_pll_tpu.utils.checkpoint import load_checkpoint
        ck = load_checkpoint(ckpt_path)
        trained = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            ck.current_params)
        pi_tr = np.asarray(trained.pi_cm(), np.float64)
        m_ratio = float(pi_tr[1, 0] / pi_tr[0, 0])
        # Restore body 1 to body 0's (gauge-pinned) scale times the true
        # mass ratio (1.0): set pi_cm[1] := (m0_trained / m1_trained) *
        # pi_cm[1] so both bodies sit at the same gauge.
        restored = scale_body1(trained, pi_tr[0, 0] / pi_tr[1, 0])
        system64 = MultibodyLearnableSystem(
            model, DT, ipm_iterations=30, newton_iterations=30)

        @jax.jit
        def ref_loss(p):
            return jnp.mean(system64.contactnets_loss_batch(
                p, x, u, x_plus, use_fused=False))

        out["trained_check"] = {
            "trained_m_ratio": m_ratio,
            "referee_loss_trained": float(ref_loss(trained)),
            "referee_loss_body1_restored": float(ref_loss(restored)),
            "referee_loss_true": float(ref_loss(true_params)),
        }
        print(json.dumps(out["trained_check"], indent=2))

    path = os.path.join(REPO, "results", "elbow_inertia_landscape.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
