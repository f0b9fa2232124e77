"""f64 referee for the TPU kernel smoke (scripts/tpu_smoke_kernel.py).

The smoke run finds XLA-f32 and Mosaic-f32 disagreeing on a few percent
of samples — expected when 1-ulp differences cross the hybrid solver's
branch points (line-search creases, better-of selects) on hard QPs. This
CPU process recomputes the same losses/rollout at f64 and reports how
far EACH f32 backend is from ground truth; the kernel is healthy iff its
error distribution matches the XLA path's. Appends the verdict to
``results/tpu_kernel_parity.json``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.soa_terms import (
        soa_contactnets_loss, soa_forward_dynamics_batch)
    from dair_pll_tpu.urdf import build_multibody_model

    dump = np.load("/tmp/tpu_smoke_dump.npz")
    x = jnp.asarray(dump["x"], jnp.float64)
    x_plus = jnp.asarray(dump["x_plus"], jnp.float64)
    B = x.shape[0]

    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params(jnp.float64)
    u = jnp.zeros((B, model.n_u), jnp.float64)

    loss64 = np.asarray(jax.jit(lambda: soa_contactnets_loss(
        model, params, x, u, x_plus, 0.0068, 1e-3, 10, 6,
        solver_backend="xla"))())
    g64 = jax.jit(jax.grad(lambda p: jnp.sum(soa_contactnets_loss(
        model, p, x, u, x_plus, 0.0068, 1e-3, 10, 6,
        solver_backend="xla"))))(params)
    w0 = jnp.zeros((B, model.n_v), jnp.float64)
    v64, _ = jax.jit(lambda: soa_forward_dynamics_batch(
        model, params, x, w0, 0.0068, 1e-4, 0.1, 10, 6,
        solver_backend="xla"))()
    v64 = np.asarray(v64)

    def err_stats(a, ref):
        a = np.asarray(a, np.float64).reshape(-1)
        ref = np.asarray(ref, np.float64).reshape(-1)
        scale = max(float(np.mean(np.abs(ref))), 1e-9)
        rel = np.abs(a - ref) / scale
        return {"median": float(np.median(rel)),
                "p99": float(np.quantile(rel, 0.99)),
                "max": float(np.max(rel))}

    verdict = {
        "loss_xla_f32_vs_f64": err_stats(dump["loss_xla"], loss64),
        "loss_solve_kernel_f32_vs_f64": err_stats(dump["loss_solvek"],
                                                  loss64),
        "loss_full_kernel_f32_vs_f64": err_stats(dump["loss_full"],
                                                 loss64),
        "rollout_xla_f32_vs_f64": err_stats(dump["v_xla"], v64),
        "rollout_warm_kernel_f32_vs_f64": err_stats(dump["v_pal"], v64),
        "grad_theta_xla_f32_vs_f64": err_stats(
            dump["g_theta_xla"], np.asarray(g64.theta)),
        "grad_theta_full_kernel_f32_vs_f64": err_stats(
            dump["g_theta_full"], np.asarray(g64.theta)),
    }
    for name, stats in verdict.items():
        print(f"{name}: median {stats['median']:.2e}, "
              f"p99 {stats['p99']:.2e}, max {stats['max']:.2e}")

    # Healthy = the kernel's error vs f64 is within 10x of the XLA
    # path's at the 99th percentile (same conditioning, different
    # rounding path).
    ok = (verdict["loss_full_kernel_f32_vs_f64"]["p99"] <=
          10 * max(verdict["loss_xla_f32_vs_f64"]["p99"], 1e-6) and
          verdict["rollout_warm_kernel_f32_vs_f64"]["p99"] <=
          10 * max(verdict["rollout_xla_f32_vs_f64"]["p99"], 1e-6) and
          verdict["grad_theta_full_kernel_f32_vs_f64"]["max"] <=
          10 * max(verdict["grad_theta_xla_f32_vs_f64"]["max"], 1e-6))
    verdict["kernel_accuracy_ok"] = bool(ok)
    print("kernel_accuracy_ok:", ok)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "tpu_kernel_parity.json")
    try:
        with open(out, "r", encoding="utf-8") as handle:
            report = json.load(handle)
    except FileNotFoundError:
        report = {}
    report["f64_referee"] = verdict
    # The referee is the accuracy authority: f32 XLA-vs-Mosaic tails on
    # chaotic samples are expected (branch points), so overall health =
    # f32 medians agree (smoke "checks") AND both backends sit at the
    # same error distribution vs f64 ground truth.
    checks_ok = all(c.get("ok", True)
                    for c in report.get("checks", {}).values())
    report["ok"] = bool(checks_ok and ok)
    with open(out, "w", encoding="utf-8") as handle:
        json.dump(report, handle, indent=1)
    print(f"updated {out}")


if __name__ == "__main__":
    main()
