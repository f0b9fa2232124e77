"""FLOPs/transition + VPU-utilization quantification (VERDICT r3 #5).

The round-3 bench note called the fused train kernel "compute-bound"
without numbers. This script makes that quantitative:

1. **FLOPs/transition** from XLA's cost analysis of the *same algebra*
   on the XLA (non-Pallas) fused SoA path — the Pallas kernel runs the
   identical SoA functions in-kernel, so the analytical flop count
   carries over (the kernel's flops are not visible to cost_analysis).
   Measured for the loss forward and for value_and_grad (the bench's
   train step, minus Adam).
2. **Empirical VPU peak** on the attached chip: a VMEM-resident Pallas
   kernel running interleaved independent FMA chains over an (8, 128)-
   aligned block — the practical f32 elementwise ceiling for this
   workload class (the fused kernel is VPU scalar algebra; the MXU is
   idle by design).
3. **Utilization**: achieved FLOP/s = flops/transition x measured
   transitions/s (from ``bench_detail.json``), as a fraction of the
   measured VPU peak.

Writes ``results/flops_utilization.json``. Run on the TPU.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def count_flops(fn, *args) -> float:
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    return float(costs["flops"])


def bench_states(key, batch, dtype):
    import jax
    import jax.numpy as jnp
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (batch, 13), dtype)
    quat = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
    height = 0.06 + 0.05 * jax.random.uniform(k2, (batch, 1), dtype)
    x = jnp.concatenate(
        (quat, x[:, 4:6] * 0.1, height, x[:, 7:] * 0.5), axis=-1)
    x_plus = x + 0.005 * jax.random.normal(k2, (batch, 13))
    x_plus = x_plus.at[:, :4].set(
        x_plus[:, :4] / jnp.linalg.norm(x_plus[:, :4], axis=-1,
                                        keepdims=True))
    return x, x_plus


def measure_vpu_peak() -> dict:
    """Times an interleaved-FMA Pallas kernel; returns achieved f32
    FLOP/s (2 flops per FMA)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from dair_pll_tpu.utils.profiling import device_timeit

    ROWS, COLS = 8, 128             # ONE f32 vector register per chain:
    #                                 accumulators must stay vreg-resident
    #                                 — a first attempt with (128,1024)
    #                                 VMEM-array chains measured only
    #                                 1.55 TF/s because every FMA step
    #                                 paid a VMEM load+store (the fused
    #                                 train kernel itself achieves 3.1)
    CHAINS = 32                     # independent accumulators (ILP). 8
    #                                 chains measured only 1.68 TF/s —
    #                                 less than the fused train kernel's
    #                                 achieved 3.06 — i.e. not enough
    #                                 in-flight FMAs to cover the FMA
    #                                 latency x issue width product.
    STEPS = 2048                    # FMAs per accumulator per block
    BLOCKS = 8192                   # grid size: ~1.1 TFLOP total, so the
    #                                 ~30 ms tunnel dispatch is <10% noise

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        c = jnp.float32(1.0 + 1e-9)  # loop-invariant multiplier: keep
        #                              the body pure vector FMAs

        def body(i, accs):
            del i
            return tuple(acc * c + x for acc in accs)

        accs = jax.lax.fori_loop(
            0, STEPS, body,
            tuple(x + jnp.float32(i) for i in range(CHAINS)))
        total = accs[0]
        for acc in accs[1:]:
            total = total + acc
        o_ref[...] = total

    x = jnp.ones((BLOCKS * ROWS, COLS), jnp.float32)
    run = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BLOCKS * ROWS, COLS),
                                       jnp.float32))(x))
    seconds = device_timeit(lambda: run(x), n=12)
    flops = 2.0 * BLOCKS * ROWS * COLS * CHAINS * STEPS
    return {"elements": BLOCKS * ROWS * COLS, "chains": CHAINS,
            "steps": STEPS, "seconds": seconds,
            "flops_per_sec": flops / seconds}


def main():
    import jax

    from dair_pll_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.multibody.learnable_system import (
        LOSS_EPSILON, MultibodyLearnableSystem)
    from dair_pll_tpu.multibody.soa_terms import soa_contactnets_loss
    from dair_pll_tpu.urdf import build_multibody_model

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    params = model.initial_params(jnp.float32)

    B = 4096  # flop counts scale exactly linearly in B on the SoA path
    x, x_plus = bench_states(jax.random.PRNGKey(0), B, jnp.float32)
    u = jnp.zeros((B, 0), jnp.float32)

    loss_fn = functools.partial(
        soa_contactnets_loss, model, dt=0.0068,
        loss_epsilon=LOSS_EPSILON, ipm_iterations=system.ipm_iterations,
        newton_iterations=system.newton_iterations, solver_backend="xla")

    fwd = lambda p, x, u, xp: jnp.sum(loss_fn(p, x=x, u=u, x_plus=xp))
    train = jax.value_and_grad(fwd)

    flops_fwd = count_flops(fwd, params, x, u, x_plus) / B
    flops_train = count_flops(train, params, x, u, x_plus) / B

    out = {
        "batch_counted": B,
        "flops_per_transition_forward": flops_fwd,
        "flops_per_transition_train": flops_train,
        "method": "XLA cost_analysis of the XLA-backend fused SoA path "
                  "(same algebra the Pallas kernel runs in-kernel)",
        "caveat": "cost_analysis weights every scalar op (incl. "
                  "transcendentals) as one flop and counts the XLA "
                  "graph, not the Mosaic-optimized kernel, so "
                  "'achieved FLOP/s' is an op-throughput proxy; the "
                  "utilization fraction compares it against a pure-FMA "
                  "probe ceiling.",
    }

    peak = None
    if jax.default_backend() not in ("cpu",):
        try:
            peak = measure_vpu_peak()
        except Exception as exc:  # keep the flop counts on probe failure
            out["vpu_peak_error"] = repr(exc)[:500]
    if peak is not None:
        out["vpu_peak_measured"] = peak
        detail_path = os.path.join(REPO, "bench_detail.json")
        if os.path.exists(detail_path):
            with open(detail_path) as f:
                detail = json.load(f)
            tps = detail.get("transitions_per_sec")
            if tps:
                achieved = flops_train * tps
                out["achieved_flops_per_sec_train"] = achieved
                out["fraction_of_measured_vpu_peak"] = (
                    achieved / peak["flops_per_sec"])
                out["bench_transitions_per_sec"] = tps
            # fold the headline numbers back into bench_detail.json
            detail["flops_per_transition_train"] = flops_train
            detail["flops_per_transition_forward"] = flops_fwd
            detail["vpu_peak_flops_per_sec_measured"] = (
                peak["flops_per_sec"])
            if "achieved_flops_per_sec_train" in out:
                detail["achieved_flops_per_sec"] = (
                    out["achieved_flops_per_sec_train"])
                detail["pct_of_vpu_peak"] = round(
                    100.0 * out["fraction_of_measured_vpu_peak"], 2)
            with open(detail_path, "w") as f:
                json.dump(detail, f, indent=2)

    path = os.path.join(REPO, "results", "flops_utilization.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
