r"""Learnable multibody system: Anitescu dynamics + ContactNets loss.

TPU-native rebuild of the reference's ``multibody_learnable_system.py``
(``/root/reference/dair_pll/multibody_learnable_system.py``). The
architecture differs fundamentally:

* All terms come from the JAX multibody engine
  (``dair_pll_tpu.multibody.terms``) instead of Drake-symbolic codegen.
* The contact solve is the batched, differentiable Lorentz-cone QP of
  ``dair_pll_tpu.ops.cone_solver`` (replacing the C++ ``sappy`` solver);
  simulation gradients flow through its implicit-function-theorem VJP,
  while the ContactNets loss detaches the solve per the envelope theorem
  (reference ``multibody_learnable_system.py:172-176``).
* Everything is a pure function of ``(params, state)``; training steps jit
  end-to-end and vmap over trajectory batches.

Physics formulation (Anitescu convex stepping; derivation reproduced in
the reference docstring ``multibody_learnable_system.py:206-249``): the
next-step contact impulse solves the dual QCQP

.. math::
    \min_{f \in FC} \tfrac 12 f^T D(q) f + f^T (J(q) v^- + [I;0]\phi/dt)

over the product friction cone, with
``v^- = v + dt * non_contact_acceleration``, and
``v^+ = v^- + M^{-1} J^T f``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.integrator import Integrator
from dair_pll_tpu.multibody.model import MultibodyModel, MultibodyParams
from dair_pll_tpu.multibody.terms import multibody_terms
from dair_pll_tpu.ops.cone_solver import solve_contact_impulse
from dair_pll_tpu.ops.sap_solver import solve_contact_impulse_hybrid
from dair_pll_tpu.ops.tensor import broadcast_lorentz
from dair_pll_tpu.system import System, SystemSummary

LOSS_EPSILON = 1e-3        # loss QP regularization (reference :130)
DYNAMICS_EPSILON = 1e-4    # dynamics QP regularization (reference :283)
CONTACT_FILTER_EPS = 1e6   # phi activation threshold (reference :262-266)
SOLVER_ITERATIONS = 200    # APGD iteration count (solver="apgd")
#: Iteration counts for warm-started rollout solves (``warm_start``;
#: see ``ops/sap_solver.solve_cone_qp_hybrid_warm``). Measured finding
#: (round 4, 2976 rollout QPs harvested from batched bouncing-cube
#: rollouts at f64, refereed by a (30,30) hybrid —
#: ``results/ipm_convergence.json``, ``scripts/diag_solver_battery.py``
#: + ``diag_soa_battery.py``): fresh impacts are genuine cold starts
#: that need the FULL central-path length. At (10, 6) the vmapped AoS
#: hybrid leaves 1.7e-3 worst-case impulse error on grazing-contact QPs
#: (phi_min ~ +2e-4) — the round-3 fused-rollout parity failure — while
#: (14, 6) is machine precision for BOTH the AoS (3e-10) and SoA
#: (1.5e-9) implementations. Gondzio centrality correctors
#: (``socp_solver.solve_cone_qp_ipm_mj`` ``correctors=``) recover
#: (10,6)-cost convergence to ~2e-7 but don't beat plain (14,6) and
#: aren't implemented in the Pallas kernel, so the shared default stays
#: corrector-free. Warm-starting cannot cut a fixed-count branchless
#: scan's per-step budget; the carry is kept because it improves
#: accuracy at equal cost (Newton converges in ~1 iteration on
#: persistent-contact steps). Rollout THROUGHPUT wins come from the
#: fused SoA scan (``simulate_batch``) instead.
DEFAULT_WARM_IPM_ITERATIONS = 14
DEFAULT_WARM_NEWTON_ITERATIONS = 6
#: Default solver. "hybrid" = interior-point warm start + SAP-Newton
#: polish (machine-precision worst-case on realistic contact QPs, fewer
#: sequential iterations); "apgd" = the round-1 FISTA solver. The hybrid
#: matches the algorithm class of the reference's sappy (Newton-type SAP,
#: reference multibody_learnable_system.py:179-184).
DEFAULT_SOLVER = "hybrid"
#: Reduced (ipm, newton) budget for EPOCH-WARM loss solves
#: (:meth:`MultibodyLearnableSystem.contactnets_loss_batch_warm`):
#: between epochs the parameters move by one optimizer step, so the
#: previous epoch's impulse is a near-solution.
#:
#: (4, 10) — a SHORT central path plus a long polish, Newton started
#: from the better (by primal cost) of the carried impulse and the IPM
#: iterate. Two measured findings pin both numbers:
#:
#: * newton >= 10: shorter f32 polishes stall at cone creases
#:   (``results/warm_loss_battery.json``: (0,8) grad rel-l2 up to 0.24,
#:   (2,6) up to 7.9 vs an f64 (30,30) referee).
#: * ipm >= 4: with NO (or a 2-step) central path, crease-stalled warm
#:   solves PERSIST in the epoch cache and compound across epochs into
#:   contaminated gradients — multi-epoch training genuinely diverges
#:   on contact-rich data ((0,10): true loss 6.7x worse than cold after
#:   10 epochs; periodic re-seeding does NOT rescue it;
#:   ``scripts/diag_warm_divergence.py``). A 4-step path hands Newton a
#:   centered interior fallback and restores cold-equivalent training
#:   ((4,10) tracks cold to <1% on the same battery), at equal
#:   per-step gradient quality on real data
#:   (``warm_loss_battery.json``: (4,8) rel-l2 0.041-0.061 vs cold
#:   (10,6)'s 0.054-0.071). The round-4 battery's "(2,x) short paths
#:   are worse than none" finding was about ipm=2 specifically — a
#:   barely-centered iterate can win the primal-cost selection and
#:   polish into a worse point; at ipm=4 the iterate is centered enough.
DEFAULT_LOSS_WARM_BUDGET = (4, 10)
#: Default (ipm, newton) budget for COLD ContactNets loss solves.
#: Round 5 flips the polish count 6 -> 10 (gradient correctness as the
#: default, VERDICT r4 #3): polish 6 leaves ~4.7% rel-l2 batch-gradient
#: error on real data at wrong-init params (the f32 Newton-polish
#: crease stall, ``results/grad_precision_real_cube.json``; 10 cuts it
#: to ~6e-4) and biases the OBJECTIVE itself ~2x high on stalled
#: solves — the 500-epoch real-cube A/B
#: (``results/warm_real_cube.json``) shows the (10,6) objective lands
#: at LESS accurate parameters (mu 0.130 vs 0.139, truth 0.15) than
#: the exact (10,10) objective. Cost: ~1.25x the solve. The old budget
#: stays one config away (``loss_solver_budget=(10, 6)``); note its
#: bias acted as an accidental regularizer that scores better on
#: one-step/rollout PREDICTION metrics (pos err 0.0408 vs 0.0478 m) —
#: prediction-first users may prefer it deliberately.
DEFAULT_LOSS_IPM_ITERATIONS = 10
DEFAULT_LOSS_NEWTON_ITERATIONS = 10
#: Flattened batch size above which the batched ContactNets loss
#: auto-routes to the fused batch-minor SoA path (``multibody/soa_terms``).
FUSED_LOSS_MIN_BATCH = 2048
#: Flattened batch size above which batched rollouts auto-route to the
#: fused SoA scan (warm-started solves, batch-minor terms). Gradient
#: training rollouts (small batches) stay on the vmapped integrator
#: whose solver has the IFT custom VJP.
FUSED_ROLLOUT_MIN_BATCH = 1024


#: Batch size above which the fused-path shape buckets refine to quarter
#: steps ({1.0, 1.25, 1.5, 1.75}x the lower power of two): at large
#: batches pure power-of-two rounding silently pays up to ~2x compute and
#: HBM for workloads just past a boundary (e.g. 1.05M rows solving 2M),
#: which dominates the (amortized-once) extra cold compiles.
QUARTER_BUCKET_MIN = 1 << 18
_PAD_WARNED: set = set()


def _batch_bucket(n_batch: int) -> int:
    """Rounds a fused-path batch size up to a shape bucket.

    Compile-time mitigation (``results/compile_time.json``): the fused
    SoA graph cold-compiles in minutes per distinct batch shape, so all
    fused entry points pad to shape buckets — a new workload size then
    hits the persistent compilation cache instead of recompiling.
    Buckets are powers of two below ``QUARTER_BUCKET_MIN`` and quarter
    steps of the enclosing power-of-two range above it (the padding
    overhead then caps at 25%; every quarter bucket there is a multiple
    of ``2**15``, so sublane packing and Pallas block divisibility are
    unaffected). Small-batch paddings past 25% log a one-time note so
    users can align workload sizes to buckets."""
    pow2 = 1 << max(0, n_batch - 1).bit_length()
    if pow2 >= QUARTER_BUCKET_MIN:
        base = pow2 >> 1
        for numerator in (5, 6, 7):
            candidate = base * numerator // 4
            if n_batch <= candidate:
                return candidate
        return pow2
    if pow2 > n_batch * 5 // 4 and pow2 not in _PAD_WARNED:
        _PAD_WARNED.add(pow2)
        import logging
        logging.getLogger(__name__).info(
            "fused-path batch %d pads to the %d compile bucket (%.0f%% "
            "padding); aligning the workload batch to a bucket avoids "
            "the padded compute", n_batch, pow2,
            100.0 * (pow2 - n_batch) / n_batch)
    return pow2


class MultibodyLearnableSystem(System):
    """Differentiable contact-dynamics system with learnable inertia,
    friction, and geometry.

    Mirrors the role of reference ``MultibodyLearnableSystem``
    (``multibody_learnable_system.py:41-333``) with a functional API:
    ``params`` (a :class:`MultibodyParams` pytree) is always passed in, so
    the same system object serves any parameter value under ``jit``/
    ``grad``/``vmap``.
    """

    model: MultibodyModel
    dt: float

    def __init__(self, model: MultibodyModel, dt: float,
                 solver_iterations: int = SOLVER_ITERATIONS,
                 solver: str = DEFAULT_SOLVER,
                 ipm_iterations: int = DEFAULT_LOSS_IPM_ITERATIONS,
                 newton_iterations: int =
                 DEFAULT_LOSS_NEWTON_ITERATIONS,
                 warm_start: bool = False,
                 warm_ipm_iterations: int = DEFAULT_WARM_IPM_ITERATIONS,
                 warm_newton_iterations: int =
                 DEFAULT_WARM_NEWTON_ITERATIONS) -> None:
        assert solver in ("hybrid", "apgd")
        self.model = model
        self.dt = dt
        self.solver = solver
        self.solver_iterations = solver_iterations
        self.ipm_iterations = ipm_iterations
        self.newton_iterations = newton_iterations
        self.warm_start = warm_start
        self.warm_ipm_iterations = warm_ipm_iterations
        self.warm_newton_iterations = warm_newton_iterations
        space = model.state_space()
        integrator = Integrator(space, self._partial_step, dt, "velocity")
        super().__init__(space, integrator)

    def _solve_contact(self, delassus: Array, M: Array, J: Array,
                       q_vec: Array, eps,
                       budget: Optional[Tuple[int, int]] = None
                       ) -> Tuple[Array, Array]:
        """Dispatches the configured cone-QP solver (impulse, valid).

        ``budget`` is an optional ``(ipm, newton)`` iteration-count
        override: loss-family QPs (eps = 1e-3) converge at the default
        ``(ipm_iterations, newton_iterations)``, while dynamics-family
        QPs (eps = 1e-4, grazing impacts along rollouts) need the larger
        rollout budget — see ``DEFAULT_WARM_IPM_ITERATIONS``.
        """
        if self.solver == "hybrid":
            ipm, newton = budget or (self.ipm_iterations,
                                     self.newton_iterations)
            return solve_contact_impulse_hybrid(
                delassus, M, J, q_vec, eps, ipm, newton)
        return solve_contact_impulse(delassus, q_vec, eps,
                                     self.solver_iterations)

    @classmethod
    def from_urdfs(cls, urdfs: Dict[str, str], dt: float,
                   **kwargs) -> "MultibodyLearnableSystem":
        """Builds the system from named URDF files (the reference
        constructor signature, ``multibody_learnable_system.py:51-66``)."""
        from dair_pll_tpu.urdf import build_multibody_model
        mesh_representation = kwargs.pop(
            "mesh_representation", "deep_support_convex")
        model = build_multibody_model(
            urdfs, mesh_representation=mesh_representation)
        return cls(model, dt, **kwargs)

    # -- dynamics ------------------------------------------------------------
    def forward_dynamics(self, params: MultibodyParams, q: Array, v: Array,
                         u: Array) -> Array:
        r"""Next velocity via Anitescu convex contact dynamics (unbatched).

        Implements the dual QCQP described in the module docstring,
        including the reference's contact activation filter
        (``multibody_learnable_system.py:262-301``) realized as a
        ``jnp.where`` mask.

        Args:
            params: learnable parameters.
            q: ``(n_q,)`` configuration.
            v: ``(n_v,)`` velocity.
            u: ``(n_u,)`` input.

        Returns:
            ``(n_v,)`` next velocity ``v^+``.
        """
        dt = self.dt
        delassus, M, J, phi, a_nc = multibody_terms(
            self.model, params, q, v, u)
        k = phi.shape[-1]

        phi_then_zero = jnp.concatenate(
            (phi, jnp.zeros((2 * k,), phi.dtype)))
        v_minus = v + dt * a_nc
        q_full = J @ v_minus + phi_then_zero / dt

        impulse, _ = self._solve_contact(
            delassus, M, J, q_full,
            jnp.asarray(DYNAMICS_EPSILON, phi.dtype),
            budget=(self.warm_ipm_iterations,
                    self.warm_newton_iterations))

        # Contact activation filter (inactive for physical scales, as in
        # the reference where eps = 1e6).
        active = broadcast_lorentz(phi) <= CONTACT_FILTER_EPS
        impulse = jnp.where(active, impulse, jnp.zeros_like(impulse))

        from dair_pll_tpu.ops.linear import spd_solve
        dv = spd_solve(M, J.T @ impulse)
        return v_minus + dv

    def forward_dynamics_with_state(self, params: MultibodyParams,
                                    q: Array, v: Array, u: Array,
                                    w0: Array) -> Tuple[Array, Array]:
        """Warm-started forward dynamics for sequential rollouts.

        Consecutive simulation steps solve nearly identical cone QPs;
        carrying the velocity-space primal ``w`` through the rollout scan
        halves the per-step solver iterations: a short central-path phase
        (for robustness at fresh impacts, which are genuine cold starts)
        plus an exact-line-search Newton polish started from the better
        of the carried and IPM points
        (``sap_solver.solve_cone_qp_hybrid_warm``, ROADMAP #3).

        Returns ``(v_plus, w)`` with ``w`` the warm-start state to carry.
        """
        from dair_pll_tpu.ops.linear import spd_solve
        from dair_pll_tpu.ops.sap_solver import solve_cone_qp_hybrid_warm
        dt = self.dt
        _, M, J, phi, a_nc = multibody_terms(self.model, params, q, v, u)
        k = phi.shape[-1]
        phi_then_zero = jnp.concatenate(
            (phi, jnp.zeros((2 * k,), phi.dtype)))
        v_minus = v + dt * a_nc
        q_full = J @ v_minus + phi_then_zero / dt

        impulse, w = solve_cone_qp_hybrid_warm(
            M, J, q_full, jnp.asarray(DYNAMICS_EPSILON, phi.dtype),
            w0, self.warm_ipm_iterations, self.warm_newton_iterations)
        finite = jnp.all(jnp.isfinite(impulse))
        bounded = jnp.all(jnp.abs(impulse) <= 1e3)
        valid = finite & bounded
        impulse = jnp.where(valid, jnp.nan_to_num(impulse),
                            jnp.zeros_like(impulse))
        w = jnp.where(valid, jnp.nan_to_num(w), jnp.zeros_like(w))

        active = broadcast_lorentz(phi) <= CONTACT_FILTER_EPS
        impulse = jnp.where(active, impulse, jnp.zeros_like(impulse))
        dv = spd_solve(M, J.T @ impulse)
        return v_minus + dv, w

    def initial_carry(self, x_0: Array) -> Any:
        """Rollout hidden state: the warm-start primal ``w`` when
        ``warm_start`` is enabled, else empty."""
        if self.warm_start:
            return jnp.zeros((self.model.n_v,), x_0.dtype)
        return super().initial_carry(x_0)

    def _partial_step(self, params: MultibodyParams, x: Array,
                      carry: Any) -> Tuple[Array, Any]:
        """Velocity-integrator callback (reference ``sim_step``,
        ``multibody_learnable_system.py:306-313``)."""
        q, v = self.space.q_v(x)
        u = jnp.zeros((self.model.n_u,), x.dtype)
        if self.warm_start:
            return self.forward_dynamics_with_state(params, q, v, u, carry)
        v_plus = self.forward_dynamics(params, q, v, u)
        return v_plus, carry

    def sim_step(self, params: MultibodyParams, x: Array) -> Array:
        """One full integration step ``x -> x^+`` (unbatched)."""
        x_next, _ = self.integrator.step(
            params, x, self.initial_carry(x))
        return x_next

    def simulate_batch(self, params: MultibodyParams, x_0: Array,
                       steps: int,
                       use_fused: Optional[bool] = None) -> Array:
        """Batched rollout ``(*, n_x) -> (*, steps + 1, n_x)``.

        For supported models at production batch sizes the whole rollout
        runs fused (``soa_terms.soa_forward_dynamics_batch``): batch-minor
        terms + warm-started hybrid solves inside one ``lax.scan``, with
        the SAP primal carried between steps. Differentiating through
        this path unrolls the solver (memory-heavy) — gradient training
        paths (small batches) auto-route to the vmapped integrator whose
        solver has the IFT custom VJP.
        """
        batch_shape = x_0.shape[:-1]
        n_batch = int(np.prod(batch_shape)) if batch_shape else 1
        if use_fused is None:
            use_fused = (n_batch >= FUSED_ROLLOUT_MIN_BATCH and
                         self.supports_fused_loss())
        if not use_fused:
            return super().simulate_batch(params, x_0, steps)

        from dair_pll_tpu.multibody.soa_terms import (
            soa_forward_dynamics_batch)
        space = self.space
        dt = self.dt
        flat = x_0.reshape((n_batch, x_0.shape[-1]))
        # Shape-bucketing: same compile-cache policy as the fused loss.
        n_padded = _batch_bucket(n_batch)
        if n_padded != n_batch:
            fill = jnp.broadcast_to(
                jnp.asarray(space.zero_state(flat.dtype)),
                (n_padded - n_batch, flat.shape[-1]))
            flat = jnp.concatenate((flat, fill), axis=0)

        def step(carry, _):
            x, w = carry
            v_plus, w = soa_forward_dynamics_batch(
                self.model, params, x, w, dt, DYNAMICS_EPSILON,
                CONTACT_FILTER_EPS, self.warm_ipm_iterations,
                self.warm_newton_iterations)
            q_next = space.euler_step(space.q(x), v_plus, dt)
            x_next = space.x(q_next, v_plus)
            return (x_next, w), x_next

        w0 = jnp.zeros((n_padded, self.model.n_v), x_0.dtype)
        _, xs = jax.lax.scan(step, (flat, w0), None, length=steps)
        xs = xs[:, :n_batch]
        flat = flat[:n_batch]
        trajectory = jnp.concatenate((flat[None], xs), axis=0)
        trajectory = jnp.moveaxis(trajectory, 0, 1)
        return trajectory.reshape(
            batch_shape + (steps + 1, x_0.shape[-1]))

    # -- ContactNets loss ------------------------------------------------------
    def _contactnets_qp(self, params: MultibodyParams, x: Array, u: Array,
                        x_plus: Array):
        """Assembles the per-transition ContactNets QP pieces (unbatched).

        Returns:
            (delassus, q_vec, M, J, phi, dv) for the loss assembly.
        """
        space = self.space
        dt = self.dt
        v = space.v(x)
        q_plus, v_plus = space.q_v(x_plus)

        delassus, M, J, phi, a_nc = multibody_terms(
            self.model, params, q_plus, v_plus, u)
        k = phi.shape[-1]
        J_t = J[k:, :]

        phi_then_zero = jnp.concatenate(
            (phi, jnp.zeros((2 * k,), phi.dtype)))
        sliding_velocities = J_t @ v_plus                     # (2k,)
        # Safe norm: at exactly-resting contacts (noiseless simulated
        # data) the tangential velocity is 0 and norm's gradient is NaN;
        # substitute 1 under the sqrt there (value exact, gradient 0).
        sliding_sq = jnp.sum(
            sliding_velocities.reshape(k, 2) ** 2, axis=-1)
        at_rest = sliding_sq < 1e-24
        sliding_speeds = jnp.sqrt(
            jnp.where(at_rest, jnp.ones_like(sliding_sq), sliding_sq))
        sliding_speeds = jnp.where(
            at_rest, jnp.zeros_like(sliding_speeds), sliding_speeds)

        dv = v_plus - (v + a_nc * dt)                          # (n_v,)
        q_pred = -(J @ dv)
        q_comp = jnp.abs(phi_then_zero)
        q_diss = dt * jnp.concatenate((sliding_speeds, sliding_velocities))
        q_vec = q_pred + q_comp + q_diss
        return delassus, q_vec, M, J, phi, dv

    def _contactnets_loss_given_force(self, delassus, q_vec, M, phi, dv,
                                      force, valid) -> Array:
        """Loss assembly from QP pieces and a (detached) solved force."""
        k = phi.shape[-1]
        Q = delassus + LOSS_EPSILON * jnp.eye(3 * k, dtype=phi.dtype)
        penetration_penalty = jnp.sum(jnp.maximum(-phi, 0.0) ** 2)
        constant = 0.5 * dv @ (M @ dv) + penetration_penalty
        loss = 0.5 * force @ (Q @ force) + force @ q_vec + constant
        return jnp.where(valid, loss, jnp.zeros_like(loss))

    def contactnets_loss(self, params: MultibodyParams, x: Array, u: Array,
                         x_plus: Array) -> Array:
        r"""ContactNets implicit violation loss for one transition
        (unbatched; ``vmap`` for batches).

        Matches the formulation of reference ``contactnets_loss``
        (``multibody_learnable_system.py:104-197``): with terms evaluated
        at the *observed* next state, the loss is

        .. math::
            \tfrac 12 f^T Q f + f^T q_{vec} + \tfrac 12 dv^T M dv +
            \sum \max(-\phi, 0)^2

        where ``f`` solves the corresponding cone QP and is detached
        (envelope theorem), ``q_vec = q_{pred} + q_{comp} + q_{diss}``
        collects prediction, complementarity, and dissipation residuals,
        and solver failures zero the sample's contribution.

        Args:
            params: learnable parameters.
            x: ``(n_x,)`` current state.
            u: ``(n_u,)`` input.
            x_plus: ``(n_x,)`` observed next state.

        Returns:
            scalar loss.
        """
        delassus, q_vec, M, J, phi, dv = self._contactnets_qp(
            params, x, u, x_plus)
        # Envelope theorem: the optimal force's dependence on parameters
        # does not contribute to the loss gradient, so detach the solve
        # (reference multibody_learnable_system.py:172-184). Solver
        # failures zero the sample's contribution (reference :186-192).
        force, valid = self._solve_contact(
            jax.lax.stop_gradient(delassus),
            jax.lax.stop_gradient(M), jax.lax.stop_gradient(J),
            jax.lax.stop_gradient(q_vec),
            jnp.asarray(LOSS_EPSILON, phi.dtype))
        force = jax.lax.stop_gradient(force)
        return self._contactnets_loss_given_force(
            delassus, q_vec, M, phi, dv, force, valid)

    def supports_fused_loss(self) -> bool:
        """Whether the batch-minor fused SoA loss path covers this model
        and solver configuration (see ``multibody/soa_terms.py``)."""
        from dair_pll_tpu.multibody.soa_terms import supports_fused
        return self.solver == "hybrid" and supports_fused(self.model)

    def contactnets_loss_batch(self, params: MultibodyParams, x: Array,
                               u: Array, x_plus: Array,
                               use_pallas: Optional[bool] = None,
                               use_fused: Optional[bool] = None) -> Array:
        """Batched ContactNets loss: ``(*, n_x) -> (*,)``.

        By default (``use_fused=None``) the batch-minor fused SoA path
        (``multibody/soa_terms.py``) handles supported models — the whole
        terms + solve + loss chain runs in TPU-native layout. Otherwise
        terms/loss assembly are vmapped and the (detached) cone solve runs
        once over the flattened batch.
        """
        batch_shape = x.shape[:-1]
        n_batch = int(np.prod(batch_shape)) if batch_shape else 1
        flat_x = x.reshape((n_batch, x.shape[-1]))
        flat_u = u.reshape((n_batch, u.shape[-1]))
        flat_xp = x_plus.reshape((n_batch, x_plus.shape[-1]))

        if use_fused is None:
            # Auto-select the fused path only at production batch sizes:
            # its advantage is HBM layout/bandwidth (large batches), while
            # its much larger traced graph makes cold compiles minutes
            # long — not worth it for small-batch runs.
            use_fused = (use_pallas is None and
                         n_batch >= FUSED_LOSS_MIN_BATCH and
                         self.supports_fused_loss())
        elif use_fused:
            assert self.supports_fused_loss(), (
                "use_fused=True forced on a model/solver the fused SoA "
                "path does not cover (see soa_terms.supports_fused)")
        if use_fused:
            from dair_pll_tpu.multibody.soa_terms import (
                soa_contactnets_loss, supports_fused_kernel)
            # Shape-bucketing (compile-time mitigation): the fused graph
            # costs minutes to cold-compile PER BATCH SHAPE, so pad the
            # flattened batch up to the next power of two with a valid
            # dummy state and slice the padding back off. New workload
            # sizes then hit the persistent cache at the bucket shape.
            # Padding rows cost <2x compute worst-case and contribute
            # nothing: outputs are sliced off, and their gradient
            # cotangents are exact zeros (jax propagates zero cotangents
            # to non-selected slice rows).
            n_padded = _batch_bucket(n_batch)
            if n_padded != n_batch:
                pad = n_padded - n_batch
                x_fill = jnp.broadcast_to(
                    jnp.asarray(self.space.zero_state(flat_x.dtype)),
                    (pad, flat_x.shape[-1]))
                flat_x = jnp.concatenate((flat_x, x_fill), axis=0)
                flat_xp = jnp.concatenate((flat_xp, x_fill), axis=0)
                flat_u = jnp.concatenate(
                    (flat_u, jnp.zeros((pad, flat_u.shape[-1]),
                                       flat_u.dtype)), axis=0)
            # On TPU, scalar-parameter models run the whole forward
            # (terms + solve + loss) and its backward (in-kernel grad
            # w.r.t. the derived scalars AND the states) as single
            # VMEM-resident Pallas kernels (ROADMAP 0b). The kernel is
            # f32-only; f64 batches (the loss_dtype precision escape
            # hatch) stay on the XLA fused SoA path.
            if (jax.default_backend() not in ("cpu",) and
                    flat_x.dtype == jnp.float32 and
                    supports_fused_kernel(self.model)):
                from dair_pll_tpu.ops.soa_loss_pallas import (
                    fused_contactnets_loss_kernel)
                losses = fused_contactnets_loss_kernel(
                    self.model, params, flat_x, flat_u, flat_xp,
                    self.dt, LOSS_EPSILON, self.ipm_iterations,
                    self.newton_iterations)
                return losses[:n_batch].reshape(batch_shape)
            losses = soa_contactnets_loss(
                self.model, params, flat_x, flat_u, flat_xp, self.dt,
                LOSS_EPSILON, self.ipm_iterations, self.newton_iterations)
            return losses[:n_batch].reshape(batch_shape)

        delassus, q_vec, M, J, phi, dv = jax.vmap(
            lambda a, b, c: self._contactnets_qp(params, a, b, c))(
                flat_x, flat_u, flat_xp)

        eps = jnp.asarray(LOSS_EPSILON, phi.dtype)
        delassus_sg = jax.lax.stop_gradient(delassus)
        q_vec_sg = jax.lax.stop_gradient(q_vec)
        if use_pallas is None:
            # Measured on v5e: the fused Pallas APGD matches (does not
            # beat) XLA's scan — the solve is dependency-chain latency
            # bound, not HBM bound — so the portable path is the default.
            use_pallas = False
        if use_pallas:
            from dair_pll_tpu.ops.pallas_cone_solver import (
                solve_contact_impulse_pallas)
            force, valid = solve_contact_impulse_pallas(
                delassus_sg, q_vec_sg, eps, self.solver_iterations)
        elif self.solver == "hybrid":
            M_sg = jax.lax.stop_gradient(M)
            J_sg = jax.lax.stop_gradient(J)
            force, valid = jax.vmap(
                lambda D, Mi, Ji, qv: solve_contact_impulse_hybrid(
                    D, Mi, Ji, qv, eps, self.ipm_iterations,
                    self.newton_iterations))(
                        delassus_sg, M_sg, J_sg, q_vec_sg)
        else:
            force, valid = jax.vmap(
                lambda D, qv: solve_contact_impulse(
                    D, qv, eps, self.solver_iterations))(
                        delassus_sg, q_vec_sg)
        force = jax.lax.stop_gradient(force)

        losses = jax.vmap(self._contactnets_loss_given_force)(
            delassus, q_vec, M, phi, dv, force, valid)
        return losses.reshape(batch_shape)

    def contactnets_loss_batch_warm(
            self, params: MultibodyParams, x: Array, u: Array,
            x_plus: Array, force_prev: Array,
            budget: Optional[Tuple[int, int]] = None
            ) -> Tuple[Array, Array]:
        """Epoch-warm-started batched ContactNets loss.

        Training revisits every sample each epoch with parameters moved
        by only one optimizer step, so the previous epoch's impulse is a
        near-solution: the hybrid solve warm-starts from it
        (``ops/soa_solver.solve_warm_hybrid_soa``) at the reduced
        ``budget`` (default ``DEFAULT_LOSS_WARM_BUDGET``), cutting the
        solve cost without losing gradient accuracy
        (``results/warm_loss_battery.json``).

        ``force_prev`` is the ``(3, k, n_batch)`` stacked impulse cache
        (zeros == cold samples — the in-solver primal-cost selection
        routes those to the short IPM iterate). Returns
        ``(loss (*batch,), force (3, k, n_batch))`` with ``force`` the
        detached refreshed cache. Requires ``supports_fused_loss()``;
        epoch 0 / resume should run the cold
        :meth:`contactnets_loss_batch` (full budget) to fill the cache.
        """
        assert self.supports_fused_loss(), (
            "warm loss requires the fused SoA path "
            "(see soa_terms.supports_fused)")
        ipm, newton = budget or DEFAULT_LOSS_WARM_BUDGET
        batch_shape = x.shape[:-1]
        n_batch = int(np.prod(batch_shape)) if batch_shape else 1
        flat_x = x.reshape((n_batch, x.shape[-1]))
        flat_u = u.reshape((n_batch, u.shape[-1]))
        flat_xp = x_plus.reshape((n_batch, x_plus.shape[-1]))
        force_prev = force_prev.reshape((3, -1, n_batch))

        n_padded = _batch_bucket(n_batch)
        if n_padded != n_batch:
            pad = n_padded - n_batch
            x_fill = jnp.broadcast_to(
                jnp.asarray(self.space.zero_state(flat_x.dtype)),
                (pad, flat_x.shape[-1]))
            flat_x = jnp.concatenate((flat_x, x_fill), axis=0)
            flat_xp = jnp.concatenate((flat_xp, x_fill), axis=0)
            flat_u = jnp.concatenate(
                (flat_u, jnp.zeros((pad, flat_u.shape[-1]),
                                   flat_u.dtype)), axis=0)
            force_prev = jnp.concatenate(
                (force_prev, jnp.zeros(force_prev.shape[:-1] + (pad,),
                                       force_prev.dtype)), axis=-1)

        from dair_pll_tpu.multibody.soa_terms import (
            soa_contactnets_loss_warm, supports_fused_kernel)
        if (jax.default_backend() not in ("cpu",) and
                flat_x.dtype == jnp.float32 and
                supports_fused_kernel(self.model)):
            from dair_pll_tpu.ops.soa_loss_pallas import (
                fused_contactnets_loss_kernel_warm)
            losses, force = fused_contactnets_loss_kernel_warm(
                self.model, params, flat_x, flat_u, flat_xp, self.dt,
                LOSS_EPSILON, ipm, newton, force_prev)
        else:
            losses, force_field, _ = soa_contactnets_loss_warm(
                self.model, params, flat_x, flat_u, flat_xp, self.dt,
                LOSS_EPSILON, ipm, newton,
                [force_prev[i] for i in range(3)],
                solver_backend="xla")
            force = jnp.stack(force_field)
        return (losses[:n_batch].reshape(batch_shape),
                jax.lax.stop_gradient(force[..., :n_batch]))

    # -- logging ----------------------------------------------------------------
    def summary(self, params: MultibodyParams,
                statistics: Dict) -> SystemSummary:
        """Physical-parameter scalars and learned meshes (reference
        ``multibody_learnable_system.py:315-333`` /
        ``multibody_terms.py:536-582``)."""
        from dair_pll_tpu.summaries import multibody_summary
        return multibody_summary(self.model, params)
