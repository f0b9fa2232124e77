r"""Multibody system-identification experiments.

Rebuild of the reference's ``drake_experiment.py``
(``/root/reference/dair_pll/drake_experiment.py:23-224``) without Drake:
the base (ground-truth) system is the same JAX multibody engine evaluated
at the URDF's true parameters, and the learnable system starts from those
URDFs and optimizes inertia/friction/geometry.

``MultibodyLosses.CONTACTNETS_LOSS`` swaps the training loss to the
ContactNets implicit loss exactly as the reference does
(``drake_experiment.py:174-175,202-224``): the loss consumes
``x = x_past[..., -1, :]`` and ``x_plus = x_future[..., 0, :]``.
"""
from __future__ import annotations

import dataclasses
import enum
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from dair_pll_tpu.multibody.learnable_system import MultibodyLearnableSystem
from dair_pll_tpu.training.config import (SupervisedLearningExperimentConfig,
                                          SystemConfig)
from dair_pll_tpu.training.experiment import SupervisedLearningExperiment
from dair_pll_tpu.urdf import build_multibody_model
from dair_pll_tpu.utils import file_utils


class MultibodyLosses(enum.Enum):
    """Training-loss selection (reference ``drake_experiment.py:30-33``)."""
    PREDICTION_LOSS = 1
    CONTACTNETS_LOSS = 2


@dataclasses.dataclass
class MultibodySystemConfig(SystemConfig):
    """Ground-truth multibody system description (role of reference
    ``DrakeSystemConfig``, ``drake_experiment.py:23-27``)."""
    urdfs: Dict[str, str] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class MultibodyLearnableSystemConfig(MultibodySystemConfig):
    """Learnable multibody system description (reference
    ``drake_experiment.py:36-43``).

    ``fix_inertial_scale`` pins the first body's overall inertial scale
    (the ``alpha`` of its ``theta`` parameterization). For a passive system
    the absolute mass/inertia scale is unobservable — the ContactNets loss
    is homogeneous in it, so an unconstrained scale direction collapses
    toward zero over long training (the reference inherits the same
    degeneracy; we pin it by default).

    ``contactnets_multistep`` extends the ContactNets loss over the full
    ``t_prediction`` window (ROADMAP item 11, beyond the reference): the
    implicit loss is summed over the window's transitions with the model's
    own (rematerialized) rollout supplying each step's preimpact state, so
    gradients couple across steps through the differentiable contact
    solves (IFT custom VJP). With ``t_prediction == 1`` it reduces to the
    standard one-step loss."""
    loss: MultibodyLosses = MultibodyLosses.PREDICTION_LOSS
    mesh_representation: str = "deep_support_convex"
    fix_inertial_scale: bool = True
    #: Pin the friction coefficient of environment (plane) geometries.
    #: Friction enters the dynamics only through the pairwise harmonic
    #: combination ``2 mu_a mu_b / (mu_a + mu_b)`` (reference
    #: ``multibody_terms.py:471``; ``multibody/terms.py:96-97``), so
    #: per-geometry coefficients are unidentifiable along a 1-D manifold
    #: per pair — pinning the plane's makes the body coefficients
    #: observable (analogous to ``fix_inertial_scale``).
    #:
    #: NOTE this default differs from the reference, which optimizes all
    #: friction coefficients jointly: recovered body coefficients are
    #: gauge-fixed relative to the pinned plane value, so a wrong plane
    #: mu in the URDF is absorbed into the learned body mus (only the
    #: pairwise COMBINED mu is physical). Set ``False`` to match the
    #: reference's joint optimization; compare runs on combined-mu, not
    #: per-geometry values.
    fix_environment_friction: bool = True
    contactnets_multistep: bool = False
    #: Optional dtype the ContactNets loss (and therefore its whole
    #: backward pass) is computed in, e.g. ``"float64"``. The default
    #: (``None``) keeps the data dtype (f32 on TPU). The f32 parameter
    #: gradient carries ~13% median relative noise on harsh states
    #: (``results/tpu_kernel_parity.json``); this is the precision escape
    #: hatch for stiffer systems: states and parameters are cast up at
    #: the loss boundary, so gradients accumulate at f64 and only the
    #: final cotangent is cast back to the parameter dtype. Requires the
    #: ``jax_enable_x64`` runtime flag; routes around the f32-only Pallas
    #: kernel automatically (the XLA fused SoA path supports f64).
    loss_dtype: Optional[str] = None
    #: Optional ``(ipm, newton)`` iteration-count override for the
    #: loss-family cone solves. The default budget (10, 6) stalls at f32
    #: on a small fraction of hard real-data QPs (~4.7% batch-gradient
    #: error on real cube tosses, ``results/grad_precision_real_cube.json``).
    #: The stall is the Newton-POLISH count, not the IPM count: (10, 10)
    #: cuts the error to ~6e-4 at ~1.25x solve cost (f32 polish error
    #: falls smoothly: 6 -> 4.7e-2, 8 -> 3.2e-3, 10 -> 6.2e-4,
    #: 12 -> 3.4e-4) — the TPU-native precision/throughput knob (f64 at
    #: the default budget is exact but needs x64).
    loss_solver_budget: Optional[Tuple[int, int]] = None
    #: Overrides the fused-SoA-path auto-selection of the ContactNets
    #: loss (default: fused only at ``n_batch >= FUSED_LOSS_MIN_BATCH``).
    #: ``True`` forces the fused path at ANY batch size — e.g. the
    #: reference mesh-cube recipe at batch 256, where the ICNN fused
    #: path is several times faster per step and the larger cold compile
    #: amortizes over a full training run. ``False`` forces the vmapped
    #: path.
    force_fused_loss: Optional[bool] = None
    #: Epoch-warm ContactNets solves: carry each training slice's solved
    #: contact impulse across epochs and warm-start the next epoch's
    #: loss solve from it at a reduced ``warm_solver_budget``
    #: (:meth:`MultibodyLearnableSystem.contactnets_loss_batch_warm`).
    #: The first epoch of every process run seeds the cache at the full
    #: production budget. ``None`` = auto (round 5): ON whenever
    #: supported (single-step ContactNets, default ``loss_dtype``,
    #: fused-SoA-capable model, static data) on non-CPU backends; OFF
    #: on CPU, where the extra seed+warm epoch compiles dominate the
    #: small runs the test suite and dryruns drive. Decisive evidence
    #: (500-epoch A/B on the 550 real tosses,
    #: ``results/warm_real_cube.json``): warm (4,10) training is
    #: END-TO-END EQUIVALENT to cold training at the exact (10,10)
    #: objective — test one-step loss 0.495 vs 0.502, pos err 0.0476
    #: vs 0.0478 m, recovered parameters identical to ~3e-4 — while
    #: skipping 6/10 IPM iterations per steady-state solve. (The
    #: legacy (10,6) COLD objective scores better on prediction
    #: metrics via its stall bias — see
    #: ``DEFAULT_LOSS_NEWTON_ITERATIONS`` — that is a property of the
    #: objective, not of warm-starting.) Multi-epoch stability of the
    #: (4,10) warm budget: ``scripts/diag_warm_divergence.py``.
    #: ``True`` forces warm epochs (raises if unsupported); ``False``
    #: disables.
    use_warm_loss: Optional[bool] = None
    #: ``(ipm, newton)`` budget for warm (non-seed) epochs; ``None`` =
    #: ``learnable_system.DEFAULT_LOSS_WARM_BUDGET``.
    warm_solver_budget: Optional[Tuple[int, int]] = None


class MultibodyLearnableExperiment(SupervisedLearningExperiment):
    """System identification of a contact-rich multibody system.

    Plays the role of the reference's
    ``DrakeMultibodyLearnableExperiment`` (``drake_experiment.py:164-224``).
    """

    def __init__(self, config: SupervisedLearningExperimentConfig) -> None:
        super().__init__(config)
        self._base_cache: Optional[Tuple[MultibodyLearnableSystem, Any]] = \
            None
        self._video_call_count = 0

    def get_base_system(self) -> Tuple[MultibodyLearnableSystem, Any]:
        """Ground-truth system at the base URDFs' parameters.

        Mesh collision elements use their *exact* vertex polygons (not a
        randomly initialized deep support network — that representation is
        for the learnable system only)."""
        if self._base_cache is None:
            base_config = self.config.base_config
            assert isinstance(base_config, MultibodySystemConfig)
            model = build_multibody_model(
                base_config.urdfs, mesh_representation="polygon")
            system = MultibodyLearnableSystem(
                model, self.config.data_config.dt)
            self._base_cache = (system, model.initial_params())
        return self._base_cache

    def get_learned_system(self) -> Tuple[MultibodyLearnableSystem, Any]:
        """Learnable system initialized from its URDFs."""
        learnable_config = self.config.learnable_config
        assert isinstance(learnable_config, MultibodyLearnableSystemConfig)
        model = build_multibody_model(
            learnable_config.urdfs,
            mesh_representation=learnable_config.mesh_representation)
        solver_kwargs = {}
        if learnable_config.loss_solver_budget is not None:
            ipm, newton = learnable_config.loss_solver_budget
            solver_kwargs = {"ipm_iterations": int(ipm),
                             "newton_iterations": int(newton)}
        system = MultibodyLearnableSystem(
            model, self.config.data_config.dt, **solver_kwargs)
        return system, model.initial_params()

    def loss_callback(self):
        learnable_config = self.config.learnable_config
        assert isinstance(learnable_config, MultibodyLearnableSystemConfig)
        if learnable_config.loss == MultibodyLosses.PREDICTION_LOSS:
            return super().loss_callback()

        system = self.learned_system
        assert isinstance(system, MultibodyLearnableSystem)
        n_u = system.model.n_u

        multistep = learnable_config.contactnets_multistep
        import jax

        loss_dtype = learnable_config.loss_dtype
        if loss_dtype is not None:
            loss_dtype = jnp.dtype(loss_dtype)
            if (loss_dtype == jnp.float64 and
                    not jax.config.read("jax_enable_x64")):
                raise ValueError(
                    "loss_dtype='float64' requires the jax_enable_x64 "
                    "runtime flag (jax.config.update('jax_enable_x64', "
                    "True) before first device use)")

        rollout_step = jax.checkpoint(
            lambda p, xb: jax.vmap(lambda xi: system.sim_step(p, xi))(xb))

        def contactnets_loss(params, x_past, x_future):
            """Slices the transition endpoints like reference
            ``drake_experiment.py:202-224``; with
            ``contactnets_multistep`` the loss averages over the whole
            prediction window, each step's preimpact state supplied by
            the model's own (rematerialized) rollout."""
            if loss_dtype is not None:
                # Precision escape hatch: cast states and parameters up
                # at the loss boundary. Gradients then accumulate at
                # loss_dtype through the whole backward pass; the cast's
                # transpose returns cotangents in the parameter dtype.
                cast = lambda leaf: (
                    leaf.astype(loss_dtype)
                    if jnp.issubdtype(jnp.asarray(leaf).dtype,
                                      jnp.floating) else leaf)
                params = jax.tree_util.tree_map(cast, params)
                x_past = cast(x_past)
                x_future = cast(x_future)
            x = x_past[..., -1, :]
            u = jnp.zeros(x.shape[:-1] + (n_u,), x.dtype)
            t_window = x_future.shape[-2] if multistep else 1
            use_fused = learnable_config.force_fused_loss
            total = system.contactnets_loss_batch(
                params, x, u, x_future[..., 0, :], use_fused=use_fused)
            for t in range(1, t_window):
                x = rollout_step(params, x)
                total = total + system.contactnets_loss_batch(
                    params, x, u, x_future[..., t, :],
                    use_fused=use_fused)
            return total / t_window

        return contactnets_loss

    def warm_loss_callback(self):
        """Epoch-warm ContactNets solves (see
        :meth:`SupervisedLearningExperiment.warm_loss_callback` and
        ``MultibodyLearnableSystemConfig.use_warm_loss``).

        Supported only for the single-step ContactNets loss at the
        default ``loss_dtype`` on fused-SoA-capable models: the cache is
        the ``(3, k, n_slices)`` stacked contact impulse field."""
        learnable_config = self.config.learnable_config
        assert isinstance(learnable_config,
                          MultibodyLearnableSystemConfig)
        use = learnable_config.use_warm_loss
        if use is False:
            return None
        unsupported = None
        if learnable_config.loss != MultibodyLosses.CONTACTNETS_LOSS:
            unsupported = "requires the ContactNets loss"
        elif learnable_config.contactnets_multistep:
            unsupported = "single-step ContactNets only"
        elif learnable_config.loss_dtype is not None:
            unsupported = "default loss_dtype only"
        system = self.learned_system
        assert isinstance(system, MultibodyLearnableSystem)
        if unsupported is None and not system.supports_fused_loss():
            unsupported = "model lacks fused SoA loss support"
        if use is None:
            # Auto (round 5): warm epochs are the production default on
            # accelerator backends — end-to-end equivalent to cold
            # training at the exact (10,10) objective on the 550 real
            # tosses (results/warm_real_cube.json; see the config
            # docstring). Off on CPU: the seed+warm epoch pair doubles
            # compiles for the small CPU runs the test suite drives.
            import jax
            if unsupported is not None or jax.default_backend() == "cpu":
                return None
        elif unsupported is not None:
            raise ValueError(f"use_warm_loss: {unsupported}")

        n_u = system.model.n_u
        k = system.model.n_contacts
        warm_budget = learnable_config.warm_solver_budget
        seed_budget = (system.ipm_iterations,
                       system.newton_iterations)

        def make_warm_fn(seed: bool):
            budget = seed_budget if seed else warm_budget

            def warm_fn(params, x_past, x_future, cache):
                x = x_past[..., -1, :]
                u = jnp.zeros(x.shape[:-1] + (n_u,), x.dtype)
                return system.contactnets_loss_batch_warm(
                    params, x, u, x_future[..., 0, :], cache,
                    budget=budget)

            return warm_fn

        def init_cache(n_slices: int, dtype):
            return jnp.zeros((3, k, n_slices), dtype)

        return make_warm_fn, init_cache

    def base_and_learned_comparison_summary(self, statistics: Dict,
                                            best_params: Any) -> Dict:
        """Overlay videos of the first saved trajectory pair of each set
        present in the statistics (role of reference
        ``drake_experiment.py:119-161`` via Drake rendering; here rendered
        host-side by ``vis_utils``).

        With ``config.update_geometry_in_videos`` the overlay geometry is
        rebuilt from the current learned parameters every call (role of
        reference ``visualizer_regeneration_is_required``,
        ``drake_experiment.py:188-200``); otherwise the base (initial)
        geometry is drawn.
        """
        assert isinstance(self.learned_system, MultibodyLearnableSystem)
        config = self.config
        # Overlay rendering is host-side matplotlib and dominates logging
        # wall time (results/cube_mesh_r4_fused.json wall_seconds_split);
        # render every ``video_period``-th evaluation that carries
        # samples, at the configured (decimated) resolution.
        has_samples = any(
            statistics.get(f"{set_name}_model_target_sample")
            for set_name in ("train", "valid", "test"))
        if not has_samples:
            return {}
        if config.video_period <= 0:
            return {}
        count = self._video_call_count
        self._video_call_count += 1
        if count % config.video_period != 0:
            return {}
        if config.update_geometry_in_videos:
            video_params = best_params
        else:
            # Draw the shapes at their initial (URDF) geometry.
            video_params = self.learned_system.model.initial_params()
        videos = {}
        for set_name in ("train", "valid", "test"):
            target_key = f"{set_name}_model_target_sample"
            prediction_key = f"{set_name}_model_prediction_sample"
            if target_key not in statistics or not statistics[target_key]:
                continue
            try:
                from dair_pll_tpu.vis_utils import visualize_trajectory
                video, fps = visualize_trajectory(
                    self.learned_system.model, video_params,
                    statistics[target_key][0],
                    statistics[prediction_key][0],
                    self.config.data_config.dt,
                    max_frames=config.video_max_frames,
                    height=config.video_height,
                    width=config.video_width)
                videos[f"{set_name}_trajectory_overlay"] = (video, fps)
            except Exception:
                continue
            try:
                # Interactive three.js viewer alongside the video
                # (ROADMAP item 8; beyond the reference).
                import os

                from dair_pll_tpu.interactive_vis import (
                    export_interactive_html)
                from dair_pll_tpu.utils import file_utils
                out_dir = os.path.join(file_utils.run_dir(
                    self.config.storage, self.config.run_name),
                    "interactive")
                export_interactive_html(
                    self.learned_system.model, video_params,
                    statistics[prediction_key][0],
                    statistics[target_key][0],
                    self.config.data_config.dt,
                    os.path.join(out_dir, f"{set_name}_overlay.html"),
                    title=f"{self.config.run_name} {set_name}")
            except Exception:
                continue
        return videos

    def parameter_update_mask(self, params: Any) -> Optional[Any]:
        """Zeroes the gradients of unidentifiable parameter directions:
        body 0's inertial-scale coordinate ``theta[0, 0]`` when
        ``fix_inertial_scale`` is set, and plane-geometry friction
        coefficients when ``fix_environment_friction`` is set (see the
        config docstrings)."""
        learnable_config = self.config.learnable_config
        assert isinstance(learnable_config, MultibodyLearnableSystemConfig)
        if not (learnable_config.fix_inertial_scale or
                learnable_config.fix_environment_friction):
            return None
        import jax
        mask = jax.tree_util.tree_map(jnp.ones_like, params)
        if learnable_config.fix_inertial_scale:
            mask.theta = mask.theta.at[0, 0].set(0.0)
        if learnable_config.fix_environment_friction:
            assert isinstance(self.learned_system, MultibodyLearnableSystem)
            for g, spec in enumerate(self.learned_system.model.geometries):
                if spec.geom_type == "plane":
                    mask.friction = mask.friction.at[g].set(0.0)
        return mask

    def generate_updated_urdfs(self, params: Any) -> Dict[str, str]:
        """Exports the learned parameters as URDFs (reference
        ``multibody_learnable_system.py:82-102``)."""
        from dair_pll_tpu.urdf_export import (
            represent_multibody_terms_as_urdfs)
        assert isinstance(self.learned_system, MultibodyLearnableSystem)
        output_dir = file_utils.urdf_dir(self.config.storage,
                                         self.config.run_name)
        urdf_strings = represent_multibody_terms_as_urdfs(
            self.learned_system.model, params, output_dir)
        new_urdfs = {}
        for name, urdf_string in urdf_strings.items():
            original = dict(self.learned_system.model.urdf_paths)[name]
            path = os.path.join(output_dir, os.path.basename(original))
            file_utils.save_string(path, urdf_string)
            new_urdfs[name] = path
        return new_urdfs
