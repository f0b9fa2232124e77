r"""Collision geometry representation and collision resolution, TPU-native.

JAX rebuild of the reference's ``geometry.py``
(``/root/reference/dair_pll/geometry.py``). Differences in design:

* Shapes are split into a *static spec* (:class:`CollisionGeometrySpec`:
  type tag, query size, initial values — hashable, safe under jit) and a
  *learnable parameter pytree* (one entry per geometry in
  ``MultibodyParams.geometry``).
* All collision functions are pure, unbatched functions of arrays; callers
  ``vmap`` over configuration batches. Contact counts are static per pair,
  so every shape is jit-compatible.
* The top-k witness-vertex query of the reference
  (``geometry.py:143-217``) is replaced by ``jax.lax.top_k`` over vertex
  dot products — branchless and TPU-friendly.
* Mesh-mesh contact replaces FCL (reference ``geometry.py:584-643``) with a
  fixed-iteration support-function direction search under
  ``lax.stop_gradient`` — same piecewise-constant-direction assumption the
  reference makes (``geometry.py:598-601``).

Supported shapes (reference type ordering ``geometry.py:46``, plus the
cylinder the reference only documents as a support-function example,
``geometry.py:100-118``):
``Plane < Polygon < Box < Cylinder < Sphere < DeepSupportConvex``.
"""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from dair_pll_tpu.ops import icnn
from dair_pll_tpu.ops.tensor import rotation_matrix_from_one_vector

GEOMETRY_TYPE_ORDER = (
    "plane", "polygon", "box", "cylinder", "sphere",
    "deep_support_convex")

#: Fixed support-direction perturbations for shapes whose support SET is
#: degenerate along some directions (cylinder disk/line contact): the
#: perturbed witnesses straddle the true contact set (same trick the
#: reference uses for deep support functions, geometry.py:306-325).
_CYLINDER_PERTURBATIONS = np.array([
    [0.0, 0.0, 0.0],
    [0.25, 0.14, 0.22],
    [-0.25, 0.14, -0.22],
    [0.0, -0.28, 0.11],
])


def _cylinder_perturbations(n_query: int) -> np.ndarray:
    """``(n_query, 3)`` support-direction perturbations for any count.

    Uses the hand-picked table up to its length and extends it
    procedurally (golden-angle spiral, alternating z) beyond, so a spec
    with ``n_query > 4`` still returns exactly ``n_query`` witnesses.
    """
    if n_query <= len(_CYLINDER_PERTURBATIONS):
        return _CYLINDER_PERTURBATIONS[:n_query]
    extra = n_query - len(_CYLINDER_PERTURBATIONS)
    ii = np.arange(extra)
    ang = 2.399963229728653 * ii          # golden angle
    more = np.stack([0.28 * np.cos(ang), 0.28 * np.sin(ang),
                     0.2 * np.where(ii % 2 == 0, 1.0, -1.0)], axis=-1)
    return np.concatenate([_CYLINDER_PERTURBATIONS, more], axis=0)

_POLYGON_DEFAULT_N_QUERY = 4
_DEEP_SUPPORT_DEFAULT_N_QUERY = 4
_DEEP_SUPPORT_DEFAULT_DEPTH = 2
_DEEP_SUPPORT_DEFAULT_WIDTH = 256
_DEEP_SUPPORT_PERTURBATION = 0.4


def _stable_seed(*parts: str) -> int:
    """Process-independent PRNG seed from string identifiers.

    Python's salted ``hash`` differs across interpreter runs; sha256 keeps
    learned-geometry initializations reproducible for identical configs.
    """
    digest = hashlib.sha256(
        "/".join(str(part) for part in parts).encode()).digest()
    return int.from_bytes(digest[:4], "little")
_MESH_MESH_ITERS = 32

# Unit cube corner signs, (8, 3).
_UNIT_BOX_VERTICES = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)])


@dataclasses.dataclass(frozen=True)
class CollisionGeometrySpec:
    """Static description of one collision geometry.

    Attributes:
        geom_type: one of :data:`GEOMETRY_TYPE_ORDER`.
        body: body index the geometry is attached to (-1 = world).
        R_BG: (3, 3) rotation of the geometry frame in the body frame.
        p_BG: (3,) geometry origin in the body frame.
        mu: initial friction coefficient.
        n_query: witness points returned per support query.
        half_lengths_init: box initial half lengths.
        radius_init: sphere / cylinder initial radius.
        half_length_init: cylinder initial half length (axis = geometry
          z).
        vertices_init: polygon / deep-support initial vertex set rows.
        icnn_depth / icnn_width: deep support function network size.
        name: geometry name for logging.
    """
    geom_type: str
    body: int
    R_BG: Tuple[Tuple[float, ...], ...]
    p_BG: Tuple[float, ...]
    mu: float
    n_query: int = _POLYGON_DEFAULT_N_QUERY
    half_lengths_init: Optional[Tuple[float, ...]] = None
    radius_init: Optional[float] = None
    half_length_init: Optional[float] = None
    vertices_init: Optional[Tuple[Tuple[float, ...], ...]] = None
    icnn_depth: int = _DEEP_SUPPORT_DEFAULT_DEPTH
    icnn_width: int = _DEEP_SUPPORT_DEFAULT_WIDTH
    icnn_negative_slope: float = 0.5
    name: str = ""

    @property
    def n_contacts(self) -> int:
        """Contact points this geometry contributes against a plane."""
        if self.geom_type == "sphere":
            return 1
        if self.geom_type == "plane":
            raise ValueError("plane has no witness points")
        return self.n_query

    def type_rank(self) -> int:
        return GEOMETRY_TYPE_ORDER.index(self.geom_type)


def default_geometry_params(spec: CollisionGeometrySpec, dtype=jnp.float32):
    """Initial learnable parameter pytree for a geometry spec.

    Mirrors the initializations of reference ``geometry.py``:
    Box stores half lengths (``:378-392``), Sphere a radius (``:428-433``),
    Polygon its vertices (``:229-239``), DeepSupportConvex an ICNN sized to
    the initial vertex set (``:283-307``). Planes have no parameters.
    """
    if spec.geom_type == "plane":
        return None
    if spec.geom_type == "box":
        return {"half_lengths": jnp.asarray(spec.half_lengths_init, dtype)}
    if spec.geom_type == "sphere":
        return {"radius": jnp.asarray(spec.radius_init, dtype)}
    if spec.geom_type == "cylinder":
        return {"radius": jnp.asarray(spec.radius_init, dtype),
                "half_length": jnp.asarray(spec.half_length_init, dtype)}
    if spec.geom_type == "polygon":
        return {"vertices": jnp.asarray(spec.vertices_init, dtype)}
    if spec.geom_type == "deep_support_convex":
        vertices = np.asarray(spec.vertices_init)
        length_scale = float(
            np.linalg.norm(vertices.max(axis=0) - vertices.min(axis=0)) / 2)
        key = jax.random.PRNGKey(_stable_seed(spec.name, spec.body, "icnn"))
        net = icnn.init_homogeneous_icnn(
            key, spec.icnn_depth, spec.icnn_width,
            negative_slope=spec.icnn_negative_slope, scale=length_scale,
            dtype=dtype)
        pert_key = jax.random.PRNGKey(
            _stable_seed(spec.name, spec.body, "pert"))
        perturbations = jnp.concatenate((
            jnp.zeros((1, 3), dtype),
            _DEEP_SUPPORT_PERTURBATION * (jax.random.uniform(
                pert_key, (spec.n_query - 1, 3), dtype=dtype) - 0.5),
        ))
        return {"icnn": net, "perturbations": perturbations}
    raise ValueError(f"unknown geometry type {spec.geom_type}")


# -- support queries ----------------------------------------------------------


def get_vertices(spec: CollisionGeometrySpec, params) -> Array:
    """Vertex set for sparse-vertex convex shapes (box/polygon).

    Box half lengths are used via absolute value so learned lengths stay
    non-negative (reference ``geometry.py:394-397``).
    """
    if spec.geom_type == "box":
        half = jnp.abs(params["half_lengths"]).reshape(1, 3)
        return jnp.asarray(_UNIT_BOX_VERTICES, half.dtype) * half
    if spec.geom_type == "polygon":
        return params["vertices"]
    raise ValueError(f"no vertex set for {spec.geom_type}")


def support_function(spec: CollisionGeometrySpec, params,
                     direction: Array) -> Array:
    """Scalar support value ``h(d) = max_{s in S} s . d`` for one direction.

    Args:
        spec/params: geometry description.
        direction: ``(3,)`` unit direction.

    Returns:
        scalar support value.
    """
    if spec.geom_type in ("box", "polygon"):
        vertices = get_vertices(spec, params)
        return jnp.max(vertices @ direction)
    if spec.geom_type == "sphere":
        return jnp.abs(params["radius"])
    if spec.geom_type == "cylinder":
        # h(d) = r ||d_xy|| + L |d_z| for a z-axis cylinder (the
        # reference documents exactly this example, geometry.py:100-118).
        return (jnp.abs(params["radius"]) *
                jnp.linalg.norm(direction[:2]) +
                jnp.abs(params["half_length"]) * jnp.abs(direction[2]))
    if spec.geom_type == "deep_support_convex":
        return icnn.icnn_value(params["icnn"], direction,
                               spec.icnn_negative_slope)
    raise ValueError(f"no support function for {spec.geom_type}")


def _cylinder_support_point(params, direction: Array) -> Array:
    """Support point of a z-axis cylinder for one direction (safe at the
    degenerate axial/radial directions; subgradient selection)."""
    radius = jnp.abs(params["radius"])
    half_length = jnp.abs(params["half_length"])
    d_xy = direction[:2]
    s = jnp.sqrt(jnp.maximum(jnp.sum(d_xy * d_xy), 1e-18))
    hat = d_xy / s
    return jnp.concatenate((
        radius * hat, (half_length * jnp.sign(direction[2]))[None]))


def support_points(spec: CollisionGeometrySpec, params,
                   direction: Array) -> Array:
    """Witness point set for a single support direction.

    Args:
        spec/params: geometry description.
        direction: ``(3,)`` unit support direction (in geometry frame).

    Returns:
        ``(n_contacts, 3)`` witness points whose convex hull contains the
        true argmax set (reference ``geometry.py:122-141``).
    """
    if spec.geom_type in ("box", "polygon"):
        vertices = get_vertices(spec, params)
        dots = vertices @ direction
        _, idx = jax.lax.top_k(dots, spec.n_query)
        return vertices[idx]
    if spec.geom_type == "sphere":
        radius = jnp.abs(params["radius"])
        return (direction * radius)[None, :]
    if spec.geom_type == "cylinder":
        # Perturbed directions straddle the (possibly degenerate: disk
        # or line) support set, like the deep-support witnesses.
        perturbed = direction[None, :] + jnp.asarray(
            _cylinder_perturbations(spec.n_query), direction.dtype)
        perturbed = perturbed / jnp.linalg.norm(
            perturbed, axis=-1, keepdims=True)
        return jax.vmap(
            lambda d: _cylinder_support_point(params, d))(perturbed)
    if spec.geom_type == "deep_support_convex":
        # Perturbed directions stabilize mesh-plane contact
        # (reference geometry.py:306-325).
        perturbed = direction[None, :] + params["perturbations"]
        perturbed = perturbed / jnp.linalg.norm(
            perturbed, axis=-1, keepdims=True)
        return jax.vmap(lambda d: icnn.icnn_support_point(
            params["icnn"], d, spec.icnn_negative_slope))(perturbed)
    raise ValueError(f"no support points for {spec.geom_type}")


def geometry_scalars(spec: CollisionGeometrySpec, params) -> dict:
    """Logging scalars per geometry (reference ``geometry.py:245-252,
    405-412, 454-456``)."""
    axes = ["x", "y", "z"]
    if spec.geom_type == "box":
        half = np.abs(np.asarray(params["half_lengths"])).reshape(-1)
        return {f"len_{a}": 2.0 * float(v) for a, v in zip(axes, half)}
    if spec.geom_type == "sphere":
        return {"radius": float(np.abs(np.asarray(params["radius"])))}
    if spec.geom_type == "cylinder":
        return {"radius": float(np.abs(np.asarray(params["radius"]))),
                "length": 2.0 * float(np.abs(np.asarray(
                    params["half_length"])))}
    if spec.geom_type == "polygon":
        vertices = np.asarray(params["vertices"])
        out = {}
        for axis_i, axis in enumerate(axes):
            for v_i in range(vertices.shape[0]):
                out[f"v{v_i}_{axis}"] = float(vertices[v_i, axis_i])
        return out
    return {}


# -- collision ----------------------------------------------------------------


def collide_plane_convex(
        spec_b: CollisionGeometrySpec, params_b, R_AB: Array,
        p_AoBo_A: Array) -> Tuple[Array, Array, Array, Array]:
    """Collides the z=0 plane of frame A against convex geometry B.

    Mirrors reference ``geometry.py:553-582``: witness points on B are the
    support points in the downward (-z of A) direction; phi is their A-frame
    z coordinate; the contact frame equals A's axes.

    Args:
        spec_b/params_b: convex geometry B.
        R_AB: ``(3, 3)`` rotation of B in A.
        p_AoBo_A: ``(3,)`` origin of B in A.

    Returns:
        phi: ``(n_c,)`` signed distances.
        R_AC: ``(n_c, 3, 3)`` contact frame rotations in A (identity).
        p_AoAc_A: ``(n_c, 3)`` witness points on the plane.
        p_BoBc_B: ``(n_c, 3)`` witness points on B (B frame).
    """
    # Support direction on B: -z axis of A, in B coordinates.
    direction_b = -R_AB.T[:, 2]
    p_BoBc_B = support_points(spec_b, params_b, direction_b)     # (n_c, 3)
    p_AoBc_A = p_BoBc_B @ R_AB.T + p_AoBo_A[None, :]
    phi = p_AoBc_A[:, 2]
    p_AoAc_A = p_AoBc_A.at[:, 2].set(0.0)
    n_c = p_BoBc_B.shape[0]
    R_AC = jnp.broadcast_to(jnp.eye(3, dtype=R_AB.dtype), (n_c, 3, 3))
    return phi, R_AC, p_AoAc_A, p_BoBc_B


def collide_convex_convex(
        spec_a: CollisionGeometrySpec, params_a,
        spec_b: CollisionGeometrySpec, params_b, R_AB: Array,
        p_AoBo_A: Array) -> Tuple[Array, Array, Array, Array]:
    """Collides two bounded convex geometries via support functions.

    Replaces the reference's FCL-based direction search
    (``geometry.py:584-643``) with a fixed-iteration Frank-Wolfe style
    minimization of the Minkowski-difference support over directions,
    wrapped in ``lax.stop_gradient`` — keeping the reference's
    piecewise-constant-direction differentiation model while staying
    jit/vmap-compatible on TPU.

    Returns one contact point (matching the reference, which assumes a
    single mesh-mesh contact).

    Args / Returns: as :func:`collide_plane_convex`, with ``n_c = 1``.
    """
    dtype = p_AoBo_A.dtype

    def signed_extent(direction_a: Array) -> Array:
        """Support of (B + p) minus support of A along -direction: the
        separation extent along ``direction_a`` (A-frame)."""
        h_a = support_function(spec_a, params_a, direction_a)
        d_b = -(R_AB.T @ direction_a)
        h_b = support_function(spec_b, params_b, d_b)
        return -(h_a + h_b - jnp.dot(direction_a, p_AoBo_A))

    # Direction search: gradient ascent on the (concave over the sphere)
    # separation with renormalization; initialized at the center offset.
    init = p_AoBo_A / jnp.maximum(jnp.linalg.norm(p_AoBo_A), 1e-9)

    def body(_, d):
        g = jax.grad(signed_extent)(d)
        d_new = d + 0.5 * g
        norm = jnp.maximum(jnp.linalg.norm(d_new), 1e-9)
        return d_new / norm

    direction = jax.lax.fori_loop(0, _MESH_MESH_ITERS, body, init)
    direction = jax.lax.stop_gradient(direction)

    R_AC = rotation_matrix_from_one_vector(direction[None, :], 2)  # (1,3,3)
    p_AoAc_A = icnn_or_support_point(spec_a, params_a, direction)[None, :]
    d_b = -(R_AB.T @ direction)
    p_BoBc_B = icnn_or_support_point(spec_b, params_b, d_b)[None, :]
    p_BoBc_A = p_BoBc_B @ R_AB.T
    p_AcBc_A = -p_AoAc_A + p_AoBo_A[None, :] + p_BoBc_A
    phi = jnp.sum(p_AcBc_A * direction[None, :], axis=-1)
    return phi, R_AC, p_AoAc_A, p_BoBc_B


def icnn_or_support_point(spec: CollisionGeometrySpec, params,
                          direction: Array) -> Array:
    """Single differentiable support point for a direction."""
    if spec.geom_type == "deep_support_convex":
        return icnn.icnn_support_point(params["icnn"], direction,
                                       spec.icnn_negative_slope)
    if spec.geom_type in ("box", "polygon"):
        # Smooth argmax would break polytope semantics; use the top vertex.
        vertices = get_vertices(spec, params)
        idx = jnp.argmax(vertices @ direction)
        return vertices[idx]
    if spec.geom_type == "sphere":
        return direction * jnp.abs(params["radius"])
    if spec.geom_type == "cylinder":
        return _cylinder_support_point(params, direction)
    raise ValueError(spec.geom_type)


def collide(spec_a: CollisionGeometrySpec, params_a,
            spec_b: CollisionGeometrySpec, params_b, R_AB: Array,
            p_AoBo_A: Array) -> Tuple[Array, Array, Array, Array]:
    """Static dispatch over geometry-pair types (reference
    ``geometry.py:507-551``); ``spec_a`` must not outrank ``spec_b`` in the
    type ordering."""
    assert spec_a.type_rank() <= spec_b.type_rank(), (
        "collision pair must be ordered by geometry type")
    if spec_a.geom_type == "plane" and spec_b.geom_type != "plane":
        return collide_plane_convex(spec_b, params_b, R_AB, p_AoBo_A)
    if spec_a.geom_type != "plane" and spec_b.geom_type != "plane":
        return collide_convex_convex(
            spec_a, params_a, spec_b, params_b, R_AB, p_AoBo_A)
    raise TypeError(
        f"unsupported collision pair: {spec_a.geom_type}, {spec_b.geom_type}")


def pair_contact_count(spec_a: CollisionGeometrySpec,
                       spec_b: CollisionGeometrySpec) -> int:
    """Static contact count for a candidate pair."""
    if spec_a.geom_type == "plane":
        return spec_b.n_contacts
    return 1
