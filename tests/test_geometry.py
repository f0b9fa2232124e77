"""Geometry and support-function tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu import geometry as geo
from dair_pll_tpu.ops import icnn


def box_spec(half=(0.05, 0.06, 0.07)):
    return geo.CollisionGeometrySpec(
        geom_type="box", body=0,
        R_BG=((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)),
        p_BG=(0.0, 0.0, 0.0), mu=0.5, n_query=4,
        half_lengths_init=half, name="box")


def sphere_spec(radius=0.1):
    return geo.CollisionGeometrySpec(
        geom_type="sphere", body=0,
        R_BG=((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)),
        p_BG=(0.0, 0.0, 0.0), mu=0.5, n_query=1,
        radius_init=radius, name="sphere")


def icnn_spec():
    cube_corners = [(sx * 0.05, sy * 0.05, sz * 0.05)
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    return geo.CollisionGeometrySpec(
        geom_type="deep_support_convex", body=0,
        R_BG=((1.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)),
        p_BG=(0.0, 0.0, 0.0), mu=0.5, n_query=4,
        vertices_init=tuple(cube_corners), icnn_width=32, name="deep")


def test_box_support_points_flat():
    spec = box_spec()
    params = geo.default_geometry_params(spec, jnp.float64)
    direction = jnp.array([0.0, 0.0, -1.0])
    points = geo.support_points(spec, params, direction)
    assert points.shape == (4, 3)
    # all four bottom corners at z = -0.07
    np.testing.assert_allclose(np.asarray(points[:, 2]), -0.07, atol=1e-12)


def test_box_negative_half_lengths_ok():
    """Learned lengths enter via absolute value (reference
    geometry.py:394-397)."""
    spec = box_spec()
    params = {"half_lengths": jnp.asarray([-0.05, 0.06, -0.07])}
    vertices = geo.get_vertices(spec, params)
    assert float(jnp.max(jnp.abs(vertices[:, 0]))) == pytest.approx(0.05)


def test_sphere_support():
    spec = sphere_spec(0.1)
    params = geo.default_geometry_params(spec, jnp.float64)
    d = jnp.array([0.6, 0.0, 0.8])
    points = geo.support_points(spec, params, d)
    np.testing.assert_allclose(np.asarray(points[0]), [0.06, 0.0, 0.08],
                               atol=1e-12)


def test_collide_plane_box():
    """Golden phi for a flat box over the plane (reference
    geometry.py:553-582 contract)."""
    spec = box_spec()
    params = geo.default_geometry_params(spec, jnp.float64)
    R_AB = jnp.eye(3)
    p = jnp.array([0.0, 0.0, 0.1])
    phi, R_AC, p_AoAc_A, p_BoBc_B = geo.collide_plane_convex(
        spec, params, R_AB, p)
    np.testing.assert_allclose(np.asarray(phi), 0.1 - 0.07, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(R_AC), np.broadcast_to(np.eye(3), (4, 3, 3)))
    # plane witness points project to z=0
    np.testing.assert_allclose(np.asarray(p_AoAc_A[:, 2]), 0.0)


def test_collide_plane_box_rotated():
    """45-degree rotated box: lowest edge at -half*sqrt(2)."""
    spec = box_spec(half=(0.05, 0.05, 0.05))
    params = geo.default_geometry_params(spec, jnp.float64)
    angle = np.pi / 4
    R_AB = jnp.asarray([
        [1, 0, 0],
        [0, np.cos(angle), -np.sin(angle)],
        [0, np.sin(angle), np.cos(angle)]])
    p = jnp.array([0.0, 0.0, 0.2])
    phi, _, _, _ = geo.collide_plane_convex(spec, params, R_AB, p)
    lowest = 0.2 - 0.05 * np.sqrt(2)
    assert np.min(np.asarray(phi)) == pytest.approx(lowest, abs=1e-9)


def test_icnn_convex_and_homogeneous(rng):
    key = jax.random.PRNGKey(3)
    params = icnn.init_homogeneous_icnn(key, 2, 32, scale=0.1,
                                        dtype=jnp.float64)
    d1 = jnp.asarray(rng.standard_normal(3))
    d2 = jnp.asarray(rng.standard_normal(3))
    f = lambda d: icnn.icnn_value(params, d)
    # positive homogeneity: f(a d) = a f(d)
    np.testing.assert_allclose(float(f(2.5 * d1)), 2.5 * float(f(d1)),
                               rtol=1e-9)
    # convexity along a segment
    for t in (0.25, 0.5, 0.75):
        lhs = float(f(t * d1 + (1 - t) * d2))
        rhs = t * float(f(d1)) + (1 - t) * float(f(d2))
        assert lhs <= rhs + 1e-9


def test_icnn_support_point_consistency(rng):
    """Euler's identity for homogeneous functions: s(d) . d = f(d)."""
    key = jax.random.PRNGKey(4)
    params = icnn.init_homogeneous_icnn(key, 2, 32, scale=0.1,
                                        dtype=jnp.float64)
    for _ in range(5):
        d = rng.standard_normal(3)
        d = jnp.asarray(d / np.linalg.norm(d))
        value = float(icnn.icnn_value(params, d))
        point = icnn.icnn_support_point(params, d)
        np.testing.assert_allclose(float(point @ d), value, rtol=1e-8)


def test_deep_support_collide_plane():
    spec = icnn_spec()
    params = geo.default_geometry_params(spec, jnp.float64)
    R_AB = jnp.eye(3)
    p = jnp.array([0.0, 0.0, 0.3])
    phi, _, _, p_BoBc_B = geo.collide_plane_convex(spec, params, R_AB, p)
    assert phi.shape == (4,)
    assert np.all(np.isfinite(np.asarray(phi)))
    # support points below the body origin for the downward direction
    assert np.all(np.asarray(p_BoBc_B)[:, 2] <= 1e-6)


def test_collide_convex_convex_spheres_exact():
    """Two ICNN-free spheres via the generic convex-convex path: known
    distance between centers minus radii."""
    a = sphere_spec(0.1)
    b = sphere_spec(0.2)
    params_a = geo.default_geometry_params(a, jnp.float64)
    params_b = geo.default_geometry_params(b, jnp.float64)
    R_AB = jnp.eye(3)
    p = jnp.array([1.0, 0.0, 0.0])
    phi, R_AC, p_AoAc_A, p_BoBc_B = geo.collide_convex_convex(
        a, params_a, b, params_b, R_AB, p)
    np.testing.assert_allclose(float(phi[0]), 1.0 - 0.3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_AoAc_A[0]), [0.1, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_BoBc_B[0]), [-0.2, 0, 0],
                               atol=1e-6)
