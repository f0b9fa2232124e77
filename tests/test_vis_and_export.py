"""Visualization, mesh extraction, and URDF export tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dair_pll_tpu.assets import get_asset
from dair_pll_tpu.mesh_extraction import (extract_mesh,
                                          extract_outward_normal_hyperplanes,
                                          mesh_to_obj)
from dair_pll_tpu.urdf import build_multibody_model, load_obj_vertices
from dair_pll_tpu.vis_utils import visualize_trajectory


def test_extract_mesh_from_box_support():
    """Support function of a box extracts its 8 corners."""
    half = np.array([0.05, 0.06, 0.07])
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)]) * half

    def support_fn(directions):
        idx = np.argmax(directions @ corners.T, axis=-1)
        return corners[idx]

    mesh = extract_mesh(support_fn)
    assert mesh.vertices.shape == (8, 3)
    assert mesh.faces.shape == (12, 3)
    normals, backwards, extents = extract_outward_normal_hyperplanes(
        mesh.vertices, mesh.faces)
    assert not np.any(backwards)  # faces oriented outward
    # extents match the half lengths along the axes
    for axis, h in enumerate(half):
        axis_normals = np.abs(normals[:, axis]) > 0.99
        np.testing.assert_allclose(extents[axis_normals], h, atol=1e-9)


def test_obj_roundtrip(tmp_path):
    half = np.array([0.05, 0.05, 0.05])
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)]) * half

    def support_fn(directions):
        idx = np.argmax(directions @ corners.T, axis=-1)
        return corners[idx]

    obj_string = mesh_to_obj(extract_mesh(support_fn))
    path = os.path.join(str(tmp_path), "box.obj")
    with open(path, "w", encoding="utf-8") as handle:
        handle.write(obj_string)
    vertices = load_obj_vertices(path)
    assert vertices.shape == (8, 3)
    np.testing.assert_allclose(np.abs(vertices), 0.05, atol=1e-9)


def test_visualize_trajectory_contract():
    """Overlay video has the reference (1, T, 3, H, W) uint8 contract."""
    model = build_multibody_model({"cube": get_asset("cube")})
    params = model.initial_params()
    T = 4
    target = np.zeros((T, 13), np.float32)
    target[:, 0] = 1.0
    target[:, 6] = 0.1
    prediction = target.copy()
    prediction[:, 4] += 0.05
    video, fps = visualize_trajectory(model, params, target, prediction,
                                      dt=0.0068, max_frames=4)
    assert video.dtype == np.uint8
    assert video.ndim == 5 and video.shape[0] == 1 and video.shape[2] == 3
    assert fps >= 1
    # target (red-ish) and prediction (blue-ish) both rendered: frame has
    # colored pixels beyond the background
    assert video.std() > 1.0


def test_interactive_html_export(tmp_path):
    """Interactive three.js rollout export (ROADMAP item 8): one
    self-contained HTML with embedded pose/geometry JSON."""
    import json
    import re

    from dair_pll_tpu.assets import get_asset
    from dair_pll_tpu.interactive_vis import export_interactive_html
    from dair_pll_tpu.multibody.learnable_system import (
        MultibodyLearnableSystem)

    model = build_multibody_model({"cube": get_asset("cube")})
    system = MultibodyLearnableSystem(model, 0.0068)
    params = model.initial_params(jnp.float64)
    x0 = jnp.array([1.0, 0, 0, 0, 0, 0, 0.1,
                    1.0, 0.5, 0.2, 0.3, -0.2, 0.0], jnp.float64)
    traj = np.asarray(system.simulate(params, x0, 10))

    path = export_interactive_html(
        model, params, traj, traj + 0.0, 0.0068,
        str(tmp_path / "rollout.html"), title="cube test")
    with open(path, "r", encoding="utf-8") as handle:
        html = handle.read()
    assert "three" in html and "cube test" in html
    blob = re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1)
    data = json.loads(blob)
    assert len(data["prediction"]) == traj.shape[0]
    assert len(data["prediction"][0]) == model.n_bodies
    assert len(data["prediction"][0][0]) == 7
    assert data["bodies"][0]["geometries"][0]["type"] == "box"
