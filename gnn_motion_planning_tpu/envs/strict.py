"""Strict (mesh-hull surface-point) collision verifier for arm envs.

The production oracle approximates each link by calibrated capsules
(envs/urdf.py::fit_capsules); the reference's oracle is PyBullet mesh
collision (reference: environment/kuka_env.py:354-411), which collides the
*convex hulls* of the link collision meshes against the obstacle boxes.
This module builds a sound-but-incomplete hull-exact check for auditing:

- every link collision mesh is convex-hulled (scipy) and its hull surface
  is point-sampled at a target spacing (plus all hull vertices);
- a configuration ``strict_hit`` iff any sampled surface point lies inside
  an obstacle AABB (inflated by ``margin``). A surface point inside a box
  proves hull-box intersection, so ``strict_hit`` never false-positives
  against the hull-vs-box ground truth; it can miss contacts whose
  penetration footprint is smaller than the sampling spacing.

Confusion semantics vs the capsule oracle therefore are:
- ``capsule_free & strict_hit``  -> PROVEN false-"free" (lower bound);
- ``capsule_hit & ~strict_hit``  -> possible false-"collide" (upper bound).

Primitive collision geometries (cylinder / box / sphere — the snake) are
already represented exactly or conservatively by the capsule oracle and are
point-sampled analytically here for completeness.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.urdf import (
    _parse_origin,
    load_obj_vertices,
    load_stl_vertices,
    rpy_to_matrix,
)


class SurfacePoints(NamedTuple):
    """Link-frame hull surface samples, concatenated over links."""

    pts: jnp.ndarray  # (P, 3) float32, in link frame
    frame: jnp.ndarray  # (P,) int32 frame index (matches fk_link_frames)


def _sample_triangles(verts, faces, spacing: float, seed: int = 0):
    """Area-weighted surface samples at roughly `spacing` resolution."""

    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    n_per = np.maximum((area / (spacing * spacing)).astype(int), 0)
    rng = np.random.RandomState(seed)
    out = []
    for tri_i in np.nonzero(n_per)[0]:
        n = n_per[tri_i]
        u = rng.uniform(size=(n, 2))
        flip = u.sum(1) > 1
        u[flip] = 1 - u[flip]
        p = (
            a[tri_i]
            + u[:, :1] * (b[tri_i] - a[tri_i])
            + u[:, 1:] * (c[tri_i] - a[tri_i])
        )
        out.append(p)
    return np.concatenate(out) if out else np.zeros((0, 3))


def _hull_surface(verts: np.ndarray, spacing: float) -> np.ndarray:
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts)
    pts = [verts[hull.vertices]]
    pts.append(_sample_triangles(verts, hull.simplices, spacing))
    return np.concatenate(pts)


def _primitive_surface(geom, spacing: float) -> np.ndarray:
    cyl = geom.find("cylinder")
    if cyl is None:
        cyl = geom.find("capsule")
    box = geom.find("box")
    sph = geom.find("sphere")
    if cyl is not None:
        L, r = float(cyl.get("length")), float(cyl.get("radius"))
        nz = max(int(L / spacing) + 1, 2)
        na = max(int(2 * np.pi * r / spacing) + 1, 8)
        z = np.linspace(-L / 2, L / 2, nz)
        th = np.linspace(0, 2 * np.pi, na, endpoint=False)
        zz, tt = np.meshgrid(z, th)
        side = np.stack([r * np.cos(tt), r * np.sin(tt), zz], -1).reshape(-1, 3)
        return side
    if sph is not None:
        r = float(sph.get("radius"))
        n = max(int(4 * np.pi * r * r / spacing**2), 16)
        u = np.random.RandomState(0).normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        return r * u
    if box is not None:
        s = np.array([float(x) for x in box.get("size").split()]) / 2
        pts = []
        for ax in range(3):
            o = [i for i in range(3) if i != ax]
            n0 = max(int(2 * s[o[0]] / spacing) + 1, 2)
            n1 = max(int(2 * s[o[1]] / spacing) + 1, 2)
            g0, g1 = np.meshgrid(
                np.linspace(-s[o[0]], s[o[0]], n0),
                np.linspace(-s[o[1]], s[o[1]], n1),
            )
            for sign in (-1, 1):
                face = np.zeros((g0.size, 3))
                face[:, o[0]] = g0.ravel()
                face[:, o[1]] = g1.ravel()
                face[:, ax] = sign * s[ax]
                pts.append(face)
        return np.concatenate(pts)
    return np.zeros((0, 3))


def build_surface_points(model, urdf_path: str, spacing: float = 0.01) -> SurfacePoints:
    """Hull surface samples for every collision element, in link frames.

    ``model`` is the RobotModel returned by parse_urdf for the same file
    (its link_order defines the frame indices used by fk_link_frames).
    """

    path = Path(urdf_path)
    root = ET.parse(str(path)).getroot()
    base_dir = path.parent
    frame_of = {name: i for i, name in enumerate(model.link_order)}

    all_pts, all_frames = [], []
    for link in root.findall("link"):
        name = link.get("name")
        if name not in frame_of:
            continue
        for col in link.findall("collision"):
            geom = col.find("geometry")
            if geom is None:
                continue
            xyz, rpy = _parse_origin(col)
            rot = rpy_to_matrix(rpy)
            mesh = geom.find("mesh")
            if mesh is not None:
                fname = mesh.get("filename")
                scale = np.ones(3)
                if mesh.get("scale"):
                    scale = np.array(
                        [float(x) for x in mesh.get("scale").split()]
                    )
                mpath = base_dir / fname
                verts = (
                    load_stl_vertices(str(mpath))
                    if mpath.suffix.lower() == ".stl"
                    else load_obj_vertices(str(mpath))
                ) * scale
                pts = _hull_surface(verts, spacing)
            else:
                pts = _primitive_surface(geom, spacing)
            if not len(pts):
                continue
            pts = pts @ rot.T + xyz
            all_pts.append(pts)
            all_frames.append(np.full(len(pts), frame_of[name], np.int32))

    pts = np.concatenate(all_pts).astype(np.float32)
    frames = np.concatenate(all_frames)
    return SurfacePoints(jnp.asarray(pts), jnp.asarray(frames))


def make_strict_hit(chain, surface: SurfacePoints, base_trans=None,
                    margin: float = 0.0, plane_point_mask=None):
    """strict_hit(scene, q) -> bool: any hull surface point inside an
    obstacle AABB (+margin). `scene` is the env's BoxScene.

    ``plane_point_mask`` (P,) bool marks surface points whose links are
    tested against the z=0 ground plane (UR5, reference ur5_env.py:111):
    a marked point with world z < 0 is a strict hit (mesh-exact)."""

    from gnn_motion_planning_tpu.envs.kinematics import fk_link_frames

    plane_mask = (
        jnp.asarray(plane_point_mask) if plane_point_mask is not None else None
    )

    def strict_hit(scene, q):
        Rs, ts = fk_link_frames(chain, q, base_trans=base_trans)
        R = Rs[surface.frame]  # (P, 3, 3)
        t = ts[surface.frame]
        world = jnp.einsum("pij,pj->pi", R, surface.pts) + t  # (P, 3)
        inside = jnp.all(
            jnp.abs(world[:, None, :] - scene.centers[None])
            <= scene.halfs[None] + margin,
            axis=-1,
        )
        hit = jnp.any(inside & scene.mask[None, :])
        if plane_mask is not None:
            hit |= jnp.any(plane_mask & (world[:, 2] < -margin))
        return hit

    return strict_hit


def validate_path_strict(env, path, strict_hit, chunk: int = 64) -> int:
    """Number of strict-hit states along `path`, interpolated at RRT_EPS
    (the resolution _edge_fp certifies). 0 = the returned path is
    hull-exactly collision-free (up to surface-sampling resolution)."""

    path = np.asarray(path, np.float64)
    if len(path) < 2:
        return 0
    states = []
    for a, b in zip(path[:-1], path[1:]):
        d = float(np.linalg.norm(b - a))
        K = max(int(d / env.RRT_EPS), 1)
        for k in range(K + 1):
            states.append(a + (b - a) * k / K)
    states = np.asarray(states, np.float32)
    batch = jax.jit(
        lambda scene, qs: jax.vmap(lambda q: strict_hit(scene, q))(qs)
    )
    n = len(states)
    pad = (-n) % chunk
    if pad:
        states = np.pad(states, ((0, pad), (0, 0)), mode="edge")
    hits = 0
    scene = env.device_scene()
    for s0 in range(0, len(states), chunk):
        h = np.asarray(batch(scene, jnp.asarray(states[s0 : s0 + chunk])))
        hits += int(h[: max(0, min(chunk, n - s0))].sum())
    return hits


def make_strict_hit_dual(chain, surface: SurfacePoints, base1, base2, margin: float = 0.0):
    """Dual-arm obstacle-side strict check (cross-arm handled separately)."""

    h1 = make_strict_hit(chain, surface, base_trans=base1, margin=margin)
    h2 = make_strict_hit(chain, surface, base_trans=base2, margin=margin)
    dof = chain.lower.shape[0]

    def strict_hit(scene, q):
        return h1(scene, q[:dof]) | h2(scene, q[dof:])

    return strict_hit


def strict_checker(env, spacing: float = 0.01):
    """Hull-surface strict checker for an arm env instance, or None for
    envs whose production oracle is already exact (maze, snake grids).

    Builds the link-hull surface sampling once per env instance (~30 s for
    the KUKA meshes) and caches it on the env. Used by the failure-triage
    tools and by the opt-in strict-fallback planner stage
    (planners/strict_fallback.py).
    """

    cached = getattr(env, "_strict_hit_fn", None)
    if cached is not None:
        return cached
    kind = type(env).__name__
    if kind not in ("KukaEnv", "Kuka2Env", "UR5Env"):
        return None
    from gnn_motion_planning_tpu.utils.assets import asset_path

    urdf = asset_path(getattr(env, "kuka_file", "ur5/ur5.urdf"))
    surface = build_surface_points(env.model, str(urdf), spacing=spacing)
    if kind == "Kuka2Env":
        fn = make_strict_hit_dual(env.chain, surface, env.base1, env.base2)
    else:
        plane_point_mask = None
        if kind == "UR5Env":
            cap_link = np.asarray(env.chain.cap_link)
            plane_frames = set(
                cap_link[np.asarray(env.geom.plane_mask)].tolist()
            )
            plane_point_mask = np.isin(
                np.asarray(surface.frame), sorted(plane_frames)
            )
        fn = make_strict_hit(
            env.chain,
            surface,
            base_trans=getattr(env, "base_trans", None),
            plane_point_mask=plane_point_mask,
        )
    env._strict_hit_fn = fn
    return fn
