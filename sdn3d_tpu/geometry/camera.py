"""Camera transforms: look / look_at / perspective divide.

Re-expression of geometric/neural_renderer/{look,look_at,perspective}.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The reference uses a truncated pi in the perspective transform
# (neural_renderer/perspective.py:10: `angle / 180. * 3.1416`).  Kept for
# bit-parity of the projection.
_REFERENCE_PI = 3.1416


def _normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def look(vertices: jnp.ndarray,
         eye: jnp.ndarray,
         direction: jnp.ndarray | None = None,
         up: jnp.ndarray | None = None) -> jnp.ndarray:
    """'Look' transformation (neural_renderer/look.py:7-45).

    vertices [B, V, 3]; eye [3] or [B, 3]; direction/up likewise.
    """
    if direction is None:
        direction = jnp.array([0.0, 0.0, 1.0], vertices.dtype)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], vertices.dtype)
    eye = jnp.atleast_2d(eye)
    direction = jnp.atleast_2d(direction)
    up = jnp.atleast_2d(up)

    z_axis = _normalize(direction)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)      # [B, 3, 3] rows

    vertices = vertices - eye[:, None, :]
    return jnp.einsum("bvj,bkj->bvk", vertices, r,
                      precision=jax.lax.Precision.HIGHEST)


def look_at(vertices: jnp.ndarray, eye: jnp.ndarray,
            at: jnp.ndarray | None = None,
            up: jnp.ndarray | None = None) -> jnp.ndarray:
    """'Look at' transformation (neural_renderer/look_at.py:7-45)."""
    if at is None:
        at = jnp.array([0.0, 0.0, 0.0], vertices.dtype)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], vertices.dtype)
    eye = jnp.atleast_2d(eye)
    at = jnp.atleast_2d(at)
    up = jnp.atleast_2d(up)

    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)

    vertices = vertices - eye[:, None, :]
    return jnp.einsum("bvj,bkj->bvk", vertices, r)


def perspective_divide(vertices: jnp.ndarray, angle_deg) -> jnp.ndarray:
    """Perspective projection (neural_renderer/perspective.py:5-19).

    x,y are divided by z * tan(angle); z passes through.  `angle_deg` is a
    scalar or [B] array in degrees.
    """
    angle = jnp.asarray(angle_deg, vertices.dtype) / 180.0 * _REFERENCE_PI
    width = jnp.tan(angle)
    width = jnp.broadcast_to(jnp.atleast_1d(width)[:, None], vertices.shape[:2])
    z = vertices[..., 2]
    x = vertices[..., 0] / z / width
    y = vertices[..., 1] / z / width
    return jnp.stack([x, y, z], axis=2)


def vertices_to_faces(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex triplets (neural_renderer/vertices_to_faces.py).

    vertices [B, V, 3], faces [B, F, 3] int -> [B, F, 3, 3].

    vmapped per-corner gathers, deliberately reshape-free: on this TPU
    backend both broadcasting take_along_axis and reshapes across small
    minor dims (e.g. [B,F,3] -> [B*F*3]) compile ~100x slower.
    """
    f = faces.astype(jnp.int32)

    def one(vb, fb):  # vb [V, 3], fb [F, 3]
        return jnp.stack([vb[fb[:, 0]], vb[fb[:, 1]], vb[fb[:, 2]]], axis=1)

    return jax.vmap(one)(vertices, f)


def face_normals(face_vertices: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-face unit normals, NMR convention (derender3d renderer.py:66-73):
    normalize(cross(v0 - v1, v2 - v1)).  face_vertices [B, F, 3, 3] -> [B, F, 3].
    """
    v10 = face_vertices[:, :, 0] - face_vertices[:, :, 1]
    v12 = face_vertices[:, :, 2] - face_vertices[:, :, 1]
    n = jnp.cross(v10, v12)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)


def get_points_from_angles(distance, elevation, azimuth,
                           degrees: bool = True) -> jnp.ndarray:
    """Spherical camera position (neural_renderer/get_points_from_angles.py):
    (d*cos(el)*sin(az), d*sin(el), -d*cos(el)*cos(az)).  Scalars or arrays;
    returns [..., 3]."""
    distance = jnp.asarray(distance, jnp.float32)
    elevation = jnp.asarray(elevation, jnp.float32)
    azimuth = jnp.asarray(azimuth, jnp.float32)
    if degrees:
        elevation = jnp.radians(elevation)
        azimuth = jnp.radians(azimuth)
    return jnp.stack([
        distance * jnp.cos(elevation) * jnp.sin(azimuth),
        distance * jnp.sin(elevation),
        -distance * jnp.cos(elevation) * jnp.cos(azimuth),
    ], axis=-1)
