"""Object-to-camera transforms.

Re-expression of geometric/derender3d/models/transforms.py:102-158 as pure
batched JAX functions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (a, b, c, d) -> rotation matrix [..., 3, 3] (transforms.py:117-129)."""
    a, b, c, d = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([a * a + b * b - c * c - d * d,
                      2 * b * c - 2 * a * d,
                      2 * b * d + 2 * a * c], axis=-1)
    row1 = jnp.stack([2 * b * c + 2 * a * d,
                      a * a - b * b + c * c - d * d,
                      2 * c * d - 2 * a * b], axis=-1)
    row2 = jnp.stack([2 * b * d - 2 * a * c,
                      2 * c * d + 2 * a * b,
                      a * a - b * b - c * c + d * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def y_rotation_quaternion(theta: jnp.ndarray) -> jnp.ndarray:
    """theta [...,] -> quaternion [..., 4] for rotation about the y axis.

    Matches derender3d/models/__init__.py:108-113: (cos t/2, 0, sin t/2, 0).
    """
    zeros = jnp.zeros_like(theta)
    return jnp.stack([jnp.cos(theta / 2), zeros, jnp.sin(theta / 2), zeros], axis=-1)


def perspective_transform(
    vertices: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    translations: Optional[jnp.ndarray] = None,
    perspective_translations: Optional[jnp.ndarray] = None,
    zooms: Optional[jnp.ndarray] = None,
    zoom_tos: Optional[jnp.ndarray] = None,
) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale -> quaternion-rotate -> translate -> perspective shear -> zoom.

    vertices: [B, V, 3].  scales [B, 3], rotations [B, 4] quaternion,
    translations [B, 3], zooms [B, 1].  When `zoom_tos` [B, 1] is given the
    zoom is solved so the object fills the view and (vertices, zooms) is
    returned (transforms.py:102-158).
    """
    if scales is not None:
        vertices = vertices * scales[:, None, :]

    if rotations is not None:
        T = quaternion_to_matrix(rotations)              # [B, 3, 3]
        vertices = jnp.einsum("bvj,bkj->bvk", vertices, T,
                              precision=jax.lax.Precision.HIGHEST)

    if translations is not None:
        vertices = vertices + translations[:, None, :]

    if perspective_translations is None:
        perspective_translations = translations
    pt = perspective_translations[:, None, :]            # [B, 1, 3]

    x, y, z = vertices[..., 0], vertices[..., 1], vertices[..., 2]
    x0, y0, z0 = pt[..., 0], pt[..., 1], pt[..., 2]

    # Object-centric perspective shear (transforms.py:145-146).
    x = x - x0 / z0 * z
    y = y - y0 / z0 * z

    if zoom_tos is not None:
        # Solve the zoom that makes the object exactly fill the view
        # (transforms.py:148-149).  Written as zoom_to / max(m/|z|) rather
        # than the reference's min(|z|/m) * zoom_to: identical up to 2 ulp
        # (incl. the m=0 -> inf and z=0 -> 0 edge cases), but the min-of-
        # ratio form compiles ~10x slower on TPU (65.7 -> 6.2 ms at
        # 16 x 18.7k verts; scripts/prof_zoomsolve.py).
        inv = jnp.maximum(jnp.abs(x), jnp.abs(y)) / jnp.abs(z)    # [B, V]
        zooms = zoom_tos / jnp.max(inv, axis=1, keepdims=True)    # [B, 1]

    z = z / zooms

    vertices = jnp.stack([x, y, z], axis=2)
    if zoom_tos is None:
        return vertices
    return vertices, zooms
