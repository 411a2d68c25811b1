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
    # HIGHEST: geometry must not go through bf16 MXU passes (same as
    # look())
    return jnp.einsum("bvj,bkj->bvk", vertices, r,
                      precision=jax.lax.Precision.HIGHEST)


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


def _float0_like(x):
    import numpy as _np
    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _v2f_adj(vertices, faces, adjacency, fill_back):
    del adjacency, fill_back
    return vertices_to_faces(vertices, faces)


def _v2f_adj_fwd(vertices, faces, adjacency, fill_back):
    return vertices_to_faces(vertices, faces), (adjacency, faces)


def _v2f_adj_bwd(fill_back, res, g):
    adjacency, faces = res
    F = faces.shape[1]
    if fill_back:
        # back copies are the front faces with reversed winding
        # (renderer.py _fill_back): grad of face f+F0 corner c belongs to
        # front face f corner 2-c.
        F0 = F // 2
        h = g[:, :F0] + g[:, F0:, ::-1, :]
    else:
        h = g
    valid = adjacency >= 0
    af = jnp.where(valid, adjacency >> 2, 0)
    ac = jnp.where(valid, adjacency & 3, 0)

    def one(hb, afb, acb, vb):  # hb [F0,3,3], af/ac [V,D]
        return jnp.where(vb[..., None], hb[afb, acb], 0.0).sum(axis=1)

    dv = jax.vmap(one)(h, af, ac, valid)                 # [B, V, 3]
    return dv, _float0_like(faces), _float0_like(adjacency)


_v2f_adj.defvjp(_v2f_adj_fwd, _v2f_adj_bwd)


def vertices_to_faces_adj(vertices: jnp.ndarray, faces: jnp.ndarray,
                          adjacency: jnp.ndarray,
                          fill_back: bool = False) -> jnp.ndarray:
    """vertices_to_faces with a gather-based custom VJP.

    The autodiff transpose of the face gather is a [B*F*3]-row scatter-add
    — TPU scatters run ~16M rows/s.  With the mesh's static
    vertex->(face,corner) adjacency table (assets.py:_vertex_adjacency,
    entries face*4+corner, -1 padded) the same reduction is a [V, D]
    gather + masked sum.

    When `fill_back` is True, `faces` holds [front ‖ reversed-back] copies
    (renderer._fill_back) and `adjacency` describes only the front half;
    back-face gradients fold in via corner reversal.
    """
    return _v2f_adj(vertices, faces, adjacency, fill_back)


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
