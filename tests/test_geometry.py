"""Geometry tests: FFD, transforms, camera (reference:
geometric/derender3d/models/transforms.py, geometric/neural_renderer/*)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick
import jax.numpy as jnp

from sdn3d_tpu.geometry import ffd as ffd_mod
from sdn3d_tpu.geometry import transforms as T
from sdn3d_tpu.geometry import camera as cam
from sdn3d_tpu.geometry.obj import load_obj, save_obj, shapenet_normalize


def test_ffd_identity():
    """Zero control displacements reproduce the vertices (Bernstein linear
    precision)."""
    rng = np.random.RandomState(0)
    verts = rng.uniform(-0.5, 0.5, size=(50, 3)).astype(np.float32)
    f = ffd_mod.FFD.from_vertices(verts, num_grids=4)
    out = f(jnp.zeros(3 * 64))
    np.testing.assert_allclose(np.asarray(out), verts, atol=1e-5)


def test_ffd_symmetry_constraint():
    """With the car constraints, deformed vertices of a z-symmetric mesh stay
    z-symmetric under arbitrary coefficients."""
    rng = np.random.RandomState(1)
    base = rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32)
    verts = np.concatenate([base, base * np.array([1, 1, -1], np.float32)])
    f = ffd_mod.FFD.from_vertices(verts, num_grids=4)
    coeff = jnp.asarray(rng.randn(3 * 64).astype(np.float32) * 0.1)
    out = np.asarray(f(coeff))
    a, b = out[:20], out[20:]
    np.testing.assert_allclose(a[:, :2], b[:, :2], atol=1e-5)
    np.testing.assert_allclose(a[:, 2], -b[:, 2], atol=1e-5)


def test_ffd_homogeneity_constraint():
    """Slices 0 and 1 along the y grid axis share x/z displacements."""
    dP = jnp.asarray(np.random.RandomState(2).randn(3, 4, 4, 4).astype(np.float32))
    out = np.asarray(ffd_mod.apply_constraints(
        dP, [ffd_mod.Constraint.homogeneity(axis=1, index=(0, 1))]))
    np.testing.assert_allclose(out[0, :, 0, :], out[0, :, 1, :], atol=1e-6)
    np.testing.assert_allclose(out[2, :, 0, :], out[2, :, 1, :], atol=1e-6)
    # y components are NOT tied
    assert not np.allclose(out[1, :, 0, :], out[1, :, 1, :])


def test_quaternion_y_rotation():
    theta = jnp.asarray([0.5])
    q = T.y_rotation_quaternion(theta)
    R = np.asarray(T.quaternion_to_matrix(q))[0]
    c, s = np.cos(0.5), np.sin(0.5)
    expected = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_perspective_transform_shear():
    """After the shear, the translation point projects onto the z axis."""
    v = jnp.zeros((1, 1, 3))
    t = jnp.asarray([[0.3, -0.2, -4.0]])
    out = T.perspective_transform(
        v, scales=jnp.ones((1, 3)), rotations=T.y_rotation_quaternion(jnp.asarray([0.0])),
        translations=t, zooms=jnp.ones((1, 1)))
    np.testing.assert_allclose(np.asarray(out)[0, 0, :2], [0, 0], atol=1e-6)


def test_perspective_transform_zoom_to():
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 30, 3)).astype(np.float32))
    t = jnp.asarray([[0.1, 0.0, -5.0], [0.0, 0.2, -6.0]], jnp.float32)
    out, zooms = T.perspective_transform(
        v, translations=t, perspective_translations=t,
        zoom_tos=jnp.full((2, 1), 0.5))
    out = np.asarray(out)
    # zooms = min_ratio * zoom_to and z is divided by zooms, so afterwards
    # min over vertices of |z|/max(|x|,|y|) == 1/zoom_to (transforms.py:148-151).
    ratio = np.abs(out[..., 2]) / np.maximum(np.abs(out[..., 0]),
                                             np.abs(out[..., 1]))
    np.testing.assert_allclose(ratio.min(axis=1), [2.0, 2.0], rtol=1e-4)


def test_look_default_camera():
    """look with eye=0, dir=(0,0,-1), up=(0,1,0): x -> -x, z -> -z
    (the camera used by derender3d renderer.py:226-229)."""
    v = jnp.asarray([[[1.0, 2.0, 3.0]]])
    out = cam.look(v, jnp.zeros(3), jnp.asarray([0.0, 0.0, -1.0]),
                   jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], [-1, 2, -3], atol=1e-6)


def test_perspective_divide():
    v = jnp.asarray([[[1.0, 0.5, 2.0]]])
    out = np.asarray(cam.perspective_divide(v, 45.0))
    w = np.tan(45.0 / 180.0 * 3.1416)
    np.testing.assert_allclose(out[0, 0], [1.0 / 2.0 / w, 0.5 / 2.0 / w, 2.0],
                               rtol=1e-6)


def test_vertices_to_faces():
    verts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    faces = jnp.asarray([[[0, 2, 1], [3, 1, 2]]])
    out = np.asarray(cam.vertices_to_faces(verts, faces))
    assert out.shape == (1, 2, 3, 3)
    np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[0, 0, 1], [6, 7, 8])
    np.testing.assert_array_equal(out[0, 1, 0], [9, 10, 11])


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = tmp_path / "m.obj"
    save_obj(str(p), verts, faces)
    v2, f2 = load_obj(str(p), normalization=False)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_obj_normalization_range(tmp_path):
    """load_obj normalization (load_obj.py:131-136) then ShapeNet ptp
    normalization puts every axis in [-0.5, 0.5]."""
    rng = np.random.RandomState(4)
    verts = rng.uniform(-3, 7, size=(40, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = tmp_path / "m.obj"
    save_obj(str(p), verts, faces)
    v, _ = load_obj(str(p), normalization=True)
    v = shapenet_normalize(v)
    assert np.all(v.min(0) >= -0.5 - 1e-5) and np.all(v.max(0) <= 0.5 + 1e-5)
    np.testing.assert_allclose(np.ptp(v, axis=0), 1.0, rtol=1e-5)


def test_mesh_bank_padding():
    from sdn3d_tpu.geometry.assets import build_mesh_bank
    rng = np.random.RandomState(5)
    m1 = (rng.uniform(-0.5, 0.5, (10, 3)).astype(np.float32),
          np.array([[0, 1, 2], [1, 2, 3]], np.int32))
    m2 = (rng.uniform(-0.5, 0.5, (7, 3)).astype(np.float32),
          np.array([[0, 1, 2]], np.int32))
    bank = build_mesh_bank([m1, m2])
    assert bank.vertices.shape == (2, 10, 3)
    assert bank.faces.shape == (2, 2, 3)
    assert bank.face_valid[0].sum() == 2 and bank.face_valid[1].sum() == 1
    assert bank.ffd_B.shape[:2] == (2, 10)


def test_vertices_to_faces_adj_vjp_matches_scatter():
    """The gather-based VJP (camera.vertices_to_faces_adj + static
    adjacency) must produce the same vertex gradients as autodiff of the
    plain gather (whose transpose is a scatter-add), with and without
    fill_back."""
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.data.synthetic import make_sphere_mesh
    from sdn3d_tpu.geometry import camera
    from sdn3d_tpu.geometry.assets import _vertex_adjacency

    verts_np, faces_np = make_sphere_mesh(6, 8)
    B, V, F = 2, verts_np.shape[0], faces_np.shape[0]
    rng = np.random.RandomState(0)
    verts = jnp.asarray(np.stack([verts_np, verts_np + 0.1]))
    faces = jnp.asarray(np.repeat(faces_np[None], B, 0))
    adj = jnp.asarray(
        np.repeat(_vertex_adjacency(faces_np.astype(np.int64), V)[None],
                  B, 0))
    cot = jnp.asarray(rng.randn(B, F, 3, 3).astype(np.float32))
    cot2 = jnp.concatenate([cot, cot[:, :, ::-1]], axis=1)

    def loss_ref(v, f):
        return (camera.vertices_to_faces(v, f) * cot).sum()

    def loss_adj(v, f):
        return (camera.vertices_to_faces_adj(v, f, adj) * cot).sum()

    g_ref = jax.grad(loss_ref)(verts, faces)
    g_adj = jax.grad(loss_adj)(verts, faces)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)

    faces2 = jnp.concatenate([faces, faces[:, :, ::-1]], axis=1)

    def loss_ref2(v):
        return (camera.vertices_to_faces(v, faces2) * cot2).sum()

    def loss_adj2(v):
        return (camera.vertices_to_faces_adj(v, faces2, adj,
                                             fill_back=True) * cot2).sum()

    g_ref2 = jax.grad(loss_ref2)(verts)
    g_adj2 = jax.grad(loss_adj2)(verts)
    np.testing.assert_allclose(np.asarray(g_adj2), np.asarray(g_ref2),
                               rtol=1e-5, atol=1e-6)

    # forward values identical
    np.testing.assert_array_equal(
        np.asarray(camera.vertices_to_faces_adj(verts, faces2, adj, True)),
        np.asarray(camera.vertices_to_faces(verts, faces2)))
