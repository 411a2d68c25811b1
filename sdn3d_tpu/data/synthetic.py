"""Synthetic meshes + batches for tests, compile checks, and benchmarks."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def make_cube_mesh(scale: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Unit cube centered at origin, 12 triangles, verts in [-0.5, 0.5]."""
    v = np.array([[x, y, z]
                  for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                 np.float32) * scale
    f = np.array([
        [0, 1, 3], [0, 3, 2],     # x = -1
        [4, 6, 7], [4, 7, 5],     # x = +1
        [0, 4, 5], [0, 5, 1],     # y = -1
        [2, 3, 7], [2, 7, 6],     # y = +1
        [0, 2, 6], [0, 6, 4],     # z = -1
        [1, 5, 7], [1, 7, 3],     # z = +1
    ], np.int32)
    return v, f


def make_sphere_mesh(n_theta: int = 12, n_phi: int = 24,
                     radius: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """UV sphere with ~2*n_theta*n_phi triangles, verts in [-r, r]."""
    verts = []
    for i in range(n_theta + 1):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            verts.append([radius * np.sin(th) * np.cos(ph),
                          radius * np.cos(th),
                          radius * np.sin(th) * np.sin(ph)])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            if i > 0:
                faces.append([a, c, b])
            if i < n_theta - 1:
                faces.append([b, c, d])
    return verts, np.asarray(faces, np.int32)


def make_derender_batch(batch_size: int, image_size: int = 224,
                        seed: int = 0) -> Dict[str, np.ndarray]:
    """Random batch with the GT fields the derenderer losses consume
    (geometric/derender3d/datasets.py:366-391 target structure)."""
    rng = np.random.RandomState(seed)
    x0 = rng.uniform(-0.8, 0.0, (batch_size, 2)).astype(np.float32)
    wh = rng.uniform(0.2, 0.6, (batch_size, 2)).astype(np.float32)
    roi = np.concatenate([x0, x0 + wh], axis=1)
    return {
        "images": rng.rand(batch_size, image_size, image_size, 3
                           ).astype(np.float32),
        "roi_norms": roi,
        "focals": np.full((batch_size, 1), 725.0, np.float32),
        "targets": np.full((batch_size,), 3, np.int32),  # geometry|reproject
        "thetas": rng.uniform(-np.pi, np.pi, (batch_size, 1)
                              ).astype(np.float32),
        "translation2ds": rng.randn(batch_size, 2).astype(np.float32) * 0.1,
        "log_scales": rng.randn(batch_size, 3).astype(np.float32) * 0.1,
        "log_depths": rng.randn(batch_size, 1).astype(np.float32) * 0.1,
    }
