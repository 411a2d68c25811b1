"""Quantify v3-vs-v1 raster kernel divergence on the benchmark metrics.

v3 (edge-coefficient/slab kernel, the fast default) reassociates the edge
functions, so ~1e-4 of boundary pixels can flip vs v1 (per-pixel cross
products, bit-exact vs the XLA scan).  This script measures what that does
to the metrics that matter: silhouette mask L1 and depth L1 at 512^2 and
768^2 with the production 16-car batch.

Run on the TPU:  python scripts/parity_v3_vs_v1.py
"""

import json

import numpy as np

import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.geometry.camera import vertices_to_faces
from sdn3d_tpu.geometry.transforms import (perspective_transform,
                                           y_rotation_quaternion)
from sdn3d_tpu.ops.rasterize import rasterize_depth, rasterize_silhouettes


def make_batch(n_obj=16, seed=0):
    bank = load_shapenet_bank("/root/reference/geometric/assets")
    rs = np.random.RandomState(seed)
    idx = rs.randint(0, bank.num_meshes, n_obj)
    V = bank.vertices.shape[1]
    verts = jnp.asarray(bank.vertices[idx])                   # [N, V, 3]
    faces_i = bank.faces[idx]
    valid = jnp.asarray(bank.face_valid[idx])
    q = y_rotation_quaternion(jnp.asarray(rs.uniform(0, 2 * np.pi, n_obj),
                                          jnp.float32))
    t = jnp.asarray(
        np.stack([rs.uniform(-1, 1, n_obj), rs.uniform(-0.5, 0.5, n_obj),
                  rs.uniform(-8, -5, n_obj)], -1), jnp.float32)
    verts, _ = perspective_transform(verts, rotations=q, translations=t,
                                     zoom_tos=jnp.full((n_obj, 1), 0.4))
    # vertices -> per-face coordinates; x-flip fix as in render()
    verts = verts * jnp.asarray([-1.0, 1.0, 1.0], verts.dtype)
    fv = vertices_to_faces(verts, jnp.asarray(faces_i))
    return fv, valid


def color_divergence(fv, valid, size):
    """v3's fused 10-bit flat-color plane vs the exact colors[face_index]
    gather (the v1/CPU parity path): float L-inf plus the fraction of
    uint8 PNG bytes that flip under the file contract's quantization
    (quantize_normal_map: clip(v*255).astype(uint8) on [0,1] maps)."""
    from sdn3d_tpu.geometry.camera import face_normals
    from sdn3d_tpu.ops.rasterize import _rasterize_sorted

    colors = face_normals(fv)                          # [B, F, 3] in [-1,1]
    outs = {}
    for v in (1, 3):
        _, _, _, rgb = _rasterize_sorted(fv, valid, size, 0.1, 100.0,
                                         version=v, colors=colors)
        outs[v] = np.asarray(rgb)                      # [B, 3, H, W]
    linf = float(np.abs(outs[1] - outs[3]).max())
    # the normal-map file contract maps [-1,1] -> [0,1] -> uint8
    b1 = np.clip((outs[1] + 1.0) * 0.5 * 255, 0, 255).astype(np.uint8)
    b3 = np.clip((outs[3] + 1.0) * 0.5 * 255, 0, 255).astype(np.uint8)
    return {"color_Linf": linf,
            "png_byte_flip_frac": float((b1 != b3).mean()),
            "png_byte_max_delta": int(np.abs(b1.astype(int)
                                             - b3.astype(int)).max())}


def main():
    fv, valid = make_batch()
    results = {}
    for size in (512, 768):
        sil = {}
        dep = {}
        for v in (1, 3):
            s = rasterize_silhouettes(fv, valid, image_size=size,
                                      anti_aliasing=False, kernel_version=v)
            d = rasterize_depth(fv, valid, image_size=size,
                                anti_aliasing=False, kernel_version=v)
            sil[v] = np.asarray(s)
            dep[v] = np.asarray(d)
        flips = (sil[1] != sil[3]).mean()
        mask_l1 = np.abs(sil[1] - sil[3]).mean()
        depth_l1 = np.abs(dep[1] - dep[3]).mean()
        results[size] = {"mask_flip_frac": float(flips),
                         "mask_L1": float(mask_l1),
                         "depth_L1": float(depth_l1)}
        results[size].update(color_divergence(fv, valid, size))
        print(f"{size}^2: " + " ".join(
            f"{k}={v:.3e}" if isinstance(v, float) else f"{k}={v}"
            for k, v in results[size].items()), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
