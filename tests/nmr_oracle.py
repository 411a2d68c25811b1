"""Pure-numpy oracle for the neural-mesh-renderer rasterization semantics.

Independent, loop-based transcription of the behavior of the reference's
"safe" per-pixel CUDA kernels (geometric/neural_renderer/rasterize.py:238-360
forward, :514-745 silhouette backward, :791-844 depth backward), used only to
validate the vectorized XLA implementation in sdn3d_tpu/ops/rasterize.py.
Deliberately slow and simple — run on tiny meshes/images only.
"""

import math

import numpy as np


def face_inv_px(face, image_size):
    """face [3,3] normalized -> (inv [3,3], denom) in pixel coords."""
    p = 0.5 * (face[:, :2] * image_size + image_size - 1)
    (p0x, p0y), (p1x, p1y), (p2x, p2y) = p
    inv = np.array([
        [p1y - p2y, p2x - p1x, p1x * p2y - p2x * p1y],
        [p2y - p0y, p0x - p2x, p2x * p0y - p0x * p2y],
        [p0y - p1y, p1x - p0x, p0x * p1y - p1x * p0y],
    ], np.float64)
    denom = p2x * (p0y - p1y) + p0x * (p1y - p2y) + p1x * (p2y - p0y)
    return inv, denom


def is_backface(face):
    return ((face[2, 1] - face[0, 1]) * (face[1, 0] - face[0, 0])
            < (face[1, 1] - face[0, 1]) * (face[2, 0] - face[0, 0]))


def forward_maps(faces, face_valid=None, image_size=16, near=0.1, far=100.0):
    """faces [B,F,3,3] -> (face_index, weight, depth, face_inv) maps."""
    B, F = faces.shape[:2]
    isz = image_size
    fi_map = -np.ones((B, isz, isz), np.int32)
    w_map = np.zeros((B, isz, isz, 3), np.float32)
    d_map = np.full((B, isz, isz), far, np.float32)
    inv_map = np.zeros((B, isz, isz, 3, 3), np.float32)
    if face_valid is None:
        face_valid = np.ones((B, F), bool)

    for b in range(B):
        invs, denoms, front = [], [], []
        for f in range(F):
            inv, den = face_inv_px(faces[b, f], isz)
            invs.append(inv / (den if den != 0 else 1.0))
            denoms.append(den)
            front.append(not is_backface(faces[b, f]))
        for yi_ in range(isz):
            for xi_ in range(isz):
                yp = (2.0 * yi_ + 1 - isz) / isz
                xp = (2.0 * xi_ + 1 - isz) / isz
                dmin, fmin, wmin, imin = far, -1, None, None
                for f in range(F):
                    if not face_valid[b, f] or not front[f] or denoms[f] == 0:
                        continue
                    fc = faces[b, f]
                    if ((yp - fc[0, 1]) * (fc[1, 0] - fc[0, 0])
                            < (xp - fc[0, 0]) * (fc[1, 1] - fc[0, 1])):
                        continue
                    if ((yp - fc[1, 1]) * (fc[2, 0] - fc[1, 0])
                            < (xp - fc[1, 0]) * (fc[2, 1] - fc[1, 1])):
                        continue
                    if ((yp - fc[2, 1]) * (fc[0, 0] - fc[2, 0])
                            < (xp - fc[2, 0]) * (fc[0, 1] - fc[2, 1])):
                        continue
                    w = invs[f] @ np.array([xi_, yi_, 1.0])
                    w = np.clip(w, 0.0, 1.0)
                    w = w / w.sum()
                    zp = 1.0 / (w[0] / fc[0, 2] + w[1] / fc[1, 2] + w[2] / fc[2, 2])
                    if zp <= near or far <= zp:
                        continue
                    if zp < dmin:
                        dmin, fmin, wmin, imin = zp, f, w, invs[f]
                if fmin >= 0:
                    fi_map[b, yi_, xi_] = fmin
                    w_map[b, yi_, xi_] = wmin
                    d_map[b, yi_, xi_] = dmin
                    inv_map[b, yi_, xi_] = imin
    return fi_map, w_map, d_map, inv_map


def silhouette_backward(faces, face_index, alpha, grad_alpha,
                        image_size=16, eps=1e-4, face_valid=None):
    """Edge-walking approximate silhouette gradient -> grad_faces [B,F,3,3]."""
    B, F = faces.shape[:2]
    isz = image_size
    grad = np.zeros((B, F, 3, 3), np.float64)
    if face_valid is None:
        face_valid = np.ones((B, F), bool)

    def amap(b, r, c):
        return alpha[b, r, c]

    for b in range(B):
        for f in range(F):
            if not face_valid[b, f] or is_backface(faces[b, f]):
                continue
            pp_all = 0.5 * (faces[b, f, :, :2] * isz + isz - 1)
            for edge in range(3):
                pi = [(edge + n) % 3 for n in range(3)]
                pp = pp_all[pi]  # [3,2]
                for axis in range(2):
                    p = pp[:, [(0 + axis) % 2, (1 + axis) % 2]]
                    if axis == 0:
                        direction = -1 if p[0, 0] < p[1, 0] else 1
                    else:
                        direction = 1 if p[0, 0] < p[1, 0] else -1
                    if p[1, 0] == p[0, 0]:
                        continue
                    d0_from = int(max(math.ceil(min(p[0, 0], p[1, 0])), 0.0))
                    d0_to = int(min(max(p[0, 0], p[1, 0]), isz - 1.0))
                    for d0 in range(d0_from, d0_to + 1):
                        d1_cross = ((p[1, 1] - p[0, 1]) / (p[1, 0] - p[0, 0])
                                    * (d0 - p[0, 0]) + p[0, 1])
                        d1_in = (math.floor(d1_cross) if direction > 0
                                 else math.ceil(d1_cross))
                        d1_out = d1_in + direction
                        if not (0 <= d1_in < isz and 0 <= d1_out < isz):
                            continue

                        def rc(d1):
                            return (d1, d0) if axis == 0 else (d0, d1)

                        alpha_in = amap(b, *rc(d1_in))
                        alpha_out = amap(b, *rc(d1_out))
                        fi_in = face_index[b][rc(d1_in)]

                        def accum(d1, diff_grad):
                            if diff_grad <= 0:
                                return
                            if p[1, 0] != d0:
                                dist = ((p[1, 0] - p[0, 0]) / (p[1, 0] - d0)
                                        * (d1 - d1_cross) * 2.0 / isz)
                                dist = dist + eps if dist > 0 else dist - eps
                                grad[b, f, pi[0], 1 - axis] -= diff_grad / dist
                            if p[0, 0] != d0:
                                dist = ((p[1, 0] - p[0, 0]) / (d0 - p[0, 0])
                                        * (d1 - d1_cross) * 2.0 / isz)
                                dist = dist + eps if dist > 0 else dist - eps
                                grad[b, f, pi[1], 1 - axis] -= diff_grad / dist

                        # out pass
                        if fi_in == f:
                            d1_limit = isz - 1 if direction > 0 else 0
                            lo = max(min(d1_out, d1_limit), 0)
                            hi = min(max(d1_out, d1_limit), isz - 1)
                            for d1 in range(lo, hi + 1):
                                r, c = rc(d1)
                                diff = (alpha[b, r, c] - alpha_in) * grad_alpha[b, r, c]
                                accum(d1, diff)

                        # in pass
                        if (d0 - p[0, 0]) * (d0 - p[2, 0]) < 0:
                            d0_cross2 = ((p[2, 1] - p[0, 1]) / (p[2, 0] - p[0, 0])
                                         * (d0 - p[0, 0]) + p[0, 1])
                        else:
                            d0_cross2 = ((p[1, 1] - p[2, 1]) / (p[1, 0] - p[2, 0])
                                         * (d0 - p[2, 0]) + p[2, 1])
                        d1_limit = (math.ceil(d0_cross2) if direction > 0
                                    else math.floor(d0_cross2))
                        lo = max(min(d1_in, d1_limit), 0)
                        hi = min(max(d1_in, d1_limit), isz - 1)
                        for d1 in range(lo, hi + 1):
                            r, c = rc(d1)
                            if face_index[b, r, c] != f:
                                continue
                            diff = (alpha[b, r, c] - alpha_out) * grad_alpha[b, r, c]
                            accum(d1, diff)
    return grad.astype(np.float32)


def depth_backward(faces, face_index, depth, weight, face_inv, grad_depth,
                   image_size=16):
    """Analytic depth gradient -> grad_faces [B,F,3,3]."""
    B, F = faces.shape[:2]
    isz = image_size
    grad = np.zeros((B, F, 3, 3), np.float64)
    for b in range(B):
        for r in range(isz):
            for c in range(isz):
                fn = face_index[b, r, c]
                if fn < 0:
                    continue
                fc = faces[b, fn]
                d = depth[b, r, c]
                d2 = d * d
                inv = face_inv[b, r, c]
                w = weight[b, r, c]
                g = grad_depth[b, r, c]
                for k in range(3):
                    zk = fc[k, 2]
                    grad[b, fn, k, 2] += g * w[k] * d2 / (zk * zk)
                tmp = np.zeros(3)
                for k in range(3):
                    for l in range(3):
                        tmp[k] += -inv[l, k] / fc[l, 2]
                for k in range(3):
                    for l in range(2):
                        grad[b, fn, k, l] += -g * tmp[l] * w[k] * d2 * isz / 2
    return grad.astype(np.float32)


def texture_sampling(faces, textures, face_index, weight, depth, eps=1e-4):
    """NR-3 forward (rasterize.py:377-424): per-pixel depth-corrected
    trilinear texture-cube sampling."""
    B, F, ts = textures.shape[0], textures.shape[1], textures.shape[2]
    isz = face_index.shape[1]
    rgb = np.zeros((B, isz, isz, 3), np.float32)
    for b in range(B):
        for y in range(isz):
            for x in range(isz):
                fn = face_index[b, y, x]
                if fn < 0:
                    continue
                face = faces[b, fn]
                tex = textures[b, fn]
                w = weight[b, y, x]
                d = depth[b, y, x]
                tif = [w[k] * (ts - 1 - eps) * (d / face[k, 2])
                       for k in range(3)]
                new_pixel = np.zeros(3)
                for pn in range(8):
                    ww = 1.0
                    ti = []
                    for k in range(3):
                        if (pn >> k) % 2 == 0:
                            ww *= 1 - (tif[k] - int(tif[k]))
                            ti.append(int(tif[k]))
                        else:
                            ww *= tif[k] - int(tif[k])
                            ti.append(int(tif[k]) + 1)
                    new_pixel += ww * tex[ti[0], ti[1], ti[2]]
                rgb[b, y, x] = new_pixel
    return rgb
