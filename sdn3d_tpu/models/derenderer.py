"""3D de-renderer: per-object pose/shape/class inference + re-rendering.

Re-expression of geometric/derender3d/models/{derenderer,__init__}.py.
The encoder is a resnet18 trunk + FC heads (derenderer.py:7-65).  The render
path replaces the reference's per-object Python loop over per-mesh torch
Modules (__init__.py:161-224) with a fully batched gather over a padded
MeshBank + vmapped FFD + one rasterizer call per render target — all inside
a single jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sdn3d_tpu.geometry import ffd as ffd_mod
from sdn3d_tpu.geometry.transforms import perspective_transform
from sdn3d_tpu.models.resnet import ResNetClassifier
from sdn3d_tpu.render import RenderType, render, render_targets


class TargetType:
    """Bitmask (geometric/derender3d/__init__.py:1-10)."""
    geometry = 1 << 0
    reproject = 1 << 1
    normal = 1 << 2
    depth = 1 << 3

    pretrain = geometry
    finetune = reproject
    full = geometry | reproject
    extend = geometry | reproject | normal | depth

    BY_NAME = {}


TargetType.BY_NAME = {
    "pretrain": TargetType.pretrain,
    "finetune": TargetType.finetune,
    "full": TargetType.full,
    "extend": TargetType.extend,
}


class Derenderer(nn.Module):
    """Encoder net (derenderer.py:7-65): resnet18 -> 256 feats, concat
    [feat ‖ mroi ‖ droi] -> fc1 -> fc2 -> heads."""

    num_classes: int = 8
    grid_size: int = 4
    hidden_size: int = 256
    # computation dtype for the resnet18 trunk + fc head (bfloat16 ~5x
    # faster convs on v5e; heads' outputs return float32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, mroi_norms: jnp.ndarray,
                 droi_norms: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """images [B, H, W, 3] (NHWC), mroi/droi [B, 2]."""
        g3 = self.grid_size ** 3
        out_sizes = {
            "_theta_deltas": 2,
            "_translation2ds": 2,
            "_log_scales": 3,
            "_log_depths": 1,
            "_class_probs": self.num_classes,
            "_ffd_coeffs": self.num_classes * g3 * 3,
        }
        x = ResNetClassifier(num_outputs=self.hidden_size, dtype=self.dtype,
                             name="net")(images, train=train)
        x = nn.relu(x)
        x = jnp.concatenate([x, mroi_norms, droi_norms], axis=1)
        x = nn.relu(nn.Dense(self.hidden_size, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_size, name="fc2")(x))
        x = nn.Dense(sum(out_sizes.values()), name="fc3")(x)

        splits = np.cumsum(list(out_sizes.values()))[:-1]
        (theta_deltas, translation2ds, log_scales, log_depths,
         class_logits, ffd_coeffs) = jnp.split(x, splits, axis=1)

        theta_deltas = theta_deltas / jnp.linalg.norm(
            theta_deltas, axis=1, keepdims=True)
        class_probs = jax.nn.softmax(class_logits, axis=1)
        ffd_coeffs = ffd_coeffs.reshape(-1, self.num_classes, g3 * 3)
        return {
            "_theta_deltas": theta_deltas,
            "_translation2ds": translation2ds,
            "_log_scales": log_scales,
            "_log_depths": log_depths,
            "_class_probs": class_probs,
            "_ffd_coeffs": ffd_coeffs,
        }


@flax.struct.dataclass
class DeviceMeshBank:
    """MeshBank moved to device as jnp arrays (see geometry/assets.py).

    A pytree, so it can (and must) be threaded through jit as an ARGUMENT —
    closing over it as a constant triggers minutes-long constant folding in
    the TPU compiler.
    """
    vertices: jnp.ndarray    # [M, V, 3]
    faces: jnp.ndarray       # [M, F, 3]
    face_valid: jnp.ndarray  # [M, F]
    ffd_B: jnp.ndarray       # [M, V, G, G, G]
    ffd_P0: jnp.ndarray      # [3, G, G, G]
    adjacency: jnp.ndarray   # [M, V, D] int32 (face*4+corner, -1 padded)

    @classmethod
    def from_host(cls, bank) -> "DeviceMeshBank":
        return cls(
            vertices=jnp.asarray(bank.vertices),
            faces=jnp.asarray(bank.faces),
            face_valid=jnp.asarray(bank.face_valid),
            ffd_B=jnp.asarray(bank.ffd_B),
            ffd_P0=jnp.asarray(bank.ffd_P0),
            adjacency=jnp.asarray(bank.adjacency),
        )


def pose_from_blob(blob: Dict[str, jnp.ndarray], image_size: int,
                   render_size: int, training: bool) -> Dict[str, jnp.ndarray]:
    """Convert encoder outputs to 3D pose quantities
    (derender3d/models/__init__.py:94-155), batched."""
    mroi = blob["_mroi_norms"]
    droi = blob["_droi_norms"]
    focals = blob["_focals"]                  # [B, 1]
    theta_deltas = blob["_theta_deltas"]

    thetas = jnp.arctan2(theta_deltas[:, 1], theta_deltas[:, 0])[:, None]
    rotations = jnp.concatenate([
        jnp.cos(thetas / 2),
        jnp.zeros_like(thetas),
        jnp.sin(thetas / 2),
        jnp.zeros_like(thetas),
    ], axis=1)
    areas = (droi[:, 0] * droi[:, 1])[:, None]
    scales = jnp.exp(blob["_log_scales"])
    depths = jnp.sqrt(jnp.exp(blob["_log_depths"]) / areas)

    center2ds = mroi + blob["_translation2ds"] * droi
    tu = jnp.stack([
        center2ds[:, 1],
        -center2ds[:, 0],
        -jnp.ones_like(center2ds[:, 0]),
    ], axis=1)
    tu = tu / jnp.linalg.norm(tu, axis=1, keepdims=True)
    translations = depths * tu

    alphas = -(thetas - jnp.arctan(translations[:, 0:1] / translations[:, 2:3]))
    alphas = jnp.mod(alphas + np.pi, 2 * np.pi) - np.pi

    out = {
        "_thetas": thetas,
        "_rotations": rotations,
        "_scales": scales,
        "_depths": depths,
        "_center2ds": center2ds,
        "_translations": translations,
        "_alphas": alphas,
    }

    if training:
        ptu = jnp.stack([
            mroi[:, 1], -mroi[:, 0], -jnp.ones_like(mroi[:, 0])], axis=1)
        ptu = ptu / jnp.linalg.norm(ptu, axis=1, keepdims=True)
        out["_perspective_translations"] = depths * ptu
        # NOTE: image_size (the encoder crop), NOT render_size, scales the
        # training zoom even though rasterization runs at render_size —
        # faithful to the reference (__init__.py:150 vs :65,202).
        out["_zooms"] = (image_size / focals) / jnp.max(droi, axis=1,
                                                        keepdims=True)
    else:
        out["_zoom_tos"] = render_size / (2.0 * focals)
    return out


def select_class(class_probs: jnp.ndarray, rng: Optional[jax.Array],
                 sample: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Categorical sample (training, REINFORCE) or argmax (eval)
    (__init__.py:131-140).  Returns (class_idx [B], log_prob [B])."""
    if sample:
        assert rng is not None
        idx = jax.random.categorical(rng, jnp.log(class_probs + 1e-20), axis=1)
        logp = jnp.log(jnp.take_along_axis(
            class_probs, idx[:, None], axis=1)[:, 0] + 1e-20)
    else:
        idx = jnp.argmax(class_probs, axis=1)
        logp = jnp.log(jnp.max(class_probs, axis=1))
    return idx.astype(jnp.int32), logp


def render_blob(
    blob: Dict[str, jnp.ndarray],
    bank: DeviceMeshBank,
    mode: int,
    image_size: int = 256,
    render_size: int = 384,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    force_no_sample: bool = False,
    obj_valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched re-rendering of all objects (replaces __init__.py:94-250).

    blob must contain encoder outputs plus _mroi_norms/_droi_norms/_focals.
    Returns the render dict (_masks, _normals, _depth_maps, poses, ...).
    """
    pose = pose_from_blob(blob, image_size, render_size, training)
    class_probs = blob["_class_probs"]
    B = class_probs.shape[0]

    cls, logp = select_class(class_probs, rng,
                             sample=training and not force_no_sample)

    # Gather per-object mesh + FFD basis and deform (batched FFD).
    Bmat = bank.ffd_B[cls]                       # [B, V, G, G, G]
    faces = bank.faces[cls]                      # [B, F, 3]
    face_valid = bank.face_valid[cls]            # [B, F]
    if obj_valid is not None:
        # Padded object slots contribute no faces: the Morton sort clusters
        # them into grid-skipped chunks, so empty slots are nearly free.
        face_valid = face_valid & obj_valid[:, None]
    ffd_coeff = jnp.take_along_axis(
        blob["_ffd_coeffs"], cls[:, None, None], axis=1)[:, 0]  # [B, 3G^3]
    vertices = jax.vmap(
        lambda Bm, co: ffd_mod.deform(Bm, bank.ffd_P0, co,
                                      num_grids=bank.ffd_P0.shape[1]))(
        Bmat, ffd_coeff)                         # [B, V, 3]

    if training:
        verts_cam = perspective_transform(
            vertices,
            scales=pose["_scales"],
            rotations=pose["_rotations"],
            translations=pose["_translations"],
            perspective_translations=pose["_perspective_translations"],
            zooms=pose["_zooms"],
        )
        zooms = pose["_zooms"]
    else:
        verts_cam, zooms = perspective_transform(
            vertices,
            scales=pose["_scales"],
            rotations=pose["_rotations"],
            translations=pose["_translations"],
            perspective_translations=pose["_translations"],
            zoom_tos=pose["_zoom_tos"],
        )

    # Per-object viewing angle (main loop __init__.py:202):
    # atan(render_size / (2 * focal)) in degrees.
    focals = blob["_focals"].reshape(B)
    viewing_angle = jnp.arctan(render_size / (2.0 * focals)) / np.pi * 180.0

    out = dict(pose)
    out["_class_samples"] = cls
    out["_class_log_probs"] = logp
    out["_zooms"] = zooms

    if training:
        # Differentiable silhouettes (custom-VJP edge gradients) for the
        # reproject mask loss; normal/depth renders are not used in any
        # training loss (scripts/main.py:136-152).
        # Windowed silhouette gradient for large training renders: the
        # exact out-walk spans the whole image; contributions decay 1/dist.
        gw = 0 if render_size <= 128 else 64
        out["_masks"] = render(verts_cam, faces, RenderType.Silhouette,
                               face_valid, image_size=render_size,
                               viewing_angle=viewing_angle, grad_walk=gw,
                               vertex_adjacency=bank.adjacency[cls])
        if mode & TargetType.normal:
            out["_normals"] = render(verts_cam, faces, RenderType.Normal,
                                     face_valid, image_size=render_size,
                                     viewing_angle=viewing_angle)
        if mode & TargetType.depth:
            out["_depth_maps"] = render(verts_cam, faces, RenderType.Depth,
                                        face_valid, image_size=render_size,
                                        viewing_angle=viewing_angle)
    else:
        targets = ["silhouette"]
        if mode & TargetType.normal:
            targets.append("normal")
        if mode & TargetType.depth:
            targets.append("depth")
        maps = render_targets(verts_cam, faces, tuple(targets), face_valid,
                              image_size=render_size,
                              viewing_angle=viewing_angle)
        out["_masks"] = maps["silhouette"]
        if "normal" in maps:
            out["_normals"] = maps["normal"]
        if "depth" in maps:
            out["_depth_maps"] = maps["depth"]
    return out


def derender_forward(
    params,
    model: Derenderer,
    images: jnp.ndarray,
    roi_norms: jnp.ndarray,
    focals: jnp.ndarray,
    bank: Optional[DeviceMeshBank],
    mode: int,
    image_size: int = 256,
    render_size: int = 384,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    mutable=False,
) -> Dict[str, jnp.ndarray]:
    """Full Derenderer3d.forward (__init__.py:67-92): roi mid/size features,
    encoder, optional reprojection."""
    # mroi = ((r2 + r0)/2, (r3 + r1)/2), droi = (r2 - r0, r3 - r1)
    # (__init__.py:70-77)
    mroi = jnp.stack([roi_norms[:, 2] + roi_norms[:, 0],
                      roi_norms[:, 3] + roi_norms[:, 1]], axis=1) / 2.0
    droi = jnp.stack([roi_norms[:, 2] - roi_norms[:, 0],
                      roi_norms[:, 3] - roi_norms[:, 1]], axis=1)

    blob = {
        "_roi_norms": roi_norms,
        "_mroi_norms": mroi,
        "_droi_norms": droi,
        "_focals": focals,
    }
    if mutable:
        enc, new_state = model.apply(params, images, mroi, droi,
                                     train=training, mutable=mutable)
        blob["_batch_stats"] = new_state
    else:
        enc = model.apply(params, images, mroi, droi, train=training)
    blob.update(enc)

    if mode & TargetType.reproject:
        assert bank is not None
        blob.update(render_blob(blob, bank, mode, image_size, render_size,
                                training, rng))
    return blob
