"""Semantic branch pipeline: training, multi-scale inference, metrics.

Re-expression of semantic/vkitti_{train,eval,test}.py: two poly-LR SGD
optimizers (encoder/decoder, vkitti_train.py:93-117), deep-supervision NLL
loss at 0.4 (vkitti_train.py:225-226), multi-scale averaged-softmax
inference over short sides {100,150,200,300,375} (vkitti_eval.py:50-107),
mIoU + pixel accuracy (semantic/utils.py:146-173).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdn3d_tpu.models.semantic import (
    SemanticModel, pixel_accuracy, resize_bilinear, segmentation_loss)

EVAL_SCALES = (100, 150, 200, 300, 375)   # short-edge sizes


@flax.struct.dataclass
class SemanticTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state_enc: Any
    opt_state_dec: Any


@dataclasses.dataclass
class SemanticTrainer:
    model: SemanticModel
    lr_encoder: float = 2e-2
    lr_decoder: float = 2e-2
    momentum: float = 0.9        # beta1
    weight_decay: float = 1e-4
    max_iters: int = 100_000
    lr_pow: float = 0.9
    deep_sup_scale: float = 0.4

    def __post_init__(self):
        def schedule(base):
            def fn(step):
                # clamp: past max_iters a negative base under a fractional
                # power is NaN, which would silently NaN every parameter
                frac = jnp.maximum(0.0, 1.0 - step / self.max_iters)
                return base * frac ** self.lr_pow
            return fn

        def sgd(base):
            return optax.chain(
                optax.add_decayed_weights(self.weight_decay),
                optax.sgd(learning_rate=schedule(base),
                          momentum=self.momentum),
            )

        self.tx_enc = sgd(self.lr_encoder)
        self.tx_dec = sgd(self.lr_decoder)

    @staticmethod
    def _split(params):
        return params["encoder"], params["decoder"]

    def init(self, rng: jax.Array, sample_images: jnp.ndarray
             ) -> SemanticTrainState:
        variables = self.model.init(rng, sample_images, train=False)
        params = variables["params"]
        enc, dec = self._split(params)
        return SemanticTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state_enc=self.tx_enc.init(enc),
            opt_state_dec=self.tx_dec.init(dec),
        )

    def make_train_step(self):
        def train_step(state: SemanticTrainState, images: jnp.ndarray,
                       labels: jnp.ndarray, rng: jax.Array
                       ) -> Tuple[SemanticTrainState, Dict[str, jnp.ndarray]]:
            def loss_fn(params):
                out, new_state = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                log_p, log_d = out
                loss = segmentation_loss(log_p, labels)
                loss_d = segmentation_loss(log_d, labels)
                total = loss + self.deep_sup_scale * loss_d
                acc = pixel_accuracy(log_p, labels)
                return total, (acc, new_state)

            (loss, (acc, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            g_enc, g_dec = self._split(grads)
            p_enc, p_dec = self._split(state.params)
            u_enc, os_enc = self.tx_enc.update(g_enc, state.opt_state_enc,
                                               p_enc)
            u_dec, os_dec = self.tx_dec.update(g_dec, state.opt_state_dec,
                                               p_dec)
            params = {"encoder": optax.apply_updates(p_enc, u_enc),
                      "decoder": optax.apply_updates(p_dec, u_dec)}
            return SemanticTrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_state.get("batch_stats", state.batch_stats),
                opt_state_enc=os_enc,
                opt_state_dec=os_dec,
            ), {"loss": loss, "acc": acc}

        return train_step


def pad_to_multiple(image: np.ndarray, multiple: int = 8) -> np.ndarray:
    """Pad H, W up to a multiple (semantic/vkitti_dataset.py padding)."""
    h, w = image.shape[:2]
    ph = -h % multiple
    pw = -w % multiple
    if ph or pw:
        image = np.pad(image, ((0, ph), (0, pw)) + ((0, 0),) * (image.ndim - 2))
    return image


@functools.lru_cache(maxsize=None)
def _jitted_scale_apply(model: SemanticModel, nh8: int, nw8: int,
                        seg_h: int, seg_w: int):
    """Resize + segment, all on device — one H2D of the source image
    total and one D2H of the averaged probs (the naive per-scale host
    round trips move 5x the bytes; device links are the bottleneck)."""
    def fn(variables, img_dev):
        x = jax.image.resize(img_dev, (nh8, nw8, 3), method="bilinear")
        return model.apply(variables, x[None], seg_size=(seg_h, seg_w),
                           train=False)[0]
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _jitted_multiscale_label(model: SemanticModel, sizes: tuple,
                             seg_h: int, seg_w: int):
    """ALL eval scales + normalization + softmax-mean + argmax in ONE
    device program over the raw uint8 RGB frame.

    The serving chain runs against a relay-attached TPU (~50 ms per
    dispatch fetch); the per-scale jit loop costs 5 dispatches plus a
    float image upload per frame.  This program takes the uint8 frame
    (3x fewer upload bytes; the BGR + mean/std normalization happens
    here with infer_image's exact f32 ops) and returns only the uint8
    argmax labels.  Same math as multiscale_probs_device + argmax —
    pinned by tests/test_models.py semantic protocol parity."""
    from sdn3d_tpu.data.semantic_data import MEAN_BGR, STD_BGR

    def fn(variables, img_u8):
        x = img_u8.astype(jnp.float32)[:, :, ::-1]
        x = (x - jnp.asarray(MEAN_BGR, jnp.float32)) / jnp.asarray(
            STD_BGR, jnp.float32)
        total = None
        for nh8, nw8 in sizes:
            r = jax.image.resize(x, (nh8, nw8, 3), method="bilinear")
            p = model.apply(variables, r[None], seg_size=(seg_h, seg_w),
                            train=False)[0]
            total = p if total is None else total + p
        return jnp.argmax(total / len(sizes), axis=-1).astype(jnp.uint8)

    return jax.jit(fn)


def multiscale_labels_device(variables, model: SemanticModel,
                             image_rgb_u8: np.ndarray,
                             scales: Sequence[int] = EVAL_SCALES
                             ) -> jnp.ndarray:
    """Argmax labels [H, W] uint8 as a DEVICE array, one dispatch (see
    _jitted_multiscale_label).  Scale sizing matches
    multiscale_probs_device exactly.  The pipelined chain dispatches
    this, starts the 1-byte/pixel fetch asynchronously, and materializes
    a stage later — byte-identical to multiscale_labels_fused."""
    from sdn3d_tpu.data.semantic_data import (IMG_MAX_SIZE_EVAL,
                                              round2nearest_multiple)
    H, W = image_rgb_u8.shape[:2]
    sizes = []
    for s in scales:
        scale = min(s / min(H, W), IMG_MAX_SIZE_EVAL / max(H, W))
        sizes.append((round2nearest_multiple(int(H * scale), 8),
                      round2nearest_multiple(int(W * scale), 8)))
    fn = _jitted_multiscale_label(model, tuple(sizes), H, W)
    return fn(variables, jnp.asarray(image_rgb_u8))


def multiscale_labels_fused(variables, model: SemanticModel,
                            image_rgb_u8: np.ndarray,
                            scales: Sequence[int] = EVAL_SCALES
                            ) -> np.ndarray:
    """Argmax labels [H, W] uint8 from the RAW uint8 RGB frame in one
    dispatch + one 1-byte/pixel fetch."""
    return np.asarray(multiscale_labels_device(variables, model,
                                               image_rgb_u8, scales))


def multiscale_probs_device(variables, model: SemanticModel,
                            image: np.ndarray,
                            scales: Sequence[int] = EVAL_SCALES
                            ) -> jnp.ndarray:
    """Averaged multi-scale softmax, kept ON DEVICE ([H, W, C]).

    Per-scale sizing follows the reference eval protocol EXACTLY
    (vkitti_dataset.py:213-221): long-edge cap (imgMaxSize=1242,
    vkitti_eval.py:175; no effect on 375x1242 VKITTI frames), then the
    target dims are CEIL-ROUNDED to x8 and the image is RESIZED to them —
    not zero-padded, which would stretch content+pad misaligned over
    seg_size at scales whose dims aren't x8-multiples."""
    from sdn3d_tpu.data.semantic_data import (IMG_MAX_SIZE_EVAL,
                                              round2nearest_multiple)
    H, W = image.shape[:2]
    img_dev = jnp.asarray(image)
    total = None
    for s in scales:
        scale = min(s / min(H, W), IMG_MAX_SIZE_EVAL / max(H, W))
        nh8 = round2nearest_multiple(int(H * scale), 8)
        nw8 = round2nearest_multiple(int(W * scale), 8)
        probs = _jitted_scale_apply(model, nh8, nw8, H, W)(
            variables, img_dev)
        total = probs if total is None else total + probs
    return total / len(scales)


def multiscale_inference(variables, model: SemanticModel,
                         image: np.ndarray,
                         scales: Sequence[int] = EVAL_SCALES,
                         num_class: int = 14) -> np.ndarray:
    """Averaged multi-scale softmax (vkitti_eval.py:58-75).

    image [H, W, 3] float (already normalized).  Returns probs [H, W, C]."""
    del num_class
    return np.asarray(multiscale_probs_device(variables, model, image,
                                              scales))


def multiscale_labels(variables, model: SemanticModel, image: np.ndarray,
                      scales: Sequence[int] = EVAL_SCALES) -> np.ndarray:
    """Argmax labels [H, W] uint8 — transfers ~1/56th of the probs volume
    (the label-PNG and mIoU paths never need host-side probabilities)."""
    probs = multiscale_probs_device(variables, model, image, scales)
    return np.asarray(jnp.argmax(probs, axis=-1).astype(jnp.uint8))


def intersection_and_union(pred: np.ndarray, label: np.ndarray,
                           num_class: int) -> Tuple[np.ndarray, np.ndarray]:
    """semantic/utils.py:146-173 semantics (ignore label < 0)."""
    pred = pred.astype(np.int64)
    label = label.astype(np.int64)
    pred = np.where(label >= 0, pred, -1)
    inter = pred[pred == label]
    area_inter, _ = np.histogram(inter, bins=num_class,
                                 range=(0, num_class - 1))
    area_pred, _ = np.histogram(pred, bins=num_class,
                                range=(0, num_class - 1))
    area_lab, _ = np.histogram(label, bins=num_class,
                               range=(0, num_class - 1))
    return area_inter, area_pred + area_lab - area_inter


def accuracy(pred: np.ndarray, label: np.ndarray) -> Tuple[float, int]:
    valid = label >= 0
    acc_sum = (valid & (pred == label)).sum()
    pixel_sum = valid.sum()
    return float(acc_sum) / (pixel_sum + 1e-10), int(pixel_sum)
