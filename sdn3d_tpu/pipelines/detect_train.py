"""Mask R-CNN training pipeline with staged layer freezing.

Re-expression of maskrcnn/model.py:1823-1911 (train_model: layer-regex
freezing of 'heads' -> '4+' -> 'all', SGD momentum 0.9, clipnorm 5) and the
4-stage VKITTI transfer schedule (maskrcnn/vkitti.py:211-243).  Freezing is
an optax.multi_transform over param-path labels — no graph surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from sdn3d_tpu.models.maskrcnn import (
    MaskRCNN, MaskRCNNConfig, generate_pyramid_anchors)
from sdn3d_tpu.models import maskrcnn_train as MT

# Layer-selection regexes of the reference (model.py:1836-1848), expressed
# as flax param-path predicates.
def _layer_label(path: Tuple[str, ...], stage: str) -> str:
    # BatchNorm scale/bias are permanently frozen in EVERY stage
    # (model.py:1477-1484 set_bn_fix: requires_grad=False on all BN
    # params), and therefore also never weight-decayed.
    if any("bn" in p for p in path):
        return "freeze"
    top = path[0] if path else ""
    in_resnet = top == "fpn" and len(path) > 1 and path[1] == "resnet"
    is_head = top in ("rpn", "classifier", "mask") or (
        top == "fpn" and not in_resnet)
    is_transfer_layer = (
        (top == "mask" and len(path) > 1 and path[1] == "conv5")
        or (top == "classifier" and len(path) > 1
            and path[1] in ("linear_class", "linear_bbox")))
    if stage == "transfer":
        # stage-0 class-count transfer (model.py:1861-1887): the heads
        # train, with the class-dependent output layers —
        # (mask.conv5.*)|(classifier.linear_class.*)|(classifier.linear_bbox.*)
        # — in their own lr=1e-2 group and the remaining heads at the
        # stage learning rate (1e-5, vkitti.py:216).
        if is_transfer_layer:
            return "transfer"
        return "train" if is_head else "freeze"
    if stage == "heads":
        return "train" if is_head else "freeze"
    if stage == "4+":
        if is_head:
            return "train"
        # resnet stages C4/C5 trainable (names C4_*, C5_*)
        if in_resnet and len(path) > 2 and path[2][:2] in ("C4", "C5"):
            return "train"
        return "freeze"
    return "train"                       # "all"


# The 4-stage VKITTI COCO-transfer schedule (vkitti.py:211-243): epochs are
# CUMULATIVE (the reference's train_model trains until `epochs`).
VKITTI_TRANSFER_SCHEDULE = (
    ("transfer", 1e-5, 10),
    ("heads", 1e-3, 40),
    ("4+", 1e-3 / 2, 70),
    ("all", 1e-3 / 5, 100),
)


def transfer_schedule(include_transfer: bool = True,
                      base_lr: float = 1e-3):
    """(stage, lr, until_epoch) tuples of the reference schedule, scaled to
    `base_lr` (config.LEARNING_RATE)."""
    sched = []
    for stage, lr, until in VKITTI_TRANSFER_SCHEDULE:
        if stage == "transfer":
            if not include_transfer:
                continue
            sched.append((stage, lr, until))
        else:
            sched.append((stage, base_lr * lr / 1e-3, until))
    return sched


def run_schedule(make_trainer, state, epochs_run: int = 0,
                 include_transfer: bool = True, base_lr: float = 1e-3,
                 epoch_fn=None):
    """Drive the staged schedule: re-build the trainer (and its freezing
    optimizer) per stage, carry params/batch_stats across stages, reset
    opt_state (the reference re-instantiates the optimizer per
    train_model call, model.py:1867-1874).

    make_trainer(stage, lr) -> MaskRCNNTrainer;
    epoch_fn(trainer, state, epoch) -> state runs one epoch."""
    for stage, lr, until in transfer_schedule(include_transfer, base_lr):
        if epochs_run >= until:
            continue
        trainer = make_trainer(stage=stage, learning_rate=lr)
        state = dict(state)
        state["opt_state"] = trainer.tx.init(state["params"])
        while epochs_run < until:
            state = epoch_fn(trainer, state, epochs_run)
            epochs_run += 1
    return state


@dataclasses.dataclass
class MaskRCNNTrainer:
    config: MaskRCNNConfig = MaskRCNNConfig()
    learning_rate: float = 1e-3          # config.py LEARNING_RATE
    momentum: float = 0.9
    weight_decay: float = 1e-4
    clipnorm: float = 5.0
    stage: str = "heads"                  # "transfer"|"heads"|"4+"|"all"
    transfer_lr: float = 1e-2            # model.py:1866 transfer group
    # False = reference parity (BN eval mode, COCO-ported running stats
    # assumed — model.py:1714-1720).  True = normal BN training for
    # FROM-SCRATCH runs: with random running stats, eval-mode BN is
    # identity and the ±128-scale inputs blow activations up (measured
    # init RPN NLL ~216 → NaN); the reference has no from-scratch mode.
    train_bn: bool = False

    def __post_init__(self):
        self.model = MaskRCNN(config=self.config)
        self.anchors = jnp.asarray(generate_pyramid_anchors(self.config))

        def sgd(lr):
            return optax.chain(
                optax.clip_by_global_norm(self.clipnorm),
                optax.add_decayed_weights(self.weight_decay),
                optax.sgd(lr, momentum=self.momentum),
            )

        stage = self.stage

        def label_fn(params):
            flat = flax.traverse_util.flatten_dict(params)
            labels = {k: _layer_label(k, stage) for k in flat}
            return flax.traverse_util.unflatten_dict(labels)

        self.tx = optax.multi_transform(
            {"train": sgd(self.learning_rate),
             "transfer": sgd(self.transfer_lr),
             "freeze": optax.set_to_zero()}, label_fn)

    def init(self, rng: jax.Array):
        cfg = self.config
        img = jnp.zeros((1,) + cfg.image_shape)
        variables = self.model.init(
            rng, img, self.anchors,
            (0.0, 0.0, float(cfg.image_max_dim), float(cfg.image_max_dim)),
            train=False)
        params = variables["params"]
        return {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def make_train_step(self):
        def train_step(state, images, rpn_match, rpn_target_bbox,
                       gt_class_ids, gt_boxes, gt_masks, rng, anchors
                       ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
            def loss_fn(params):
                # Default: batch_stats are READ-ONLY — BN runs in eval
                # mode during training (set_bn_eval,
                # model.py:1714-1720), so the ported running averages
                # are never overwritten.  train_bn=True (from-scratch
                # mode) trains BN normally and returns updated stats.
                variables = {"params": params,
                             "batch_stats": state["batch_stats"]}
                if self.train_bn:
                    out, mut = self.model.apply(
                        variables, images, anchors, gt_class_ids,
                        gt_boxes, gt_masks, rng, train_bn=True,
                        method=MaskRCNN.train_forward,
                        mutable=["batch_stats"])
                    out["_batch_stats"] = mut["batch_stats"]
                else:
                    out = self.model.apply(
                        variables, images, anchors, gt_class_ids,
                        gt_boxes, gt_masks, rng,
                        method=MaskRCNN.train_forward)
                tgt = out["targets"]
                losses = {
                    "rpn_class_loss": MT.rpn_class_loss(
                        rpn_match, out["rpn_class_logits"]),
                    "rpn_bbox_loss": MT.rpn_bbox_loss(
                        rpn_target_bbox, rpn_match, out["rpn_bbox"]),
                    "mrcnn_class_loss": MT.mrcnn_class_loss(
                        tgt["class_ids"], tgt["roi_valid"],
                        out["mrcnn_class_logits"]),
                    "mrcnn_bbox_loss": MT.mrcnn_bbox_loss(
                        tgt["deltas"], tgt["class_ids"], tgt["is_pos"],
                        out["mrcnn_bbox"]),
                    "mrcnn_mask_loss": MT.mrcnn_mask_loss(
                        tgt["masks"], tgt["class_ids"], tgt["is_pos"],
                        out["mrcnn_masks"]),
                }
                total = sum(losses.values())
                return total, (losses,
                               out.get("_batch_stats",
                                       state["batch_stats"]))

            grads, (losses, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt_state = self.tx.update(grads, state["opt_state"],
                                                state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {
                "params": params,
                "batch_stats": new_stats,
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }, losses

        return train_step

    def make_train_step_batched(self):
        """B>1 training step: the per-image graph vmapped over a leading
        frame axis, losses meaned across frames, ONE optimizer update.

        The reference emulated batching by accumulating B batch-1
        backward passes before each optimizer step (model.py:1958-1963,
        forced by its CUDA-NMS batch-1 graph); the rebuild's fixed-shape
        graph vmaps directly (VERDICT r4 item 3).  Inputs gain a leading
        [B] axis vs make_train_step: images [B, H, W, 3], rpn_match
        [B, A], rpn_target_bbox [B, R, 4], gt_* [B, ...]; `rng` is split
        per frame (detection-target sampling stays independent per
        image, model.py:1790-1805).  Loss semantics match gradient
        accumulation up to the mean (the reference sums losses over the
        accumulation window then steps once)."""
        def train_step(state, images, rpn_match, rpn_target_bbox,
                       gt_class_ids, gt_boxes, gt_masks, rng, anchors
                       ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
            B = images.shape[0]

            def loss_fn(params):
                def per_image(img, m, tb, gci, gb, gm, key):
                    variables = {"params": params,
                                 "batch_stats": state["batch_stats"]}
                    if self.train_bn:
                        out, mut = self.model.apply(
                            variables, img[None], anchors, gci, gb, gm,
                            key, train_bn=True,
                            method=MaskRCNN.train_forward,
                            mutable=["batch_stats"])
                        stats = mut["batch_stats"]
                    else:
                        out = self.model.apply(
                            variables, img[None], anchors, gci, gb, gm,
                            key, method=MaskRCNN.train_forward)
                        stats = state["batch_stats"]
                    tgt = out["targets"]
                    return stats, {
                        "rpn_class_loss": MT.rpn_class_loss(
                            m, out["rpn_class_logits"]),
                        "rpn_bbox_loss": MT.rpn_bbox_loss(
                            tb, m, out["rpn_bbox"]),
                        "mrcnn_class_loss": MT.mrcnn_class_loss(
                            tgt["class_ids"], tgt["roi_valid"],
                            out["mrcnn_class_logits"]),
                        "mrcnn_bbox_loss": MT.mrcnn_bbox_loss(
                            tgt["deltas"], tgt["class_ids"],
                            tgt["is_pos"], out["mrcnn_bbox"]),
                        "mrcnn_mask_loss": MT.mrcnn_mask_loss(
                            tgt["masks"], tgt["class_ids"],
                            tgt["is_pos"], out["mrcnn_masks"]),
                    }

                keys = jax.random.split(rng, B)
                stats_b, per = jax.vmap(per_image)(
                    images, rpn_match, rpn_target_bbox, gt_class_ids,
                    gt_boxes, gt_masks, keys)
                losses = {k: jnp.mean(v) for k, v in per.items()}
                # cross-batch BN stat mean — the SyncBN-equivalent
                # reduction over the vmapped frame axis
                new_stats = jax.tree_util.tree_map(
                    lambda x: jnp.mean(x, axis=0), stats_b)
                return sum(losses.values()), (losses, new_stats)

            grads, (losses, new_stats) = jax.grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt_state = self.tx.update(grads, state["opt_state"],
                                                state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {
                "params": params,
                "batch_stats": (new_stats if self.train_bn
                                else state["batch_stats"]),
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }, losses

        return train_step
