"""Derenderer training/eval steps (jit-compiled, mesh-shardable).

Re-expression of the geometric branch's training harness:
geometric/scripts/main.py:114-154 (losses) + geometric/bulb/bulb/net.py
(epoch engine).  One optax Adam + exponential stair LR replaces
torch.optim.Adam + StepLR (main.py:188, bulb/net.py:147-150).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from sdn3d_tpu.models.derenderer import (
    Derenderer,
    DeviceMeshBank,
    TargetType,
    derender_forward,
)


def masked_mean(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-sample values x [B] over selected samples m [B] bool;
    0 when none selected (BaseNet.partial, main.py:96-112)."""
    m = m.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_mse(pred: jnp.ndarray, gt: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """MSE over the selected subset of samples — matches
    F.mse_loss(pred[idx], gt[idx]) which averages over *all* elements of the
    selected rows."""
    per_sample = jnp.mean((pred - gt) ** 2, axis=tuple(range(1, pred.ndim)))
    return masked_mean(per_sample, m)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class DerenderTrainer:
    """Builds jittable train/eval steps for the derenderer."""

    model: Derenderer
    bank: Optional[DeviceMeshBank]
    mode: int
    image_size: int = 256
    render_size: int = 384
    mask_weight: float = 0.1
    ffd_coeff_reg: float = 1.0
    lr: float = 1e-3
    weight_decay: float = 1e-3
    lr_decay_steps: int = 10_000
    lr_decay_rate: float = 0.5

    def __post_init__(self):
        schedule = optax.exponential_decay(
            self.lr, self.lr_decay_steps, self.lr_decay_rate, staircase=True)
        # torch Adam weight_decay adds wd*param to the gradient (not AdamW).
        self.tx = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )

    def init(self, rng: jax.Array, batch: Dict[str, jnp.ndarray]) -> TrainState:
        variables = self.model.init(
            rng, batch["images"], jnp.zeros((batch["images"].shape[0], 2)),
            jnp.zeros((batch["images"].shape[0], 2)), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    def losses(self, blob: Dict[str, jnp.ndarray],
               batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Loss dict (main.py:114-154).  batch carries GT tensors + per-sample
        `targets` bitmask."""
        targets = batch["targets"]
        loss = {}

        # Key presence gates are trace-time (static per batch schema):
        # single-source datasets carry only their own loss family's
        # targets (e.g. kitti+extend = KittiObject items with geometry
        # targets but no masks, data_loader.py:50-52) — the hybrid
        # datasets' zero-fill collate provides both families.
        if self.mode & TargetType.geometry and "thetas" in batch:
            is_geo = (targets & TargetType.pretrain) > 0
            theta_deltas_gt = jnp.concatenate(
                [jnp.cos(batch["thetas"]), jnp.sin(batch["thetas"])], axis=1)
            loss["theta_delta_loss"] = masked_mse(
                blob["_theta_deltas"], theta_deltas_gt, is_geo)
            loss["translation2d_loss"] = masked_mse(
                blob["_translation2ds"], batch["translation2ds"], is_geo)
            loss["scale_loss"] = masked_mse(
                blob["_log_scales"], batch["log_scales"], is_geo)
            loss["depth_loss"] = masked_mse(
                blob["_log_depths"], batch["log_depths"], is_geo)

        if self.mode & TargetType.reproject and "masks" in batch:
            is_rep = (targets & TargetType.finetune) > 0
            masks_gt = batch["masks"]
            ignores = batch["ignores"]
            ml = (1 - ignores) * (blob["_masks"] - masks_gt) ** 2
            mask_losses = self.mask_weight * ml.mean(axis=(1, 2, 3))  # [B]
            loss["class_reward"] = masked_mean(
                blob["_class_log_probs"] * jax.lax.stop_gradient(mask_losses),
                is_rep)
            loss["mask_loss"] = masked_mean(mask_losses, is_rep)
            loss["ffd_coeff_reg"] = self.ffd_coeff_reg * jnp.mean(
                blob["_ffd_coeffs"] ** 2)

        return loss

    def make_train_step(self):
        """Returns train_step(state, batch, rng, bank).

        `bank` must be passed through jit as an argument (closure-constant
        mesh arrays stall the TPU compiler's constant folder)."""
        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                       rng: jax.Array,
                       bank: Optional[DeviceMeshBank] = None
                       ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
            if bank is None:
                bank = self.bank

            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                blob = derender_forward(
                    variables, self.model, batch["images"],
                    batch["roi_norms"], batch["focals"], bank,
                    self.mode, self.image_size, self.render_size,
                    training=True, rng=rng, mutable=["batch_stats"])
                loss_dict = self.losses(blob, batch)
                total = sum(loss_dict.values())
                return total, (loss_dict, blob["_batch_stats"])

            grads, (loss_dict, new_state) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_train_state = TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_state.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
            )
            return new_train_state, loss_dict

        return train_step

    def make_eval_step(self):
        def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                      bank: Optional[DeviceMeshBank] = None
                      ) -> Dict[str, jnp.ndarray]:
            if bank is None:
                bank = self.bank
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            blob = derender_forward(
                variables, self.model, batch["images"], batch["roi_norms"],
                batch["focals"], bank, self.mode, self.image_size,
                self.render_size, training=False)
            return self.losses(blob, batch)

        return eval_step
