"""Interactive editing operations on textural conditioning state.

Capability-equivalent of textural/models/ui_model.py (the Cityscapes demo
model): change region labels, remove/add objects, and transfer per-instance
texture ("style") codes between instances or images.  Operates on the same
conditioning maps consumed by fake_inference; re-generation after each op
produces the edited image.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class EditState:
    """Mutable conditioning state for a single image."""
    label: np.ndarray               # [H, W] int32
    inst: np.ndarray                # [H, W] int32
    feat_codes: Dict[int, np.ndarray]   # inst id -> [feat_num]
    pose: Optional[np.ndarray] = None   # [H, W] int32 bins
    normal: Optional[np.ndarray] = None  # [H, W, 3]

    def copy(self) -> "EditState":
        return EditState(self.label.copy(), self.inst.copy(),
                         {k: v.copy() for k, v in self.feat_codes.items()},
                         None if self.pose is None else self.pose.copy(),
                         None if self.normal is None else self.normal.copy())


def change_label(state: EditState, region: np.ndarray,
                 new_label: int) -> EditState:
    """ui_model 'change label' brush: region [H, W] bool."""
    out = state.copy()
    out.label = np.where(region, np.int32(new_label), out.label)
    out.inst = np.where(region & (out.inst < 1000), np.int32(new_label),
                        out.inst)
    return out


def remove_object(state: EditState, inst_id: int,
                  fill_label: int = 5) -> EditState:
    """Delete an instance; exposed pixels become `fill_label` (road)."""
    out = state.copy()
    sel = out.inst == inst_id
    out.label = np.where(sel, np.int32(fill_label), out.label)
    out.inst = np.where(sel, np.int32(fill_label), out.inst)
    out.feat_codes.pop(inst_id, None)
    if out.pose is not None:
        out.pose = np.where(sel, 0, out.pose)
    return out


def add_object(state: EditState, mask: np.ndarray, inst_id: int,
               label: int, code: np.ndarray,
               pose_bin: int = 0) -> EditState:
    """Paste a new instance (ui_model 'add object')."""
    out = state.copy()
    out.label = np.where(mask, np.int32(label), out.label)
    out.inst = np.where(mask, np.int32(inst_id), out.inst)
    out.feat_codes[inst_id] = np.asarray(code, np.float32)
    if out.pose is not None and pose_bin:
        out.pose = np.where(mask, np.int32(pose_bin), out.pose)
    return out


def transfer_style(state: EditState, inst_id: int,
                   code: np.ndarray) -> EditState:
    """ui_model 'style brush': swap an instance's texture code."""
    out = state.copy()
    out.feat_codes[inst_id] = np.asarray(code, np.float32)
    return out


def to_batch(state: EditState, max_instances: int = 64) -> Dict[str, np.ndarray]:
    """Conditioning state -> a fake_inference batch (+ splatted feat map)."""
    from sdn3d_tpu.data.textural_data import (
        dense_instance_slots, splat_feat_codes)

    slots, _ = dense_instance_slots(state.inst, max_instances)
    feat_num = (len(next(iter(state.feat_codes.values())))
                if state.feat_codes else 5)
    feat = splat_feat_codes(state.inst, state.feat_codes, feat_num)
    batch = {
        "label": state.label[None],
        "inst": state.inst[None],
        "inst_slots": slots[None],
        "feat_map": feat[None],
    }
    if state.pose is not None:
        batch["pose"] = state.pose[None]
    if state.normal is not None:
        batch["normal"] = state.normal[None].astype(np.float32)
    return batch
