"""VKITTI de-renderer training data: motgt tables -> GT targets.

Re-expression of geometric/derender3d/datasets.py:193-420 (VKitti dataset):
motgt per-object rows become the supervision targets of the derenderer
(theta/rotation, per-axis scale, projected 2D translation, log-depth) and
occlusion ignore maps come from depth ordering.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sdn3d_tpu.data.vkitti import Camera, SPLIT_RANGES, WORLD_IDS, SCENE_IDS

# Empirical width correction baked into the reference's scale target
# (datasets.py:370: scale = [l3d, h3d, 1.2206 * w3d]).
WIDTH_CORRECTION = 1.2206


def mask_to_roi(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """Binary mask [H, W] -> (y1, x1, y2, x2) (Transforms.mask_to_roi)."""
    ys, xs = np.nonzero(mask)
    return int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1


def roi_jitter(roi: Sequence[int], ratio: float = 0.1,
               rng: Optional[random.Random] = None) -> List[int]:
    """Random ROI jitter (derender3d/datasets.py:39-49)."""
    rng = rng or random
    dy = int(ratio * (roi[2] - roi[0]))
    dx = int(ratio * (roi[3] - roi[1]))
    return [roi[0] + rng.randint(-dy, dy), roi[1] + rng.randint(-dx, dx),
            roi[2] + rng.randint(-dy, dy), roi[3] + rng.randint(-dx, dx)]


def motgt_targets(row: Dict[str, float], roi: Sequence[float],
                  camera=Camera) -> Dict[str, np.ndarray]:
    """One motgt row + its ROI -> derenderer GT targets
    (datasets.py:351-391).

    row must carry ry, l3d, h3d, w3d, x3d, y3d, z3d."""
    roi_norm = np.asarray([
        (roi[0] - camera.v0) / camera.focal,
        (roi[1] - camera.u0) / camera.focal,
        (roi[2] - camera.v0) / camera.focal,
        (roi[3] - camera.u0) / camera.focal,
    ], np.float32)
    mroi = np.asarray([(roi_norm[2] + roi_norm[0]) / 2,
                       (roi_norm[3] + roi_norm[1]) / 2], np.float32)
    droi = np.asarray([roi_norm[2] - roi_norm[0],
                       roi_norm[3] - roi_norm[1]], np.float32)

    ry = float(row["ry"])
    theta = np.asarray([-ry], np.float32)
    rotation = np.asarray([np.cos(ry / 2), 0, -np.sin(ry / 2), 0],
                          np.float32)
    scale = np.asarray([row["l3d"], row["h3d"],
                        WIDTH_CORRECTION * row["w3d"]], np.float32)
    xyz = np.asarray([row["x3d"], -(row["y3d"] - row["h3d"] / 2),
                      -row["z3d"]], np.float32)

    translation2d = np.clip(np.asarray([
        (xyz[1] / xyz[2] - mroi[0]) / droi[0],
        (-xyz[0] / xyz[2] - mroi[1]) / droi[1],
    ], np.float32), -6, 6)

    depth_sq = float(np.sum(xyz ** 2))
    log_depth = np.asarray(
        [np.log(depth_sq) + np.log(droi[0]) + np.log(droi[1])], np.float32)

    return {
        "roi_norms": roi_norm,
        "thetas": theta,
        "rotations": rotation,
        "translations": xyz,
        "translation2ds": translation2d,
        "scales": scale,
        "log_scales": np.log(scale).astype(np.float32),
        "log_depths": log_depth,
    }


def object_depth_sq(row: Dict[str, float]) -> float:
    xyz = np.asarray([row["x3d"], -(row["y3d"] - row["h3d"] / 2),
                      -row["z3d"]])
    return float(np.sum(xyz ** 2))


def occlusion_ignore(masks: np.ndarray, depths_sq: np.ndarray,
                     own_index: int) -> np.ndarray:
    """Ignore map for one object: union of strictly-nearer objects' masks
    (datasets.py:385-391)."""
    nearer = depths_sq < depths_sq[own_index]
    return np.clip((masks * nearer[:, None, None]).sum(0), 0, 1)


def training_row_filter(row: Dict[str, float]) -> bool:
    """Sample selection (datasets.py:313-327): area > 16^2, truncation
    ratio < 0.7, occupancy ratio > 0.3."""
    area = (row["b"] - row["t"]) * (row["r"] - row["l"])
    return bool(area > 16 * 16 and row["truncr"] < 0.7
                and row["occupr"] > 0.3)


@dataclasses.dataclass
class VKittiMotgt:
    """motgt table loader (datasets.py:236-258); requires VKITTI_ROOT_DIR."""

    root_dir: str

    def __post_init__(self):
        import pandas as pd

        dfs = []
        for world in WORLD_IDS:
            for topic in SCENE_IDS:
                path = os.path.join(self.root_dir, "vkitti_1.3.1_motgt",
                                    f"{world}_{topic}.txt")
                if not os.path.isfile(path):
                    continue
                df = pd.read_csv(path, sep=" ", index_col=False)
                df["world"] = world
                df["topic"] = topic
                dfs.append(df)
        import pandas as pd
        self.df = (pd.concat(dfs).set_index(["world", "topic", "frame"])
                   if dfs else None)

    def frames(self, split: str) -> List[Tuple[str, str, int]]:
        out = []
        if self.df is None:
            return out
        for wi, world in enumerate(WORLD_IDS):
            rng = SPLIT_RANGES["train" if split == "train" else "test"][wi]
            for topic in SCENE_IDS:
                try:
                    frames = self.df.loc[(world, topic)].index.unique()
                except KeyError:
                    continue
                out.extend((world, topic, int(f)) for f in frames
                           if f in rng)
        return out

    def objects(self, world: str, topic: str, frame: int) -> List[dict]:
        rows = self.df.loc[(world, topic, frame)]
        if hasattr(rows, "iterrows"):
            return [r.to_dict() for _, r in rows.iterrows()]
        return [rows.to_dict()]
