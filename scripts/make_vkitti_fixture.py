"""Build a miniature on-disk Virtual KITTI 1.3.1 replica for a given edit
JSON — real directory layout, parseable by the production data layer
(vkitti_1.3.1_rgb/<world>/<topic>/<frame>.png, vkitti_1.3.1_scenegt pngs +
<world>_<topic>_scenegt_rgb_encoding.txt), so the full 3-stage benchmark
protocol (semantic_test -> geometric_main -> edit_benchmark) can run
end-to-end without the real dataset.

Synthetic content: gradient road/sky background; each SOURCE frame gets a
"car" rectangle at every modify/delete operation's from-(u, v) position
(sized from the op's to-roi when present), drawn consistently in the RGB
and the scenegt instance map, so the GT-source geometric stage detects and
edits real objects.  TARGET frames are background-only (they are consumed
as L1 targets, not re-detected).

Usage: python scripts/make_vkitti_fixture.py <root> [edit_json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sdn3d_tpu.data.vkitti import (CATEGORIES, SCENE_IDS, WORLD_IDS,  # noqa: E402
                                   Camera)

H, W = Camera.height, Camera.width

# fixed background category colors (scenegt encoding)
BG_COLORS = {"Sky": (90, 200, 255), "Road": (100, 60, 100),
             "Terrain": (210, 0, 200)}


def _background_rgb(seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    img = np.zeros((H, W, 3), np.uint8)
    horizon = H // 3
    img[:horizon] = (135 + rs.randint(-20, 20), 196, 235)      # sky-ish
    grad = np.linspace(90, 40, H - horizon)[:, None]
    img[horizon:] = np.stack([grad, grad, grad], -1) + rs.randint(0, 10)
    return img


def _background_scenegt() -> np.ndarray:
    img = np.zeros((H, W, 3), np.uint8)
    horizon = H // 3
    img[:horizon] = BG_COLORS["Sky"]
    img[horizon:] = BG_COLORS["Road"]
    return img


def _car_rect(op) -> tuple:
    """(y1, x1, y2, x2) box for an operation's from-position."""
    u = float(op["from"]["u"])
    v = float(op["from"]["v"])
    if op.get("to") and op["to"].get("roi"):
        y1, x1, y2, x2 = op["to"]["roi"]
        h, w = max(24, int(y2 - y1)), max(32, int(x2 - x1))
    else:
        h, w = 60, 100
    y1 = int(np.clip(v - h / 2, 0, H - 24))
    x1 = int(np.clip(u - w / 2, 0, W - 32))
    return y1, x1, min(H, y1 + h), min(W, x1 + w)


def build_fixture(root: str, edit_json: str) -> None:
    with open(edit_json) as f:
        items = json.load(f)

    rgb_dir = os.path.join(root, "vkitti_1.3.1_rgb")
    gt_dir = os.path.join(root, "vkitti_1.3.1_scenegt")
    os.makedirs(gt_dir, exist_ok=True)

    # --- per-(world, topic) instance color registry -----------------------
    # sources: one car instance per operation (unique color per instance)
    cars: dict = {}          # (world, topic) -> list of (frame, box, color)
    frames: dict = {}        # (world, topic) -> set of frames
    for it in items:
        key = (it["world"], it["topic"])
        frames.setdefault(key, set()).update({it["source"], it["target"]})
        for k, op in enumerate(it.get("operations", [])):
            color = (200, 40 + (37 * len(cars.get(key, []))) % 200,
                     60 + (53 * len(cars.get(key, []))) % 180)
            cars.setdefault(key, []).append((it["source"], _car_rect(op),
                                             color))

    # --- scenegt encoding txts for EVERY world x topic (get_tables
    # iterates all 50; unused ones get background-only tables) -------------
    for world in WORLD_IDS:
        for scene in SCENE_IDS:
            path = os.path.join(gt_dir,
                                f"{world}_{scene}_scenegt_rgb_encoding.txt")
            lines = ["Category(:id) r g b"]
            for cat, (r, g, b) in BG_COLORS.items():
                assert cat in CATEGORIES
                lines.append(f"{cat} {r} {g} {b}")
            for j, (_, _, (r, g, b)) in enumerate(
                    cars.get((world, scene), [])):
                lines.append(f"Car:{j + 1:03d} {r} {g} {b}")
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")

    # --- frames ------------------------------------------------------------
    from PIL import Image

    n = 0
    for (world, topic), fset in frames.items():
        odir_rgb = os.path.join(rgb_dir, world, topic)
        odir_gt = os.path.join(gt_dir, world, topic)
        os.makedirs(odir_rgb, exist_ok=True)
        os.makedirs(odir_gt, exist_ok=True)
        for frame in sorted(fset):
            seed = abs(hash((world, topic, frame))) % (2 ** 31)
            rgb = _background_rgb(seed)
            gt = _background_scenegt()
            for (src, (y1, x1, y2, x2), color) in cars.get((world, topic),
                                                           []):
                if src != frame:
                    continue
                rgb[y1:y2, x1:x2] = color
                # simple shading so the crop isn't constant
                rgb[y1:y2, x1:x2, 0] = np.clip(
                    np.linspace(color[0] - 40, color[0] + 40, x2 - x1)[None],
                    0, 255).astype(np.uint8)
                gt[y1:y2, x1:x2] = color
            Image.fromarray(rgb).save(
                os.path.join(odir_rgb, f"{frame}.png"))
            Image.fromarray(gt).save(
                os.path.join(odir_gt, f"{frame}.png"))
            n += 1
    print(f"fixture: {n} frames under {root}")


if __name__ == "__main__":
    root = sys.argv[1]
    ej = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/assets/vkitti_edit_benchmark.json"
    build_fixture(root, ej)
