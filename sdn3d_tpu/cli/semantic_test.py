"""Semantic branch inference CLI (mirrors semantic/vkitti_test.py).

Modes: single image (--test_img path/to.png) or whole benchmark list
(--test_img benchmark with --edit_json).  Writes raw label PNGs consumed by
the downstream branches (vkitti_test.py:21-27,46-79) plus colorized
previews.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_img", required=True,
                   help="image path, or 'benchmark'")
    p.add_argument("--data_root", default=os.environ.get("VKITTI_ROOT_DIR"))
    p.add_argument("--edit_json", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--result", default="./semantic_out")
    p.add_argument("--num_class", type=int, default=14)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scales", type=int, nargs="+",
                   default=[100, 150, 200, 300, 375])
    return p


def load_model(args):
    import jax
    import jax.numpy as jnp

    from sdn3d_tpu.core.checkpoint import restore_variables
    from sdn3d_tpu.models.semantic import SemanticModel

    model = SemanticModel(num_class=args.num_class,
                          dtype=jnp.dtype(args.compute_dtype))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    if args.ckpt_dir:
        # restore_variables accepts both bare-variables checkpoints and
        # the full train states cli/semantic_train saves
        variables, step = restore_variables(args.ckpt_dir, variables)
        print(f"restored semantic checkpoint step {step}")
    else:
        print("WARNING: no --ckpt_dir; running with random weights")
    return model, variables


def infer_image(model, variables, image_rgb: np.ndarray, args) -> np.ndarray:
    """uint8 RGB frame -> uint8 label map.  The exact reference
    normalization (vkitti_dataset.py:43-44,152 — BGR order, ImageNet
    means x255, stds in 0..1 scale) happens INSIDE the fused device
    program with the same f32 ops the old host path used; one dispatch +
    uint8-only transfers per frame."""
    from sdn3d_tpu.pipelines.semantic import multiscale_labels_fused

    return multiscale_labels_fused(variables, model,
                                   np.ascontiguousarray(image_rgb),
                                   scales=tuple(args.scales))


def main(argv=None):
    from PIL import Image

    from sdn3d_tpu.utils.visualizer import tensor2label

    args = build_argparser().parse_args(argv)
    os.makedirs(args.result, exist_ok=True)
    model, variables = load_model(args)

    if args.test_img == "benchmark":
        from sdn3d_tpu.data.vkitti import load_edit_json, benchmark_split
        assert args.edit_json and args.data_root
        items = benchmark_split(load_edit_json(args.edit_json))
        # output stem = item.source_name (world_topic_frame): what the
        # downstream edit CLIs look up, and collision-free across
        # worlds/topics that reuse frame numbers.
        work = sorted({
            (i.source_name,
             os.path.join(args.data_root, "vkitti_1.3.1_rgb", i.world,
                          i.topic, f"{i.source}.png")) for i in items})
    else:
        stem = os.path.splitext(os.path.basename(args.test_img))[0]
        work = [(stem, args.test_img)]

    for stem, path in work:
        image = np.asarray(Image.open(path).convert("RGB"))
        pred = infer_image(model, variables, image, args)
        Image.fromarray(pred).save(os.path.join(args.result, f"{stem}.png"))
        Image.fromarray(tensor2label(pred, args.num_class)).save(
            os.path.join(args.result, f"{stem}_color.png"))
        print(f"wrote {stem}.png")


if __name__ == "__main__":
    main()
