"""Textural edit CLI (mirrors textural/edit_vkitti.py).

Reads: source RGB (--edit_source), its precomputed label PNG
(--segm_path), and a directory of geometric outputs (--edit_dir with
{i:05d}.png / .json / -normal.png [/-depth.png]).  Extracts per-instance
texture codes from the SOURCE image, rebuilds conditioning tensors per edit
frame, generates, and writes an HTML gallery (edit_vkitti.py:41-124).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edit_source", required=True)
    p.add_argument("--segm_path", required=True)
    p.add_argument("--edit_dir", required=True)
    p.add_argument("--edit_num", type=int, default=1)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--results_dir", default="./edit_out")
    p.add_argument("--load_size", type=int, default=624)
    p.add_argument("--fine_width", type=int, default=624)
    p.add_argument("--fine_height", type=int, default=192)
    p.add_argument("--no_vgg", action="store_true")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    return p


def load_trainer(args):
    import jax

    from sdn3d_tpu.core.checkpoint import load_meta, restore_checkpoint
    from sdn3d_tpu.pipelines.textural import (config_from_train_meta,
                                              TexturalTrainer)

    # Rebuild the checkpoint's training-time architecture from its manifest
    # (reference: test/edit options re-read the persisted opt.txt flags,
    # options/base_options.py:112-128) so e.g. --use_global_encoder or
    # --small checkpoints restore without a tree mismatch.
    meta = {}
    if args.ckpt_dir:
        try:
            meta = load_meta(args.ckpt_dir).get("meta", {})
        except (OSError, ValueError):
            pass
    cfg = config_from_train_meta(
        meta, use_vgg_loss=not args.no_vgg,
        compute_dtype=getattr(args, "compute_dtype", "float32"))
    trainer = TexturalTrainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0), args.fine_height,
                         args.fine_width)
    if args.ckpt_dir:
        state, step = restore_checkpoint(args.ckpt_dir, state)
        print(f"restored textural checkpoint step {step}")
    else:
        print("WARNING: no --ckpt_dir; random generator weights")
    return trainer, state


def prepare_source_begin(trainer, state, src_img, label_img, load_size,
                         wh):
    """Host transforms + netE feature-means dispatch for one source
    frame, with the (tiny) d2h fetch started asynchronously.  Returns a
    pending handle for prepare_source_finish.  The split exists so a
    chunked caller (pipelines/chain.py stage B) can dispatch every
    source's program before materializing any fetch — the ~50 ms relay
    round trip per source then overlaps the next sources' dispatch/PIL
    work instead of serializing after each one."""
    import jax.numpy as jnp

    from sdn3d_tpu.data.textural_data import (dense_instance_slots,
                                              transform_image)

    base_img_t = transform_image(src_img.convert("RGB"), load_size, wh)
    base_label = (np.asarray(transform_image(
        label_img, load_size, wh, nearest=True,
        normalize=False)) * 255.0).astype(np.int32)[..., 0]
    src_slots, _ = dense_instance_slots(base_label,
                                        trainer.cfg.max_instances)
    feat_means_dev = trainer.encode_feat_means_jit(
        state.params_e, jnp.asarray(base_img_t[None]),
        jnp.asarray(src_slots[None]))            # [1, max_instances, feat]
    try:
        feat_means_dev.copy_to_host_async()
    except AttributeError:
        pass
    return base_img_t, base_label, feat_means_dev


def prepare_source_finish(pending):
    base_img_t, base_label, feat_means_dev = pending
    return base_img_t, base_label, np.asarray(feat_means_dev)[0]


def prepare_source_inputs(trainer, state, src_img, label_img, load_size,
                          wh):
    """Source-side textural inputs from PIL images: the transformed RGB
    in [-1, 1], the int32 label map at target resolution, and the
    per-slot source feature-code table [max_instances, feat] (netE +
    instance means in one device program; its slot order is
    dense_instance_slots(base_label)).  The ONE implementation shared by
    this CLI, cli/edit_benchmark's per-source cache and
    EditChain.generate — the math must stay identical across all callers
    for the fused == file chain parity guarantee (tests/test_chain.py).
    Exactly prepare_source_finish(prepare_source_begin(...))."""
    return prepare_source_finish(prepare_source_begin(
        trainer, state, src_img, label_img, load_size, wh))


def assemble_edit_conditioning(trainer, state, base_img_t, base_label,
                               inst_img, json_obj, normal_img, wh, args,
                               feats=None, inst_small=None,
                               normal_small=None):
    """Host-side conditioning assembly for one edit frame: transformed
    maps + instance slots + the per-slot source-code table, as numpy —
    ready to stack into a generation batch.  Returns (maps, slots,
    feat_table, normal_u8): `feat_table` [max_instances, feat] holds each
    target slot's source code (zeros when the source has no matching
    instance id); expanding it through `slots` on device reproduces the
    reference's per-pixel splat exactly (edit_vkitti.py:99-105 — a gather
    of the same f32 codes) while uploading ~1 KB instead of a
    [H, W, feat] float map over the ~70 MB/s relay.  `normal_u8` is the
    raw resized normal PNG (uint8), normalized on device by
    fake_inference with assemble_condition_maps' exact math.

    `inst_small`/`normal_small` optionally carry the geometric stage's
    DEVICE-downsized planes (uint8, already at `wh` — the fused serving
    contract, pipelines/derender_infer.py small_plan): bit-exact to the
    PIL transform this function would apply (tests/test_pil_resize.py),
    so the full-resolution PIL path is skipped, including its float
    round-trip (replicated below: uint8/255*255 is exact in f32)."""
    import jax.numpy as jnp

    from sdn3d_tpu.data.textural_data import (
        assemble_condition_maps, dense_instance_slots, transform_image)

    if inst_small is not None:
        inst_png = ((np.asarray(inst_small).astype(np.float32) / 255.0)
                    * 255.0).astype(np.int32)
    else:
        inst_png = np.asarray(transform_image(
            inst_img, args.load_size, wh, nearest=True, normalize=False)
            * 255.0).astype(np.int32)[..., 0]
    normal_png = None
    if normal_small is not None:
        normal_png = (np.asarray(normal_small).astype(np.float32)
                      / 255.0) * 255.0
    elif normal_img is not None:
        normal_png = np.asarray(transform_image(
            normal_img.convert("RGB"), args.load_size, wh,
            normalize=False)) * 255.0

    maps = assemble_condition_maps(base_label, inst_png, json_obj,
                                   normal_png)
    if normal_png is not None:
        # PIL resizes uint8 images in uint8, so these floats are
        # integer-valued: the uint8 cast is lossless
        normal_u8 = normal_png.astype(np.uint8)
    else:
        # absent normal (the reference's 'no cars' frame,
        # textural/edit_vkitti.py:88-95): the generator must see EXACT
        # 0.0 conditioning, not the uint8 normalization of zero bytes
        # (~-0.996) — normal_u8=None makes the caller ship a zeroed
        # plane plus a validity flag that fake_inference applies AFTER
        # its uint8 normalization (see generate_edit_batch).
        maps["normal"] = np.zeros(base_img_t.shape, np.float32)
        normal_u8 = None

    # source texture codes, by target instance id
    cfg = trainer.cfg
    slots, mapping = dense_instance_slots(maps["inst"], cfg.max_instances)
    # codes from the SOURCE instance layout (prepare_source_inputs
    # computes the per-slot mean table [max_instances, feat] on device,
    # fused with netE; ~1 KB instead of a [H, W, feat] map per source)
    src_slots, src_mapping = dense_instance_slots(
        np.asarray(base_label), cfg.max_instances)
    if feats is None:
        import jax.numpy as _jnp
        feats = np.asarray(trainer.encode_feat_means_jit(
            state.params_e, _jnp.asarray(base_img_t[None]),
            _jnp.asarray(src_slots[None])))[0]
    means_np = np.asarray(feats, np.float32)     # [max_instances, feat]
    # For edit frames, codes are looked up by matching instance ids
    # between source and target (edit_vkitti.py:57,99-105): same k*1000
    # id = same object.
    feat_table = np.zeros((cfg.max_instances, cfg.feat_num), np.float32)
    for inst_id, slot in mapping.items():
        src_slot = src_mapping.get(inst_id)
        if src_slot is not None:
            feat_table[slot] = means_np[src_slot]
    # raw instance plane for the serving upload (values <= 255: it comes
    # from a uint8 PNG/small plane); fake_inference reconstructs the
    # int32 k*1000 map from it with assemble_condition_maps' exact math
    inst_raw = inst_png.astype(np.uint8)
    return maps, slots, feat_table, normal_u8, inst_raw


def generate_edit_from_images(trainer, state, base_img_t, base_label,
                              inst_img, json_obj, normal_img, wh, args,
                              feats=None, inst_small=None,
                              normal_small=None):
    """Core of the textural edit step from in-memory PIL images.

    Entry point of the fused single-process chain
    (pipelines/chain.py): byte-identical to the file-based path, since
    the PNG round-trip it skips is lossless.  `inst_img` is the full-res
    instance map (L mode), `normal_img` an RGB image or None.  `feats`
    optionally carries the source image's pre-encoded feature map
    [H, W, feat] so callers can cache it across pairs sharing a source
    (pure recompute elision; identical values)."""
    fakes, maps_list = generate_edit_batch(
        trainer, state,
        [{"base_img_t": base_img_t, "base_label": base_label,
          "inst_img": inst_img, "json_obj": json_obj,
          "normal_img": normal_img, "feats": feats,
          "inst_small": inst_small, "normal_small": normal_small}],
        wh, args)
    return fakes[0], maps_list[0]


def generate_edit_batch(trainer, state, items, wh, args):
    """Batched textural generation: assemble each frame's conditioning
    host-side, then run ONE fake_inference over the stacked [N, H, W]
    batch (the reference generates one frame per forward,
    edit_vkitti.py:109; batching amortizes dispatch and gives the
    data-parallel serving axis).  Each items[i] needs base_img_t,
    base_label, inst_img, json_obj, and optional normal_img / feats.
    Returns (list of [H, W, 3] fakes, list of condition-map dicts)."""
    import jax.numpy as jnp

    from sdn3d_tpu.utils import phases

    with phases.phase("tex.assemble"):
        assembled = [
            assemble_edit_conditioning(
                trainer, state, it["base_img_t"], it["base_label"],
                it.get("inst_img"), it["json_obj"], it.get("normal_img"),
                wh, args, feats=it.get("feats"),
                inst_small=it.get("inst_small"),
                normal_small=it.get("normal_small"))
            for it in items]
    with phases.phase("tex.upload"):
        # Conditioning ships in the smallest lossless dtypes (label ids
        # <= 14, pose bins <= 24, slots < max_instances, normal = raw
        # PNG bytes); fake_inference widens/normalizes on device with
        # identical math.  The source image is only an input when the
        # global encoder consumes it — skipping it saves a [B, H, W, 3]
        # f32 upload per chunk.
        batch = {
            "label": jnp.asarray(np.stack(
                [m["label"] for m, _, _, _, _ in assembled]
                ).astype(np.uint8)),
            # raw uint8 instance plane (1 byte/pixel); fake_inference
            # reconstructs the int32 k*1000 map on device exactly
            "inst": jnp.asarray(np.stack(
                [ir for _, _, _, _, ir in assembled])),
            "inst_slots": jnp.asarray(np.stack(
                [s for _, s, _, _, _ in assembled]).astype(np.uint8)),
            "pose": jnp.asarray(np.stack(
                [m["pose"] for m, _, _, _, _ in assembled]
                ).astype(np.uint8)),
            "normal": jnp.asarray(np.stack(
                [n if n is not None
                 else np.zeros(items[i]["base_img_t"].shape, np.uint8)
                 for i, (_, _, _, n, _) in enumerate(assembled)])),
            # 1 where the frame HAS a normal map; frames without one
            # (normal_u8 is None) must condition on exact f32 zeros, so
            # fake_inference zeroes them after the uint8 normalization
            "normal_valid": jnp.asarray(np.asarray(
                [n is not None for _, _, _, n, _ in assembled],
                np.float32)),
        }
        if trainer.cfg.use_global_encoder:
            batch["image"] = jnp.asarray(np.stack(
                [it["base_img_t"] for it in items]))
        feat_tables = jnp.asarray(np.stack(
            [f for _, _, f, _, _ in assembled]))
        phases.block((batch, feat_tables))
        phases.add_bytes("tex.upload", feat_tables, *batch.values())
    with phases.phase("tex.generate"):
        fakes = np.asarray(
            trainer.fake_inference_jit(state, batch, feat_tables))
        phases.add_bytes("tex.generate", fakes)
    return list(fakes), [m for m, _, _, _, _ in assembled]


def generate_edit_frame(trainer, state, base_img_t, base_label,
                        edit_dir, index, wh, args, feats=None):
    """Assemble one edit frame's conditioning + generate
    (edit_vkitti.py:63-107).  `index` is the geometric output stem: an int
    (zero-padded, the example-edit layout) or a string (benchmark
    target_name layout)."""
    from PIL import Image

    stem = f"{index:05d}" if isinstance(index, int) else index
    inst_img = Image.open(os.path.join(edit_dir, f"{stem}.png"))
    with open(os.path.join(edit_dir, f"{stem}.json")) as f:
        json_obj = json.load(f)
    normal_path = os.path.join(edit_dir, f"{stem}-normal.png")
    normal_img = Image.open(normal_path) if os.path.exists(normal_path) \
        else None
    return generate_edit_from_images(trainer, state, base_img_t,
                                     base_label, inst_img, json_obj,
                                     normal_img, wh, args, feats=feats)


def main(argv=None):
    from PIL import Image

    from sdn3d_tpu.utils.visualizer import HTMLGallery, tensor2im, \
        tensor2label

    args = build_argparser().parse_args(argv)
    trainer, state = load_trainer(args)
    wh = (args.fine_width, args.fine_height)

    base_img_t, base_label, feats = prepare_source_inputs(
        trainer, state, Image.open(args.edit_source),
        Image.open(args.segm_path), args.load_size, wh)

    gallery = HTMLGallery(args.results_dir, "sdn3d_tpu edit results")
    for i in range(args.edit_num):
        fake, maps = generate_edit_frame(trainer, state, base_img_t,
                                         base_label, args.edit_dir, i, wh,
                                         args, feats=feats)
        gallery.add_images({
            "input_label": tensor2label(maps["label"], 14),
            "synthesized_image": tensor2im(fake),
            "real_image": tensor2im(base_img_t),
        }, f"{i:05d}")
        print(f"generated edit frame {i:05d}")
    out = gallery.save()
    print(f"gallery: {out}")


if __name__ == "__main__":
    main()
