"""End-to-end edit-chain throughput on the TPU (random weights).

Per target frame of the 92-pair benchmark the system runs:
  semantic multi-scale inference (source, once per source) ->
  Mask R-CNN detection (source, once) ->
  derenderer encode (once) -> edit ops -> batched re-render + composite
  (per frame) -> textural fake_inference (per frame).

This script times the steady-state jit-cached per-frame path (re-render +
composite + textural G) and the per-source path (semantic + detection +
encode), with float32 and bfloat16 CNN compute.
"""
import sys
import time

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

IMG_PATH = "/root/reference/assets/0006_30-deg-right_00043.png"


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s}: {dt*1e3:9.1f} ms")
    return dt


def main(dt="bfloat16"):
    from sdn3d_tpu.geometry.assets import load_shapenet_bank
    from sdn3d_tpu.models.derenderer import Derenderer, DeviceMeshBank
    from sdn3d_tpu.models.maskrcnn import MaskRCNNConfig
    from sdn3d_tpu.models.semantic import SemanticModel
    from sdn3d_tpu.pipelines import derender_infer as DI
    from sdn3d_tpu.pipelines.detect import MaskRCNNDetector
    from sdn3d_tpu.pipelines.semantic import multiscale_inference
    from sdn3d_tpu.pipelines.textural import TexturalConfig, TexturalTrainer

    img = np.asarray(Image.open(IMG_PATH).convert("RGB"))
    H, W = img.shape[:2]
    print("image:", img.shape, "dtype:", dt)

    rng = np.random.RandomState(0)

    # --- semantic (per source) ---
    sem = SemanticModel(num_class=14, dtype=jnp.dtype(dt))
    sem_vars = sem.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), seg_size=(64, 64))

    def run_sem():
        return multiscale_inference(sem_vars, sem, img)
    t_sem = timeit("semantic multi-scale inference", run_sem)

    # --- detection (per source) ---
    det = MaskRCNNDetector(MaskRCNNConfig(compute_dtype=dt))
    det_vars = det.init(jax.random.PRNGKey(1))

    def run_det():
        return det.detect(det_vars, img)
    t_det = timeit("maskrcnn detect", run_det)
    class_ids, masks, rois = run_det()
    n = min(len(rois), 16)
    if n == 0:
        # random weights may detect nothing: synthesize boxes
        n = 8
        rois = np.stack([
            rng.uniform(0, H - 80, n), rng.uniform(0, W - 120, n),
            rng.uniform(80, H, n), rng.uniform(120, W, n)], 1)
        rois = np.stack([np.minimum(rois[:, 0], rois[:, 2] - 40),
                         np.minimum(rois[:, 1], rois[:, 3] - 40),
                         rois[:, 2], rois[:, 3]], 1).astype(np.float32)
        class_ids = np.ones(n, np.int32)
        masks = (rng.rand(n, H, W) > 0.5).astype(np.float32)

    # --- derenderer (encode per source; render+composite per frame) ---
    bank = DeviceMeshBank.from_host(
        load_shapenet_bank("/root/reference/geometric/assets"))
    model = Derenderer(num_classes=8, dtype=jnp.dtype(dt))
    dvars = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 224, 224, 3)),
        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    cfg = DI.DerenderInferConfig()

    def full_derender():
        return DI.derender_image(dvars, model, bank, img,
                                 class_ids[:n], masks[:n], rois[:n],
                                 cfg, operations=[
                                     {"type": "modify",
                                      "from": {"u": 600, "v": 200},
                                      "to": {"u": 650, "v": 200},
                                      "zoom": 1.2, "ry": 0.3}])
    t_geo = timeit("derender+edit+render+composite", full_derender)
    geo = full_derender()

    # --- textural synthesis (per frame) ---
    tcfg = TexturalConfig(compute_dtype=dt, use_vgg_loss=False)
    tr = TexturalTrainer(tcfg)
    state = tr.init(jax.random.PRNGKey(3), 192, 624)
    batch = {
        "label": jnp.asarray(rng.randint(0, 14, (1, 192, 624))),
        "inst": jnp.asarray(rng.randint(0, 30, (1, 192, 624))),
        "inst_slots": jnp.asarray(rng.randint(0, 30, (1, 192, 624))),
        "image": jnp.asarray(rng.rand(1, 192, 624, 3).astype(np.float32)),
        "pose": jnp.asarray(rng.randint(0, 25, (1, 192, 624))),
        "normal": jnp.asarray(rng.rand(1, 192, 624, 3).astype(np.float32)),
    }
    fake_inf = jax.jit(lambda b: tr.fake_inference(state, b))
    t_tex = timeit("textural fake_inference 192x624", fake_inf, batch)

    per_frame = t_geo + t_tex
    per_source = t_sem + t_det
    print(f"per-frame (re-render+composite+G): {per_frame*1e3:.0f} ms "
          f"-> {1.0/per_frame:.2f} edit frames/s")
    print(f"per-source (semantic+detect):      {per_source*1e3:.0f} ms")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
