"""Test-time silhouette-refinement loop timing (main.py:405-459 path).

Measures refine_silhouettes at production shapes for TWO different
images: the second call must reuse the cached jit (the pre-fix code
closure-captured the per-image blob and re-jitted per image).

Run: python scripts/prof_refine.py [num_opts] [render_size]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.models.derenderer import Derenderer, DeviceMeshBank
from sdn3d_tpu.pipelines.derender_infer import (DerenderInferConfig,
                                                refine_silhouettes)

NUM_OPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
RENDER = int(sys.argv[2]) if len(sys.argv) > 2 else 384
B = 16


def make_blob(model, variables, seed):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
    mroi = jnp.zeros((B, 2))
    droi = jnp.full((B, 2), 0.6)
    enc = model.apply(variables, images, mroi, droi, train=False)
    blob = dict(enc)
    blob.update({
        "_roi_norms": jnp.asarray(
            np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32),
                    (B, 1))),
        "_mroi_norms": mroi, "_droi_norms": droi,
        "_focals": jnp.full((B, 1), 725.0),
    })
    return blob


def main():
    bank = DeviceMeshBank.from_host(
        load_shapenet_bank("/root/reference/geometric/assets"))
    model = Derenderer()
    rng0 = np.random.RandomState(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, 224, 224, 3)), jnp.zeros((B, 2)),
                           jnp.zeros((B, 2)), train=False)
    cfg = DerenderInferConfig(num_opts=NUM_OPTS, render_size=RENDER)
    masks = jnp.asarray(
        (rng0.rand(B, 1, RENDER, RENDER) > 0.7).astype(np.float32))

    print(f"refine: {NUM_OPTS} Adam iters, render {RENDER} (raster "
          f"{RENDER*2}^2 AA), {B} objects")
    for i in range(3):
        blob = make_blob(model, variables, i)
        t0 = time.perf_counter()
        out = refine_silhouettes(blob, bank, masks, None, cfg)
        np.asarray(out["_translation2ds"])
        print(f"image {i}: {time.perf_counter()-t0:7.2f} s"
              + ("  (compile)" if i == 0 else ""))


if __name__ == "__main__":
    main()
