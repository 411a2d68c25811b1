"""sdn3d_tpu: a TPU-native (JAX/XLA/Pallas/pjit) scene de-rendering and
re-rendering framework with the capabilities of 3D-SDN (NeurIPS 2018).

Three branches, one program:
  * semantic  — dilated-ResNet50 + PPM segmenter        (models.semantic)
  * geometric — Mask R-CNN proposals + 3D de-renderer +
                differentiable mesh rasterizer           (models.maskrcnn,
                                                          models.derenderer,
                                                          ops.rasterize)
  * textural  — pix2pixHD-style GAN synthesis            (models.pix2pixhd)

Unlike the reference (PyTorch + Chainer + CUDA glued by the filesystem), all
compute paths here are jit-compiled XLA programs with static shapes; the
per-object Python loops of the reference are replaced by vmap over padded
object slots, and multi-device scaling uses jax.sharding meshes.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache for every entry point (CLI, bench,
# driver, tests) — without it each process replays multi-minute relay
# compiles for programs compiled a hundred times before (core/cache.py).
from sdn3d_tpu.core.cache import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache
