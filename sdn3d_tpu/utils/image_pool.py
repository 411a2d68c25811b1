"""GAN history buffer (textural/util/image_pool.py:6-32).

Host-side: stores previously generated conditioning+fake stacks and, with
probability 0.5, swaps the current fake for a historical one.  The 3D-SDN
config uses pool_size=0 (train_options.py:35), where this is a pass-through
— provided for full pix2pixHD parity.
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.RandomState(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """images [B, ...] -> same-shaped batch, possibly from history."""
        if self.pool_size == 0:
            return images
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.rand() > 0.5:
                idx = self.rng.randint(len(self.images))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)
