"""Derenderer training dataset selection by (dataset, mode).

Re-expression of geometric/derender3d/data_loader.py:43-82: the
reference's DataLoader picks the dataset class (and, for kitti-full, a
WeightedRandomSampler over the hybrid concat) from the --dataset flag
and the TargetType mode.  Returns (dataset, sampler-or-None); feed both
to data.loader.PrefetchLoader (whose zero-fill collate handles the
hybrid datasets' heterogeneous key sets, data_loader.py:17-40).
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

from sdn3d_tpu.data.loader import HybridDataset, WeightedSampler
from sdn3d_tpu.models.derenderer import TargetType


def select_derender_dataset(
    dataset: str,
    mode: int,
    vkitti_root: Optional[str] = None,
    kitti_object_root: Optional[str] = None,
    kitti_semantics_root: Optional[str] = None,
    cityscapes_root: Optional[str] = None,
    is_train: bool = True,
    image_size: int = 224,
    render_size: int = 256,
    seed: int = 0,
) -> Tuple[object, Optional[WeightedSampler]]:
    """(dataset name, TargetType mode) -> (dataset, sampler).

    Mirrors data_loader.py:43-82 exactly:
      vkitti, any mode          -> VKitti
      kitti, pretrain | extend  -> KittiObject
      kitti, finetune           -> KittiSemantics
      kitti, full               -> KittiObject + KittiSemantics hybrid,
                                   WeightedRandomSampler over get_weights()
      cityscapes, full          -> VKitti + CityscapesSemantics hybrid
                                   (weights 0.75 / 0.25, datasets.py:1115-1123)
      cityscapes, extend        -> CityscapesSemantics
    """
    jit_rng = random.Random(seed)

    def vkitti():
        from sdn3d_tpu.data.vkitti_derender import VKittiDerenderDataset
        assert vkitti_root, "--vkitti_root required"
        return VKittiDerenderDataset(vkitti_root, is_train=is_train,
                                     image_size=image_size,
                                     render_size=render_size,
                                     jitter_rng=jit_rng)

    def kitti_object():
        from sdn3d_tpu.data.kitti import KittiObjectDataset
        assert kitti_object_root, "--kitti_object_root required"
        return KittiObjectDataset(kitti_object_root, is_train=is_train,
                                  image_size=image_size)

    def kitti_semantics():
        from sdn3d_tpu.data.kitti import KittiSemanticsDataset
        assert kitti_semantics_root, "--kitti_semantics_root required"
        return KittiSemanticsDataset(kitti_semantics_root,
                                     is_train=is_train,
                                     image_size=image_size,
                                     render_size=render_size,
                                     jitter_rng=jit_rng)

    def cityscapes_semantics():
        from sdn3d_tpu.data.cityscapes_derender import \
            CityscapesSemanticsDataset
        assert cityscapes_root, "--cityscapes_root required"
        return CityscapesSemanticsDataset(cityscapes_root,
                                          is_train=is_train,
                                          image_size=image_size,
                                          render_size=render_size,
                                          jitter_rng=jit_rng)

    if dataset == "vkitti":
        return vkitti(), None
    if dataset == "kitti":
        if mode in (TargetType.pretrain, TargetType.extend):
            return kitti_object(), None
        if mode == TargetType.finetune:
            return kitti_semantics(), None
        if mode == TargetType.full:
            ds = HybridDataset([kitti_object(), kitti_semantics()])
            return ds, WeightedSampler(ds.get_weights(), seed=seed)
        raise ValueError(f"kitti has no dataset for mode {mode}")
    if dataset == "cityscapes":
        if mode == TargetType.full:
            return HybridDataset([vkitti(), cityscapes_semantics()],
                                 weights=[0.75, 0.25]), None
        if mode == TargetType.extend:
            return cityscapes_semantics(), None
        raise ValueError(f"cityscapes has no dataset for mode {mode}")
    raise ValueError(f"unknown dataset {dataset!r}")
