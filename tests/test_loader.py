"""Host loader tests (forked-DataLoader equivalent: zero-fill collate,
weighted sampling, threaded prefetch, sharded device_put)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from sdn3d_tpu.data.loader import (EpochSampler, PrefetchLoader,
                                   WeightedSampler, zero_fill_collate)


def test_zero_fill_collate():
    """Missing keys are zero-filled per derender3d/data_loader.py:17-40."""
    a = {"x": np.ones((2, 3)), "y": np.full((4,), 7.0)}
    b = {"x": 2 * np.ones((2, 3))}
    out = zero_fill_collate([a, b])
    assert out["x"].shape == (2, 2, 3)
    assert out["y"].shape == (2, 4)
    np.testing.assert_array_equal(out["y"][0], 7.0)
    np.testing.assert_array_equal(out["y"][1], 0.0)


def test_weighted_sampler_ratios():
    s = WeightedSampler([1.0, 3.0], seed=0)
    it = iter(s)
    draws = [next(it) for _ in range(4000)]
    frac1 = np.mean(np.asarray(draws) == 1)
    assert 0.70 < frac1 < 0.80


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64),
                "img": np.full((4, 4), float(i), np.float32)}


def test_prefetch_loader_epoch():
    ds = _DS(10)
    loader = PrefetchLoader(ds, batch_size=3, num_workers=3, shuffle=True,
                            seed=1)
    batches = list(loader)
    assert len(batches) == 3                        # drop_last
    seen = np.concatenate([b["idx"][:, 0] for b in batches])
    assert len(set(seen.tolist())) == 9             # distinct indices
    for b in batches:
        assert b["img"].shape == (3, 4, 4)
        np.testing.assert_array_equal(b["img"][:, 0, 0], b["idx"][:, 0])


def test_prefetch_loader_sharded():
    import jax
    from sdn3d_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(4)
    loader = PrefetchLoader(_DS(8), batch_size=8, num_workers=2,
                            sharding=batch_sharding(mesh), shuffle=False)
    (batch,) = list(loader)
    assert isinstance(batch["img"], jax.Array)
    assert batch["img"].shape == (8, 4, 4)
    total = jax.jit(lambda x: x.sum())(batch["idx"])
    assert int(total) == sum(range(8))


def test_prefetch_loader_infinite_sampler_streams():
    """An infinite WeightedSampler streams lazily — batches arrive without
    materializing the (endless) index sequence up front."""
    from itertools import islice
    from sdn3d_tpu.data.loader import WeightedSampler

    ds = _DS(6)
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2,
                            sampler=WeightedSampler(np.ones(6)))
    batches = list(islice(iter(loader), 5))
    assert len(batches) == 5
    for b in batches:
        assert b["img"].shape == (2, 4, 4)


def test_prefetch_loader_worker_error_propagates():
    """A dataset exception surfaces as RuntimeError instead of silently
    killing the worker and deadlocking the loader."""
    import pytest

    class Bad(_DS):
        def __getitem__(self, i):
            if i == 4:
                raise ValueError("corrupt sample")
            return super().__getitem__(i)

    loader = PrefetchLoader(Bad(8), batch_size=2, num_workers=2,
                            shuffle=False)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_prefetch_loader_reshuffles_each_epoch():
    loader = PrefetchLoader(_DS(12), batch_size=12, num_workers=1,
                            shuffle=True, drop_last=False, seed=7)
    (b1,) = list(loader)
    (b2,) = list(loader)
    assert not np.array_equal(b1["idx"], b2["idx"])   # per-epoch reshuffle
    assert sorted(b1["idx"][:, 0]) == sorted(b2["idx"][:, 0])


def test_prefetch_loader_threads_cleaned_up_on_break():
    """Abandoning an iteration (early break / partial drain) must not leak
    the feeder/worker/orderer threads or their in-flight batches."""
    import gc
    import threading
    import time

    ds = _DS(64)
    loader = PrefetchLoader(ds, batch_size=4, num_workers=4, shuffle=False)
    base = threading.active_count()
    for _ in range(5):
        for k, _b in enumerate(loader):
            if k == 2:
                break
    gc.collect()                       # drop abandoned generator frames
    deadline = time.monotonic() + 30.0
    while (threading.active_count() > base
           and time.monotonic() < deadline):
        time.sleep(0.05)
    assert threading.active_count() <= base


def test_prefetch_loader_threads_cleaned_up_after_error():
    """The worker-error re-raise path must also shut the pipeline down."""
    import gc
    import threading
    import time

    class _Bad(_DS):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom")
            return super().__getitem__(i)

    loader = PrefetchLoader(_Bad(32), batch_size=4, num_workers=3,
                            shuffle=False)
    base = threading.active_count()
    with pytest.raises(RuntimeError):
        list(loader)
    gc.collect()
    deadline = time.monotonic() + 30.0
    while (threading.active_count() > base
           and time.monotonic() < deadline):
        time.sleep(0.05)
    assert threading.active_count() <= base
