"""Derenderer model + training pipeline tests, incl. multi-device sharding
on the 8-device CPU mesh (replaces the reference's 2-GPU SyncBN fixture,
semantic/lib/nn/modules/tests/test_sync_batchnorm.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdn3d_tpu.data.synthetic import make_derender_batch, make_sphere_mesh
from sdn3d_tpu.geometry.assets import build_mesh_bank
from sdn3d_tpu.models.derenderer import (
    Derenderer, DeviceMeshBank, TargetType, derender_forward)
from sdn3d_tpu.pipelines.derender import DerenderTrainer


IMAGE = 32
RENDER = 32


@pytest.fixture(scope="module")
def setup():
    verts, faces = make_sphere_mesh(4, 8)
    bank = DeviceMeshBank.from_host(build_mesh_bank([(verts, faces)] * 3))
    model = Derenderer(num_classes=3)
    trainer = DerenderTrainer(model=model, bank=bank, mode=TargetType.extend,
                              image_size=IMAGE, render_size=RENDER)
    batch = make_derender_batch(4, IMAGE)
    batch["masks"] = np.zeros((4, 1, RENDER, RENDER), np.float32)
    batch["masks"][:, :, 8:24, 8:24] = 1.0
    batch["ignores"] = np.zeros_like(batch["masks"])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = trainer.init(jax.random.PRNGKey(0), batch)
    return trainer, batch, state


def test_forward_shapes(setup):
    trainer, batch, state = setup
    blob = derender_forward(
        {"params": state.params, "batch_stats": state.batch_stats},
        trainer.model, batch["images"], batch["roi_norms"], batch["focals"],
        trainer.bank, TargetType.extend, IMAGE, RENDER, training=False)
    assert blob["_masks"].shape == (4, 1, RENDER, RENDER)
    assert blob["_normals"].shape == (4, 3, RENDER, RENDER)
    assert blob["_depth_maps"].shape == (4, 1, RENDER, RENDER)
    assert blob["_class_probs"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(blob["_class_probs"]).sum(1), 1.0,
                               rtol=1e-5)
    # Eval-mode zoom solve must put the object on screen.
    assert float(blob["_masks"].mean()) > 0.01


@pytest.mark.slow
def test_train_step_runs_and_is_finite(setup):
    trainer, batch, state = setup
    step = jax.jit(trainer.make_train_step())
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(new_state.step) == 1
    # Params actually moved.
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params,
                               state.params), 0.0)
    assert delta > 0


@pytest.mark.slow
def test_train_step_sharded_multichip(setup):
    """One full training step over an 8-device data mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sdn3d_tpu.parallel import make_mesh, shard_batch

    trainer, batch, state = setup
    n = len(jax.devices())
    assert n == 8, f"conftest should force 8 cpu devices, got {n}"
    mesh = make_mesh(n)
    batch8 = {k: jnp.concatenate([v, v], 0) for k, v in batch.items()}
    batch8 = shard_batch(batch8, mesh)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))

    step = jax.jit(trainer.make_train_step())
    new_state, losses = step(state_r, batch8, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


@pytest.mark.slow
def test_sharded_matches_single_device(setup):
    """Data-parallel step == single-device step on the same batch (the
    distributed-parity fixture, SURVEY.md §4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sdn3d_tpu.parallel import make_mesh, shard_batch

    trainer, batch, state = setup
    batch8 = {k: jnp.concatenate([v, v], 0) for k, v in batch.items()}

    step = trainer.make_train_step()
    s1, l1 = jax.jit(step)(state, batch8, jax.random.PRNGKey(3))

    mesh = make_mesh(8)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    s2, l2 = jax.jit(step)(state_r, shard_batch(batch8, mesh),
                           jax.random.PRNGKey(3))
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=2e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_graft_entry():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)


def test_multihost_mesh_single_process(setup):
    """The DCN x ICI mesh degenerates to [1, n_local] under one process;
    a batch sharded over (hosts, data) matches the flat data sharding."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sdn3d_tpu.parallel import (local_batch_slice, make_multihost_mesh,
                                    multihost_batch_sharding)

    mesh = make_multihost_mesh()
    assert mesh.devices.shape == (1, len(jax.devices()))

    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, multihost_batch_sharding(mesh))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    np.testing.assert_allclose(float(y), float((x * 2).sum()))

    assert local_batch_slice(16) == slice(0, 16)
