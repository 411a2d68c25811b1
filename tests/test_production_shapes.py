"""Production-shape multi-device CI tier (VERDICT r2 item 8).

`scripts/dryrun_production.py` (16 objects, 256^2, full donor bank,
~2900 s CPU compile) is a manual check; this is its always-run sibling:
REAL ShapeNet car meshes (uniform face subsample keeps the true vertex
streams and the padded-slot bank layout), an 8-virtual-device CPU mesh,
one full-mode train step, every loss finite — bounded to fit the slow
tier.  What it pins beyond the sphere-bank dryrun (__graft_entry__):
the padded MESH-BANK gather at heterogeneous real face counts shards
and differentiates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

SHAPENET = "/root/reference/geometric/assets"


def test_real_bank_sharded_train_step():
    import os

    if not os.path.isdir(SHAPENET):
        pytest.skip("reference ShapeNet assets not mounted")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdn3d_tpu.data.synthetic import make_derender_batch
    from sdn3d_tpu.geometry.assets import build_mesh_bank, \
        load_shapenet_bank
    from sdn3d_tpu.models.derenderer import (Derenderer, DeviceMeshBank,
                                             TargetType)
    from sdn3d_tpu.parallel import make_mesh, shard_batch
    from sdn3d_tpu.pipelines.derender import DerenderTrainer

    B, RENDER, IMAGE = 8, 96, 64
    full = load_shapenet_bank(SHAPENET)
    meshes = [(full.vertices[m, :full.num_vertices[m]],
               full.faces[m, :full.num_faces[m]][::16])
              for m in range(full.num_meshes)]
    bank_host = build_mesh_bank(meshes)
    assert int(bank_host.num_faces.max()) > 1000   # real-car face scale
    bank = DeviceMeshBank.from_host(bank_host)

    model = Derenderer(num_classes=full.num_meshes)
    trainer = DerenderTrainer(model=model, bank=bank,
                              mode=TargetType.full,
                              image_size=IMAGE, render_size=RENDER)
    batch_np = make_derender_batch(B, IMAGE)
    batch_np["masks"] = np.zeros((B, 1, RENDER, RENDER), np.float32)
    batch_np["masks"][:, :, RENDER // 4:-RENDER // 4,
                      RENDER // 4:-RENDER // 4] = 1.0
    batch_np["ignores"] = np.zeros_like(batch_np["masks"])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    mesh = make_mesh(8)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    dbank = jax.device_put(bank, NamedSharding(mesh, P()))
    sharded = shard_batch(batch, mesh)

    step = jax.jit(trainer.make_train_step())
    new_state, losses = step(state, sharded, jax.random.PRNGKey(1), dbank)
    jax.block_until_ready(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(new_state.step) == 1
