"""Production-shape multi-chip dryrun (VERDICT weak #7).

`__graft_entry__.dryrun_multichip` proves the sharded train step compiles
and runs on toy sphere meshes; this script repeats the exercise with the
REAL ShapeNet mesh bank, 16 objects per device batch and the production
render size, on the same 8-virtual-device CPU mesh, so the pass means the
production shapes shard sanely (padded mesh-bank gather, per-device batch
slices, sharded raster + VJP).

CPU raster-backward compiles are minutes-slow (see
.claude/skills/verify/SKILL.md), so the render size is CLI-tunable:
  python scripts/dryrun_production.py [render_size] [n_devices]
defaulting to 256 (the inference render size; 768 is the training size —
pass it explicitly when you can afford the compile).
"""
import sys
import time

RENDER = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NDEV = int(sys.argv[2]) if len(sys.argv) > 2 else 8

import __graft_entry__ as g

g._force_cpu_platform(NDEV)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sdn3d_tpu.data.synthetic import make_derender_batch
from sdn3d_tpu.geometry.assets import load_shapenet_bank
from sdn3d_tpu.models.derenderer import Derenderer, DeviceMeshBank, TargetType
from sdn3d_tpu.parallel import make_mesh, shard_batch
from sdn3d_tpu.pipelines.derender import DerenderTrainer

B = 16  # the reference's per-image object cap (geometric/scripts/main.py:812)

full = load_shapenet_bank("/root/reference/geometric/assets")
# Subsample faces uniformly for the CPU compile; keeps the real vertex
# streams + padded-slot bank layout that production sharding must handle.
# Rebuild (don't mutate) so face_valid/adjacency stay consistent.
from sdn3d_tpu.geometry.assets import build_mesh_bank
meshes = [(full.vertices[m, :full.num_vertices[m]],
           full.faces[m, :full.num_faces[m]][::8])
          for m in range(full.num_meshes)]
bank_host = build_mesh_bank(meshes)
bank = DeviceMeshBank.from_host(bank_host)

model = Derenderer(num_classes=8)
trainer = DerenderTrainer(model=model, bank=bank, mode=TargetType.full,
                          image_size=224, render_size=RENDER)
batch_np = make_derender_batch(B, 224)
batch_np["masks"] = np.zeros((B, 1, RENDER, RENDER), np.float32)
batch_np["ignores"] = np.zeros_like(batch_np["masks"])
batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

mesh = make_mesh(NDEV)
state = trainer.init(jax.random.PRNGKey(0), batch)
state = jax.device_put(state, NamedSharding(mesh, P()))
dbank = jax.device_put(bank, NamedSharding(mesh, P()))
batch = shard_batch(batch, mesh)

train_step = jax.jit(trainer.make_train_step())
t0 = time.time()
new_state, losses = train_step(state, batch, jax.random.PRNGKey(1), dbank)
jax.block_until_ready(losses)
t1 = time.time()
assert all(np.isfinite(np.asarray(v)) for v in losses.values()), losses
print(f"PRODUCTION DRYRUN OK: render={RENDER} n_devices={NDEV} "
      f"B={B} real-bank faces={int(bank_host.num_faces.max())} "
      f"compile+step={t1 - t0:.1f}s "
      f"losses={{{', '.join(f'{k}={float(v):.4f}' for k, v in losses.items())}}}")
