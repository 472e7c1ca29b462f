"""Worker for the real two-process multi-host test (test_multihost.py).

Run as:  python tests/multiprocess_worker.py <process_id> <coordinator_port>

Each process initializes jax.distributed against a shared coordinator,
forms a global 4-device CPU mesh (2 local virtual devices x 2 processes),
and exercises the production placement layer:

- put_global of a replicated array and a data-sharded batch plan,
- a jitted global-sum over the sharded array (XLA inserts the cross-process
  collective),
- all_processes_agree on matching and deliberately mismatched digests.

Exit code 0 = every assertion held on this process.
"""

import os
import sys

process_id = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=process_id,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trajnetplusplusbaselines_tpu.parallel import multihost as mh

assert jax.process_count() == 2
assert len(jax.devices()) == 4  # global
assert len(jax.local_devices()) == 2

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))

# replicated resident-store placement
arr = np.arange(32, dtype=np.float32).reshape(4, 8)
rep = mh.put_global(NamedSharding(mesh, P()), arr)
assert rep.sharding.is_fully_replicated

# data-sharded plan placement + global reduction through a collective
plan = np.arange(8, dtype=np.float32)
sharded = mh.put_global(NamedSharding(mesh, P("data")), plan)
total = jax.jit(lambda x: jnp.sum(x))(sharded)
assert float(total) == float(plan.sum()), float(total)

# process_slice partitions the dataset list exactly
datasets = [f"d{i}" for i in range(5)]
mine = mh.shard_items(datasets)
sizes = {0: 3, 1: 2}
assert len(mine) == sizes[process_id], mine

# agreement check: identical digests pass...
assert mh.all_processes_agree(np.array([1.0, 2.0]))
# ...divergent digests are detected
assert not mh.all_processes_agree(np.array([float(process_id)]))

# ---- the PRODUCTION resident-epoch trainer over the 2-process mesh ----
# Same seed on both hosts -> identical plans (the digest guard verifies),
# scene axis sharded over all 4 global devices, psum crossing processes.
from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.parallel import make_mesh
from trajnetplusplusbaselines_tpu.trainers.common import make_optimizer, step_lr
from trajnetplusplusbaselines_tpu.trainers.lstm import Trainer


class MiniDataset:
    def __init__(self, n=16, t=21, seed=0):
        rng = np.random.default_rng(seed)
        self.xys = [rng.normal(size=(t, 4, 2)).cumsum(axis=0) * 0.3
                    for _ in range(n)]
        self.goals = [np.zeros((4, 2)) for _ in range(n)]

    def __len__(self):
        return len(self.xys)


model = LSTM(pool=None)
trainer = Trainer(
    model, model.init_params(jax.random.PRNGKey(0)), make_optimizer(),
    step_lr(1e-3, 10), batch_size=8, augment=True, save_every=10**9,
    val_flag=False, seed=7, mesh=make_mesh(4, dp=4, tp=1),
)
ds = MiniDataset()
trainer.train(ds, epoch=0)
losses0 = trainer.train(ds, epoch=1)
leaves = jax.tree.leaves(trainer.params)
assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
# replicated parameters must be IDENTICAL across hosts after the psum chain
digest = np.array([float(np.asarray(l).sum()) for l in leaves])
assert mh.all_processes_agree(digest), "params diverged across hosts"

# ---- multi-host checkpoint save: collective gather + process-0-only write ----
# With tp=2 on the global mesh the TP-sharded weights span devices on BOTH
# processes, so they are not fully addressable from either; save_checkpoint
# must allgather them (utils/checkpoint._to_host) and only process 0 may
# touch the filesystem (concurrent writes to a shared path would corrupt).
import tempfile

from jax.experimental import multihost_utils

trainer_tp = Trainer(
    model, model.init_params(jax.random.PRNGKey(1)), make_optimizer(),
    step_lr(1e-3, 10), batch_size=8, augment=True, save_every=10**9,
    val_flag=False, seed=7, mesh=make_mesh(4, dp=2, tp=2),
)
trainer_tp.train(ds, epoch=0)
w_ih = trainer_tp.params["encoder"]["w_ih"]
assert not w_ih.is_fully_addressable, "expected cross-process TP sharding"

ckpt_path = os.path.join(tempfile.gettempdir(), f"mh_ckpt_{port}.pkl")
if process_id == 0:
    for suffix in ("", ".state"):
        if os.path.exists(ckpt_path + suffix):
            os.remove(ckpt_path + suffix)
multihost_utils.sync_global_devices("ckpt-clean")
trainer_tp.save_checkpoint(epoch=1, filename=ckpt_path)  # collective
multihost_utils.sync_global_devices("ckpt-saved")
assert os.path.exists(ckpt_path) and os.path.exists(ckpt_path + ".state")
from trajnetplusplusbaselines_tpu.utils import checkpoint as ckpt_mod

restored = ckpt_mod.load_predictor(ckpt_path)
expect = np.asarray(multihost_utils.process_allgather(w_ih, tiled=True))
np.testing.assert_allclose(
    np.asarray(restored.params["encoder"]["w_ih"]), expect, atol=0
)

print(f"process {process_id} ok")
