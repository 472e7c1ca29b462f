"""Multi-host input-sharding layer (parallel/multihost.py).

Three layers of proof: (a) put_global is bit-identical to device_put on a
(4, 2) virtual mesh for every sharding the trainers use, including the
callback path multi-host placement takes; (b) the process_slice arithmetic
that decides which work each host owns is a balanced exact partition for
any (n, process_count); and (c) test_real_two_process_runtime spawns TWO
actual JAX processes with jax.distributed over a local coordinator and runs
placement, a cross-process collective, and the agreement check for real.
"""

import os
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from trajnetplusplusbaselines_tpu.parallel import make_mesh
from trajnetplusplusbaselines_tpu.parallel import multihost as mh


def _shardings(mesh):
    return [
        NamedSharding(mesh, P()),  # replicated resident store
        NamedSharding(mesh, P(None, "data")),  # batch plan [nb, S]
        NamedSharding(mesh, P("data")),  # scene-leading arrays
        NamedSharding(mesh, P(None, "model")),  # TP weight layout
    ]


def test_put_global_matches_device_put():
    mesh = make_mesh(8, dp=4, tp=2)
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(8, 16)).astype(np.float32)
    for sh in _shardings(mesh):
        a = mh.put_global(sh, arr)
        b = jax.device_put(arr, sh)
        assert a.sharding.is_equivalent_to(b.sharding, arr.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_put_global_callback_path_single_process():
    # force the make_array_from_callback branch (what multi-host runs) and
    # check it builds the same global value as device_put
    mesh = make_mesh(8, dp=4, tp=2)
    arr = np.arange(8 * 16, dtype=np.int32).reshape(8, 16)
    for sh in _shardings(mesh):
        built = jax.make_array_from_callback(
            arr.shape, sh, lambda index: jnp.asarray(arr[index])
        )
        np.testing.assert_array_equal(np.asarray(built), arr)


def test_put_global_tree():
    mesh = make_mesh(8, dp=8, tp=1)
    repl = NamedSharding(mesh, P())
    tree = {"w": np.ones((4, 4), np.float32), "b": np.zeros((4,), np.float32)}
    out = mh.put_global_tree(lambda leaf: repl, tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])


def test_process_slice_partitions_exactly():
    for n in [0, 1, 5, 8, 13, 100, 2063]:
        for pc in [1, 2, 3, 4, 8, 12]:
            slices = [mh.process_slice(n, pi, pc) for pi in range(pc)]
            covered = []
            for s in slices:
                covered.extend(range(n)[s])
            assert covered == list(range(n)), (n, pc)
            sizes = [len(range(n)[s]) for s in slices]
            assert max(sizes) - min(sizes) <= 1, (n, pc)


def test_shard_items_uses_runtime_process_info():
    items = list(range(10))
    # single-process runtime: this process owns everything
    assert list(mh.shard_items(items)) == items
    # explicit override mimics a 3-host pod
    parts = [list(mh.shard_items(items, pi, 3)) for pi in range(3)]
    assert [len(p) for p in parts] == [4, 3, 3]
    assert sum(parts, []) == items


def test_all_processes_agree_single_process():
    assert mh.all_processes_agree(np.arange(5))


def test_resident_place_is_multihost_path():
    # ResidentDataset.place routes through put_global; resident arrays stay
    # bit-identical and fully replicated on the mesh
    from trajnetplusplusbaselines_tpu.trainers.common import ResidentDataset

    class FakeDataset:
        xys = [np.cumsum(np.ones((21, 3, 2), np.float32), 0) * (i + 1)
               for i in range(5)]
        goals = [np.zeros((3, 2), np.float32) for _ in range(5)]

    mesh = make_mesh(8, dp=8, tp=1)
    res = ResidentDataset(FakeDataset())
    before = {k: np.asarray(v["xs"]) for k, v in res.buckets.items()}
    res.place(mesh)
    for key, data in res.buckets.items():
        assert data["xs"].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(data["xs"]), before[key])


def test_real_two_process_runtime():
    """Spawn TWO actual JAX processes (jax.distributed over a local
    coordinator, CPU backend): put_global, a cross-process collective, the
    dataset slicing, and the agreement check all run for real."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"process {pid} ok" in out
