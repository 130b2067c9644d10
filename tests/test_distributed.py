"""Multi-host exercise: a real 2-process jax.distributed CPU cluster.

parallel/distributed.py wraps jax.distributed.initialize for multi-host
runs (SURVEY.md §2.2 — the comm-backend replacement covers DCN/multi-host),
but nothing on one TPU chip exercises it. This test spawns two REAL
processes on this box that form a distributed cluster (coordinator on
localhost), build the global mesh across both processes' virtual CPU
devices, and run a shard_map'd psum whose reduction crosses the process
boundary — the same control plane a real multi-host (DCN) deployment uses.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
pid = int(sys.argv[1]); port = sys.argv[2]

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nerf_shared_tpu.parallel import distributed
import pytest

# spawns a 2-process jax.distributed cluster (fresh backend inits)
pytestmark = pytest.mark.slow


distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 8

mesh = distributed.global_mesh(("data",))
assert mesh.devices.size == 8

# global [8, 4] array, 4 rows local to each process; the psum reduces
# across BOTH processes (gloo collective over the distributed runtime)
local = np.full((4, 4), pid + 1.0, np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, global_shape=(8, 4))
f = jax.jit(jax.shard_map(
    lambda x: jax.lax.psum(jnp.sum(x), "data"),
    mesh=mesh, in_specs=P("data"), out_specs=P()))
out = f(arr)
# fully replicated result: each process reads its own addressable copy
val = float(np.asarray(out.addressable_data(0)))
# sum = 4*4*1 + 4*4*2 = 48 — correct ONLY if the cross-process psum ran
print(f"RESULT {pid} {val}", flush=True)
assert val == 48.0, val
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"RESULT {pid} 48.0" in out, out
