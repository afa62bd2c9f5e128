"""Distributed-runtime seam (parallel/distributed.py): the full
initialize -> global mesh -> sharded search path, run in a SUBPROCESS so
jax.distributed doesn't contaminate this test process' runtime. Only one
host exists in this environment, so num_processes=1 exercises the real
coordinator handshake + global device list; multi-DEVICE semantics are
covered by the 8-device virtual mesh in test_parallel.py and the
driver's dryrun_multichip."""
import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os, sys
sys.path.insert(0, %(repo)r)
import numpy as np
from vectorsearch_tpu.parallel.distributed import (
    global_mesh, maybe_initialize, put_sharded,
)

# real coordinator handshake, single process
assert maybe_initialize("127.0.0.1:%(port)d", num_processes=1, process_id=0)
assert maybe_initialize("127.0.0.1:%(port)d") is True  # idempotent
assert jax.process_count() == 1

mesh = global_mesh()
assert mesh.devices.size == len(jax.devices())

# sharded index over the global mesh end-to-end
from vectorsearch_tpu.parallel import ShardedFlat
from vectorsearch_tpu.quant import layout

rng = np.random.default_rng(0)
v = rng.normal(size=(64, 32)).astype(np.float32)
packed = layout.pack_float(v)
idx = ShardedFlat.build(mesh, packed, np.arange(1, 65, dtype=np.int64))
s, ids = idx.search(v[:3], k=5, chunk=64)
assert (ids[:, 0] == [1, 2, 3]).all(), ids[:, 0]

# put_sharded places through the addressable path on one host
from vectorsearch_tpu.parallel.mesh import row_sharding
arr = put_sharded(np.ones((mesh.devices.size * 2, 4), np.float32), row_sharding(mesh))
assert arr.shape == (mesh.devices.size * 2, 4)
print("DISTRIBUTED_OK")
"""


def test_initialize_and_sharded_search(unused_tcp_port_factory=None):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": os.getcwd(), "port": port}],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.getcwd(),
    )
    assert "DISTRIBUTED_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
