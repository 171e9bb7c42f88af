"""Multi-process (pod-style) launch validation: 2 processes x 4 virtual CPU
devices = one 8-device global mesh over the jax.distributed DCN path — the
cross-host story the single-process virtual mesh cannot cover
(VERDICT round-1 item 10; parity role: the reference's SLURM/deepspeed rank
forking, scripts/mad/stage1_dense.sh:34-35)."""

import os
import socket
import subprocess
import sys

import pytest

CHILD = r"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp

from revisionllm_tpu.parallel.launch import host_shard_indices, initialize_distributed

initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))

# global array sharded over all 8 devices across both processes; psum over
# DCN must see every shard
local = jnp.arange(4, dtype=jnp.float32) + 4 * jax.process_index()
arrs = [jax.device_put(local[i : i + 1], d) for i, d in enumerate(jax.local_devices())]
garr = jax.make_array_from_single_device_arrays(
    (8,), NamedSharding(mesh, P("x")), arrs
)

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(garr))
assert t == sum(range(8)), t

# host_shard_indices covers the work list disjointly
idx = list(host_shard_indices(10))
expected = list(range(0, 5)) if jax.process_index() == 0 else list(range(5, 10))
assert idx == expected, (idx, expected)
print(f"proc {jax.process_index()} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "COORD": f"127.0.0.1:{port}",
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = []
    for pid in range(2):
        env = dict(env_base, PID_IDX=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", CHILD], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
