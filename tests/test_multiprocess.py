"""Multi-process distributed smoke test (SURVEY.md §5.8).

Everything else validates sharding on one process with 8 virtual devices;
this test actually runs TWO OS processes through
``parallel.mesh.initialize_distributed`` + ``shard_host_local_batch`` —
JAX's local multi-process CPU mode — and reduces a globally-sharded array
across them, so the multi-host input path has at least one executed test
(each process contributes only its local shard; the jitted sum needs a
cross-process collective).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = r"""
import sys

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from dmmfods_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed(coord, nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

mesh = mesh_lib.make_mesh(data=jax.device_count())
# per-host local shard: process i supplies rows filled with (i + 1)
local = np.full((2, 4), float(pid + 1), np.float32)
(batch,) = mesh_lib.shard_host_local_batch((local,), mesh)
assert batch.shape == (2 * nproc, 4), batch.shape

total = jax.jit(jnp.sum)(batch)  # cross-process reduction
expected = 2 * 4 * 1.0 + 2 * 4 * 2.0
assert abs(float(total) - expected) < 1e-5, float(total)
print("MULTIPROC_OK", pid, flush=True)
"""


def test_two_process_distributed_reduction(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIPROC_OK {pid}" in out, out
