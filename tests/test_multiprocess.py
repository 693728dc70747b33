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


def _run_two_procs(tmp_path, worker_src, timeout=180):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)

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
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} failed:\n{out}\n--- other process:\n"
            f"{outs[1 - pid]}"
        )
    return outs


def test_two_process_distributed_reduction(tmp_path):
    outs = _run_two_procs(tmp_path, _WORKER)
    for pid, out in enumerate(outs):
        assert f"MULTIPROC_OK {pid}" in out, out


# Full TRAINING step across 2 processes x 2 local devices (VERDICT r2 #5):
# every process supplies only its host-local batch shard, the jitted train
# step runs over the global (data=4) mesh with XLA-inserted cross-process
# gradient collectives, and the loss must equal the single-process run on
# the identical full batch.
_TRAIN_WORKER = r"""
import sys

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

from dmmfods_tpu import trainer as trainer_lib
from dmmfods_tpu.config import get_config
from dmmfods_tpu.data.synthetic import make_batch
from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar
from dmmfods_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed(coord, nproc, pid)
assert jax.process_count() == nproc

cfg = get_config("/tmp/mp_train_" + str(pid))
cfg.tpu.compute_dtype = "float32"
cfg.model.growth_rate = 8
cfg.model.block_config = (2, 2, 2, 2)
cfg.model.num_init_features = 16

def barrier(name):
    # coordination-service barrier (NOT a Gloo collective): aligns the two
    # single-core-sharing processes before any Gloo op — Gloo context init
    # has a hard 30 s deadline that model-init skew easily exceeds
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, 560_000)


bundle = densenet121_u_lidar(config=cfg, init_hw=(32, 64))
tx = trainer_lib.make_optimizer(cfg)
state = trainer_lib.create_train_state(bundle, tx)

mesh = mesh_lib.make_mesh(data=jax.device_count())
# no-broadcast replication: each process places its identical local copy
state = mesh_lib.put_replicated_host_local(state, mesh)
barrier("post_init")
step = trainer_lib.make_train_step(bundle.module, tx, cfg, mesh=mesh,
                                   donate=False)

img, lidar, ht = make_batch(batch_size=4, h=32, w=64, seed=5)
lo, hi = pid * 2, (pid + 1) * 2  # this host's local rows of the global batch
local = (np.asarray(img)[lo:hi], np.asarray(lidar)[lo:hi],
         np.asarray(ht)[lo:hi])
barrier("pre_shard")
batch = mesh_lib.shard_host_local_batch(local, mesh)
assert batch[0].shape[0] == 4  # global batch reassembled

# serialize the (minutes-long, single-core) compile through the shared
# persistent cache: pid 0 compiles, pid 1 waits and then hits the cache —
# otherwise the compile-time skew blows the shutdown barrier deadline
from dmmfods_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/mp_train_cache")
if pid == 0:
    compiled = step.lower(state, *batch).compile()
barrier("compile_0")
if pid != 0:
    compiled = step.lower(state, *batch).compile()
barrier("pre_step")
_, metrics = compiled(state, *batch)
print("MP_TRAIN_LOSS", float(metrics["loss"]), flush=True)
barrier("done")
"""


def test_two_process_full_train_step(tmp_path):
    # two full-model train-step compiles contend for this host's single
    # core: ~13 min when the suite runs alongside (passes standalone in
    # ~9); the budget covers the loaded-host case
    outs = _run_two_procs(tmp_path, _TRAIN_WORKER, timeout=1500)
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MP_TRAIN_LOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1]))
    assert losses[0] == losses[1]

    # single-process oracle on the identical full batch
    import numpy as np

    from dmmfods_tpu import trainer as trainer_lib
    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.data.synthetic import make_batch
    from dmmfods_tpu.models.dense_unet_lidar import densenet121_u_lidar

    cfg = get_config(str(tmp_path))
    cfg.tpu.compute_dtype = "float32"
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2, 2, 2)
    cfg.model.num_init_features = 16
    bundle = densenet121_u_lidar(config=cfg, init_hw=(32, 64))
    tx = trainer_lib.make_optimizer(cfg)
    state = trainer_lib.create_train_state(bundle, tx)
    step = trainer_lib.make_train_step(bundle.module, tx, cfg, donate=False)
    img, lidar, ht = make_batch(batch_size=4, h=32, w=64, seed=5)
    _, metrics = step(state, img, lidar, ht)
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-4)


# Full AGENT lifecycle across 2 processes x 2 local devices (VERDICT r3 #4):
# each process's loader supplies only its host-local rows; the Agent's _put
# routes them through shard_host_local_mixed_batch, state placement uses the
# no-broadcast host-local replication, train_one_epoch + validate run over
# the global mesh, and save_checkpoint single-writes from process 0.
_AGENT_WORKER = r"""
import sys

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

from dmmfods_tpu.config import get_config
from dmmfods_tpu.data.synthetic import make_batch
from dmmfods_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed(coord, nproc, pid)
assert jax.process_count() == nproc


def barrier(name):
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, 560_000)


cfg = get_config("/tmp/mp_agent_" + str(pid))
cfg.tpu.compute_dtype = "float32"
cfg.model.growth_rate = 4
cfg.model.block_config = (1, 1, 1, 1)
cfg.model.num_init_features = 8
cfg.agent.max_epoch = 1

# identical global data on both processes; each host feeds its local rows
img, lidar, ht = (np.asarray(a) for a in make_batch(batch_size=4, h=32, w=64, seed=9))
lo, hi = pid * 2, (pid + 1) * 2


class Loader:
    class _It:
        def __init__(self, n):
            self.n = n

        def __iter__(self):
            for _ in range(self.n):
                yield img[lo:hi], lidar[lo:hi], ht[lo:hi]

    train_loader = _It(2)
    valid_loader = _It(1)
    train_iterations = 2
    valid_iterations = 1


from dmmfods_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/mp_agent_cache")

# the constructor overwrites model arch fields; bypass via direct agent
# construction on the tiny config (densenet121_u_lidar force-sets
# growth/block_config — use the module path the agent exposes for tests)
import dmmfods_tpu.models.dense_unet_lidar as dm

orig = dm._dense_u_net_lidar

def tiny_ctor(arch, growth, blocks, init, pretrained, progress, config, **kw):
    return orig(arch, 4, (1, 1, 1, 1), 8, pretrained, progress, config, **kw)

dm.densenet121_u_lidar.__globals__["_dense_u_net_lidar"] = tiny_ctor
from dmmfods_tpu.agents.dense_unet_agent import Dense_U_Net_lidar_Agent

barrier("pre_agent")
agent = Dense_U_Net_lidar_Agent(cfg, torchvision_init=True, data_loader=Loader())
assert agent.mesh is not None and agent.mesh.devices.size == 4
barrier("post_init")

# serialize the single-core COMPILES through the shared persistent cache
# (lower/compile are host-only — no collectives), then EXECUTE the SPMD
# program simultaneously on both processes: in multi-controller JAX every
# process must run the same jitted computation or its collectives hang.
# _put (make_array_from_process_local_data) includes a cross-process
# consistency collective: BOTH processes must call it together
barrier("pre_put")
probe = agent._put((img[lo:hi], lidar[lo:hi], ht[lo:hi]))
if pid == 0:
    agent.train_step.lower(agent.state, *probe).compile()
    agent.eval_step.lower(agent.state, *probe).compile()
barrier("compile_0")
if pid != 0:
    agent.train_step.lower(agent.state, *probe).compile()
    agent.eval_step.lower(agent.state, *probe).compile()
barrier("pre_train")
agent.train()
barrier("trained")

iou = agent.validate()
ap = agent.epoch_ap_per_class
print("MP_AGENT_IOU", " ".join(f"{v:.6f}" for v in np.asarray(iou)), flush=True)
print("MP_AGENT_AP", " ".join(f"{v:.6f}" for v in np.asarray(ap)), flush=True)

# checkpoint: single-writer (process 0); both processes took the epoch loop
import os

ck = os.path.join(cfg.dir.current_run.checkpoints, "checkpoint")
if pid == 0:
    assert os.path.isdir(ck), ck
else:
    assert not os.path.exists(ck)  # non-writer process skipped the write
print("MP_AGENT_OK", pid, flush=True)
barrier("done")
"""


def test_two_process_agent_epoch(tmp_path):
    outs = _run_two_procs(tmp_path, _AGENT_WORKER, timeout=1500)
    ious, aps = [], []
    for pid, out in enumerate(outs):
        assert f"MP_AGENT_OK {pid}" in out, out
        ious.append([l for l in out.splitlines() if l.startswith("MP_AGENT_IOU")][0])
        aps.append([l for l in out.splitlines() if l.startswith("MP_AGENT_AP")][0])
    # the globally-sharded computation must agree across processes
    assert ious[0] == ious[1]
    assert aps[0] == aps[1]
