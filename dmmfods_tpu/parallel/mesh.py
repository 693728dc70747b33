"""Device mesh + sharding rules — the distributed backend.

The reference has no multi-device execution at all (its
``torch.distributed`` import is dead code, reference
``Dense_U_Net_lidar.py:7``; SURVEY.md §2.3/§2.4). This module is the
first-class TPU-native replacement: a ``jax.sharding.Mesh`` with a ``data``
axis (batch / data parallelism over ICI) and a ``model`` axis
(output-channel tensor parallelism for the wide decoder convs), plus helpers
that produce ``NamedSharding`` trees for params, optimizer state and batches.
XLA inserts the collectives (gradient ``psum`` over ``data``, activation
``all_gather`` around channel-sharded convs) from these annotations.

Multi-host: ``initialize_distributed`` wraps ``jax.distributed.initialize``
so the same mesh spans slices over DCN.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (no-op when single-process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(config=None, *, data=None, spatial=None, model=None, devices=None) -> Mesh:
    """Build a ``(data, spatial, model)`` mesh from ``config.tpu.mesh`` or
    overrides.

    ``data == -1`` (default) consumes all devices left after the other axes.
    Axis order puts ``model`` innermost so tensor-parallel collectives ride
    the fastest ICI links; ``spatial`` (image-H sharding — the conv net's
    sequence-parallel analogue, SURVEY.md §5.7) sits between.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if config is not None:
        mesh_cfg = config.tpu.mesh
        data = mesh_cfg.data if data is None else data
        spatial = mesh_cfg.get("spatial", 1) if spatial is None else spatial
        model = mesh_cfg.model if model is None else model
    model = 1 if model in (None, -1) else int(model)
    spatial = 1 if spatial in (None, -1) else int(spatial)
    data = int(data) if data not in (None, -1) else n // (model * spatial)
    if data * spatial * model > n:
        raise ValueError(
            f"mesh {data}x{spatial}x{model} needs more than the {n} available devices"
        )
    # Size-1 axes are dropped: XLA's SPMD partitioner handles a degenerate
    # mesh dimension pathologically (observed: a (4,1,2) mesh takes >10x
    # longer to compile the train step than the equivalent (4,2)). Sharding
    # helpers below only reference axes present in the mesh.
    axes = [(name, size) for name, size in
            (("data", data), ("spatial", spatial), ("model", model)) if size > 1]
    if not axes:
        axes = [("data", 1)]
    total = 1
    for _, size in axes:
        total *= size
    dev_array = np.asarray(devices[:total]).reshape([size for _, size in axes])
    return Mesh(dev_array, axis_names=tuple(name for name, _ in axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch over ``data`` and image rows over ``spatial`` (no-op when
    the spatial axis has size 1)."""
    return NamedSharding(mesh, batch_spec(mesh))


def batch_spec(mesh: Mesh | None = None) -> P:
    if mesh is None:
        return P("data")
    data = "data" if "data" in mesh.shape else None
    if mesh.shape.get("spatial", 1) > 1:
        return P(data, "spatial")
    return P(data)


def param_partition_spec(path_names, leaf, mesh: Mesh, threshold: int = 256) -> P:
    """Tensor-parallel rule for one param leaf.

    Conv kernels are HWIO; shard the O (output-channel) axis over ``model``
    when it is wide enough and divisible. Everything else (BN scales, narrow
    convs) is replicated — at this model scale replication is free and keeps
    collectives off the critical path.
    """
    model_size = mesh.shape.get("model", 1)
    if model_size == 1:
        return P()
    if leaf.ndim == 4 and path_names and path_names[-1] == "kernel":
        out_ch = leaf.shape[-1]
        if out_ch >= threshold and out_ch % model_size == 0:
            return P(None, None, None, "model")
    return P()


def make_param_shardings(params, mesh: Mesh, threshold: int = 256):
    """``NamedSharding`` tree for a param/batch-stats pytree."""

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        return NamedSharding(mesh, param_partition_spec(names, leaf, mesh, threshold))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated_host_local(tree, mesh: Mesh):
    """Replicate host-local values onto every device of a (possibly
    multi-process) mesh WITHOUT any cross-process broadcast: each process
    places its own copy on its addressable devices and the global array is
    assembled from the local shards. Values must be identical across
    processes (e.g. same-seed model init) — this is the multi-host
    replication idiom; a plain ``device_put`` onto a multi-process sharding
    triggers one Gloo/ICI broadcast rendezvous per leaf (hundreds for a
    param tree), which both wastes interconnect and can blow the collective
    deadline when hosts are skewed."""
    sharding = replicated(mesh)
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]

    def put(x):
        x = np.asarray(x)
        bufs = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, bufs)

    return jax.tree_util.tree_map(put, tree)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_mixed_batch(batch, mesh: Mesh):
    """Raw-record batches mix image tensors with point/box buffers: 4-D
    image-like leaves take the full ``(data, spatial)`` spec, everything
    else (padded points, box tables, valid counts) is sharded on the batch
    axis alone — a spatial axis must never split a point buffer's N dim.
    Identical to :func:`shard_batch` for all-dense batches."""
    img_sharding = batch_sharding(mesh)
    data_only = NamedSharding(
        mesh, P("data" if "data" in mesh.shape else None)
    )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, img_sharding if getattr(x, "ndim", 0) == 4 else data_only
        ),
        batch,
    )


def _require_data_axis(mesh: Mesh):
    """Host-local input stitching is only meaningful when the batch is split
    over a ``data`` axis: each host supplies its LOCAL rows, so a replicated
    (``P(None)``) placement would silently treat one host's slice as the
    whole global array. Fail loudly instead."""
    if "data" not in mesh.shape:
        raise ValueError(
            "multi-process input sharding needs a 'data' axis in the mesh "
            f"(got axes {tuple(mesh.shape)}); per-host batch slices cannot "
            "be placed replicated — each host only holds its local rows"
        )


def shard_host_local_batch(batch, mesh: Mesh):
    """Multi-host input path: each host supplies its *local* slice of the
    global batch and the pieces are stitched into one global sharded array
    (the moral successor of per-worker DataLoader shards; SURVEY.md §5.8).

    On a single host this is identical to :func:`shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    _require_data_axis(mesh)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def shard_host_local_mixed_batch(batch, mesh: Mesh):
    """Multi-host twin of :func:`shard_mixed_batch`: each host supplies its
    *local* rows of the global batch; image-like (4-D) leaves take the full
    ``(data, spatial)`` spec, point/box buffers shard on batch only. This is
    what the Agent's ``_put`` uses when ``jax.process_count() > 1`` — the
    per-host data loader feeds host-local shards, never the global batch."""
    if jax.process_count() == 1:
        return shard_mixed_batch(batch, mesh)
    _require_data_axis(mesh)
    img_sharding = batch_sharding(mesh)
    data_only = NamedSharding(mesh, P("data"))

    def put(x):
        x = np.asarray(x)
        sharding = img_sharding if x.ndim == 4 else data_only
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def place_replicated_state(tree, mesh: Mesh):
    """Replicate a state pytree onto the mesh, choosing the no-broadcast
    host-local path under multi-process execution (see
    :func:`put_replicated_host_local`)."""
    if jax.process_count() > 1:
        return put_replicated_host_local(tree, mesh)
    return jax.device_put(tree, replicated(mesh))


def make_state_shardings(state, mesh: Mesh, threshold: int = 256):
    """``NamedSharding`` tree for a WHOLE train-state pytree (params +
    batch_stats + opt_state): any 4-D leaf whose path ends in ``kernel``
    follows the tensor-parallel rule of :func:`param_partition_spec` —
    which automatically catches Adam's ``mu``/``nu`` mirrors of the param
    tree (their leaf paths retain the param names) — and everything else
    (BN stats, scalars, hyperparams) replicates."""

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        return NamedSharding(mesh, param_partition_spec(names, leaf, mesh, threshold))

    return jax.tree_util.tree_map_with_path(spec_for, state)


def place_state(state, mesh: Mesh, threshold: int = 256):
    """Place a train state on the mesh with the placement the mesh CONFIG
    implies: tensor-parallel (out-channel-sharded conv kernels + matching
    optimizer moments) when the mesh has a ``model`` axis, replicated
    otherwise. This is what the Agent routes through — a user configuring
    ``config.tpu.mesh.model > 1`` gets sharded compute, not silently
    replicated params (VERDICT r4 #4)."""
    if mesh.shape.get("model", 1) > 1:
        shardings = make_state_shardings(state, mesh, threshold)
        if jax.process_count() > 1:
            # no-broadcast multi-host placement: every process holds the
            # full (identical) host value; each fills only its local shards
            def put(x, sharding):
                x = np.asarray(x)
                return jax.make_array_from_callback(
                    x.shape, sharding, lambda idx: x[idx]
                )

            return jax.tree_util.tree_map(put, state, shardings)
        return jax.device_put(state, shardings)
    return place_replicated_state(state, mesh)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel analogue for the conv U-Net (SURVEY.md §5.7): shard
    the image H axis over the ``spatial`` mesh dim; XLA inserts the halo
    exchanges the 3x3/5x5/7x7 convs need. Use with high-resolution inputs
    whose activations don't fit one chip."""
    return NamedSharding(mesh, P("data", "spatial"))


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
