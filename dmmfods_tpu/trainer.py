"""Jit-compiled train / eval steps.

Replaces the reference's per-iteration Python hot loop
(``dmmfods/agents/Dense_U_Net_lidar_Agent.py:215-307``) with single fused XLA
programs: forward + BCE loss + backward + Adam update + *all metrics* execute
on device in one ``jit``; the host only feeds batches and drains small metric
arrays. Data parallelism comes from sharded batch inputs over the mesh's
``data`` axis (gradients are reduced by XLA-inserted collectives); tensor
parallelism from channel-sharded param annotations (see ``parallel.mesh``).

Training objective: sum-reduced BCE-with-logits — the exact reference
objective (agent:247-264). Per-step metrics reproduce the reference taxonomy
(loss / IoU / NaN-count / accuracy per class; agent:248-260) including the
raw-logit-threshold quirk (agent:252).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from . import losses, metrics
from .parallel import mesh as mesh_lib


class TrainState(struct.PyTreeNode):
    """Device-resident training state (a pytree; counters live on the host
    Agent as in the reference)."""

    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config) -> optax.GradientTransformation:
    """Adam with the reference hyperparams (helper.py:146-159), learning rate
    injected so the Agent can apply StepLR-style epoch decay without
    recompiling (reference agent:297-298)."""
    opt = config.optimizer
    if opt.get("amsgrad", False):
        base = optax.amsgrad
    else:
        base = optax.adam
    tx = optax.inject_hyperparams(base)(
        learning_rate=opt.learning_rate, b1=opt.beta1, b2=opt.beta2, eps=opt.eps
    )
    if opt.get("weight_decay", 0):
        tx = optax.chain(optax.add_decayed_weights(opt.weight_decay), tx)
    return tx


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate (StepLR semantics, host-side)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def create_train_state(bundle, tx) -> TrainState:
    variables = bundle.variables
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def _step_metrics(logits, ht_map, elementwise_loss, iou_threshold):
    """The reference per-iteration metric set, computed in-graph
    (agent:248-260). All outputs are small (C,)-shaped arrays."""
    loss_per_class = losses.per_class_loss(elementwise_loss)
    iou_inst = metrics.compute_iou_batch(logits, ht_map, iou_threshold)  # logits quirk
    iou_per_class, iou_nans = metrics.aggregate_iou(iou_inst)
    acc_per_class = metrics.compute_accuracy(ht_map, logits, iou_threshold)
    return {
        "loss_per_class": loss_per_class,
        "iou_per_class": iou_per_class,
        "iou_nans": iou_nans,
        "acc_per_class": acc_per_class,
    }


def make_train_step(module, tx, config, *, loss_fn: Optional[Callable] = None,
                    mesh=None, donate=True):
    """Build the jitted train step:
    ``(state, rgb, lidar, ht_map) -> (state, metrics)``."""
    # the per-class logging breakdown is the elementwise form of the SAME
    # objective being optimized (not always BCE) — scalar loss is its sum
    elementwise_fn = (
        losses.make_elementwise_loss_fn(config) if loss_fn is None else None
    )
    iou_threshold = config.agent.iou_threshold
    single_stream = config.model.stream_2_in_channels == 0

    def step(state: TrainState, rgb, lidar, ht_map):
        if mesh is not None:
            constraint = jax.sharding.NamedSharding(mesh, mesh_lib.batch_spec(mesh))
            rgb = jax.lax.with_sharding_constraint(rgb, constraint)
            if lidar is not None:
                lidar = jax.lax.with_sharding_constraint(lidar, constraint)
            ht_map = jax.lax.with_sharding_constraint(ht_map, constraint)

        def loss_and_aux(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = module.apply(
                variables, rgb, None if single_stream else lidar, True,
                mutable=["batch_stats"],
            )
            logits = logits.astype(jnp.float32)
            if elementwise_fn is not None:
                elementwise = elementwise_fn(logits, ht_map)
                loss = jnp.sum(elementwise)
            else:
                elementwise = losses.bce_with_logits(logits, ht_map)
                loss = loss_fn(logits, ht_map)
            return loss, (logits, elementwise, mutated["batch_stats"])

        (loss, (logits, elementwise, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step_metrics = _step_metrics(logits, ht_map, elementwise, iou_threshold)
        step_metrics["loss"] = loss
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt_state
        )
        return new_state, step_metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(module, config, *, loss_fn: Optional[Callable] = None, mesh=None):
    """Build the jitted eval step:
    ``(state, rgb, lidar, ht_map) -> metrics`` (running stats frozen,
    reference ``validate`` agent:309-398)."""
    elementwise_fn = (
        losses.make_elementwise_loss_fn(config) if loss_fn is None else None
    )
    iou_threshold = config.agent.iou_threshold
    single_stream = config.model.stream_2_in_channels == 0

    def step(state: TrainState, rgb, lidar, ht_map):
        if mesh is not None:
            constraint = jax.sharding.NamedSharding(mesh, mesh_lib.batch_spec(mesh))
            rgb = jax.lax.with_sharding_constraint(rgb, constraint)
            if lidar is not None:
                lidar = jax.lax.with_sharding_constraint(lidar, constraint)
            ht_map = jax.lax.with_sharding_constraint(ht_map, constraint)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = module.apply(
            variables, rgb, None if single_stream else lidar, False
        ).astype(jnp.float32)
        if elementwise_fn is not None:
            elementwise = elementwise_fn(logits, ht_map)
            loss = jnp.sum(elementwise)
        else:
            elementwise = losses.bce_with_logits(logits, ht_map)
            loss = loss_fn(logits, ht_map)
        step_metrics = _step_metrics(logits, ht_map, elementwise, iou_threshold)
        step_metrics["loss"] = loss
        # heat-map AP (probability domain) — the benchmark-grade metric the
        # north star tracks alongside the reference's thresholded IoU
        step_metrics["ap_per_class"] = metrics.heatmap_average_precision(ht_map, logits)
        # fixed-size score-histogram contribution for the DATASET-level
        # pooled AP (a mean of per-batch APs is not the val-set AP; the
        # host merges these integer counts and finishes the PR curve once
        # per epoch — metrics.StreamingAP)
        step_metrics["ap_bin_counts"] = metrics.binned_ap_counts(ht_map, logits)
        return step_metrics

    return jax.jit(step)


def make_train_step_raw(module, tx, config, *, mesh=None, donate=True,
                        full_height=1280, full_width=1920,
                        splat_mode="nearest_pooled"):
    """Train step with *device-side preprocessing fused in* (the north-star
    replacement for the reference's offline per-sample ETL, SURVEY.md §3.5):

    ``(state, image, points, num_valid, boxes) -> (state, metrics)``

    where ``points (B, N, 3)`` / ``num_valid (B,)`` are padded LiDAR point
    buffers and ``boxes (B, M, 5)`` padded label boxes. The LiDAR splat +
    binning + pooling and the heat-map rasterization run inside the same XLA
    program as forward/backward — host->HBM transfer is raw points + boxes
    (tens of KB) instead of dense images.
    """
    from .ops import preprocess as pp

    base_step = make_train_step(module, tx, config, mesh=mesh, donate=donate)
    rasterize = _make_heatmap_rasterizer(full_height, full_width)

    def step(state, image, points, num_valid, boxes):
        lidar = jax.vmap(
            lambda p, n: pp.lidar_points_to_model_input(
                p, n, full_height, full_width, mode=splat_mode
            )
        )(points, num_valid)
        return base_step(state, image, lidar, rasterize(image, boxes))

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _make_heatmap_rasterizer(full_height, full_width):
    """In-graph GT heat-map rasterization from padded label boxes — the
    device-side half of raw-record preprocessing (the reference stores these
    maps offline, helper.py:643-646). Box-structured (no scatter): measured
    ~0.1 ms per 32x64-box batch on v5e."""
    from .ops import preprocess as pp

    def rasterize(image, boxes):
        out_h, out_w = image.shape[1], image.shape[2]
        pool = full_height // out_h
        return jax.vmap(
            lambda b: pp.rasterize_heatmaps_direct(b, out_h, out_w, pool)
        )(boxes)

    return rasterize


def make_train_step_ht(module, tx, config, *, mesh=None, donate=True,
                       full_height=1280, full_width=1920):
    """Train step for host-splat raw-record training:

    ``(state, image, lidar, boxes) -> (state, metrics)``

    The LiDAR splat already happened on the host runtime
    (``data/host_preprocess.py``, overlapped in prefetch threads); the GT
    heat maps are rasterized here in-graph from the padded boxes, so raw
    records never store dense targets. This is the default
    ``tpu.device_preprocess`` path (``tpu.splat = 'host'``).
    """
    base_step = make_train_step(module, tx, config, mesh=mesh, donate=donate)
    rasterize = _make_heatmap_rasterizer(full_height, full_width)

    def step(state, image, lidar, boxes):
        return base_step(state, image, lidar, rasterize(image, boxes))

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step_ht(module, config, *, mesh=None,
                      full_height=1280, full_width=1920):
    """Eval twin of :func:`make_train_step_ht`:
    ``(state, image, lidar, boxes) -> metrics``."""
    base_step = make_eval_step(module, config, mesh=mesh)
    rasterize = _make_heatmap_rasterizer(full_height, full_width)

    def step(state, image, lidar, boxes):
        return base_step(state, image, lidar, rasterize(image, boxes))

    return jax.jit(step)


def make_eval_step_raw(module, config, *, mesh=None,
                       full_height=1280, full_width=1920,
                       splat_mode="nearest_pooled"):
    """Eval twin of :func:`make_train_step_raw` (fully device-side
    preprocessing): ``(state, image, points, num_valid, boxes) -> metrics``."""
    from .ops import preprocess as pp

    base_step = make_eval_step(module, config, mesh=mesh)
    rasterize = _make_heatmap_rasterizer(full_height, full_width)

    def step(state, image, points, num_valid, boxes):
        lidar = jax.vmap(
            lambda p, n: pp.lidar_points_to_model_input(
                p, n, full_height, full_width, mode=splat_mode
            )
        )(points, num_valid)
        return base_step(state, image, lidar, rasterize(image, boxes))

    return jax.jit(step)


def make_forward(module, config, *, train=False):
    """Jitted inference forward: ``(variables, rgb, lidar) -> logits``."""
    single_stream = config.model.stream_2_in_channels == 0

    @jax.jit
    def forward(variables, rgb, lidar=None):
        return module.apply(variables, rgb, None if single_stream else lidar, False)

    return forward
