"""Table-driven description of the model's lowering policy.

The model's lowering gates (rows-as-batch zones, Pallas strip kernels, s2d
stem, phase-head impl, continuous rows region — see :class:`ModelSpec`'s
field docs and BASELINE.md for the measurements behind each) are evaluated
per component at trace time. This module computes the SAME decisions ahead of
time for a given ``(spec, batch, height, width, train, backend)`` so they can
be inspected (``cli policy``), asserted in tests, and reviewed as one table
instead of being scattered across call sites.

The predicates here mirror the model's exactly — the shared module-level
gates (:func:`.dense_unet_lidar._rows_ok`, :func:`.dense_unet_lidar._region_active`,
:func:`.dense_unet_lidar._stem_pool_ok`) are imported, and the per-component
conditions restate the inline expressions (anchored by
``tests/test_model.py::test_lowering_policy_*`` sweeps: the described policy
must produce the numerics of the canonical lowering at every zone).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def plane_schedule(spec, height: int, width: int) -> Dict[str, Any]:
    """Spatial plane sizes through the encoder for an ``(height, width)``
    input: the stem halves (conv0 s2), pool0 halves again, and each
    transition halves between dense blocks."""
    planes = {"input": (height, width), "stem": (height // 2, width // 2)}
    ph, pw = height // 4, width // 4
    blocks = []
    for i in range(len(spec.block_config)):
        blocks.append((ph, pw))
        if i != len(spec.block_config) - 1:
            ph, pw = ph // 2, pw // 2
    planes["blocks"] = blocks
    return planes


def _zone(spec, px: int) -> str:
    if px >= spec.rows_min_pixels:
        return "big"
    if px <= spec.rows_small_max_pixels:
        return "small"
    return "mid"


def describe(spec, batch: int, height: int, width: int, *,
             train: bool = False, backend: str | None = None) -> Dict[str, Any]:
    """The lowering decision table: one entry per component.

    ``backend``: 'tpu' | 'cpu' | None (None = the current default backend).
    Pallas kernels that gate on-TPU ('auto') resolve against it.
    """
    from . import dense_unet_lidar as m

    if backend is None:
        backend = jax.default_backend()
    on_tpu = backend == "tpu"
    sched = plane_schedule(spec, height, width)
    dtype_bytes = jnp.dtype(spec.dtype).itemsize

    region = m._region_active(spec, batch, height, width, train)
    rows_ok = m._rows_ok(spec, batch, train)
    stem_fuse = (not region
                 and m._stem_pool_ok(spec, batch, height, width,
                                     spec.network_input_channels, train,
                                     backend=backend))

    # --- stem -------------------------------------------------------------
    use_s2d = (spec.s2d_stem is True
               or (spec.s2d_stem == "auto" and height * width >= 262144))
    use_s2d = use_s2d and height % 2 == 0 and width % 2 == 0
    if stem_fuse:
        stem = "pallas_stem_pool"
    elif use_s2d and rows_ok and not train and batch <= spec.rows_max_batch \
            and not region:
        stem = "s2d_rows"
    elif use_s2d:
        stem = "s2d"
    else:
        stem = "conv7x7_s2"

    # --- pool0 ------------------------------------------------------------
    sh, sw = sched["stem"]
    px0 = sh * sw
    if stem_fuse:
        pool0 = "fused_into_stem"
    elif region:
        pool0 = "rows_region"
    elif rows_ok and sh % 2 == 0 and _zone(spec, px0) != "mid":
        pool0 = "rows"
    else:
        pool0 = "maxpool_3x3_s2"

    # --- dense blocks + transitions ----------------------------------------
    blocks: List[Dict[str, Any]] = []
    num_features = spec.num_init_features
    for i, (num_layers, (ph, pw)) in enumerate(
            zip(spec.block_config, sched["blocks"]), start=1):
        px = ph * pw
        c0 = num_features
        entry = {"block": i, "plane": (ph, pw), "zone": _zone(spec, px),
                 "channels_in": c0}
        impl = spec.impl_for_block(i - 1)
        strip_sel = str(spec.dense_block_strip).strip().lower()
        strip_on = (strip_sel not in ("", "off", "none") and not train
                    and not region
                    and spec.drop_rate == 0 and px >= spec.rows_min_pixels
                    and (strip_sel != "auto" or on_tpu))
        if strip_on:
            from ..ops.pallas.dense_block_strip import eligible

            strip_on = eligible(batch, ph, pw, c0, spec.growth_rate,
                                num_layers, spec.bn_size, dtype_bytes,
                                carry=strip_sel in ("carry", "auto"))
        # DenseBlock's own gate (dense_unet_lidar.py DenseBlock.__call__)
        # does NOT route through _rows_ok — it admits training when
        # rows_train is set (and remat is off), so the policy must too.
        rows_block = (spec.rows_for_block(i)
                      and batch <= spec.rows_max_batch
                      and (not train or (spec.rows_train and not spec.remat))
                      and spec.drop_rate == 0 and _zone(spec, px) != "mid")
        if region:
            entry["impl"] = "rows_region"
        elif strip_on:
            entry["impl"] = ("pallas_strip_carry"
                             if strip_sel in ("carry", "auto")
                             else "pallas_strip")
        elif rows_block:
            entry["impl"] = "rows"
        elif train and impl == "buffer":
            entry["impl"] = "concat"
        else:
            entry["impl"] = impl
        num_features = c0 + num_layers * spec.growth_rate
        if i != len(spec.block_config):
            # Transition admits rows_train in training (no remat term —
            # Transition has no remat path; dense_unet_lidar.py Transition)
            t_rows = (spec.rows_for_block(i)
                      and batch <= spec.rows_max_batch
                      and (not train or spec.rows_train)
                      and ph % 2 == 0 and _zone(spec, px) != "mid")
            entry["transition"] = ("rows_region" if region
                                   else "rows" if t_rows else "standard")
            num_features //= 2
        blocks.append(entry)

    # --- head ---------------------------------------------------------------
    head_px = height * width
    fused = (spec.use_fused_kernels and head_px <= spec.fused_head_max_pixels
             and not train)
    big = head_px > 98304
    if not fused:
        head = "plain" if not train else (
            "phase_train" if spec.use_fused_kernels
            and head_px <= spec.fused_head_max_pixels else "plain")
    elif spec.phase_head_impl != "auto":
        head = f"phase_{spec.phase_head_impl}"
    elif not big:
        head = "phase_slices"
    elif batch == 1 and (height // 2) % 8 == 0 and on_tpu:
        head = "phase_strip"
    elif batch == 1:
        head = "phase_rows"
    else:
        head = "phase_single"

    return {
        "batch": batch,
        "resolution": (height, width),
        "train": train,
        "backend": backend,
        "rows_region": region,
        "stem": stem,
        "pool0": pool0,
        "blocks": blocks,
        "head": head,
    }


def format_table(policy: Dict[str, Any]) -> str:
    """Human-readable rendering for ``cli policy``."""
    h, w = policy["resolution"]
    lines = [
        f"lowering policy @ {h}x{w} b{policy['batch']} "
        f"{'train' if policy['train'] else 'eval'} [{policy['backend']}]",
        f"  rows_region: {policy['rows_region']}",
        f"  stem:  {policy['stem']}",
        f"  pool0: {policy['pool0']}",
    ]
    for b in policy["blocks"]:
        ph, pw = b["plane"]
        t = f" | transition: {b['transition']}" if "transition" in b else ""
        lines.append(
            f"  block{b['block']} ({ph}x{pw}, {b['zone']} zone, "
            f"C={b['channels_in']}): {b['impl']}{t}"
        )
    lines.append(f"  head:  {policy['head']}")
    return "\n".join(lines)
