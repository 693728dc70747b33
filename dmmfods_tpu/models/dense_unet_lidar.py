"""Dense U-Net LiDAR — the flagship multi-modal heat-map detection model.

TPU-native (NHWC, flax.linen, static shapes) re-design of the reference
``dmmfods/graphs/models/Dense_U_Net_lidar.py``: a DenseNet encoder with an
optional parallel LiDAR stream (no / early / mid fusion selected by the same
config fields, reference model:57-65), a U-Net transposed-conv decoder fed by
the encoder skip stack (model:102-132), and a refinement head emitting
per-pixel multi-label class heat-map LOGITS (sigmoid is applied downstream).

Channel arithmetic reproduces the reference exactly (verified by tests):
for DenseNet-121 the skip stack is [128, 256, 512, 1024] + bottleneck 1024
(model:81-95), decoder stage i reduces the 2x concat with a 1x1 conv then
transposed-convs (k=3, s=2, p=1) to the recorded encoder shape (model:104-120,
the ``output_size``-polymorphic call at model:261 — resolved *statically* here
from the traced encoder shapes), and the head maps
``128 + stream_1_ch + stream_2_ch -> 64 -> num_classes`` with 3x3 / 5x5 convs
(model:123-132).

Layout notes (TPU-first):
  * activations NHWC, kernels HWIO — XLA tiles these directly onto the MXU;
  * BatchNorm uses torch semantics (eps 1e-5, running-stat momentum 0.1 ==
    flax momentum 0.9) so ported torchvision weights bit-match;
  * transposed convs are expressed as ``lhs_dilation`` convs with padding
    computed from the (static) encoder shape stack, so XLA sees one fused
    conv instead of a dynamic-shape op;
  * an optional ``remat`` flag wraps dense blocks in ``jax.checkpoint`` to
    trade FLOPs for HBM at large batch/resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..ops.fused import concat_bn_relu_conv1x1
from ..ops.normalization import TorchBatchNorm

# ---------------------------------------------------------------------------
# Model spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static architecture description, derived from ``config.model``.

    Field defaults equal the reference config defaults (helper.py:111-123).
    """

    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    num_init_features: int = 64
    stream_1_in_channels: int = 3
    stream_2_in_channels: int = 1
    concat_before_block_num: int = 2
    num_layers_before_blocks: int = 4
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 3
    memory_efficient: bool = False  # kept for config parity; remat supersedes it
    dtype: Any = jnp.float32
    remat: bool = False
    use_fused_kernels: bool = False
    # 'concat' | 'buffer' | 'pallas' (see DenseBlock), or a comma-separated
    # per-block list like "concat,concat,buffer,buffer" (profiling on v5e
    # shows XLA lowers the early blocks' concats to in-place updates on its
    # own but leaves the late blocks' as full concatenates)
    dense_block_impl: str = "concat"
    # lower the stems' 7x7-s2 convs over a 2x space-to-depth (see
    # EncoderStem) — wins at large resolution, no effect needed at
    # 128x192. 'auto' (default): on when the input plane is >= 512x512.
    s2d_stem: Any = "auto"
    # phase-space head refine1 lowering is plane-size dependent (see Head):
    # shifted-slice convs below this pixel count, the single masked
    # 4x4-conv / rows-as-batch forms above it. The r2-era hard gate that
    # DISABLED the head above 98k pixels predates those large-plane
    # lowerings (b1 1280x1920 measured 100.7 -> 74.0 ms with the head ON,
    # r3); the default is now effectively ungated.
    fused_head_max_pixels: int = 1 << 62
    # rows-as-batch inference lowering for large-plane batch-1 dense
    # blocks: (1, H, W, C) is RESHAPED (free — identical element order) to
    # (H, 1, W, C) so the sublane tile fills with W instead of the empty
    # batch dim, and each 3x3 conv becomes three row-shifted 1x3 convs
    # (identical taps). XLA's layout assignment for the in-graph b1
    # full-res blocks runs them 3.6x slower than the same block isolated
    # (12.6 vs 3.5 ms, r3 profile); rows sidesteps that. Comma-separated
    # 1-based block indices, or 'auto' (blocks whose plane exceeds
    # rows_min_pixels at batch 1).
    rows_blocks: str = "auto"
    # Two measured win regimes (v5e, r3): big planes (>= rows_min_pixels:
    # the b1 full-res blocks 1-2, 38k-153k px — 2x) and small planes
    # (<= rows_small_max_pixels: ALL blocks at the 128x192 working
    # resolution, 96-1536 px — 1.2-2.5x at b1-b16). Mid-size planes (e.g.
    # full-res block3, 9600 px) measured neutral (41.9 vs 42.3 ms whole
    # model) and stay excluded as unproven.
    rows_min_pixels: int = 16384
    rows_small_max_pixels: int = 2048
    # rows-as-batch also generalizes to B > 1 — (B, H, W, C) -> (B*H, 1,
    # W, C) is equally free, with per-sample boundary masks on the row
    # shifts (exact; tested). Applied when batch <= rows_max_batch
    # (measured wins through b16 at 128x192; b256 untested and excluded).
    rows_max_batch: int = 16
    # experimental: allow the rows lowering in TRAINING too (BN batch
    # stats reduce over the identical element set, the conv decomposition
    # is exact under autodiff — pinned by tests). Off by default pending
    # a measured win; incompatible with remat (gated off).
    rows_train: bool = False
    # CONTINUOUS rows region: instead of each component reshaping
    # standard -> rows -> standard around itself (every boundary is a
    # physical retile copy — the 1.4-1.5 ms reshape ops in the r3 full-res
    # trace, ~10 round trips), enter rows form ONCE after the stem, keep
    # pool0 / blocks / transitions / fuse / decoder stages in rows form,
    # and exit once at the head (whose batch-1 phase-space rows lowering
    # folds the exit reshape away entirely). Inside the region EVERY plane
    # is rows — the per-plane pixel zones (rows_min_pixels /
    # rows_small_max_pixels) only apply to the per-component mode, since
    # without boundaries the mid-zone neutrality argument no longer holds.
    # 'off' | 'on' | 'auto' (auto = the measured win regime, see
    # _region_active).
    rows_region: str = "off"
    # batch-1 large-plane dense blocks as a Pallas row-strip pipeline
    # (ops/pallas/dense_block_strip.py): the whole block runs per 8-N-row
    # strip with the growing concat VMEM-resident — supersedes the rows
    # XLA lowering in its big-plane regime (>= rows_min_pixels). 'auto'
    # (default: on-TPU only), 'on' (force — tests run interpret mode on
    # CPU), 'off'.
    dense_block_strip: str = "auto"
    # phase-space head lowering: 'auto' picks per shape/backend (see Head
    # — at batch 1 on TPU with a large plane and H/2 divisible by 8, the
    # Pallas row-strip kernel in ops/pallas/phase_head.py; otherwise the
    # rows / single / slices XLA forms). Explicit values force one impl.
    phase_head_impl: str = "auto"
    # batch-1 large-plane encoder stems as ONE Pallas row-strip kernel
    # fusing conv0 (s2d form) + norm0 fold + relu0 + pool0
    # (ops/pallas/stem_pool.py): the (H/2, W/2, F) stem plane never
    # touches HBM and XLA's 3/1/12-channel b1 formatting disappears.
    # MEASURED NEUTRAL at 1280x1920 b1 (two paired A/Bs: 33.63 vs 33.98
    # and 33.79 vs 33.26 ms — inside chip variance; BASELINE.md r3), so
    # 'auto' resolves to OFF per the measured-win-only gating policy.
    # QUARANTINED on real TPU (VERDICT r4 #3): the compiled kernel hit
    # nondeterministic `INVALID_ARGUMENT: TPU backend error` crashes that
    # poison the device server (BASELINE.md r4); 'on' therefore engages
    # only the interpret/CPU path (tests), 'force' is the explicit unsafe
    # hardware opt-in, 'off' disables.
    stem_pool_strip: str = "auto"
    # shared-prefix BN1 batch stats in the dense-block train path (exact
    # regrouping, O(L) stat passes — BASELINE.md r5 training section).
    # False restores per-layer reductions (the vjp-lowering oracles pin
    # against that grouping).
    share_bn_stats: bool = True
    # training-only: route the decoder stages' BNs (norm0 sits on the
    # skip-concat fan-out) through the analytic custom-VJP backward
    # (ops/normalization.bn_train_apply). The GLOBAL flip is a measured
    # negative (blocks dense-block backward fusion); this selective form
    # is A/B'd on its own — see BASELINE.md r3 training section.
    decoder_bn_vjp: bool = False

    def impl_for_block(self, i: int) -> str:
        impls = self.dense_block_impl.split(",")
        return impls[i].strip() if i < len(impls) else impls[-1].strip()

    def rows_for_block(self, i: int) -> bool:
        """Whether 1-based block ``i`` opts into the rows-as-batch lowering
        (still gated at call time on batch==1 / eval / plane size)."""
        sel = self.rows_blocks.strip().lower()
        if not sel or sel == "none":
            return False
        if sel == "auto":
            return True  # per-plane pixel gate applies at call time
        return str(i) in {s.strip() for s in sel.split(",")}

    @classmethod
    def from_config(cls, config, **overrides):
        m = config.model
        kwargs = dict(
            growth_rate=m.growth_rate,
            block_config=tuple(m.block_config),
            num_init_features=m.num_init_features,
            stream_1_in_channels=m.stream_1_in_channels,
            stream_2_in_channels=m.stream_2_in_channels,
            concat_before_block_num=m.concat_before_block_num,
            num_layers_before_blocks=m.num_layers_before_blocks,
            bn_size=m.bn_size,
            drop_rate=float(m.drop_rate),
            num_classes=m.num_classes,
            memory_efficient=m.memory_efficient,
        )
        tpu = config.get("tpu", {})
        if tpu:
            kwargs["dtype"] = jnp.dtype(tpu.get("compute_dtype", "float32"))
            kwargs["remat"] = bool(tpu.get("remat", False))
            kwargs["use_fused_kernels"] = bool(tpu.get("use_fused_kernels", False))
            kwargs["dense_block_impl"] = tpu.get("dense_block_impl", "concat")
            s2d = tpu.get("s2d_stem", "auto")
            kwargs["s2d_stem"] = s2d if s2d == "auto" else bool(s2d)
            kwargs["fused_head_max_pixels"] = int(
                tpu.get("fused_head_max_pixels", 1 << 62))
            kwargs["rows_blocks"] = str(tpu.get("rows_blocks", "auto"))
            kwargs["rows_min_pixels"] = int(tpu.get("rows_min_pixels", 16384))
            kwargs["rows_small_max_pixels"] = int(
                tpu.get("rows_small_max_pixels", 2048))
            kwargs["rows_max_batch"] = int(tpu.get("rows_max_batch", 16))
            kwargs["rows_train"] = bool(tpu.get("rows_train", False))
            kwargs["rows_region"] = str(tpu.get("rows_region", "off"))
            kwargs["phase_head_impl"] = str(tpu.get("phase_head_impl", "auto"))
            kwargs["dense_block_strip"] = str(
                tpu.get("dense_block_strip", "auto"))
            kwargs["stem_pool_strip"] = str(
                tpu.get("stem_pool_strip", "auto"))
            kwargs["share_bn_stats"] = bool(tpu.get("share_bn_stats", True))
            kwargs["decoder_bn_vjp"] = bool(tpu.get("decoder_bn_vjp", False))
        kwargs.update(overrides)
        return cls(**kwargs)

    @property
    def fusion(self) -> str:
        """Fusion-mode dispatch — same rules as reference model:57-65."""
        if self.concat_before_block_num == 1 and self.stream_2_in_channels == 0:
            return "no"
        if self.concat_before_block_num == 1 and self.stream_2_in_channels > 0:
            return "early"
        if 1 < self.concat_before_block_num <= len(self.block_config):
            return "mid"
        raise AttributeError(
            f"invalid fusion config: concat_before_block_num="
            f"{self.concat_before_block_num}, stream_2_in_channels={self.stream_2_in_channels}"
        )

    @property
    def network_input_channels(self) -> int:
        if self.fusion == "early":
            return self.stream_1_in_channels + self.stream_2_in_channels
        return self.stream_1_in_channels

    def encoder_feature_sizes(self):
        """Skip-stack channel widths + bottleneck width (reference model:81-95).

        Returns ``(stack, bottleneck)``. ``stack[0]`` is the
        ``num_init_features + 2*growth_rate`` entry the reference pushes first
        (model:82) — it is consumed by the *last* decoder stage, so the final
        transposed conv emits 128 channels for DenseNet-121.
        """
        sizes = [self.num_init_features + 2 * self.growth_rate]
        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            num_features += num_layers * self.growth_rate
            sizes.append(num_features)
            if i != len(self.block_config) - 1:
                num_features //= 2
        bottleneck = sizes.pop()  # last block output
        return sizes, bottleneck

    def decoder_stage_features(self):
        """Per-stage reduce-conv output widths, in application order.

        Mirrors the pop order of the reference decoder construction
        (model:104-119): for DenseNet-121 -> [1024, 512, 256, 128].
        """
        sizes, _ = self.encoder_feature_sizes()
        return list(reversed(sizes))  # e.g. densenet121: [1024, 512, 256, 128]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5  # torch BatchNorm2d default
_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")  # kaiming_normal


def _maxpool_3x3_s2_p1(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )


def _avgpool_2x2_s2(x):
    return (
        lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    ).astype(x.dtype)


def _rows_conv3x3(y, w, boundary_every: int = 0):
    """3x3 conv on a rows-as-batch tensor ``y: (B*H, 1, W, Cin)``.

    Exact decomposition: ``out[h] = c0[h-1] + c1[h] + c2[h+1]`` where
    ``c_dy`` is the 1x3 conv of every row with kernel tap row ``dy`` —
    identical taps and zero-padding semantics to the standard conv
    (numerically pinned by tests and tools/micro_block_layout.py).

    ``boundary_every``: sample height H when the row-batch packs B > 1
    samples — the shifted terms must not read across sample boundaries,
    so rows at sample starts/ends are zeroed with multiplicative masks
    (they fuse into the adds). 0 = single sample (the pad rows already
    zero the only boundary).
    """
    def c(ws):
        return lax.conv_general_dilated(
            y, ws, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    c0, c1, c2 = c(w[0:1]), c(w[1:2]), c(w[2:3])
    z = jnp.zeros_like(c1[:1])
    top = jnp.concatenate([z, c0[:-1]], axis=0)
    bot = jnp.concatenate([c2[1:], z], axis=0)
    if boundary_every:
        idx = jnp.arange(y.shape[0]) % boundary_every
        mt = (idx != 0).astype(y.dtype)[:, None, None, None]
        mb = (idx != boundary_every - 1).astype(y.dtype)[:, None, None, None]
        top = top * mt
        bot = bot * mb
    return top + c1 + bot


def _maxpool_3x3_s2_p1_rows(x):
    """3x3/2 max pool (pad 1) on a STANDARD ``(B, H, W, C)`` tensor,
    lowered rows-as-batch: per-row W pooling, then a 3-row max assembled
    from the even/odd row planes (out[i] = max(m[2i-1], m[2i], m[2i+1])).
    Exact vs :func:`_maxpool_3x3_s2_p1` (pinned by tests)."""
    b, h, w, c = x.shape
    xr = x.reshape(b * h, 1, w, c)
    m = lax.reduce_window(
        xr, -jnp.inf, lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        ((0, 0), (0, 0), (1, 1), (0, 0)))                    # (B*H, 1, W/2, C)
    wo = m.shape[2]
    m = m.reshape(b, h // 2, 2, wo, c)
    a = m[:, :, 0]                                           # rows 2i
    bb = m[:, :, 1]                                          # rows 2i+1
    ninf = jnp.full_like(bb[:, :1], -jnp.inf)
    prev = jnp.concatenate([ninf, bb[:, :-1]], axis=1)       # rows 2i-1
    return jnp.maximum(jnp.maximum(prev, a), bb)             # (B, H/2, W/2, C)


def _avgpool_2x2_s2_rows(x):
    """2x2/2 avg pool on a rows-as-batch tensor ``(H, 1, W, C)`` ->
    ``(H/2, 1, W/2, C)``: the H-pair merge is a free reshape into a
    spatial dim of size 2, then one VALID reduce_window."""
    h, _, w, c = x.shape
    x = x.reshape(h // 2, 2, w, c)
    x = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return (x / 4.0).astype(x.dtype).reshape(h // 2, 1, w // 2, c)


def _nearest_upsample_2x(x):
    # single broadcast + reshape: one materialization of the 2x tensor
    # (chained jnp.repeat writes the H-doubled intermediate too — profiled
    # ~2 ms/step extra HBM traffic at batch 256)
    b, h, w, c = x.shape
    out = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return out.reshape(b, 2 * h, 2 * w, c)



def _rows_ok(spec, batch: int, train: bool) -> bool:
    sel = spec.rows_blocks.strip().lower()
    return (sel not in ("", "none") and not train
            and batch <= spec.rows_max_batch)


def _stem_pool_ok(spec, b: int, h: int, w: int, c: int, train: bool,
                  backend: str | None = None) -> bool:
    """Whether the fused Pallas stem+pool0 strip kernel applies (see
    ModelSpec.stem_pool_strip). Called by the encoders so they can skip
    the separate pool0 when the stem already pooled. ``backend`` defaults
    to the live backend (the lowering-policy table passes its own)."""
    sel = str(spec.stem_pool_strip).strip().lower()
    if sel in ("", "off", "none", "0", "false") or train:
        return False
    if b != 1:
        return False
    if sel == "auto":
        # measured NEUTRAL in its target regime (full-res b1 — see
        # ModelSpec.stem_pool_strip): auto keeps the XLA path
        return False
    if backend is None:
        backend = jax.default_backend()
    if sel != "force" and backend == "tpu":
        # QUARANTINED on real TPU (VERDICT r4 #3): repeated executions of
        # the compiled kernel hit nondeterministic `INVALID_ARGUMENT: TPU
        # backend error` crashes that poison the device server for minutes
        # (BASELINE.md r4 negatives). 'on' therefore only engages the
        # interpret/CPU path (tests); the hardware path requires the
        # explicit unsafe opt-in `tpu.stem_pool_strip = "force"`.
        return False
    from ..ops.pallas.stem_pool import eligible

    return eligible(b, h, w, c, spec.num_init_features,
                    jnp.dtype(spec.dtype).itemsize)


def _region_active(spec, b: int, h: int, w: int, train: bool) -> bool:
    """Whether the continuous rows region applies (see ModelSpec.rows_region).

    Geometry gates: H, W multiples of 32 keep every stage's halvings exact
    and every decoder stage's output padding at (1, 1) — the only case the
    rows transposed conv can emit rows form without a crop.
    """
    mode = spec.rows_region.strip().lower()
    if mode in ("", "off", "none") or train or spec.drop_rate > 0:
        return False
    if b > spec.rows_max_batch or h % 32 or w % 32:
        return False
    return mode in ("on", "auto")


def _maxpool_3x3_s2_p1_rows_io(x, b: int, h: int):
    """3x3/2 max pool (pad 1) rows-in/rows-out: ``(B*H, 1, W, C) ->
    (B*H/2, 1, W/2, C)``. Same decomposition as
    :func:`_maxpool_3x3_s2_p1_rows` (per-row W pooling + 3-row max over the
    even/odd planes), without leaving rows form; per-sample boundaries are
    handled by masking the shifted odd plane with ``-inf`` (``where``, not
    multiplication — ``-inf * 0`` is NaN)."""
    m = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        ((0, 0), (0, 0), (1, 1), (0, 0)))                    # (B*H, 1, W/2, C)
    wo, c = m.shape[2], m.shape[3]
    m = m.reshape(b * h // 2, 2, wo, c)
    a = m[:, 0:1]                                            # rows 2i
    bb = m[:, 1:2]                                           # rows 2i+1
    ninf = jnp.full_like(bb[:1], -jnp.inf)
    prev = jnp.concatenate([ninf, bb[:-1]], axis=0)          # rows 2i-1
    if b > 1:
        idx = jnp.arange(b * h // 2) % (h // 2)
        prev = jnp.where((idx == 0)[:, None, None, None], -jnp.inf, prev)
    return jnp.maximum(jnp.maximum(prev, a), bb)             # (B*H/2, 1, W/2, C)


def _pool0(x, spec, train: bool):
    """pool0 dispatch: the rows lowering when eligible under the same
    measured policy as the blocks (see ModelSpec.rows_*)."""
    px = x.shape[1] * x.shape[2]
    if (_rows_ok(spec, x.shape[0], train) and x.shape[1] % 2 == 0
            and (px >= spec.rows_min_pixels
                 or px <= spec.rows_small_max_pixels)):
        return _maxpool_3x3_s2_p1_rows(x)
    return _maxpool_3x3_s2_p1(x)


class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1-BN-ReLU-Conv3x3 bottleneck layer emitting ``growth_rate``
    new channels (torchvision ``_DenseLayer`` semantics)."""

    growth_rate: int
    bn_size: int
    drop_rate: float
    dtype: Any
    rows: bool = False        # input is rows-as-batch (B*H, 1, W, C); eval only
    rows_boundary: int = 0    # sample height H when B > 1 (see _rows_conv3x3)

    @nn.compact
    def __call__(self, x, train: bool, norm1_stats=None):
        # norm1_stats: optional PRE-COMPUTED (mean_b, var_biased) of x's
        # channels (DenseBlock's shared-prefix stats — every layer's norm1
        # reduces the SAME prefix channels, so the block computes each
        # slab's stats once and passes the prefix slice here; exact, incl.
        # the running-EMA update, via TorchBatchNorm.stats_override)
        y = TorchBatchNorm(
            use_running_average=not train, name="norm1", dtype=self.dtype
        )(x, stats_override=norm1_stats,
          virtual_n=(x.size // x.shape[-1]) if norm1_stats is not None else None)
        y = nn.relu(y)
        y = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            kernel_init=_CONV_INIT, name="conv1", dtype=self.dtype,
        )(y)
        y = TorchBatchNorm(use_running_average=not train, name="norm2", dtype=self.dtype)(y)
        y = nn.relu(y)
        conv2 = nn.Conv(
            self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=_CONV_INIT, name="conv2", dtype=self.dtype,
        )
        if self.rows and not self.is_initializing():
            w2 = self.variables["params"]["conv2"]["kernel"]
            y = _rows_conv3x3(y, w2.astype(self.dtype), self.rows_boundary)
        else:
            y = conv2(y)
        if self.drop_rate > 0:
            y = nn.Dropout(rate=self.drop_rate, deterministic=not train)(y)
        return y


class DenseBlock(nn.Module):
    """Concatenating dense block (torchvision ``_DenseBlock`` semantics).

    Two implementations, numerically identical and sharing param names:

    * ``impl='concat'``: the textbook re-concat per layer (what torch does);
      XLA materializes a growing concat every layer — O(L^2) HBM traffic.
    * ``impl='buffer'``: the block's final feature buffer is allocated once
      and each layer writes its ``growth_rate`` new channels via
      ``dynamic_update_slice`` (in-place for XLA); layers read a static
      prefix slice. Same math, linear traffic.
    """

    num_layers: int
    growth_rate: int
    bn_size: int
    drop_rate: float
    dtype: Any
    remat: bool = False
    impl: str = "concat"
    rows: bool = False           # opt-in rows-as-batch lowering (see spec)
    rows_min_pixels: int = 16384
    rows_small_max_pixels: int = 2048
    rows_max_batch: int = 16
    rows_train: bool = False
    strip: str = "off"           # ModelSpec.dense_block_strip
    # shared-prefix BN1 batch stats in the train concat path (see below);
    # False restores per-layer stat reductions — used by the vjp-vs-concat
    # exactness oracles, whose reference must match the vjp lowering's
    # reduction grouping bit-for-bit
    share_stats: bool = True

    @nn.compact
    def __call__(self, x, train: bool, rows_meta=None):
        layer_cls = DenseLayer
        if self.remat:
            layer_cls = nn.remat(DenseLayer, static_argnums=(2,))

        if rows_meta is not None and not self.is_initializing():
            # continuous-region call: x is ALREADY rows form (B*H, 1, W, C)
            # and stays that way — no entry/exit relabels (see
            # ModelSpec.rows_region)
            b, h = rows_meta
            return self._rows_layers(x, b, h, train)

        px = x.shape[1] * x.shape[2]
        if self._strip_eligible(x, train, px):
            # batch-1 big-plane fast path: the whole block as a Pallas
            # row-strip pipeline, concat buffer VMEM-resident (read x once
            # + halo, write the final buffer once — vs O(L^2) HBM round
            # trips). Supersedes the rows XLA lowering in this regime.
            from ..ops.pallas.dense_block import fold_block_params_jnp
            from ..ops.pallas import dense_block_strip as strip_mod

            variables = self.variables
            folded = fold_block_params_jnp(
                variables["params"], variables["batch_stats"],
                self.num_layers, x.shape[-1], self.growth_rate, self.bn_size,
            )
            run = (strip_mod.dense_block_strip_carry
                   if self._strip_carry() else strip_mod.dense_block_strip)
            return run(
                x, folded, num_layers=self.num_layers, c0=x.shape[-1],
                growth=self.growth_rate, h=x.shape[1], w=x.shape[2],
            )

        rows = (
            self.rows and (not train or (self.rows_train and not self.remat))
            and not self.is_initializing()
            and x.shape[0] <= self.rows_max_batch and self.drop_rate == 0
            and (px >= self.rows_min_pixels
                 or px <= self.rows_small_max_pixels)
        )
        if rows:
            # free relabel: (B, H, W, C) and (B*H, 1, W, C) have identical
            # element order, so W (not the thin batch dim) fills the
            # sublane tile; 3x3 convs decompose per _rows_conv3x3, with
            # sample-boundary masks when B > 1
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            feats = self._rows_layers(
                x.reshape(b * h, 1, w, x.shape[-1]), b, h, train)
            return feats.reshape(b, h, w, feats.shape[-1])

        # impl is numerically identical either way, so pick per mode: the
        # 'buffer' lowering wins at inference for the late blocks (their
        # concats stay full concatenates in XLA) but LOSES under autodiff
        # (b32 train step: all-concat 34.4 ms, all-buffer 46.8 ms — the
        # backward of the slab updates recomputes poorly). Under train the
        # custom-VJP lowering ('vjp', ops/dense_block_vjp.py) supersedes
        # both: single-buffer residual + reverse-walk recompute.
        impl = "concat" if train and self.impl == "buffer" else self.impl

        if train and impl == "vjp" and self._vjp_eligible():
            from ..ops.dense_block_vjp import dense_block_train, ema_updates

            params = self.variables["params"]
            out, stats = dense_block_train(x, params, _BN_EPS)
            if self.is_mutable_collection("batch_stats"):
                old = self.variables["batch_stats"]
                n = x.shape[0] * x.shape[1] * x.shape[2]
                for name, upd in ema_updates(old, stats, n).items():
                    self.put_variable("batch_stats", name, upd)
            return out
        if impl == "vjp":
            impl = "buffer"  # eval twin of the vjp lowering

        if self._pallas_eligible(x, train):
            # inference fast path: the whole block runs as one Pallas kernel
            # with the growing feature buffer resident in VMEM (measured
            # 1.37x over the XLA lowering on v5e at DenseNet-121 block
            # shapes). Params are the same tree the normal path registers.
            from ..ops.pallas.dense_block import (
                dense_block_pallas, fold_block_params_jnp,
            )

            variables = self.variables
            folded = fold_block_params_jnp(
                variables["params"], variables["batch_stats"],
                self.num_layers, x.shape[-1], self.growth_rate, self.bn_size,
            )
            return dense_block_pallas(
                x, folded, num_layers=self.num_layers, c0=x.shape[-1],
                growth=self.growth_rate, h=x.shape[1], w=x.shape[2],
            )

        def layer(i, feats, norm1_stats=None):
            mod = layer_cls(
                growth_rate=self.growth_rate,
                bn_size=self.bn_size,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                name=f"denselayer{i + 1}",
            )
            if norm1_stats is not None:
                return mod(feats, train, norm1_stats)
            return mod(feats, train)

        if impl == "buffer":
            c0 = x.shape[-1]
            c_final = c0 + self.num_layers * self.growth_rate
            buf = jnp.zeros(x.shape[:-1] + (c_final,), x.dtype)
            buf = lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
            for i in range(self.num_layers):
                width = c0 + i * self.growth_rate
                new = layer(i, lax.slice_in_dim(buf, 0, width, axis=3))
                buf = lax.dynamic_update_slice(buf, new, (0, 0, 0, width))
            return buf

        # Shared-prefix BN1 batch stats (train): layer l's norm1 reduces
        # the channels of [x | y_0 | ... | y_{l-1}] — data every LATER
        # layer reduces again. The per-channel stats depend only on that
        # channel's slab, so compute each slab's (mean, E[x^2]) ONCE when
        # it lands and hand each layer the prefix slice: O(L) reduction
        # passes instead of O(L^2/2). Exact — same function, different
        # graph factoring; autodiff and the per-layer running-EMA updates
        # flow through the shared values. (measured: b128 raw-record train
        # 88.7 -> see BASELINE.md r5 training section.)
        share_stats = (self.share_stats and train
                       and not self.is_initializing())

        def ch_stats(t):
            tf = t.astype(jnp.float32)
            ax = tuple(range(t.ndim - 1))
            return jnp.mean(tf, axis=ax), jnp.mean(jnp.square(tf), axis=ax)

        means, msqs = [], []
        if share_stats:
            m0, q0 = ch_stats(x)
            means.append(m0)
            msqs.append(q0)

        features = x
        for i in range(self.num_layers):
            stats = None
            if share_stats:
                mean = means[0] if len(means) == 1 else jnp.concatenate(means)
                msq = msqs[0] if len(msqs) == 1 else jnp.concatenate(msqs)
                var = jnp.maximum(msq - jnp.square(mean), 0.0)
                stats = (mean, var)
            new = layer(i, features, stats)
            if share_stats:
                ml, ql = ch_stats(new)
                means.append(ml)
                msqs.append(ql)
            features = jnp.concatenate([features, new], axis=-1)
        return features

    def _rows_layers(self, feats, b: int, h: int, train: bool):
        """The layer loop on a rows-form feature tensor (B*H, 1, W, C)."""
        for i in range(self.num_layers):
            new = DenseLayer(
                growth_rate=self.growth_rate, bn_size=self.bn_size,
                drop_rate=self.drop_rate, dtype=self.dtype, rows=True,
                rows_boundary=h if b > 1 else 0,
                name=f"denselayer{i + 1}",
            )(feats, train)
            feats = jnp.concatenate([feats, new], axis=-1)
        return feats

    def _strip_carry(self) -> bool:
        """Whether the strip fast path uses the halo-carry kernel.

        ``auto`` resolves to CARRY: measured 28.46 vs 30.89 ms on the
        full-res default path (b1 1280x1920, bit-identical output anchors)
        with 5x faster Mosaic compiles (365 vs 1800 s) — BASELINE.md r5.
        The recompute kernel stays as the ``on`` opt-in."""
        return self.strip in ("carry", "auto")

    def _strip_eligible(self, x, train: bool, px: int) -> bool:
        if self.strip == "off" or train or self.is_initializing():
            return False
        if self.drop_rate > 0 or px < self.rows_min_pixels:
            return False
        if self.strip == "auto" and not any(
            d.platform == "tpu" for d in jax.devices()
        ):
            return False
        if "denselayer1" not in self.variables.get("batch_stats", {}):
            return False
        from ..ops.pallas.dense_block_strip import eligible

        return eligible(
            x.shape[0], x.shape[1], x.shape[2], x.shape[-1],
            self.growth_rate, self.num_layers, self.bn_size,
            jnp.dtype(self.dtype).itemsize, carry=self._strip_carry(),
        )

    def _vjp_eligible(self) -> bool:
        if self.is_initializing() or self.drop_rate > 0 or self.remat:
            return False
        stats = self.variables.get("batch_stats", {})
        return "denselayer1" in stats

    def _pallas_eligible(self, x, train: bool) -> bool:
        if self.impl != "pallas" or train or self.is_initializing():
            return False
        if self.drop_rate > 0 or not any(
            d.platform == "tpu" for d in jax.devices()
        ):
            return False
        stats = self.variables.get("batch_stats", {})
        if "denselayer1" not in stats:
            return False
        from ..ops.pallas.dense_block import eligible

        return eligible(
            self.num_layers, x.shape[-1], self.growth_rate, self.bn_size,
            x.shape[1], x.shape[2], dtype_bytes=jnp.dtype(self.dtype).itemsize,
            batch=x.shape[0],
        )


class Transition(nn.Module):
    """BN-ReLU-Conv1x1(half)-AvgPool2 (torchvision ``_Transition``)."""

    num_output_features: int
    dtype: Any
    rows: bool = False
    rows_min_pixels: int = 16384
    rows_small_max_pixels: int = 2048
    rows_max_batch: int = 16
    rows_train: bool = False

    @nn.compact
    def __call__(self, x, train: bool, rows_meta=None):
        region = rows_meta is not None and not self.is_initializing()
        if region:
            b, h = rows_meta
            w = x.shape[2]
            rows = False
        else:
            px = x.shape[1] * x.shape[2]
            rows = (
                self.rows and (not train or self.rows_train)
                and not self.is_initializing()
                and x.shape[0] <= self.rows_max_batch and x.shape[1] % 2 == 0
                and (px >= self.rows_min_pixels
                     or px <= self.rows_small_max_pixels)
            )
            b, h, w = x.shape[0], x.shape[1], x.shape[2]
            if rows:
                # pooling pairs never straddle samples (H is even)
                x = x.reshape(b * h, 1, w, x.shape[-1])
        x = TorchBatchNorm(use_running_average=not train, name="norm", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.num_output_features, (1, 1), use_bias=False,
            kernel_init=_CONV_INIT, name="conv", dtype=self.dtype,
        )(x)
        if region:
            # rows in, rows out: (B*H, 1, W, C) -> (B*H/2, 1, W/2, C); the
            # H-pair merge never straddles samples (per-sample H is even)
            return _avgpool_2x2_s2_rows(x)
        if rows:
            return _avgpool_2x2_s2_rows(x).reshape(
                b, h // 2, w // 2, self.num_output_features)
        return _avgpool_2x2_s2(x)


class EncoderStem(nn.Module):
    """conv0(7x7, s2, p3) - norm0 - relu0 [- pool0 applied by caller].

    ``s2d``: lower conv0 as a 4x4 stride-1 conv over the 2x space-to-depth
    of the input (the MLPerf-ResNet stem trick) — identical taps, but the
    MXU sees 4C instead of C input channels and a quarter of the spatial
    positions. A 3-channel 7x7-s2 conv at 1280x1920 runs at ~2.3 GFLOP/s/
    lane-starved (profiled 5-6 ms/stream at b1 full-res, `BASELINE.md` r3);
    the s2d form is the same math on MXU-shaped operands. The (7,7,C,F)
    param is kept (checkpoint/port compatibility) and re-indexed in-graph.
    """

    num_init_features: int
    dtype: Any
    s2d: Any = "auto"  # True | False | 'auto' (on when plane >= 512x512)
    rows: bool = False       # rows-as-batch lowering of the s2d conv (eval)
    rows_max_batch: int = 16
    rows_out: bool = False   # emit rows form (B*H/2, 1, W/2, F) — region mode
    fuse_pool: bool = False  # run the Pallas stem+pool0 strip kernel and
    #                          return the POOLED plane (caller skips pool0;
    #                          set only when _stem_pool_ok said yes)

    @nn.compact
    def __call__(self, x, train: bool):
        in_b, in_h, in_w = x.shape[0], x.shape[1], x.shape[2]
        if self.fuse_pool and not self.is_initializing():
            from ..ops.pallas.stem_pool import stem_pool_strip

            w7 = self.variables["params"]["conv0"]["kernel"]
            # declare/reuse the norm0 submodule for its folded (gamma, beta)
            # — same params/stats as the standard path below
            gamma, beta = TorchBatchNorm(
                use_running_average=True, name="norm0", dtype=self.dtype,
            )(jnp.zeros((1, self.num_init_features)), return_fold=True)
            return stem_pool_strip(
                x.astype(self.dtype), w7, gamma, beta)
        conv = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, kernel_init=_CONV_INIT, name="conv0", dtype=self.dtype,
        )
        use_s2d = (self.s2d is True or (
            self.s2d == "auto" and x.shape[1] * x.shape[2] >= 262144))
        if (use_s2d and not self.is_initializing()
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            from ..ops.fused import space_to_depth_2x
            from ..ops.pallas.stem_pool import s2d_conv0_weight

            w7 = self.variables["params"]["conv0"]["kernel"]
            c = x.shape[-1]
            f = self.num_init_features
            # tap (dy, dx) of the 7x7 kernel reads source pixel
            # (2i + dy - 3): in block space that is block offset
            # a' = floor((dy - 3) / 2) in [-2, 1] and phase py = (dy - 3) & 1
            w4 = s2d_conv0_weight(w7, c, f).astype(self.dtype)
            if (self.rows and not train
                    and x.shape[0] <= self.rows_max_batch):
                # rows-as-batch: s2d via H-pair reshapes + unit slices, the
                # 4x4 conv as four row-shifted 1x4 convs (H pad (2, 1))
                bsz, h, w = x.shape[0], x.shape[1], x.shape[2]
                hh = h // 2
                rw = x.astype(self.dtype).reshape(
                    bsz * hh, 2, w // 2, 2 * c)
                xs = jnp.concatenate([rw[:, 0:1], rw[:, 1:2]], axis=-1)

                def c1x4(r):
                    return lax.conv_general_dilated(
                        xs, w4[r:r + 1], (1, 1), ((0, 0), (2, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))

                c0, c1, c2, c3 = c1x4(0), c1x4(1), c1x4(2), c1x4(3)
                # out[i] = sum_r c_r[i + r - 2], i in [0, hh): shifts need
                # per-sample boundaries when B > 1 -> masks (fuse into adds)
                z = jnp.zeros_like(c0[:1])
                t0 = jnp.concatenate([z, z, c0[:-2]], axis=0)
                t1 = jnp.concatenate([z, c1[:-1]], axis=0)
                t3 = jnp.concatenate([c3[1:], z], axis=0)
                if bsz > 1:
                    idx = jnp.arange(bsz * hh) % hh
                    dt_ = xs.dtype
                    t0 = t0 * (idx >= 2).astype(dt_)[:, None, None, None]
                    t1 = t1 * (idx >= 1).astype(dt_)[:, None, None, None]
                    t3 = t3 * (idx != hh - 1).astype(dt_)[:, None, None, None]
                x = t0 + t1 + c2 + t3                    # rows: (B*H/2, 1, W/2, F)
                if not self.rows_out:
                    x = x.reshape(bsz, hh, w // 2, f)
            else:
                x = lax.conv_general_dilated(
                    space_to_depth_2x(x).astype(self.dtype), w4,
                    (1, 1), ((2, 1), (2, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                if self.rows_out and not self.is_initializing():
                    x = x.reshape(in_b * in_h // 2, 1, in_w // 2, f)
        else:
            x = conv(x)
            if self.rows_out and not self.is_initializing():
                # region entry: one relabel into rows form, then norm0/relu
                # (and everything downstream) stay rows
                x = x.reshape(
                    in_b * x.shape[1], 1, x.shape[2], x.shape[-1])
        x = TorchBatchNorm(use_running_average=not train, name="norm0", dtype=self.dtype)(x)
        return nn.relu(x)


class Encoder(nn.Module):
    """DenseNet feature extractor up to (and excluding) the classifier.

    ``up_to_block`` limits the depth: blocks 1..up_to_block-1 and transitions
    1..up_to_block-1 are built — used verbatim for the LiDAR stream_2
    (reference model:156-183). Full depth builds all blocks + transitions
    (reference model:72-100; norm5/classifier intentionally absent,
    reference drops them too).

    Returns ``(features, skips, shapes)`` where ``skips`` are the dense-block
    outputs except the last (reference model:250-252) and ``shapes`` the
    spatial sizes recorded for the decoder (pre-pool0 + per-skip,
    reference model:248-252).
    """

    spec: ModelSpec
    in_channels: int
    up_to_block: int | None = None  # None: full depth

    @nn.compact
    def __call__(self, x, train: bool):
        spec = self.spec
        b, in_h, in_w = x.shape[0], x.shape[1], x.shape[2]
        region = (_region_active(spec, b, in_h, x.shape[2], train)
                  and not self.is_initializing())
        fuse_pool = (not region and not self.is_initializing()
                     and _stem_pool_ok(spec, b, in_h, in_w, x.shape[3], train))
        x = EncoderStem(spec.num_init_features, spec.dtype, spec.s2d_stem,
                        rows=region or _rows_ok(spec, b, train),
                        rows_max_batch=spec.rows_max_batch,
                        rows_out=region,
                        fuse_pool=fuse_pool,
                        name="stem")(x, train)
        if region:
            h_cur = in_h // 2
            shapes = [(h_cur, x.shape[2])]  # pre-pool0 spatial size
            x = _maxpool_3x3_s2_p1_rows_io(x, b, h_cur)
            h_cur //= 2
        elif fuse_pool:
            h_cur = None
            shapes = [(in_h // 2, in_w // 2)]  # pre-pool0 spatial size
        else:
            h_cur = None
            shapes = [(x.shape[1], x.shape[2])]  # (model:248-249)
            x = _pool0(x, spec, train)

        n_blocks = len(spec.block_config) if self.up_to_block is None else self.up_to_block - 1
        skips = []
        num_features = spec.num_init_features
        for i in range(n_blocks):
            num_layers = spec.block_config[i]
            x = DenseBlock(
                num_layers=num_layers,
                growth_rate=spec.growth_rate,
                bn_size=spec.bn_size,
                drop_rate=spec.drop_rate,
                dtype=spec.dtype,
                remat=spec.remat,
                impl=spec.impl_for_block(i),
                rows=spec.rows_for_block(i + 1),
                rows_min_pixels=spec.rows_min_pixels,
                rows_small_max_pixels=spec.rows_small_max_pixels,
                rows_max_batch=spec.rows_max_batch,
                rows_train=spec.rows_train,
                strip=spec.dense_block_strip,
                share_stats=spec.share_bn_stats,
                name=f"denseblock{i + 1}",
            )(x, train, rows_meta=(b, h_cur) if region else None)
            num_features += num_layers * spec.growth_rate
            if self.up_to_block is None and i < len(spec.block_config) - 1:
                skips.append(x)
                shapes.append((h_cur if region else x.shape[1], x.shape[2]))
            if i != len(spec.block_config) - 1:
                x = Transition(num_features // 2, spec.dtype,
                               rows=spec.rows_for_block(i + 1),
                               rows_min_pixels=spec.rows_min_pixels,
                               rows_small_max_pixels=spec.rows_small_max_pixels,
                               rows_max_batch=spec.rows_max_batch,
                               rows_train=spec.rows_train,
                               name=f"transition{i + 1}")(
                    x, train, rows_meta=(b, h_cur) if region else None)
                num_features //= 2
                if region:
                    h_cur //= 2
        return x, skips, shapes


class ConcatFuse(nn.Module):
    """Mid-fusion concat block: BN(2C)-ReLU-Conv1x1(2C -> C) over the channel
    concat of the two streams (reference ``concat_module`` model:185-192).

    With ``use_fused`` the concat is never materialized: the Pallas kernel
    computes ``ReLU(BN(cat(a, b))) @ W`` as a sum of two matmuls.
    """

    num_features: int
    dtype: Any
    use_fused: bool = False

    @nn.compact
    def __call__(self, a, b, train: bool):
        cat = jnp.concatenate([a, b], axis=-1)
        bn = TorchBatchNorm(use_running_average=not train, name="norm", dtype=self.dtype)
        conv = nn.Conv(
            self.num_features, (1, 1), use_bias=False,
            kernel_init=_CONV_INIT, name="conv", dtype=self.dtype,
        )
        if self.use_fused and not train:
            # inference fast path: fold BN stats and run the fused kernel
            stats = self.variables.get("batch_stats", None)
            params = self.variables.get("params", None)
            if stats is not None and params is not None and "norm" in stats:
                return concat_bn_relu_conv1x1(
                    a, b,
                    scale=params["norm"]["scale"], bias=params["norm"]["bias"],
                    mean=stats["norm"]["mean"], var=stats["norm"]["var"],
                    kernel=params["conv"]["kernel"], eps=_BN_EPS,
                )
        x = bn(cat)
        x = nn.relu(x)
        return conv(x)


class ConvTransposeToShape(nn.Module):
    """Transposed conv (k=3, s=2, p=1) whose output spatial size is resolved
    statically to ``target_hw`` — the XLA-friendly equivalent of the
    reference's runtime ``output_size=`` call (model:261). Output padding is
    derived per torch semantics: ``op = target - (2 * in - 1)``, must be 0/1.
    Expressed as an ``lhs_dilation`` conv so XLA fuses it like any other conv.
    Kernel stored HWIO (kh, kw, C_in, C_out), pre-flipped relative to torch
    (the importer handles the flip + transpose).
    """

    features: int
    dtype: Any
    kernel_size: int = 3
    stride: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x, target_hw, rows_meta=None, rows_out=False):
        k, s, p = self.kernel_size, self.stride, self.pad
        h_in = rows_meta[1] if rows_meta is not None else x.shape[1]
        op_h = target_hw[0] - ((h_in - 1) * s - 2 * p + k)
        op_w = target_hw[1] - ((x.shape[2] - 1) * s - 2 * p + k)
        if not (0 <= op_h < s and 0 <= op_w < s):
            raise ValueError(
                f"requested output size {target_hw} unreachable from input "
                f"{x.shape[1:3]} with stride {s} (output_padding {op_h},{op_w})"
            )
        kernel = self.param(
            "kernel", _CONV_INIT, (k, k, x.shape[-1], self.features), jnp.float32
        )
        # NOTE(perf): a subpixel decomposition (4 phase convs + interleave,
        # nominally 4x fewer MACs than the zero-dilated formulation) was
        # implemented and measured SLOWER end-to-end on v5e (4506 vs 5494
        # frames/s at batch 256) — XLA's lhs_dilation lowering already avoids
        # the zero work, and the interleave costs extra HBM passes. Keep the
        # single dilated conv and let the compiler schedule it.
        base = k - 1 - p
        if rows_meta is not None:
            return _conv_transpose_3x3_s2_rows(
                x.astype(self.dtype), kernel.astype(self.dtype),
                op_h, op_w, rows_meta[0], rows_meta[1], rows_out=rows_out)
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((base, base + op_h), (base, base + op_w)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y


def _conv_transpose_3x3_s2_rows(x_rows, kernel, op_h, op_w, b, hin,
                                rows_out=False):
    """k=3, s=2, p=1 transposed conv (the ``ConvTransposeToShape``
    contraction) on a rows-as-batch tensor ``(B*Hin, 1, Win, C)``.

    Writing the transposed conv as a conv over the zero-dilated input
    (base pad 1), output row parity separates the kernel rows exactly:
    ``y[2i] = x[i] (*) w[1]`` and ``y[2i+1] = x[i] (*) w[0] + x[i+1] (*)
    w[2]`` — three per-row 1x3 W-transposed convs plus one row shift,
    interleaved by a free reshape. Exact vs the standard lowering
    (pinned by ``test_rows_decoder_matches_standard``)."""
    wout = (x_rows.shape[2] - 1) * 2 - 2 + 3 + op_w

    def c1x3(d):
        return lax.conv_general_dilated(
            x_rows, kernel[d:d + 1], (1, 1), ((0, 0), (1, 1 + op_w)),
            lhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    r0, r1, r2 = c1x3(0), c1x3(1), c1x3(2)
    z = jnp.zeros_like(r2[:1])
    t2 = jnp.concatenate([r2[1:], z], axis=0)           # r2[i + 1]
    if b > 1:
        idx = jnp.arange(b * hin) % hin
        t2 = t2 * (idx != hin - 1).astype(t2.dtype)[:, None, None, None]
    odd = r0 + t2
    f = r1.shape[-1]
    y = jnp.concatenate([r1, odd], axis=1)              # (B*Hin, 2, Wout, F)
    if rows_out:
        # stay rows: (B*Hin, 2, Wout, F) -> (B*2Hin, 1, Wout, F) is the
        # same element order (region mode requires op_h == 1 — no crop)
        assert op_h == 1, "rows_out needs output_padding 1 (no H crop)"
        return y.reshape(b * 2 * hin, 1, wout, f)
    y = y.reshape(b, 2 * hin, wout, f)
    if op_h == 0:
        y = y[:, : 2 * hin - 1]
    return y


class DecoderStage(nn.Module):
    """One U-Net decoder stage: concat with the encoder skip (stages > 0,
    reference model:257-258), BN-ReLU-Conv1x1(reduce)-BN-ReLU, then a
    transposed conv to the recorded skip shape (reference model:108-118).

    NOTE(perf): running the skip concat through the fused
    ``concat_bn_relu_conv1x1`` (the mid-fusion identity) was measured
    SLOWER here — interleaved A/B at b256: 37.0 vs 35.9 ms/step. The
    decoder's concats sit right next to large convs XLA already schedules
    well (late-stage tensors are small), unlike the mid-fusion block's.
    Plain concat kept."""

    features: int
    dtype: Any
    use_fused: bool = False  # accepted for uniformity; see NOTE above
    rows: bool = False
    rows_min_pixels: int = 16384
    rows_small_max_pixels: int = 2048
    rows_max_batch: int = 16
    # selective analytic-backward BN (norm0 sits on the skip-concat
    # fan-out); A/B'd independently of the global normalization flag
    bn_vjp: bool = False

    @nn.compact
    def __call__(self, x, skip, target_hw, train: bool, rows_meta=None,
                 rows_out=False):
        region = rows_meta is not None and not self.is_initializing()
        if region:
            # continuous-region call: x (and skip) arrive in rows form
            b, hin = rows_meta
            rows = True
            if skip is not None:
                x = jnp.concatenate([x, skip], axis=-1)
        else:
            # rows eligibility gates on the OUTPUT plane (where the stage's
            # traffic lives); same measured policy zones as the blocks.
            px = target_hw[0] * target_hw[1]
            rows = (
                self.rows and not train and not self.is_initializing()
                and x.shape[0] <= self.rows_max_batch
                and (px >= self.rows_min_pixels
                     or px <= self.rows_small_max_pixels)
            )
            if skip is not None:
                x = jnp.concatenate([x, skip], axis=-1)
            b, hin = x.shape[0], x.shape[1]
            if rows:
                x = x.reshape(b * hin, 1, x.shape[2], x.shape[-1])
        x = TorchBatchNorm(use_running_average=not train, name="norm0",
                           dtype=self.dtype, custom_vjp=self.bn_vjp)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False,
            kernel_init=_CONV_INIT, name="conv_reduce", dtype=self.dtype,
        )(x)
        x = TorchBatchNorm(use_running_average=not train, name="norm1",
                           dtype=self.dtype, custom_vjp=self.bn_vjp)(x)
        x = nn.relu(x)
        return ConvTransposeToShape(self.features, self.dtype, name="transp_conv")(
            x, target_hw, rows_meta=(b, hin) if rows else None,
            rows_out=region and rows_out)


class Head(nn.Module):
    """Final refinement to heat-map logits: 2x nearest upsample, concat with
    the raw network input, then BN-ReLU-Conv3x3-BN-ReLU-Conv5x5
    (reference ``Upsample`` model:120 + ``dec_out_to_heat_maps``
    model:123-132; the upsample/concat moved in here so the fused fast path
    can own them).

    Fast path (``use_fused``, inference): the ENTIRE head runs at low
    resolution in phase space (``ops/fused.py::phase_space_head``): the
    upsample broadcast (2.0 GB HBM at b256), the 132-channel concat and the
    half-lane-idle refine0 collapse into one (2, 2) shift-and-share conv
    with phase-stacked output channels; refine1's 5x5 taps become a (3, 3)
    block-space conv; only the 12-channel logits expand to full resolution.
    (A Pallas version that re-interleaved refine0's output to NHWC in VMEM
    was measured SLOWER than the naive graph — the interleave is
    sublane-shuffle-bound — and removed; numbers in BASELINE.md.)
    """

    mid_features: int
    num_classes: int
    dtype: Any
    use_fused: bool = False
    fused_max_pixels: int = 98304
    impl: str = "auto"   # ModelSpec.phase_head_impl

    @nn.compact
    def __call__(self, x_lo, raw, train: bool, raw_parts=None):
        norm0 = TorchBatchNorm(use_running_average=not train, name="norm0", dtype=self.dtype)
        refine0 = nn.Conv(
            self.mid_features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=_CONV_INIT, name="refine0", dtype=self.dtype,
        )
        norm1 = TorchBatchNorm(use_running_average=not train, name="norm1", dtype=self.dtype)
        refine1 = nn.Conv(
            self.num_classes, (5, 5), padding=((2, 2), (2, 2)), use_bias=False,
            kernel_init=_CONV_INIT, name="refine1", dtype=self.dtype,
        )

        stats = self.variables.get("batch_stats", {})
        if self._fused_eligible(x_lo, raw) and "norm0" in stats and "norm1" in stats:
            if train:
                return self._phase_head_train(x_lo, raw, norm0, norm1)
            from ..ops.fused import phase_space_head

            params = self.variables["params"]
            # refine1 lowering: shifted-slice convs stay fused and win at
            # the working resolution; above ~100k output pixels the single
            # masked 4x4-conv form avoids four full-plane slice reads; at
            # batch 1 the rows-as-batch whole-head form sidesteps XLA's
            # pathological b1 layouts (19.4 -> measured in BASELINE.md r3);
            # and on TPU the Pallas row-strip kernel beats even that by
            # never materializing the window grid (ops/pallas/phase_head)
            big = raw.shape[1] * raw.shape[2] > 98304
            if self.impl != "auto":
                refine1_impl = self.impl
            elif not big:
                refine1_impl = "slices"
            elif (raw.shape[0] == 1 and x_lo.shape[1] % 8 == 0
                  and jax.default_backend() == "tpu"):
                refine1_impl = "strip"
            elif raw.shape[0] == 1:
                refine1_impl = "rows"
            else:
                refine1_impl = "single"
            return phase_space_head(
                x_lo.astype(self.dtype), raw.astype(self.dtype),
                norm0=params["norm0"], norm0_stats=stats["norm0"],
                refine0_kernel=params["refine0"]["kernel"],
                norm1=params["norm1"], norm1_stats=stats["norm1"],
                refine1_kernel=params["refine1"]["kernel"],
                eps=_BN_EPS, refine1_impl=refine1_impl,
                raw_parts=raw_parts if refine1_impl == "strip" else None,
            )

        x = _nearest_upsample_2x(x_lo)
        x = jnp.concatenate([x, raw], axis=-1)
        x = norm0(x)
        x = nn.relu(x)
        x = refine0(x)
        x = norm1(x)
        x = nn.relu(x)
        return refine1(x)

    def _phase_head_train(self, x_lo, raw, norm0, norm1):
        """Training-mode phase-space head: identical math to the plain
        pipeline (loss AND gradients), at low resolution.

        BN0's batch statistics over the upsampled stream equal the LOW-res
        statistics exactly (nearest-2x duplicates every value 4x), so they
        are computed without materializing the upsample; norm1's come from
        shifted slices of the window grid (every full-res position appears
        once across the four phases). The running-stat EMA updates go
        through the BN modules with the full-res virtual sample count, so
        eval later sees exactly what the plain path would have written.
        """
        from ..ops import fused as fused_ops
        from ..ops.normalization import _bn_train_compute

        params = self.variables["params"]
        dt = self.dtype
        c_up = x_lo.shape[-1]
        raw_ch = raw.shape[-1]
        hh, hw = x_lo.shape[1], x_lo.shape[2]
        n_full = raw.shape[0] * raw.shape[1] * raw.shape[2]

        # BN0 + ReLU per stream (plain autodiff — the custom-VJP BN was a
        # measured regression, see ops/normalization.py). The up stream's
        # batch stats at LOW res equal the stats over its nearest-2x
        # upsample exactly (every value duplicated 4x).
        s0 = params["norm0"]["scale"]
        bi0 = params["norm0"]["bias"]
        ya, mean_a, var_a, _ = _bn_train_compute(
            x_lo.astype(dt), s0[:c_up], bi0[:c_up], _BN_EPS)
        yr, mean_r, var_r, _ = _bn_train_compute(
            raw.astype(dt), s0[c_up:], bi0[c_up:], _BN_EPS)
        a = jnp.maximum(ya, 0).astype(dt)
        rn = jnp.maximum(yr, 0).astype(dt)
        # EMA side-effect with the full-res virtual sample count (fold
        # discarded — the normalize already happened above)
        norm0(None,
              stats_override=(jnp.concatenate([mean_a, mean_r]),
                              jnp.concatenate([var_a, var_r])),
              virtual_n=n_full, return_fold=True)

        w0p, w1p = fused_ops.fold_phase_head_weights(
            params["refine0"]["kernel"], params["refine1"]["kernel"],
            c_up, raw_ch,
        )
        P = fused_ops.phase_head_conv0(a, rn, w0p, dt)
        mean1, var1, _ = fused_ops.phase_head_norm1_stats_strips(
            P, hh, hw, self.mid_features
        )
        g1, b1 = norm1(None, stats_override=(mean1, var1),
                       virtual_n=n_full, return_fold=True)
        return fused_ops.phase_head_refine1_single(
            P, g1, b1, w1p, dt, hh, hw, self.mid_features
        )

    def _fused_eligible(self, x_lo, raw) -> bool:
        if not self.use_fused or self.is_initializing():
            return False
        if "refine0" not in self.variables.get("params", {}):
            return False
        return (
            raw.shape[1] == 2 * x_lo.shape[1]
            and raw.shape[2] == 2 * x_lo.shape[2]
            and raw.shape[1] * raw.shape[2] <= self.fused_max_pixels
        )



# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class DenseUNetLidar(nn.Module):
    """The full dual-stream Dense U-Net (see module docstring).

    ``__call__(rgb, lidar, train)`` takes NHWC inputs —
    ``rgb: (B, H, W, stream_1_in_channels)``,
    ``lidar: (B, H, W, stream_2_in_channels)`` (ignored for 'no' fusion) —
    and returns ``(B, H, W, num_classes)`` logits. H and W must reduce
    cleanly through 5 stride-2 stages (e.g. multiples of 32).
    """

    spec: ModelSpec

    @nn.compact
    def __call__(self, stream_1_data, stream_2_data=None, train: bool = False):
        spec = self.spec
        fusion = spec.fusion
        dt = spec.dtype
        stream_1_data = stream_1_data.astype(dt)
        if stream_2_data is not None:
            stream_2_data = stream_2_data.astype(dt)

        # fusion dispatch (reference model:224-235). raw_parts carries the
        # unconcatenated streams to the head — its strip kernel consumes
        # them per stream (relabels CSE with the s2d stems'), and the
        # raw_skip concat DCEs away when nothing else reads it
        if fusion == "no":
            raw_skip = stream_1_data
            enc_in = stream_1_data
            raw_parts = (stream_1_data,)
        elif fusion == "early":
            raw_skip = jnp.concatenate([stream_1_data, stream_2_data], axis=-1)
            enc_in = raw_skip
            raw_parts = (raw_skip,)
        else:  # mid
            raw_skip = jnp.concatenate([stream_1_data, stream_2_data], axis=-1)
            enc_in = stream_1_data
            raw_parts = (stream_1_data, stream_2_data)

        # encoder (+ parallel stream_2 up to the fusion point for 'mid')
        if fusion == "mid":
            s2, _, _ = Encoder(
                spec, spec.stream_2_in_channels,
                up_to_block=spec.concat_before_block_num,
                name="stream_2_features",
            )(stream_2_data, train)

        x, skips, shapes = self._encode_with_fusion(
            enc_in, s2 if fusion == "mid" else None, train
        )

        b, in_h = enc_in.shape[0], enc_in.shape[1]
        region = (_region_active(spec, b, in_h, enc_in.shape[2], train)
                  and not self.is_initializing())
        h_cur = in_h // 32 if region else None  # bottleneck plane H

        # decoder (reference model:255-261); skip/shape stacks pop LIFO
        stage_features = spec.decoder_stage_features()
        for i, feats in enumerate(stage_features):
            skip = skips.pop() if i > 0 else None
            target_hw = shapes.pop()
            # region exit happens INSIDE the last stage's transposed conv:
            # its rows lowering emits standard form via the same single
            # reshape the per-component path uses — an explicit
            # rows -> rows -> standard relabel pair after up4 did NOT fold
            # in XLA (a measured +1.2 ms retile on the 640x960 plane)
            last = i == len(stage_features) - 1
            x = DecoderStage(
                feats, dt, use_fused=spec.use_fused_kernels,
                rows=_rows_ok(spec, b, train),
                rows_min_pixels=spec.rows_min_pixels,
                rows_small_max_pixels=spec.rows_small_max_pixels,
                rows_max_batch=spec.rows_max_batch,
                bn_vjp=spec.decoder_bn_vjp and train,
                name=f"up{i + 1}",
            )(x, skip, target_hw, train,
              rows_meta=(b, h_cur) if region else None,
              rows_out=region and not last)
            if region:
                h_cur = target_hw[0]
        assert not skips and not shapes

        # 2x upsample (reference model:120) + head over the concat with the
        # raw input (model:264-265) — both live inside Head so its fused
        # fast path can eliminate the intermediate materializations
        return Head(stage_features[-1] // 2, spec.num_classes, dt,
                    use_fused=spec.use_fused_kernels,
                    fused_max_pixels=spec.fused_head_max_pixels,
                    impl=spec.phase_head_impl,
                    name="dec_out_to_heat_maps")(
            x, raw_skip, train, raw_parts=raw_parts)

    def _encode_with_fusion(self, enc_in, s2, train):
        """Main-stream encoder with the mid-fusion concat inserted right after
        ``transition{concat_before_block_num - 1}`` (reference model:53,242-245)."""
        spec = self.spec
        b, in_h, in_w = enc_in.shape[0], enc_in.shape[1], enc_in.shape[2]
        region = (_region_active(spec, b, in_h, enc_in.shape[2], train)
                  and not self.is_initializing())
        fuse_pool = (not region and not self.is_initializing()
                     and _stem_pool_ok(spec, b, in_h, in_w,
                                       enc_in.shape[3], train))
        x = EncoderStem(spec.num_init_features, spec.dtype, spec.s2d_stem,
                        rows=region or _rows_ok(spec, b, train),
                        rows_max_batch=spec.rows_max_batch,
                        rows_out=region,
                        fuse_pool=fuse_pool,
                        name="features_stem")(enc_in, train)
        if region:
            h_cur = in_h // 2
            shapes = [(h_cur, x.shape[2])]
            x = _maxpool_3x3_s2_p1_rows_io(x, b, h_cur)
            h_cur //= 2
        elif fuse_pool:
            h_cur = None
            shapes = [(in_h // 2, in_w // 2)]
        else:
            h_cur = None
            shapes = [(x.shape[1], x.shape[2])]
            x = _pool0(x, spec, train)

        skips = []
        num_features = spec.num_init_features
        for i, num_layers in enumerate(spec.block_config):
            x = DenseBlock(
                num_layers=num_layers,
                growth_rate=spec.growth_rate,
                bn_size=spec.bn_size,
                drop_rate=spec.drop_rate,
                dtype=spec.dtype,
                remat=spec.remat,
                impl=spec.impl_for_block(i),
                rows=spec.rows_for_block(i + 1),
                rows_min_pixels=spec.rows_min_pixels,
                rows_small_max_pixels=spec.rows_small_max_pixels,
                rows_max_batch=spec.rows_max_batch,
                rows_train=spec.rows_train,
                strip=spec.dense_block_strip,
                share_stats=spec.share_bn_stats,
                name=f"features_denseblock{i + 1}",
            )(x, train, rows_meta=(b, h_cur) if region else None)
            num_features += num_layers * spec.growth_rate
            if i < len(spec.block_config) - 1:
                skips.append(x)
                shapes.append((h_cur if region else x.shape[1], x.shape[2]))
                x = Transition(num_features // 2, spec.dtype,
                               rows=spec.rows_for_block(i + 1),
                               rows_min_pixels=spec.rows_min_pixels,
                               rows_small_max_pixels=spec.rows_small_max_pixels,
                               rows_max_batch=spec.rows_max_batch,
                               rows_train=spec.rows_train,
                               name=f"features_transition{i + 1}")(
                    x, train, rows_meta=(b, h_cur) if region else None
                )
                num_features //= 2
                if region:
                    h_cur //= 2
                if s2 is not None and (i + 1) == spec.concat_before_block_num - 1:
                    # rows or standard, both streams arrive in the SAME form
                    # (the stream_2 Encoder shares the region decision)
                    assert x.shape == s2.shape, f"{x.shape} vs {s2.shape}"  # model:243
                    x = ConcatFuse(
                        num_features, spec.dtype,
                        use_fused=spec.use_fused_kernels, name="concat_module",
                    )(x, s2, train)
        return x, skips, shapes


# ---------------------------------------------------------------------------
# Public constructors (reference model:311-388)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ModelBundle:
    """Module + initialized variables + config: the JAX-idiomatic stand-in for
    the reference's stateful ``nn.Module`` instance."""

    module: DenseUNetLidar
    variables: Any
    config: Any
    spec: ModelSpec

    @property
    def num_params(self) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(self.variables["params"]))

    def apply(self, rgb, lidar=None, train=False, variables=None, **kwargs):
        variables = variables if variables is not None else self.variables
        if train:
            return self.module.apply(
                variables, rgb, lidar, True, mutable=["batch_stats"], **kwargs
            )
        return self.module.apply(variables, rgb, lidar, False, **kwargs)


def _dense_u_net_lidar(arch, growth_rate, block_config, num_init_features,
                       pretrained, progress, config, *, init_hw=None, seed=None,
                       state_dict=None, lazy=False):
    """Create a model bundle (reference ``_dense_u_net_lidar`` model:311-332).

    ``pretrained`` loads torchvision DenseNet weights into the encoder
    stream(s) via :mod:`dmmfods_tpu.models.torch_port`. With no network
    egress, pass the downloaded torch ``state_dict`` explicitly or set
    ``config.model.pretrained_path`` to a local ``.pth`` file.
    ``lazy`` skips parameter initialization (shape-only uses).
    """
    from ..config import get_config

    if config is None:
        config = get_config()

    # for compatibility with densenet original constructors (model:323-325)
    config.model.growth_rate = growth_rate
    config.model.block_config = block_config
    config.model.num_init_features = num_init_features

    spec = ModelSpec.from_config(config)
    module = DenseUNetLidar(spec)

    variables = None
    if not lazy:
        if init_hw is None:
            # config.dataset.images.size is (C, W, H) per the reference
            _, w, h = config.dataset.images.size
            init_hw = (h, w)
        seed = config.agent.seed if seed is None else seed
        # Init runs once: do it eagerly on the host CPU backend (a jit-compile
        # of the full graph costs minutes; eager dispatch to a remote TPU is
        # worse), then transfer the param tree to the default device in one go.
        # LOCAL devices only: under multi-process, jax.devices() lists other
        # hosts' devices first and arrays committed there are unusable here.
        default = jax.local_devices()[0]
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu0 = default
        with jax.default_device(cpu0):
            # the zero inputs MUST be created inside this context: an input
            # placed on the default accelerator drags every eager init op
            # back there (r5 measured: 503 s of per-op tunnel round trips,
            # and the session it leaves behind wedges later bulk transfers)
            rgb = jnp.zeros(
                (1, init_hw[0], init_hw[1], spec.stream_1_in_channels),
                spec.dtype)
            lidar = (
                jnp.zeros(
                    (1, init_hw[0], init_hw[1], spec.stream_2_in_channels),
                    spec.dtype)
                if spec.stream_2_in_channels > 0
                else None
            )
            variables = module.init(jax.random.PRNGKey(seed), rgb, lidar, False)
        if default.platform != "cpu":
            variables = jax.device_put(variables, default)

        if pretrained:
            from .torch_port import load_torchvision_encoder

            if state_dict is None:
                path = config.model.get("pretrained_path", None)
                if path is not None:
                    import torch

                    state_dict = torch.load(path, map_location="cpu")
                elif config.model.get("pretrained_url_fetch", False):
                    # drop-in parity with reference _load_state_dict
                    # (model:269-309): fetch the torchvision checkpoint by
                    # URL. Opt-in only — most deployments have no egress.
                    state_dict = _fetch_torchvision_state_dict(arch, progress)
                else:
                    raise FileNotFoundError(
                        "pretrained=True needs `state_dict=`, "
                        "config.model.pretrained_path pointing at a local "
                        f"torchvision {arch} checkpoint, or "
                        "config.model.pretrained_url_fetch=True (requires "
                        "network egress)."
                    )
            variables = load_torchvision_encoder(variables, state_dict, spec)

    return ModelBundle(module=module, variables=variables, config=config, spec=spec)


# torchvision release URLs (reference model_urls consumed at model:269-309)
TORCHVISION_DENSENET_URLS = {
    "densenet121": "https://download.pytorch.org/models/densenet121-a639ec97.pth",
    "densenet161": "https://download.pytorch.org/models/densenet161-8d451a50.pth",
    "densenet169": "https://download.pytorch.org/models/densenet169-b2777c0a.pth",
    "densenet201": "https://download.pytorch.org/models/densenet201-c1103571.pth",
}


def _fetch_torchvision_state_dict(arch, progress=True):
    """Download the torchvision densenet checkpoint (reference
    ``_load_state_dict``'s ``load_state_dict_from_url``, model:284). Kept
    out of the default path: only runs when
    ``config.model.pretrained_url_fetch`` is set."""
    import torch

    url = TORCHVISION_DENSENET_URLS[arch]
    return torch.hub.load_state_dict_from_url(
        url, map_location="cpu", progress=progress
    )


def densenet121_u_lidar(pretrained=False, progress=True, config=None, **kwargs):
    """Densenet-121 backbone variant (reference model:335-346)."""
    return _dense_u_net_lidar("densenet121", 32, (6, 12, 24, 16), 64,
                              pretrained, progress, config, **kwargs)


def densenet161_u_lidar(pretrained=False, progress=True, config=None, **kwargs):
    """Densenet-161 backbone variant (reference model:349-360)."""
    return _dense_u_net_lidar("densenet161", 48, (6, 12, 36, 24), 96,
                              pretrained, progress, config, **kwargs)


def densenet169_u_lidar(pretrained=False, progress=True, config=None, **kwargs):
    """Densenet-169 backbone variant (reference model:363-374)."""
    return _dense_u_net_lidar("densenet169", 32, (6, 12, 32, 32), 64,
                              pretrained, progress, config, **kwargs)


def densenet201_u_lidar(pretrained=False, progress=True, config=None, **kwargs):
    """Densenet-201 backbone variant (reference model:377-388)."""
    return _dense_u_net_lidar("densenet201", 32, (6, 12, 48, 32), 64,
                              pretrained, progress, config, **kwargs)
