"""Device-side Waymo preprocessing math, vectorized for TPU.

Re-implements, as fixed-shape jnp programs, the per-sample Python loops of the
reference offline ETL (``dmmfods/utils/Dense_U_Net_lidar_helper.py``):

* bbox -> class heat-map rasterization (reference ``create_ground_truth_maps``
  helper.py:276-305 and the pedestrian silhouette prior helper.py:233-252),
* LiDAR point splat into an image-plane range image (reference
  ``lidar_array_to_image_like_tensor`` helper.py:493-515),
* LiDAR distance inversion / binning / pooling (reference
  ``pool_lidar_tensor`` helper.py:446-491),
* 10x avg/max downsizing pools (reference helper.py:430-444).

Everything here is pure, static-shape, jit-able, and vmap-able; variable-length
box/point lists are carried as fixed-size padded buffers. Layout is
channel-LAST (H, W, C) — the TPU-native layout — whereas the reference stores
(C, H, W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Waymo label types (reference helper.py:162-168)
TYPE_VEHICLE = 1
TYPE_PEDESTRIAN = 2
TYPE_CYCLIST = 4

# class -> heat-map channel remap {1,2,4} -> {0,1,2} (reference helper.py:301)
_CLASS_TO_CHANNEL = {TYPE_VEHICLE: 0, TYPE_PEDESTRIAN: 1, TYPE_CYCLIST: 2}


# ---------------------------------------------------------------------------
# Ground-truth heat-map rasterization
# ---------------------------------------------------------------------------


def _pedestrian_template_value(row_rel, col_rel, height, width):
    """Silhouette-prior value at box-relative integer coords.

    Mirrors the region fills of the reference pedestrian prior
    (helper.py:233-252): a box of ones with
      rows [0, h//5)  x cols [0, w//4) and [3*w//4, w): 0.3   (head corners)
      rows [3*h//5,h) x cols [0, w//4) and [3*w//4, w): 0.5   (leg corners)
      rows [3*h//5,h) x cols [w//4, 3*w//4):            0.75  (legs)
    everything else 1.0.
    """
    hf = height // 5
    wf = width // 4
    top = row_rel < hf
    bottom = row_rel >= 3 * hf
    left = col_rel < wf
    right = col_rel >= 3 * wf
    side = left | right

    value = jnp.ones_like(row_rel, dtype=jnp.float32)
    value = jnp.where(top & side, 0.3, value)
    value = jnp.where(bottom & side, 0.5, value)
    value = jnp.where(bottom & ~side, 0.75, value)
    return value


def rasterize_heatmaps(boxes, height=1280, width=1920, *, num_classes=3):
    """Rasterize padded boxes into ``(height, width, num_classes)`` heat maps.

    Args:
      boxes: int32 ``(N, 5)`` rows ``[type, x, y, w, h]`` with ``x, y`` the
        upper-left corner in pixels; rows with ``type`` not in {1, 2, 4} are
        ignored (use type 0 for padding). Matches the label-dict fields
        produced by the reference converter (helper.py:633-639).
      height/width: raster resolution (the reference rasterizes at the full
        1280x1920 camera resolution, then 10x max-pools; see
        ``rasterize_heatmaps_pooled``).

    Semantics match reference ``create_ground_truth_maps`` (helper.py:276-305)
    exactly, including its *overwrite* behavior: boxes are applied in array
    order and a later box overwrites earlier values inside its rectangle
    (relevant for overlapping pedestrians whose corner prior is < 1).
    """
    boxes = jnp.asarray(boxes, jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def apply_box(maps, box):
        btype, x, y, w, h = box[0], box[1], box[2], box[3], box[4]
        in_box = (rows >= y) & (rows < y + h) & (cols >= x) & (cols < x + w)

        ped = _pedestrian_template_value(rows - y, cols - x, h, w)
        fill = jnp.where(btype == TYPE_PEDESTRIAN, ped, 1.0)

        channel = jnp.where(
            btype == TYPE_VEHICLE, 0, jnp.where(btype == TYPE_PEDESTRIAN, 1, 2)
        )
        valid = (btype == TYPE_VEHICLE) | (btype == TYPE_PEDESTRIAN) | (btype == TYPE_CYCLIST)

        onehot = (
            lax.broadcasted_iota(jnp.int32, (maps.shape[-1],), 0) == channel
        ) & valid
        write = in_box[:, :, None] & onehot[None, None, :]
        maps = jnp.where(write, fill[:, :, None], maps)
        return maps, None

    init = jnp.zeros((height, width, num_classes), jnp.float32)
    maps, _ = lax.scan(apply_box, init, boxes)
    return maps


def maxpool2d(x, window, stride=None):
    """Channel-last max pool, VALID padding (torch MaxPool2d default)."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(window[0], window[1], 1),
        window_strides=(stride[0], stride[1], 1),
        padding="VALID",
    )


def avgpool2d(x, window, stride=None):
    """Channel-last average pool, VALID padding (torch AvgPool2d default)."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(window[0], window[1], 1),
        window_strides=(stride[0], stride[1], 1),
        padding="VALID",
    )
    return summed / (window[0] * window[1])


def rasterize_heatmaps_pooled(boxes, height=1280, width=1920, pool=10):
    """Full-res rasterize + ``pool``x max-pool, as stored by the reference ETL
    (helper.py:643-646): ``maxpool_tensor(create_ground_truth_maps(labels))``.
    Returns ``(height//pool, width//pool, 3)``.
    """
    return maxpool2d(rasterize_heatmaps(boxes, height, width), pool)


def _pedestrian_window_max(r0, r1, c0, c1, h, w):
    """Max of the pedestrian template over the box-relative region
    [r0, r1) x [c0, c1) — closed-form, no full-res raster.

    Template cells (see ``_pedestrian_template_value``): top side corners
    0.3, bottom side corners 0.5, bottom center 0.75, everything else 1.0.
    """
    hf = h // 5
    wf = w // 4
    top = r0 < hf
    mid = (r1 > hf) & (r0 < 3 * hf)
    bot = r1 > 3 * hf
    left = c0 < wf
    center = (c1 > wf) & (c0 < 3 * wf)
    right = c1 > 3 * wf
    side = left | right

    val = jnp.zeros_like(r0, dtype=jnp.float32)
    val = jnp.maximum(val, jnp.where(top & side, 0.3, 0.0))
    val = jnp.maximum(val, jnp.where(bot & side, 0.5, 0.0))
    val = jnp.maximum(val, jnp.where(bot & center, 0.75, 0.0))
    val = jnp.maximum(val, jnp.where(mid | (top & center), 1.0, 0.0))
    return val


def rasterize_heatmaps_direct(boxes, out_height=128, out_width=192, pool=10,
                              *, num_classes=3):
    """Rasterize straight onto the pooled grid — the device-side fast path.

    Computes, per output pixel, the value max-pooling the full-res raster
    would produce: a ``pool x pool`` window holds a box's fill iff it
    intersects the box, and for pedestrians the window value is the
    closed-form template max over the intersection. ~``pool**2`` x less VPU
    work than :func:`rasterize_heatmaps_pooled`, suitable for running
    *inside* the jitted train step (north-star device-side preprocessing).

    Exactly equal to the pooled reference path for non-overlapping boxes
    (the overwhelmingly common case); for boxes of the same class that
    overlap, overwrite-order mixing inside a shared window can differ in
    those windows (the offline converter keeps the exact path).
    """
    boxes = jnp.asarray(boxes, jnp.int32)
    rows = lax.broadcasted_iota(jnp.int32, (out_height, out_width), 0)
    cols = lax.broadcasted_iota(jnp.int32, (out_height, out_width), 1)
    win_y0 = rows * pool
    win_y1 = win_y0 + pool
    win_x0 = cols * pool
    win_x1 = win_x0 + pool

    def apply_box(maps, box):
        btype, x, y, w, h = box[0], box[1], box[2], box[3], box[4]
        intersects = (win_y1 > y) & (win_y0 < y + h) & (win_x1 > x) & (win_x0 < x + w)
        # intersection region in box-relative coords
        r0 = jnp.maximum(win_y0 - y, 0)
        r1 = jnp.minimum(win_y1 - y, h)
        c0 = jnp.maximum(win_x0 - x, 0)
        c1 = jnp.minimum(win_x1 - x, w)
        ped = _pedestrian_window_max(r0, r1, c0, c1, h, w)
        fill = jnp.where(btype == TYPE_PEDESTRIAN, ped, 1.0)

        channel = jnp.where(
            btype == TYPE_VEHICLE, 0, jnp.where(btype == TYPE_PEDESTRIAN, 1, 2)
        )
        valid = (btype == TYPE_VEHICLE) | (btype == TYPE_PEDESTRIAN) | (btype == TYPE_CYCLIST)
        onehot = (
            lax.broadcasted_iota(jnp.int32, (maps.shape[-1],), 0) == channel
        ) & valid
        write = intersects[:, :, None] & onehot[None, None, :]
        return jnp.where(write, fill[:, :, None], maps), None

    init = jnp.zeros((out_height, out_width, num_classes), jnp.float32)
    maps, _ = lax.scan(apply_box, init, boxes)
    return maps


# ---------------------------------------------------------------------------
# LiDAR range image
# ---------------------------------------------------------------------------


def lidar_points_to_range_image(
    points, num_valid, height=1280, width=1920, kernel_size=5, *, mode="last"
):
    """Splat projected LiDAR points into a ``(height, width, 1)`` range image.

    Args:
      points: float32 ``(N, 3)`` rows ``[x, y, distance]`` (image-plane pixel
        coords + range), zero-padded to fixed N.
      num_valid: scalar int, number of valid rows in ``points``.
      kernel_size: splat footprint (reference default 5; helper.py:493).
      mode: ``'last'`` reproduces the reference sequential-overwrite semantics
        (helper.py:503-513: the last point in array order wins on overlap);
        ``'nearest'`` keeps the closest point instead — physically preferable
        and cheaper (single scatter-min), used by the device-side fast path.

    Returns a 2-D ``(height, width)`` image: a trailing singleton channel at
    full resolution would be lane-padded 1 -> 128 by the TPU layout
    (observed: a (32, 1280, 1920, 1) f32 buffer allocates 40 GB); the
    channel dim is added after pooling (``pool_lidar_image``).

    Empty pixels are ``-1.0`` as in the reference (helper.py:501). The
    reference's slice clamping means the last row and column are never
    written (``max_y = shape-1`` exclusive, helper.py:507-511); reproduced.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    shift = (kernel_size - 1) // 2

    # int() in the reference truncates toward zero
    px = jnp.trunc(points[:, 0]).astype(jnp.int32)
    py = jnp.trunc(points[:, 1]).astype(jnp.int32)
    d = points[:, 2]
    valid = (
        lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < num_valid
    )

    # Build the 5x5 footprint as ONE scatter over all kernel_size^2 offsets
    # (a chain of 25 scatters makes XLA keep 25 full-res buffers live — OOM
    # at training batch sizes; a single scatter needs only one).
    offsets_y = jnp.repeat(jnp.arange(-shift, shift + 1), kernel_size)  # (k*k,)
    offsets_x = jnp.tile(jnp.arange(-shift, shift + 1), kernel_size)
    ty = (py[:, None] + offsets_y[None, :]).reshape(-1)  # (n*k*k,)
    tx = (px[:, None] + offsets_x[None, :]).reshape(-1)
    ok = (
        jnp.repeat(valid, kernel_size * kernel_size)
        & (ty >= 0) & (ty <= height - 2) & (tx >= 0) & (tx <= width - 2)
    )
    ty = jnp.where(ok, ty, 0)
    tx = jnp.where(ok, tx, 0)

    if mode == "nearest":
        # scatter-min of distance; +inf init, then -1 for untouched pixels
        val = jnp.where(ok, jnp.repeat(d, kernel_size * kernel_size), jnp.inf)
        img = jnp.full((height, width), jnp.inf, jnp.float32)
        img = img.at[ty, tx].min(val, mode="drop")
        return jnp.where(jnp.isinf(img), -1.0, img)

    if mode != "last":
        raise ValueError(f"unknown splat mode {mode!r}")

    # 'last' (reference parity): scatter-max of the point *index*, then gather
    # that winner's distance. Later points have larger indices, so max-index
    # == last-written, reproducing sequential overwrite.
    order = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    key = jnp.where(ok, jnp.repeat(order, kernel_size * kernel_size), -1)
    winner = jnp.full((height, width), -1, jnp.int32)
    winner = winner.at[ty, tx].max(key, mode="drop")
    return jnp.where(winner >= 0, d[jnp.clip(winner, 0, n - 1)], -1.0)


LIDAR_MAX_RANGE = 75.0


def bin_lidar_range(x):
    """Invert + bin raw distances, reference semantics (helper.py:446-478):

      d > 75       -> 75          (clip; waymo mid-range truncation)
      d == -1      -> 76          (empty marker)
      d <= 25      -> d * -6.2 + 255   (155 bins for the close [0, 25m])
      25 < d <= 76 -> d * -2 + 150     (100 bins for (25m, 75m]; empty -> -2)
    """
    x = jnp.where(x > LIDAR_MAX_RANGE, LIDAR_MAX_RANGE, x)
    x = jnp.where(x == -1.0, LIDAR_MAX_RANGE + 1.0, x)
    close = x * -6.2 + 255.0
    far = x * -2.0 + 150.0
    return jnp.where(x <= 25.0, close, far)


def pool_lidar_image(range_image):
    """Bin + (20, 10)/s(10, 10) max-pool + replicate-pad + clamp-negatives.

    Matches reference ``pool_lidar_tensor`` (helper.py:446-491): the (20, 10)
    receptive field (> stride) swallows empty pixels between scan lines; the
    one-row bottom replicate pad restores 128 rows; leftover empty (-2) values
    become 0. Input ``(1280, 1920)`` (or with a trailing singleton channel)
    -> output ``(128, 192, 1)``.
    """
    if range_image.ndim == 3:
        range_image = range_image[:, :, 0]
    x = bin_lidar_range(range_image)
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (20, 10), (10, 10), "VALID"
    )
    x = jnp.concatenate([x, x[-1:, :]], axis=0)  # replicate-pad bottom row
    return jnp.where(x < 0.0, 0.0, x)[:, :, None]


def lidar_points_to_model_input(points, num_valid, height=1280, width=1920, *, mode="last"):
    """Full device-side LiDAR path: splat -> bin -> pool -> (H/10, W/10, 1).

    ``mode='nearest_pooled'`` is the training fast path: it skips the
    full-resolution range image entirely (see
    :func:`lidar_points_to_model_input_pooled`).
    """
    if mode == "nearest_pooled":
        return lidar_points_to_model_input_pooled(points, num_valid, height, width)
    return pool_lidar_image(
        lidar_points_to_range_image(points, num_valid, height, width, mode=mode)
    )


def lidar_points_to_model_input_pooled(points, num_valid, height=1280, width=1920):
    """Direct-to-pooled LiDAR fast path (equivalent to ``mode='nearest'``).

    The binning formula is monotonically DECREASING in distance, so the
    (20, 10) max-pool of the binned full-res image equals
    ``bin(min distance among splatted pixels in the window)``. Instead of
    scattering 25 offsets into the 1280x1920 image (profiled at ~340 ms/step
    for batch 32 training — 9x the model itself), scatter-min distances
    straight onto the 127x192 pooled grid: each point's 5x5 footprint
    intersects at most 3 pooled rows (20-tall windows, stride 10) x 2 pooled
    cols, i.e. 6 scatter rows/point instead of 25 onto a 33x smaller target.

    Numerically identical to ``pool_lidar_image(splat(mode='nearest'))``
    (verified in tests), including the footprint edge clamps and the bottom
    replicate-pad row.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    out_h = height // 10 - 1  # pre-pad rows: (height - 20) // 10 + 1
    out_w = width // 10

    px = jnp.trunc(points[:, 0]).astype(jnp.int32)
    py = jnp.trunc(points[:, 1]).astype(jnp.int32)
    d = points[:, 2]
    valid = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < num_valid

    # clipped 5x5 footprint bounds (matching the splat's edge semantics:
    # rows/cols [max(p-2,0), min(p+2, dim-2)])
    ylo = jnp.maximum(py - 2, 0)
    yhi = jnp.minimum(py + 2, height - 2)
    xlo = jnp.maximum(px - 2, 0)
    xhi = jnp.minimum(px + 2, width - 2)
    fp_valid = valid & (ylo <= yhi) & (xlo <= xhi)

    img = jnp.full((out_h, out_w), jnp.inf, jnp.float32)
    r_top = jnp.floor_divide(yhi, 10)     # last window whose start <= yhi
    c_top = jnp.floor_divide(xhi, 10)
    for dr in (0, 1, 2):                  # windows are 20 tall / stride 10
        for dc in (0, 1):                 # windows are 10 wide / stride 10
            r = r_top - dr
            c = c_top - dc
            ok = (
                fp_valid
                & (r >= 0) & (r < out_h) & (c >= 0) & (c < out_w)
                & (10 * r + 20 > ylo)     # window intersects footprint rows
                & (10 * c + 10 > xlo)     # window intersects footprint cols
            )
            rr = jnp.where(ok, r, 0)
            cc = jnp.where(ok, c, 0)
            val = jnp.where(ok, d, jnp.inf)
            img = img.at[rr, cc].min(val, mode="drop")

    # empty windows: every full-res pixel is -1 -> 76 -> binned -2 -> clamp 0
    binned = jnp.where(jnp.isinf(img), -2.0, bin_lidar_range(img))
    binned = jnp.concatenate([binned, binned[-1:, :]], axis=0)  # replicate pad
    return jnp.where(binned < 0.0, 0.0, binned)[:, :, None]


def downsize_image(img):
    """10x avg-pool for RGB storage downsizing (reference helper.py:430-436).
    ``(H, W, C)`` -> ``(H//10, W//10, C)``."""
    return avgpool2d(img, 10)


def boxes_to_point_heatmaps(bbs, size_maps=(1080, 1920, 3)):
    """Point-sparse heat maps from a bounding-box corner array.

    Channel-last re-design of the reference's (unused) ``bbs_To_Heatmaps``
    (helper.py:734-746): one hot pixel per box at its (x, y) coordinate in
    its class channel. ``bbs``: int ``(N, 3)`` rows ``[class_idx, x, y]``.
    Returns ``(H, W, C)``.
    """
    bbs = jnp.asarray(bbs, jnp.int32)
    h, w, c = size_maps
    heatmaps = jnp.zeros((h, w, c), jnp.float32)
    return heatmaps.at[bbs[:, 2], bbs[:, 1], bbs[:, 0]].set(1.0, mode="drop")


# Batched convenience wrappers -------------------------------------------------

rasterize_heatmaps_batch = jax.vmap(rasterize_heatmaps_pooled, in_axes=(0,))
lidar_batch_to_model_input = jax.vmap(
    functools.partial(lidar_points_to_model_input), in_axes=(0, 0)
)
