"""One-command real-data parity runner (``cli parity``).

The north-star acceptance question — "does the ported model reproduce the
reference torch agent's heat-map AP / IoU on the same data?" — answered by
one command the moment real Waymo data and a reference-trained checkpoint are
available:

    dmmfods-tpu parity --torch-ckpt checkpoint.pth.tar --data /path/to/val

Pipeline: port the torch checkpoint (``models/torch_port``), evaluate the
JAX model over every batch file in the data directory (dataset-level pooled
AP via ``metrics.StreamingAP`` + the reference's thresholded-IoU/accuracy
taxonomy), then — when the reference torch implementation is importable —
run the ACTUAL reference network (reference
``dmmfods/graphs/models/Dense_U_Net_lidar.py``) from the same checkpoint
over the same batches and print a side-by-side table. The torch side is
optional: without it the JAX column still prints (with a note), so the
command degrades gracefully on machines without the reference package.

Both sides are scored by the SAME host metric implementations — any gap in
the table is model behavior, never metric skew.
"""

from __future__ import annotations

import sys
from os.path import isdir, join
from pathlib import Path
from typing import Optional

import numpy as np

CLASS_NAMES = ("vehicle", "pedestrian", "cyclist")


def _batch_files(data_dir: str):
    """Sorted batch files in ``data_dir``: a flat directory of serialized
    dense batches (``.npy``/``.npz``/legacy torch files), or the reference's
    ``mode/subdir/...`` bucket layout (one level of subdirectories)."""
    root = Path(data_dir)
    files = sorted(
        p for p in root.iterdir()
        if p.is_file() and p.name != "labels" and not p.name.startswith(".")
    ) if root.is_dir() else []
    if not files:
        files = sorted(
            p for sub in sorted(root.iterdir()) if sub.is_dir()
            for p in sorted(sub.iterdir())
            if p.is_file() and p.name != "labels"
        )
    if not files:
        raise FileNotFoundError(f"no batch files under {data_dir}")
    return [str(p) for p in files]


class _Scorer:
    """Dataset-level metric accumulator, shared by both sides."""

    def __init__(self, num_classes=3, iou_threshold=0.7):
        from .. import metrics as metrics_lib

        self._m = metrics_lib
        self.ap = metrics_lib.StreamingAP(num_classes)
        self.iou_threshold = iou_threshold
        self.iou, self.nans, self.acc, self.n = [], [], [], 0

    def update(self, logits, ht_map):
        logits = np.asarray(logits, np.float32)
        ht_map = np.asarray(ht_map, np.float32)
        self.ap.update(self._m.binned_ap_counts(ht_map, logits))
        inst = self._m.compute_iou_batch(logits, ht_map, self.iou_threshold)
        iou, nans = self._m.aggregate_iou(inst)
        self.iou.append(np.asarray(iou))
        self.nans.append(np.asarray(nans))
        self.acc.append(np.asarray(
            self._m.compute_accuracy(ht_map, logits, self.iou_threshold)))
        self.n += logits.shape[0]

    def result(self):
        return {
            "ap_per_class": np.asarray(self.ap.result(), np.float64),
            "iou_per_class": np.mean(self.iou, axis=0),
            "iou_nans": np.sum(self.nans, axis=0),
            "acc_per_class": np.mean(self.acc, axis=0),
            "frames": self.n,
        }


def _import_reference_model(reference_root: Optional[str] = None):
    """The reference torch implementation, or ``(None, reason)``.

    Works with the reference package installed (``pip install dmmfods``) or
    a source checkout passed via ``--reference-root``."""
    if reference_root:
        if not isdir(join(reference_root, "dmmfods")):
            return None, f"no dmmfods package under {reference_root}"
        if reference_root not in sys.path:
            sys.path.insert(0, reference_root)
    try:
        from dmmfods.graphs.models import Dense_U_Net_lidar as ref_mod

        return ref_mod.Dense_U_Net_lidar, None
    except Exception as exc:  # ImportError, torchvision missing, ...
        return None, f"reference torch model unavailable ({exc})"


def evaluate_jax(bundle, files, config):
    """Score the JAX model over every batch file (jitted forward)."""
    import jax

    from ..data.waymo import load_dense_batch_file
    from .cache import jit_auto_out

    module, variables, spec = bundle.module, bundle.variables, bundle.spec
    single = spec.stream_2_in_channels == 0

    @jit_auto_out
    def forward(rgb, lidar):
        out = module.apply(variables, rgb, None if single else lidar, False)
        return out.astype(jax.numpy.float32)

    scorer = _Scorer(spec.num_classes, config.agent.iou_threshold)
    for path in files:
        image, lidar, ht = load_dense_batch_file(path)
        logits = forward(
            image.astype(np.dtype(spec.dtype)),
            lidar.astype(np.dtype(spec.dtype)),
        )
        scorer.update(logits, ht)
    return scorer.result()


def evaluate_torch(torch_model, files, config):
    """Score the reference torch network over the same batch files with the
    same metrics (reference eval semantics: ``model.eval()``, raw logits)."""
    import torch

    from ..data.waymo import load_dense_batch_file

    torch_model.eval()
    scorer = _Scorer(config.model.num_classes, config.agent.iou_threshold)
    with torch.no_grad():
        for path in files:
            image, lidar, ht = load_dense_batch_file(path)
            # reference consumes NCHW (agent:238-244)
            rgb_t = torch.from_numpy(np.transpose(image, (0, 3, 1, 2)).copy())
            lidar_t = torch.from_numpy(np.transpose(lidar, (0, 3, 1, 2)).copy())
            out = torch_model(
                rgb_t, lidar_t if torch_model.fusion != "no" else None
            ).numpy()
            scorer.update(np.transpose(out, (0, 2, 3, 1)), ht)
    return scorer.result()


def format_side_by_side(jax_res, torch_res=None, torch_note=None) -> str:
    """The parity table: per-class AP / IoU / accuracy, JAX vs torch."""
    lines = []
    cols = "metric".ljust(24) + "jax (this framework)".rjust(22)
    if torch_res is not None:
        cols += "torch (reference)".rjust(20) + "abs diff".rjust(12)
    lines.append(cols)
    lines.append("-" * len(cols))

    def row(name, a, b):
        line = name.ljust(24) + f"{a:.6f}".rjust(22)
        if b is not None:
            line += f"{b:.6f}".rjust(20) + f"{abs(a - b):.6f}".rjust(12)
        return line

    for key, label in (("ap_per_class", "AP"), ("iou_per_class", "IoU"),
                       ("acc_per_class", "accuracy")):
        a = np.asarray(jax_res[key], np.float64)
        b = (np.asarray(torch_res[key], np.float64)
             if torch_res is not None else None)
        for c, cname in enumerate(CLASS_NAMES[:len(a)]):
            lines.append(row(f"{label}/{cname}", float(np.nan_to_num(a[c])),
                             None if b is None else float(np.nan_to_num(b[c]))))
        lines.append(row(f"{label}/mean", float(np.nan_to_num(a).mean()),
                         None if b is None else float(np.nan_to_num(b).mean())))
    lines.append(f"frames: {jax_res['frames']}")
    if torch_res is None:
        lines.append(f"note: torch column skipped — {torch_note}")
    return "\n".join(lines)


def run_parity(config, torch_checkpoint: str, data_dir: str, *,
               reference_root: Optional[str] = None,
               torch_model_cls=None, full_model: bool = True, bundle=None):
    """Port ``torch_checkpoint``, evaluate both sides on ``data_dir``, and
    return ``(jax_result, torch_result_or_None, table_text)``.

    ``torch_model_cls`` / ``bundle``: injection points for tests (default:
    the reference implementation / a fresh DenseNet-121 bundle)."""
    import torch

    from ..models.dense_unet_lidar import densenet121_u_lidar
    from ..models.torch_port import load_full_torch_model, load_torchvision_encoder

    raw = torch.load(torch_checkpoint, map_location="cpu", weights_only=False)
    state_dict = (raw.get(config.agent.checkpoint.state_dict, raw)
                  if isinstance(raw, dict) else raw)

    if bundle is None:
        bundle = densenet121_u_lidar(config=config)
    if full_model:
        bundle.variables, missing = load_full_torch_model(
            bundle.variables, state_dict, bundle.spec)
        real_missing = [k for k in missing
                        if not k.endswith("num_batches_tracked")]
        if real_missing:
            print(f"note: {len(real_missing)} checkpoint keys had no target "
                  f"(first: {real_missing[:3]})")
    else:
        bundle.variables = load_torchvision_encoder(
            bundle.variables, state_dict, bundle.spec)

    files = _batch_files(data_dir)
    jax_res = evaluate_jax(bundle, files, config)

    torch_res, note = None, None
    if torch_model_cls is None:
        torch_model_cls, note = _import_reference_model(reference_root)
    if torch_model_cls is not None:
        torch_model = torch_model_cls(config)
        torch_model.load_state_dict(state_dict)
        torch_res = evaluate_torch(torch_model, files, config)

    table = format_side_by_side(jax_res, torch_res, note)
    return jax_res, torch_res, table
