"""Torch/torchvision checkpoint import.

Re-implements the reference pretrained-weight bootstrap
(``dmmfods/graphs/models/Dense_U_Net_lidar.py:269-309``) for the JAX model:

* legacy torchvision densenet keys ``...denselayerK.norm.1.weight`` are
  re-keyed to ``norm1`` (reference model:281-282);
* ``features.conv0.weight`` is dropped when the network input channel count
  differs from the checkpoint (early fusion or non-RGB stream_1,
  reference model:295-296);
* for mid fusion, stream_1 encoder weights are mirrored into stream_2
  except its conv0 (reference model:304-309);
* layout conversion: conv ``(O, I, kh, kw)`` -> HWIO; transposed conv
  ``(I, O, kh, kw)`` -> spatially-flipped HWIO (the model expresses
  ConvTranspose as an ``lhs_dilation`` correlation — see
  ``ConvTransposeToShape``); BN ``weight/bias`` -> ``scale/bias`` params and
  ``running_mean/var`` -> ``batch_stats``.

Also handles *full* reference-trained model checkpoints (decoder /
concat_module / head keys), so a user can move a torch-trained DMMFODS model
onto TPU.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

_LEGACY_PATTERN = re.compile(
    r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|running_mean|running_var))$"
)


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def normalize_torch_keys(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Re-key legacy ``norm.1`` style entries and convert values to numpy."""
    out = {}
    for key, value in state_dict.items():
        m = _LEGACY_PATTERN.match(key)
        if m:
            key = m.group(1) + m.group(2)
        out[key] = _to_numpy(value)
    return out


def conv_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> HWIO (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convtranspose_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flipped HWIO.

    ``ConvTransposeToShape`` computes a correlation over the stride-dilated
    input, which equals torch's transposed conv with the kernel spatially
    flipped (verified numerically in tests/test_model.py).
    """
    return np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(0, 1)).copy()


# (torch module path prefix) -> (flax collection path prefix) for the
# non-encoder parts; encoder prefixes are computed programmatically.
def _decoder_path(torch_key: str):
    """Map decoder/head/concat torch keys to flax paths.

    Reference naming: ``decoder.Transposed_Convolution_Sequence_%d.{norm0,
    conv_reduce,norm1}``, ``decoder.Transposed_Convolution_%d`` (model:116-118),
    ``concat_module.{norm,conv}`` (model:187-192),
    ``dec_out_to_heat_maps.{norm0,refine0,norm1,refine1}`` (model:123-132).
    Ours: ``up{i}/{norm0,conv_reduce,norm1,transp_conv}``, ``concat_module/*``,
    ``dec_out_to_heat_maps/*``.
    """
    m = re.match(r"^decoder\.Transposed_Convolution_Sequence_(\d+)\.(\w+)\.(\w+)$", torch_key)
    if m:
        return (f"up{m.group(1)}", m.group(2)), m.group(3), "conv" if m.group(2).startswith("conv") else "bn"
    m = re.match(r"^decoder\.Transposed_Convolution_(\d+)\.(\w+)$", torch_key)
    if m:
        return (f"up{m.group(1)}", "transp_conv"), m.group(2), "convT"
    m = re.match(r"^concat_module\.(\w+)\.(\w+)$", torch_key)
    if m:
        return ("concat_module", m.group(1)), m.group(2), "conv" if m.group(1) == "conv" else "bn"
    m = re.match(r"^dec_out_to_heat_maps\.(\w+)\.(\w+)$", torch_key)
    if m:
        return ("dec_out_to_heat_maps", m.group(1)), m.group(2), "conv" if m.group(1).startswith("refine") else "bn"
    return None


def _encoder_path(torch_key: str, *, stream2: bool):
    """Map ``features.*`` / ``stream_2_features.*`` keys to flax paths.

    Main-stream flax names are flattened (``features_stem``,
    ``features_denseblock1`` ...); stream_2 is an ``Encoder`` submodule
    (``stream_2_features/stem`` ...).
    """
    prefix = "stream_2_features." if stream2 else "features."
    if not torch_key.startswith(prefix):
        return None
    rest = torch_key[len(prefix):]

    def flax_top(name):
        if stream2:
            return ("stream_2_features", "stem" if name in ("conv0", "norm0") else name)
        if name in ("conv0", "norm0"):
            return ("features_stem",)
        return (f"features_{name}",)

    m = re.match(r"^(conv0|norm0)\.(\w+)$", rest)
    if m:
        base = flax_top(m.group(1))
        return base + (m.group(1),), m.group(2), "conv" if m.group(1) == "conv0" else "bn"
    m = re.match(r"^(denseblock\d+)\.(denselayer\d+)\.(\w+)\.(\w+)$", rest)
    if m:
        base = flax_top(m.group(1))
        kind = "conv" if m.group(3).startswith("conv") else "bn"
        return base + (m.group(2), m.group(3)), m.group(4), kind
    m = re.match(r"^(transition\d+)\.(norm|conv)\.(\w+)$", rest)
    if m:
        base = flax_top(m.group(1))
        return base + (m.group(2),), m.group(3), "conv" if m.group(2) == "conv" else "bn"
    return None  # norm5 / classifier / unknown -> skipped (strict=False parity)


def _assign(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    expected = node[path[-1]]
    if tuple(expected.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"checkpoint {value.shape} vs model {expected.shape}")
    node[path[-1]] = jnp.asarray(value, dtype=expected.dtype)
    return True


def _place(params, batch_stats, flax_path, attr, kind, value):
    """Route one torch tensor into params/batch_stats with layout conversion."""
    if kind in ("conv", "convT"):
        if attr != "weight":
            return False  # conv bias never used in this architecture
        kernel = (
            convtranspose_kernel_to_hwio(value) if kind == "convT" else conv_kernel_to_hwio(value)
        )
        return _assign(params, flax_path + ("kernel",), kernel)
    # batch norm
    if attr == "weight":
        return _assign(params, flax_path + ("scale",), value)
    if attr == "bias":
        return _assign(params, flax_path + ("bias",), value)
    if attr == "running_mean":
        return _assign(batch_stats, flax_path + ("mean",), value)
    if attr == "running_var":
        return _assign(batch_stats, flax_path + ("var",), value)
    return False  # num_batches_tracked etc.


def load_torchvision_encoder(variables, state_dict, spec, *, strict=False):
    """Load a torchvision densenet ``state_dict`` into the encoder stream(s).

    Mirrors reference ``_load_state_dict`` (model:269-309): drops
    ``features.conv0.weight`` when input channels differ, loads everything
    matching into stream_1, and for mid fusion mirrors stream_1 weights
    (minus conv0) into stream_2. Returns updated ``variables``.
    """
    import jax

    sd = normalize_torch_keys(state_dict)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-copy tree
    params = _deep_mutable(variables["params"])
    batch_stats = _deep_mutable(variables.get("batch_stats", {}))

    drop_conv0 = spec.fusion == "early" or spec.stream_1_in_channels != 3
    loaded, skipped = 0, []
    for key, value in sd.items():
        if key == "features.conv0.weight" and drop_conv0:
            continue
        mapped = _encoder_path(key, stream2=False)
        if mapped is None:
            skipped.append(key)
            continue
        flax_path, attr, kind = mapped
        if _place(params, batch_stats, flax_path, attr, kind, value):
            loaded += 1
        else:
            skipped.append(key)

    # stream_2 mirroring (model:304-309): every stream_1 weight that has a
    # stream_2 counterpart, except conv0.
    if spec.fusion == "mid":
        for key, value in sd.items():
            if key == "features.conv0.weight":
                continue
            mapped = _encoder_path("stream_2_" + key, stream2=True)
            if mapped is None:
                continue
            flax_path, attr, kind = mapped
            if _place(params, batch_stats, flax_path, attr, kind, value):
                loaded += 1

    if strict and skipped:
        unexpected = [k for k in skipped if not k.startswith(("classifier", "features.norm5"))]
        if unexpected:
            raise KeyError(f"unmapped checkpoint keys: {unexpected[:10]}")

    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_full_torch_model(variables, state_dict, spec):
    """Load a *full* reference-trained DMMFODS torch checkpoint (encoder +
    stream_2 + concat_module + decoder + head) into the JAX model."""
    import jax

    sd = normalize_torch_keys(state_dict)
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = _deep_mutable(variables["params"])
    batch_stats = _deep_mutable(variables.get("batch_stats", {}))

    missing = []
    for key, value in sd.items():
        mapped = (
            _encoder_path(key, stream2=False)
            or _encoder_path(key, stream2=True)
            or _decoder_path(key)
        )
        if mapped is None:
            missing.append(key)
            continue
        flax_path, attr, kind = mapped
        if not _place(params, batch_stats, flax_path, attr, kind, value):
            missing.append(key)

    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out, missing


def _deep_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _deep_mutable(v) for k, v in tree.items()}
    return tree
