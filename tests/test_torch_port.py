"""Torchvision/torch checkpoint import tests (reference _load_state_dict
semantics, model:269-309): key mapping, layout transposes, legacy-key
rewrite, conv0 drop rule, stream-2 mirroring, and end-to-end numeric parity
of an imported ConvTranspose against torch."""

import numpy as np
import pytest
import torch

import jax

from dmmfods_tpu.models.dense_unet_lidar import DenseUNetLidar, ModelSpec
from dmmfods_tpu.models import torch_port


def _tiny_spec(**kw):
    base = dict(growth_rate=8, block_config=(2, 2), num_init_features=16,
                stream_2_in_channels=1, concat_before_block_num=2)
    base.update(kw)
    return ModelSpec(**base)


def _init_variables(spec, h=32, w=64):
    module = DenseUNetLidar(spec)
    rgb = np.zeros((1, h, w, spec.stream_1_in_channels), np.float32)
    lidar = (
        np.zeros((1, h, w, spec.stream_2_in_channels), np.float32)
        if spec.stream_2_in_channels
        else None
    )
    return module, module.init(jax.random.PRNGKey(0), rgb, lidar, False)


def _fake_densenet_state_dict(spec, rng, legacy_keys=False):
    """Random torch-style densenet state dict matching ``spec``'s encoder."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[name + ".weight"] = torch.tensor(
            rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        )

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_mean"] = torch.tensor(rng.normal(size=(c,)).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.5
        )

    g, bs = spec.growth_rate, spec.bn_size
    conv("features.conv0", 3, spec.num_init_features, 7)
    bn("features.norm0", spec.num_init_features)
    c = spec.num_init_features
    for bi, layers in enumerate(spec.block_config, start=1):
        for li in range(1, layers + 1):
            cin = c + (li - 1) * g
            sep = "." if legacy_keys else ""
            prefix = f"features.denseblock{bi}.denselayer{li}"
            if legacy_keys:
                bn(f"{prefix}.norm.1", cin)
                conv(f"{prefix}.conv.1", cin, bs * g, 1)
                bn(f"{prefix}.norm.2", bs * g)
                conv(f"{prefix}.conv.2", bs * g, g, 3)
            else:
                bn(f"{prefix}.norm1", cin)
                conv(f"{prefix}.conv1", cin, bs * g, 1)
                bn(f"{prefix}.norm2", bs * g)
                conv(f"{prefix}.conv2", bs * g, g, 3)
        c += layers * g
        if bi != len(spec.block_config):
            bn(f"features.transition{bi}.norm", c)
            conv(f"features.transition{bi}.conv", c, c // 2, 1)
            c //= 2
    # classifier entries that must be ignored (strict=False parity)
    bn("features.norm5", c)
    sd["classifier.weight"] = torch.tensor(rng.normal(size=(10, c)).astype(np.float32))
    sd["classifier.bias"] = torch.tensor(rng.normal(size=(10,)).astype(np.float32))
    return sd


def test_encoder_import_and_stream2_mirroring():
    spec = _tiny_spec()
    module, variables = _init_variables(spec)
    rng = np.random.default_rng(0)
    sd = _fake_densenet_state_dict(spec, rng)
    out = torch_port.load_torchvision_encoder(variables, sd, spec)

    # conv0: transposed into HWIO
    want = np.transpose(sd["features.conv0.weight"].numpy(), (2, 3, 1, 0))
    got = np.asarray(out["params"]["features_stem"]["conv0"]["kernel"])
    np.testing.assert_allclose(got, want, atol=0)

    # norm0 scale + running stats landed
    np.testing.assert_allclose(
        np.asarray(out["params"]["features_stem"]["norm0"]["scale"]),
        sd["features.norm0.weight"].numpy(), atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["features_stem"]["norm0"]["var"]),
        sd["features.norm0.running_var"].numpy(), atol=0,
    )

    # a dense-layer conv mapped correctly
    want = np.transpose(
        sd["features.denseblock1.denselayer2.conv2.weight"].numpy(), (2, 3, 1, 0)
    )
    got = np.asarray(
        out["params"]["features_denseblock1"]["denselayer2"]["conv2"]["kernel"]
    )
    np.testing.assert_allclose(got, want, atol=0)

    # stream_2 mirroring (model:304-309): same weights except conv0
    s2 = out["params"]["stream_2_features"]
    np.testing.assert_allclose(
        np.asarray(s2["denseblock1"]["denselayer1"]["conv1"]["kernel"]),
        np.transpose(sd["features.denseblock1.denselayer1.conv1.weight"].numpy(), (2, 3, 1, 0)),
        atol=0,
    )
    # stream_2 conv0 keeps its own (1-channel) init, not the RGB weights
    assert np.asarray(s2["stem"]["conv0"]["kernel"]).shape[2] == 1


def test_conv0_drop_rule_early_fusion():
    spec = _tiny_spec(concat_before_block_num=1, stream_2_in_channels=1)  # early
    module, variables = _init_variables(spec)
    before = np.asarray(variables["params"]["features_stem"]["conv0"]["kernel"]).copy()
    rng = np.random.default_rng(1)
    sd = _fake_densenet_state_dict(spec, rng)
    out = torch_port.load_torchvision_encoder(variables, sd, spec)
    after = np.asarray(out["params"]["features_stem"]["conv0"]["kernel"])
    # 4-channel conv0 untouched (checkpoint is 3-channel; model:295-296)
    np.testing.assert_allclose(after, before, atol=0)
    # but norm0 WAS imported
    np.testing.assert_allclose(
        np.asarray(out["params"]["features_stem"]["norm0"]["scale"]),
        sd["features.norm0.weight"].numpy(), atol=0,
    )


def test_legacy_key_rewrite():
    sd = {"features.denseblock1.denselayer1.norm.1.weight": torch.ones(4)}
    normalized = torch_port.normalize_torch_keys(sd)
    assert "features.denseblock1.denselayer1.norm1.weight" in normalized


def test_shape_mismatch_raises():
    spec = _tiny_spec()
    module, variables = _init_variables(spec)
    sd = {"features.conv0.weight": torch.zeros(99, 3, 7, 7)}
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_port.load_torchvision_encoder(variables, sd, spec)


def test_imported_encoder_matches_torch_numerically():
    """Port a torch BN->ReLU->Conv stack and compare activations — the layout
    transposes are numerically validated end to end."""
    torch.manual_seed(0)
    cin, cout = 6, 8
    tm = torch.nn.Sequential(
        torch.nn.BatchNorm2d(cin), torch.nn.ReLU(),
        torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False),
    )
    tm.eval()
    with torch.no_grad():
        tm[0].running_mean.normal_()
        tm[0].running_var.uniform_(0.5, 2.0)
        tm[0].weight.normal_()
        tm[0].bias.normal_()
    x = torch.randn(2, cin, 8, 10)
    ref = tm(x).detach().numpy()

    import flax.linen as nn
    import jax.numpy as jnp

    from dmmfods_tpu.ops.normalization import TorchBatchNorm

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = TorchBatchNorm(use_running_average=True, name="norm")(x)
            x = nn.relu(x)
            return nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                           name="conv")(x)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    mod = Stack()
    variables = mod.init(jax.random.PRNGKey(0), xj)
    variables = {
        "params": {
            "norm": {"scale": jnp.asarray(tm[0].weight.detach().numpy()),
                     "bias": jnp.asarray(tm[0].bias.detach().numpy())},
            "conv": {"kernel": jnp.asarray(
                torch_port.conv_kernel_to_hwio(tm[2].weight.detach().numpy())
            )},
        },
        "batch_stats": {
            "norm": {"mean": jnp.asarray(tm[0].running_mean.numpy()),
                     "var": jnp.asarray(tm[0].running_var.numpy())},
        },
    }
    ours = np.asarray(mod.apply(variables, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("arch", ["densenet121", "densenet161", "densenet169", "densenet201"])
def test_hub_checkpoint_key_inventory_fully_mapped(arch):
    """Every key in the real torchvision hub checkpoints (vendored inventory,
    legacy 'norm.1' naming as served by load_state_dict_from_url — the exact
    input of reference _load_state_dict, model:269-309) is either mapped by
    normalize_torch_keys + _encoder_path or is a documented skip
    (classifier / final norm5, which this architecture discards)."""
    from pathlib import Path

    keys = Path(__file__).with_name("fixtures").joinpath(
        f"{arch}_hub_keys.txt").read_text().split()
    assert len(keys) > 600 or arch == "densenet121"

    normalized = torch_port.normalize_torch_keys({k: np.zeros(1) for k in keys})
    # the legacy rewrite removed every '.N.' segment inside denselayers
    assert not any(".1." in k or ".2." in k
                   for k in normalized if "denselayer" in k)

    unmapped = []
    for key in normalized:
        if key.startswith(("classifier", "features.norm5")):
            continue
        mapped = torch_port._encoder_path(key, stream2=False)
        if mapped is None:
            unmapped.append(key)
            continue
        flax_path, attr, kind = mapped
        # every mapped tensor routes to a real slot kind
        assert kind in ("conv", "bn")
        assert attr in ("weight", "bias", "running_mean", "running_var")
    assert unmapped == []

    # and the stream-2 mirror accepts the same inventory minus conv0
    for key in normalized:
        if key.startswith(("classifier", "features.norm5")):
            continue
        assert torch_port._encoder_path("stream_2_" + key, stream2=True) is not None


def test_pretrained_url_fetch_flag(tmp_path, monkeypatch):
    """VERDICT r3 #9: with no local checkpoint, pretrained=True either fails
    with a clear error (default: no egress assumed) or — when
    `config.model.pretrained_url_fetch` is set — routes through the
    torchvision-URL fetch path (reference model:269-309). The fetch itself
    is stubbed: no network in tests."""
    import pytest
    import torch

    from dmmfods_tpu.config import get_config
    from dmmfods_tpu.models import dense_unet_lidar as m

    cfg = get_config(str(tmp_path))
    cfg.model.growth_rate = 8
    cfg.model.block_config = (2, 2)
    cfg.model.num_init_features = 16
    cfg.dataset.images.size = (3, 32, 16)

    with pytest.raises(FileNotFoundError, match="pretrained_url_fetch"):
        m._dense_u_net_lidar("densenet121", 8, (2, 2), 16, True, True, cfg)

    fetched = {}

    def fake_fetch(url, map_location="cpu", progress=True):
        fetched["url"] = url
        # minimal real state dict from the fixture-shaped torch model is
        # overkill here; an empty dict exercises the routing (the loader
        # tolerates missing keys in non-strict mode)
        return {}

    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", fake_fetch)
    cfg.model.pretrained_url_fetch = True
    bundle = m._dense_u_net_lidar("densenet121", 8, (2, 2), 16, True, True, cfg)
    assert fetched["url"] == m.TORCHVISION_DENSENET_URLS["densenet121"]
    assert bundle.variables is not None
