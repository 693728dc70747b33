"""CLI-level end-to-end test: `cli train` / `cli eval` driven through
``cli.main`` (argument parsing, config.json load, loader crawl, agent
lifecycle) against a prepared raw-record dataset — the workflow of
docs/WORKFLOW.md without subprocess overhead."""

import pickle
from pathlib import Path

import numpy as np

from dmmfods_tpu import cli
from dmmfods_tpu.config import get_config, save_config
from dmmfods_tpu.data.converter import save_raw_data_in_batch


def _prepare(host_dir, *, h=32, w=64, samples=4, batch=2):
    """Write a tiny raw dataset AND the host dir's config.json so the CLI
    picks everything up from --host-dir alone (the reference's get_config
    load-or-create path, helper.py:213-223)."""
    cfg = get_config(str(host_dir))
    cfg.tpu.compute_dtype = "float32"
    cfg.agent.max_epoch = 1
    cfg.dataset.batch_size = batch
    cfg.dataset.images.size = (3, w, h)
    cfg.dataset.images["original.size"] = (3, w * 10, h * 10)
    cfg.tpu.mesh.data = 2
    cfg.tpu.device_preprocess = True
    save_config(cfg)

    full_h, full_w = h * 10, w * 10
    root = Path(cfg.dir.data.root)
    tfdir = root / "training_0000" / "tf_0"
    rng = np.random.default_rng(0)
    for sub in ("images", "points", "labels"):
        (tfdir / sub).mkdir(parents=True, exist_ok=True)
    for i in range(samples):
        stem = f"img_0_0_{i}_0"
        np.savez(tfdir / "images" / (stem + ".npz"),
                 rng.random((h, w, 3)).astype(np.float32))
        n = int(rng.integers(50, 300))
        pts = np.stack([rng.uniform(0, full_w, n), rng.uniform(0, full_h, n),
                        rng.uniform(0.5, 80, n)], axis=-1).astype(np.float32)
        np.savez(tfdir / "points" / ("points_" + stem + ".npz"), pts)
        with open(tfdir / "labels" / ("labels_" + stem), "wb") as fh:
            pickle.dump({"0": {"type": 1, "x": 40, "y": 50,
                               "width": 180, "height": 120}}, fh)
    for mode in ("train", "val", "test"):
        assert save_raw_data_in_batch(cfg, "training_0000", mode) == samples // batch


def test_cli_train_then_eval_raw_records(tmp_path):
    _prepare(tmp_path)
    args = ["--host-dir", str(tmp_path)]

    cli.main(["train"] + args)
    base = tmp_path / "DMMFODS" / "dmmfods_tpu"
    assert list((base / "experiments").iterdir()), "no run directory written"
    assert list(base.rglob("checkpoint")), "no checkpoint written"

    # eval resumes the best checkpoint over the test split (same run dir:
    # the saved config pins current_run)
    cli.main(["eval"] + args)
    text = "".join(p.read_text() for p in base.rglob("scalars.jsonl"))
    assert "Training/Loss" in text and "Validation/IoU" in text


def test_cli_parity_verb_wiring(monkeypatch, tmp_path, capsys):
    """`cli parity` parses its args, loads the host-dir config and routes
    into utils.parity.run_parity, printing the returned table."""
    called = {}

    def fake_run_parity(config, ckpt, data, *, reference_root=None,
                        full_model=True, **kw):
        called.update(ckpt=ckpt, data=data, reference_root=reference_root,
                      full_model=full_model,
                      dtype=config.tpu.compute_dtype)
        return {}, None, "PARITY-TABLE"

    import dmmfods_tpu.utils.parity as parity_mod

    monkeypatch.setattr(parity_mod, "run_parity", fake_run_parity)
    cli.main([
        "parity", "--host-dir", str(tmp_path),
        "--torch-ckpt", "ckpt.pth.tar", "--data", "valdir",
        "--reference-root", "/ref", "--encoder-only",
        "--set", "tpu.compute_dtype=float32",
    ])
    assert "PARITY-TABLE" in capsys.readouterr().out
    assert called == {
        "ckpt": "ckpt.pth.tar", "data": "valdir",
        "reference_root": "/ref", "full_model": False,
        "dtype": "float32",
    }
