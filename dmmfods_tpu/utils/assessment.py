"""Visual assessment — side-by-side prediction panels.

Replaces the reference's Colab visual-assessment cell
(``Colab_Setup.ipynb`` cell 12; SURVEY.md §4): for a handful of validation
samples, render RGB | LiDAR | sigmoid(prediction) | ground truth side by side
and save PNGs. matplotlib is optional; without it, raw per-panel PNGs are
written via PIL, and failing that, ``.npy`` dumps.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _panel_image(image, lidar, pred_sigmoid, gt):
    """Compose one (H, 4*W, 3) uint8 panel row."""

    def norm(x):
        x = np.asarray(x, np.float32)
        lo, hi = float(x.min()), float(x.max())
        return (x - lo) / (hi - lo + 1e-6)

    h, w = image.shape[:2]
    rgb = norm(image)
    lid = np.repeat(norm(lidar), 3, axis=-1)
    pred = np.stack([pred_sigmoid[..., i] for i in range(3)], axis=-1)
    gtc = np.stack([gt[..., i] for i in range(3)], axis=-1)
    row = np.concatenate([rgb, lid, pred, gtc], axis=1)
    return (np.clip(row, 0, 1) * 255).astype(np.uint8)


def visual_assessment(config, *, num_samples=4, out_dir="assessment",
                      agent=None, loader=None):
    """Run the best-checkpoint model over validation samples and write panels.

    Returns the list of written file paths.
    """
    import jax

    from ..agents.dense_unet_agent import Dense_U_Net_lidar_Agent

    if agent is None:
        config.loader.mode = "test"
        agent = Dense_U_Net_lidar_Agent(config, torchvision_init=False,
                                        data_loader=loader)
    loader = loader or agent.data_loader

    out = Path(out_dir)
    out.mkdir(exist_ok=True, parents=True)
    written = []

    variables = {"params": agent.state.params, "batch_stats": agent.state.batch_stats}
    single_stream = config.model.stream_2_in_channels == 0

    @jax.jit
    def forward(image, lidar):
        logits = agent.model.module.apply(
            variables, image, None if single_stream else lidar, False
        )
        return jax.nn.sigmoid(logits.astype(np.float32))

    count = 0
    for image, lidar, ht_map in loader.valid_loader:
        probs = np.asarray(forward(image, lidar))
        for b in range(image.shape[0]):
            panel = _panel_image(image[b], lidar[b], probs[b], np.asarray(ht_map[b]))
            path = out / f"sample_{count}.png"
            _write_png(panel, path)
            written.append(str(path))
            count += 1
            if count >= num_samples:
                return written
    return written


def _write_png(array_u8, path):
    try:
        from PIL import Image

        Image.fromarray(array_u8).save(path)
    except Exception:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imsave(path, array_u8)
        except Exception:
            np.save(str(path).replace(".png", ".npy"), array_u8)
