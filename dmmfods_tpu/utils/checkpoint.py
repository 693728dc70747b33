"""Orbax-backed checkpoint / resume.

Reproduces the reference checkpoint contract
(``dmmfods/agents/Dense_U_Net_lidar_Agent.py:96-163``): a state bundle with
configurable key names (``config.agent.checkpoint.*``, helper.py:182-189)
holding ``epoch`` / ``train_iteration`` / ``val_iteration`` / ``best_val_iou``
/ model state / optimizer state, written every epoch with a best-val-IoU
copy, and a resume path that tolerates a missing checkpoint ("First time to
train", agent:160-163).

The model "state_dict" is the flax variables tree (params + batch_stats);
the optimizer entry is the optax state. Orbax handles sharded arrays
natively, so the same code checkpoints a multi-chip run.
"""

from __future__ import annotations

import shutil
import warnings
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(config) -> Path:
    return Path(config.dir.current_run.checkpoints).absolute()


def _checkpointer():
    """Orbax checkpointer; under multi-process execution the Agent
    single-writes host-materialized numpy trees from process 0 (shared
    storage), so orbax must NOT run its own cross-process barriers —
    restrict its active processes to the caller."""
    import jax

    if jax.process_count() > 1:
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
                barrier_sync_key_prefix=f"p{jax.process_index()}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(config, *, params, batch_stats, opt_state,
                    epoch, train_iteration, val_iteration, best_val_iou,
                    filename="checkpoint", is_best=False):
    """Write the state bundle; with ``is_best`` write under the best-name
    instead (reference agent:96-122)."""
    keys = config.agent.checkpoint
    state = {
        keys.epoch: epoch,
        keys.train_iteration: train_iteration,
        keys.val_iteration: val_iteration,
        keys.best_val_iou: float(best_val_iou),
        keys.state_dict: {"params": params, "batch_stats": batch_stats},
        keys.optimizer: opt_state,
    }
    base = _ckpt_dir(config)
    base.mkdir(exist_ok=True, parents=True)
    path = base / filename
    if path.exists():
        shutil.rmtree(path)
    with _checkpointer() as ckptr:
        ckptr.save(path, state)
    if is_best:
        # Deliberate improvement over the reference: reference agent:115-122
        # REPLACES the filename with best_checkpoint_name on best epochs, so
        # its rolling checkpoint goes stale. Here both stay fresh: the
        # rolling epoch checkpoint above AND a best-val-IoU copy.
        best = base / config.agent.best_checkpoint_name
        if best.exists():
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return str(path)


def load_checkpoint(config, *, template, filename: Optional[str] = None):
    """Restore a state bundle.

    ``template``: a dict with the same structure (e.g. a freshly-initialized
    state) so arrays restore with correct dtypes/shardings. Returns ``None``
    if no checkpoint exists (reference's "First time to train" path,
    agent:160-163).
    """
    if filename is None:
        filename = config.agent.best_checkpoint_name
    path = _ckpt_dir(config) / filename
    if not path.exists():
        warnings.warn(f"No checkpoint exists from {path}. Skipping...")
        return None
    keys = config.agent.checkpoint
    abstract = {
        keys.epoch: 0,
        keys.train_iteration: 0,
        keys.val_iteration: 0,
        keys.best_val_iou: 0.0,
        keys.state_dict: {
            "params": template["params"],
            "batch_stats": template["batch_stats"],
        },
        keys.optimizer: template["opt_state"],
    }
    with _checkpointer() as ckptr:
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=abstract)
        )
    return restored
