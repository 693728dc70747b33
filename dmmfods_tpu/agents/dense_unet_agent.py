"""Training/eval/checkpoint orchestration agent.

Public surface mirrors the reference
``dmmfods/agents/Dense_U_Net_lidar_Agent.py``: construct with
``(config, torchvision_init)``, then ``run() / train() / validate() /
save_checkpoint() / load_checkpoint() / finalize()`` with the same epoch loop,
best-val-IoU tracking, per-iteration TensorBoard scalar taxonomy and epoch
summary logs (agent:165-398). TPU-native internals: the whole train step
(forward + loss + backward + Adam + metrics) is one jitted XLA program over a
device mesh (see ``trainer``); the host loop only pumps prefetched batches
and drains metric buffers.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime
from pathlib import Path

import jax
import numpy as np

from .. import trainer as trainer_lib
from ..config import save_json_file
from ..models.dense_unet_lidar import densenet121_u_lidar
from ..parallel import mesh as mesh_lib
from ..utils import checkpoint as ckpt_lib
from ..utils.summary import SummaryWriter, StepTimer


class Dense_U_Net_lidar_Agent:
    """See module docstring. Same class name as the reference agent."""

    def __init__(self, config=None, torchvision_init=True, *, data_loader=None,
                 state_dict=None, use_mesh=True):
        """
        Args:
          torchvision_init: True -> bootstrap encoder weights from a
            torchvision densenet state dict (requires ``state_dict=`` or
            ``config.model.pretrained_path``; reference agent:22,44-45);
            False -> resume from the best checkpoint if one exists
            (agent:88-89).
          data_loader: override the data loader (e.g. synthetic); default
            crawls the Waymo layout via ``WaymoDataset_Loader``.
          use_mesh: build a device mesh and shard batches over it.
        """
        self.logger = logging.getLogger("Agent")

        # correctness tooling (SURVEY.md §5.2: the functional-purity analogue
        # of sanitizers): surface NaNs at the op that produced them
        if config is not None and config.get("tpu", {}).get("debug_nans", False):
            jax.config.update("jax_debug_nans", True)

        # model (+ config creation if None — reference agent:44-48)
        self.model = densenet121_u_lidar(
            pretrained=torchvision_init and (
                state_dict is not None
                or (config is not None and config.model.get("pretrained_path"))
            ),
            config=config,
            state_dict=state_dict,
        )
        self.config = self.model.config

        # data loader (reference agent:51)
        if data_loader is not None:
            self.data_loader = data_loader
        else:
            from ..data.waymo import WaymoDataset_Loader

            self.data_loader = WaymoDataset_Loader(self.config)

        # mesh + sharded steps (the reference's .cuda() device placement,
        # agent:76-86, generalized to an ICI mesh)
        self.mesh = mesh_lib.make_mesh(self.config) if use_mesh else None

        # optimizer (reference agent:57-67; StepLR handled per epoch below)
        self.tx = trainer_lib.make_optimizer(self.config)
        self.state = trainer_lib.create_train_state(self.model, self.tx)
        if self.mesh is not None:
            self.state = self._place_state(self.state)

        # step selection: dense offline tensors (reference-equivalent) vs
        # raw records with north-star preprocessing (heat maps rasterized
        # in-graph; LiDAR splat on the host runtime or in-graph per
        # `tpu.splat` — see data/host_preprocess.py for the measured design)
        tpu = self.config.tpu
        donate = tpu.get("donate", True)
        self.device_preprocess = bool(tpu.get("device_preprocess", False))
        _, full_w, full_h = self.config.dataset.images["original.size"]
        if self.device_preprocess and tpu.get("splat", "host") == "device":
            self.train_step = trainer_lib.make_train_step_raw(
                self.model.module, self.tx, self.config, mesh=self.mesh,
                donate=donate, full_height=full_h, full_width=full_w,
            )
            self.eval_step = trainer_lib.make_eval_step_raw(
                self.model.module, self.config, mesh=self.mesh,
                full_height=full_h, full_width=full_w,
            )
        elif self.device_preprocess:
            self.train_step = trainer_lib.make_train_step_ht(
                self.model.module, self.tx, self.config, mesh=self.mesh,
                donate=donate, full_height=full_h, full_width=full_w,
            )
            self.eval_step = trainer_lib.make_eval_step_ht(
                self.model.module, self.config, mesh=self.mesh,
                full_height=full_h, full_width=full_w,
            )
        else:
            self.train_step = trainer_lib.make_train_step(
                self.model.module, self.tx, self.config, mesh=self.mesh,
                donate=donate,
            )
            self.eval_step = trainer_lib.make_eval_step(
                self.model.module, self.config, mesh=self.mesh
            )

        # counters (reference agent:70-73)
        self.current_epoch = 0
        self.current_train_iteration = 0
        self.current_val_iteration = 0
        self.best_val_iou = 0.0

        if not torchvision_init:
            self.load_checkpoint()

        # writers (reference agent:92-94)
        Path(self.config.dir.current_run.summary).mkdir(exist_ok=True, parents=True)
        self.train_summary_writer = SummaryWriter(self.config.dir.current_run.summary)
        self.val_summary_writer = SummaryWriter(self.config.dir.current_run.summary)
        self.step_timer = StepTimer()

    # ------------------------------------------------------------------
    # checkpointing (reference agent:96-163)
    # ------------------------------------------------------------------

    def save_checkpoint(self, filename="checkpoint", is_best=False):
        params, batch_stats, opt_state = (
            self.state.params, self.state.batch_stats, self.state.opt_state
        )
        if jax.process_count() > 1:
            # single-writer on shared storage: the state is fully replicated,
            # so process 0 materializes it host-side and writes alone — no
            # cross-process orbax coordination needed
            if jax.process_index() != 0:
                return None
            params, batch_stats, opt_state = jax.tree_util.tree_map(
                np.asarray, (params, batch_stats, opt_state)
            )
        return ckpt_lib.save_checkpoint(
            self.config,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            epoch=self.current_epoch,
            train_iteration=self.current_train_iteration,
            val_iteration=self.current_val_iteration,
            best_val_iou=self.best_val_iou,
            filename=filename,
            is_best=is_best,
        )

    def load_checkpoint(self, filename=None):
        template = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
        }
        if jax.process_count() > 1:
            # every process restores host-side from shared storage (the
            # replicated template leaves are fully addressable), then
            # re-places without broadcast below
            template = jax.tree_util.tree_map(np.asarray, template)
        restored = ckpt_lib.load_checkpoint(self.config, template=template, filename=filename)
        if restored is None:
            self.logger.info("**First time to train**")
            return
        keys = self.config.agent.checkpoint
        self.current_epoch = int(restored[keys.epoch])
        self.current_train_iteration = int(restored[keys.train_iteration])
        self.current_val_iteration = int(restored[keys.val_iteration])
        self.best_val_iou = float(restored[keys.best_val_iou])
        self.state = self.state.replace(
            params=restored[keys.state_dict]["params"],
            batch_stats=restored[keys.state_dict]["batch_stats"],
            opt_state=restored[keys.optimizer],
        )
        if self.mesh is not None:
            # orbax restores to default single-device placement; the steps
            # expect mesh-placed state alongside mesh-sharded batches
            self.state = self._place_state(self.state)
        self.logger.info(
            "Checkpoint loaded successfully from %s at (epoch %d) at (iteration %d)",
            self.config.dir.current_run.checkpoints,
            self.current_epoch,
            self.current_train_iteration,
        )

    # ------------------------------------------------------------------
    # run / train / validate (reference agent:165-398)
    # ------------------------------------------------------------------

    def run(self):
        print("starting " + self.config.loader.mode + " at " + str(datetime.now()))
        try:
            if self.config.loader.mode == "test":
                self.validate()
            else:
                self.train()
        except KeyboardInterrupt:
            self.logger.info("You have entered CTRL+C.. Wait to finalize")

    def train(self):
        # record the ACTUAL configured objective/optimizer, not a fixed
        # string — a focal or amsgrad run must be identifiable from its
        # hyperparams.json / TB hparams tab
        loss = self.config.loss
        loss_type = loss.get("type", "bce")
        if loss_type == "bce":
            loss.func = "bce_with_logits(sum)"
        else:
            loss.func = f"{loss_type}(alpha={loss.alpha}, gamma={loss.gamma}, sum)"
        opt = self.config.optimizer
        opt_name = "amsgrad" if opt.get("amsgrad", False) else "adam"
        opt.func = f"optax.{opt_name}(lr={opt.learning_rate})" + (
            f" + weight_decay({opt.weight_decay})" if opt.get("weight_decay", 0) else ""
        )
        self.add_hparams_summary_writer()
        self.save_hparams_json()

        for epoch in range(self.current_epoch, self.config.agent.max_epoch):
            self.current_epoch = epoch
            self.train_one_epoch()

            avg_val_iou_per_class = self.validate()
            val_iou = float(np.mean(avg_val_iou_per_class))
            is_best = val_iou > self.best_val_iou
            if is_best:
                self.best_val_iou = val_iou
            self.save_checkpoint(is_best=is_best)
            # epoch-level StepLR (reference agent:297-298)
            sched = self.config.optimizer.lr_scheduler
            if sched.want and (epoch + 1) % sched.every_n_epochs == 0:
                new_lr = float(
                    self.config.optimizer.learning_rate
                    * sched.gamma ** ((epoch + 1) // sched.every_n_epochs)
                )
                self.state = self.state.replace(
                    opt_state=trainer_lib.set_learning_rate(self.state.opt_state, new_lr)
                )

        self.train_summary_writer.close()
        self.val_summary_writer.close()

    def _place_state(self, state):
        """Mesh placement for the train state: tensor-parallel when
        ``config.tpu.mesh.model > 1`` (out-channel conv sharding over the
        ``model`` axis — ``parallel.mesh.place_state``), replicated
        otherwise."""
        threshold = int(self.config.tpu.get("tp_shard_threshold", 256))
        return mesh_lib.place_state(state, self.mesh, threshold=threshold)

    def _put(self, batch):
        if self.mesh is None:
            return batch
        if jax.process_count() > 1:
            # multi-host: this host's loader supplies only its local rows of
            # the global batch; stitch them into one global sharded array
            return mesh_lib.shard_host_local_mixed_batch(batch, self.mesh)
        return mesh_lib.shard_mixed_batch(batch, self.mesh)

    def train_one_epoch(self):
        # profiling hook (SURVEY.md §5.1 rebuild): trace a few steps of the
        # first epoch into the run's summary dir for TensorBoard/Perfetto
        profile_steps = int(self.config.tpu.get("profile_steps", 0))
        profiling = False
        epoch_metrics = []
        # batch tuples: dense (image, lidar, ht_map) | host-splat raw
        # (image, lidar, boxes) | device-splat raw
        # (image, points, num_valid, boxes) — the step built in __init__
        # matches the loader's storage mode
        for i, batch in enumerate(self.data_loader.train_loader):
            if profile_steps and self.current_epoch == 0 and i == 1:
                jax.profiler.start_trace(self.config.dir.current_run.summary)
                profiling = True
            if profiling and i == 1 + profile_steps:
                jax.profiler.stop_trace()
                profiling = False
            batch = self._put(batch)
            self.step_timer.start()
            self.state, m = self.train_step(self.state, *batch)
            self.step_timer.stop(m["loss"])
            epoch_metrics.append(m)
            # reference per-iteration scalar taxonomy (agent:268-288);
            # buffered — no device sync here
            self.train_summary_writer.add_class_scalars(
                "Training/Loss", m["loss_per_class"], self.current_train_iteration
            )
            self.train_summary_writer.add_class_scalars(
                "Training/Accuracy", m["acc_per_class"], self.current_train_iteration
            )
            self.train_summary_writer.add_class_scalars(
                "Training/IoU", m["iou_per_class"], self.current_train_iteration
            )
            self.current_train_iteration += 1

        if profiling:
            jax.profiler.stop_trace()
        self.train_summary_writer.flush()
        self._log_epoch("Training", epoch_metrics)

    def validate(self):
        from .. import metrics as metrics_lib

        epoch_metrics = []
        epoch_ap = metrics_lib.StreamingAP(self.config.model.num_classes)
        for batch in self.data_loader.valid_loader:
            batch = self._put(batch)
            m = dict(self.eval_step(self.state, *batch))
            epoch_ap.update(m.pop("ap_bin_counts"))
            epoch_metrics.append(m)
            self.val_summary_writer.add_class_scalars(
                "Validation/Loss", m["loss_per_class"], self.current_val_iteration
            )
            self.val_summary_writer.add_class_scalars(
                "Validation/Accuracy", m["acc_per_class"], self.current_val_iteration
            )
            self.val_summary_writer.add_class_scalars(
                "Validation/IoU", m["iou_per_class"], self.current_val_iteration
            )
            if "ap_per_class" in m:
                self.val_summary_writer.add_class_scalars(
                    "Validation/AP", m["ap_per_class"], self.current_val_iteration
                )
            self.current_val_iteration += 1

        # dataset-level pooled AP: the north-star parity metric at epoch
        # granularity — AP over every pixel of the val set, not a mean of
        # per-batch APs
        self.epoch_ap_per_class = epoch_ap.result()
        self.val_summary_writer.add_class_scalars(
            "Validation/EpochAP", self.epoch_ap_per_class, self.current_epoch
        )
        self.val_summary_writer.flush()
        return self._log_epoch("Validation", epoch_metrics,
                               epoch_ap=self.epoch_ap_per_class)

    def _log_epoch(self, phase, epoch_metrics, epoch_ap=None):
        """Epoch summary log (reference agent:301-307,388-394). Returns the
        per-class epoch-average IoU."""
        if not epoch_metrics:
            return np.zeros(self.config.model.num_classes)
        loss = np.mean([np.asarray(m["loss_per_class"]) for m in epoch_metrics], axis=0)
        iou = np.mean([np.asarray(m["iou_per_class"]) for m in epoch_metrics], axis=0)
        nans = np.sum([np.asarray(m["iou_nans"]) for m in epoch_metrics], axis=0)
        acc = np.mean([np.asarray(m["acc_per_class"]) for m in epoch_metrics], axis=0)
        ap_part = (
            " | Dataset AP: %s" % np.asarray(epoch_ap).tolist()
            if epoch_ap is not None else ""
        )
        self.logger.info(
            "%s at Epoch-%d | Average Loss: %s | Average IoU: %s | "
            "Number of NaNs: %s | Average Accuracy: %s | mean step %.4fs%s",
            phase, self.current_epoch, loss.tolist(), iou.tolist(),
            nans.tolist(), acc.tolist(), self.step_timer.mean, ap_part,
        )
        return iou

    # ------------------------------------------------------------------
    # hparams + finalize (reference agent:400-450)
    # ------------------------------------------------------------------

    def add_hparams_summary_writer(self):
        hp = {
            "loss_func": self.config.loss.get("func", "bce"),
            "loss_alpha": self.config.loss.alpha,
            "loss_gamma": self.config.loss.gamma,
            "optimizer": self.config.optimizer.get("func", "adam"),
            "learning_rate": self.config.optimizer.learning_rate,
            "beta1": self.config.optimizer.beta1,
            "beta2": self.config.optimizer.beta2,
            "eps": self.config.optimizer.eps,
            "amsgrad": self.config.optimizer.amsgrad,
            "weight_decay": self.config.optimizer.weight_decay,
            "lr_scheduler": self.config.optimizer.lr_scheduler.want,
            "lr_scheduler_every_n_epochs": self.config.optimizer.lr_scheduler.every_n_epochs,
            "lr_scheduler_gamma": self.config.optimizer.lr_scheduler.gamma,
        }
        self.train_summary_writer.add_hparams(hp)
        self.val_summary_writer.add_hparams(hp)

    def save_hparams_json(self):
        hparams = {
            "loss": self.config.loss.to_dict() if hasattr(self.config.loss, "to_dict") else dict(self.config.loss),
            "optimizer": self.config.optimizer.to_dict() if hasattr(self.config.optimizer, "to_dict") else dict(self.config.optimizer),
        }
        save_json_file(
            os.path.join(self.config.dir.current_run.summary, "hyperparams.json"),
            hparams, indent=4,
        )

    def finalize(self):
        self.logger.info("Please wait while finalizing the operation.. Thank you")
        self.train_summary_writer.close()
        self.val_summary_writer.close()
        print("ending " + self.config.loader.mode + " at " + str(datetime.now()))
