"""Base training loop.

Parity: /root/reference/train/trainlib/trainer.py:12-316, with one fix the
survey calls out (SURVEY.md §7 hard-part 8): the reference loop hard-codes
YOLO loss keys and would KeyError on NeRF loss dicts (trainer.py:204-208);
this loop records whatever keys the trainer emits.

Kept behaviors: interval-driven print/eval/metric/save/backup/vis, NaN-loss
abort returning "nan", best-F1 checkpointing, pause-file polling, per-save
.npy loss-history arrays, epoch-wise exponential lr decay, grad
accumulation (accu_grad), fixed_test option.
"""

from __future__ import annotations

import math
import os
import os.path as osp
import time

import numpy as np
import optax

from ..data.loader import DataLoader
from ..utils.misc import print_with_time, stall_watchdog_from_env
from . import checkpoints


class _JsonlWriter:
    """TensorBoard-free metric logger fallback (jsonl lines)."""

    def __init__(self, path):
        os.makedirs(path, exist_ok=True)
        self._f = open(osp.join(path, "metrics.jsonl"), "a")

    def add_scalar(self, tag, value, global_step=None):
        import json

        self._f.write(
            json.dumps({"tag": tag, "value": float(value), "step": global_step})
            + "\n"
        )
        self._f.flush()

    def add_scalars(self, tag, values, global_step=None):
        for k, v in values.items():
            self.add_scalar(f"{tag}/{k}", v, global_step)


def make_writer(path):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(path)
    except Exception:
        return _JsonlWriter(path)


class Trainer:
    """Subclasses implement train_step/eval_step/vis_step/metric_step and
    own the jitted update functions + optimizer state."""

    def __init__(self, train_dataset, test_dataset, args, conf):
        self.args = args
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset

        # 8/4 prefetch workers like the reference's torch loaders
        # (trainer.py:19-32); threads here — sample loading is disk IO +
        # PNG decode, which overlaps the jitted train step.  Capped at the
        # host core count: more threads than cores just adds GIL thrash.
        cores = os.cpu_count() or 1
        self.train_data_loader = DataLoader(
            train_dataset,
            batch_size=args.batch_size,
            shuffle=True,
            seed=getattr(args, "seed", 0),
            num_workers=conf.get_int("num_workers", min(8, cores)),
        )
        self.test_data_loader = DataLoader(
            test_dataset,
            batch_size=min(args.batch_size, 16),
            shuffle=False,
            num_workers=conf.get_int("num_workers_test", min(4, cores)),
        )

        self.num_total_batches = len(self.train_dataset)
        self.exp_name = args.name
        self.save_interval = conf.get_int("save_interval")
        self.backup_interval = conf.get_int("backup_interval")
        self.print_interval = conf.get_int("print_interval")
        # NaN-abort lag bound: the reference checks every batch
        # (trainer.py:210-212) but each check forces a host sync; checking
        # every nan_interval batches bounds the abort lag at that many
        # steps while keeping the dispatch pipeline deep
        self.nan_interval = conf.get_int(
            "nan_interval", min(self.print_interval, 20)
        )
        self.vis_interval = conf.get_int("vis_interval")
        self.eval_interval = conf.get_int("eval_interval")
        self.metric_interval = conf.get_int("metric_interval")
        self.num_epoch_repeats = conf.get_int("num_epoch_repeats", 1)
        self.num_epochs = args.epochs
        self.accu_grad = conf.get_int("accu_grad", 1)
        self.summary_path = osp.join(args.logs_path, args.name)
        os.makedirs(self.summary_path, exist_ok=True)
        self.writer = make_writer(self.summary_path)

        self.fixed_test = bool(getattr(args, "fixed_test", False))

        # Adam + per-epoch exponential decay (ExponentialLR parity,
        # trainer.py:53-59): lr(epoch) = lr0 * gamma^epoch.  Gradient
        # accumulation (accu_grad, trainer.py:304-309) via optax.MultiSteps.
        # The lr is NOT baked into the optimizer: scale_by_adam produces the
        # direction and the jitted update multiplies by -lr (a device-scalar
        # argument), so set_lr never has to poke optax internals.
        self.base_lr = args.lr
        self.gamma = args.gamma
        # Linear lr warmup over the first N global steps (train.warmup_steps,
        # default 0 = off).  Large-batch stabilizer: the reference's
        # per-epoch ExponentialLR (trainer.py:53-59) has no warmup because
        # its GPU-era 128-ray batches never needed one; the TPU-sized
        # 2048-8192-ray operating point diverges without it (PERF.md r4
        # large-batch study).  Host-side only — the lr reaches the jitted
        # update as a scalar argument, so per-step warmup never retraces.
        self.warmup_steps = conf.get_int("warmup_steps", 0)
        self._lr = float(args.lr)
        base_opt = optax.scale_by_adam()
        self.optimizer = (
            optax.MultiSteps(base_opt, every_k_schedule=self.accu_grad)
            if self.accu_grad > 1
            else base_opt
        )

        self.iter_state_path = osp.join(
            args.checkpoints_path, args.name, "_iter"
        )
        self.optim_state_path = osp.join(
            args.checkpoints_path, args.name, "_optim"
        )
        self.lrsched_state_path = osp.join(
            args.checkpoints_path, args.name, "_lrsched"
        )
        self.start_iter_id = 0
        self.start_epoch = 0

        self.visual_path = osp.join(args.visual_path, args.name)
        self.conf = conf

    # -- state owned by subclasses -----------------------------------------

    def init_opt_state(self, params):
        self.opt_state = self.optimizer.init(params)
        if self.args.resume:
            if os.path.exists(self.optim_state_path):
                try:
                    self.opt_state = checkpoints.load_pytree(
                        self.optim_state_path, self.opt_state
                    )
                except Exception:
                    import warnings

                    warnings.warn(
                        "Failed to load optimizer state at "
                        + self.optim_state_path
                    )
            if os.path.exists(self.iter_state_path):
                state = checkpoints.load_json(self.iter_state_path)
                self.start_iter_id = state["iter"]
                self.start_epoch = state.get("epoch", 0)
            if os.path.exists(self.lrsched_state_path):
                sched = checkpoints.load_json(self.lrsched_state_path)
                self.start_epoch = sched.get("epoch", self.start_epoch)

    def current_lr(self, epoch: int) -> float:
        return self.base_lr * (self.gamma**epoch)

    def lr_at(self, epoch: int, step_id: int) -> float:
        """Epoch-decayed lr scaled by the linear warmup ramp when the
        global step is still inside ``train.warmup_steps``."""
        lr = self.current_lr(epoch)
        if self.warmup_steps > 0 and step_id < self.warmup_steps:
            lr *= (step_id + 1) / self.warmup_steps
        return lr

    def set_lr(self, lr: float):
        """The lr flows into the jitted update as a scalar argument, so
        changing it is a host-side assignment (no optax state surgery, no
        retrace)."""
        self._lr = float(lr)

    # -- subclass hooks ------------------------------------------------------

    def post_batch(self, epoch, batch):
        pass

    def extra_save_state(self):
        pass

    def save_model_state(self, epochNum: str = ""):
        raise NotImplementedError()

    def train_step(self, data, global_step):
        raise NotImplementedError()

    def eval_step(self, data, global_step):
        raise NotImplementedError()

    def vis_step(self, data, global_step):
        return None, None

    def metric_step(self, data_loader, print_hc=False):
        return None, None, None

    # -- FLOP accounting --------------------------------------------------------

    def _stash_update_avals(self, update_fn, args):
        """Record the steady-state jitted update's argument avals once
        (called by subclasses just before invoking the donated update, so
        shapes are captured before donation consumes the buffers).
        Enables update_cost_analysis()."""
        if getattr(self, "_update_aval_call", None) is None:
            import jax
            import jax.numpy as jnp

            sds = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), args
            )
            self._update_aval_call = (update_fn, sds)

    def update_cost_analysis(self):
        """XLA cost analysis (executed flops / bytes accessed, optimized
        HLO) of the steady-state jitted train update — the honest
        denominator for a train-side MFU (bench.py train records).
        Returns the analysis dict, or None before the first train step or
        when the backend exposes none.  The lower+compile here is a cache
        hit against the first train step's compilation."""
        call = getattr(self, "_update_aval_call", None)
        if call is None:
            return None
        fn, sds = call
        try:
            ca = fn.lower(*sds).compile().cost_analysis()
        except Exception:  # noqa: BLE001 - accounting is best-effort
            return None
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        return ca if ca and "flops" in ca else None

    # -- the loop --------------------------------------------------------------

    def start(self):
        def fmt_loss_str(losses):
            if not isinstance(losses, dict):
                return "loss " + str(losses)
            return "loss " + " ".join(
                k + ":" + str(losses[k]) for k in losses
            )

        def data_loop(dl):
            while True:
                for x in iter(dl):
                    yield x

        test_data_iter = data_loop(self.test_data_loader)
        step_id = self.start_iter_id

        # opt-in dead-accelerator abort (utils.misc.StallWatchdog): the
        # remote-TPU tunnel can die mid-run, blocking the next device sync
        # forever; with PNY_STALL_ABORT_S set, hard-exit instead of hanging
        watchdog = stall_watchdog_from_env()
        try:
            return self._run_epochs(
                test_data_iter, step_id, fmt_loss_str, watchdog
            )
        finally:
            if watchdog is not None:
                watchdog.stop()

    def _run_epochs(self, test_data_iter, step_id, fmt_loss_str, watchdog):
        print_with_time("Starting training with", self.num_epochs, "epochs")

        save: dict[str, list] = {}
        best_f1 = 0.0

        for epoch in range(self.start_epoch, self.num_epochs):
            lr = self.current_lr(epoch)
            self.set_lr(lr)
            self.writer.add_scalar("lr", lr, global_step=step_id)

            batch = 0
            for _ in range(self.num_epoch_repeats):
                for data in self.train_data_loader:
                    # pause-file mechanism (trainer.py:185-190)
                    if os.path.exists("pause"):
                        print_with_time("pause file found, pausing")
                        while os.path.exists("pause"):
                            time.sleep(5)
                        print_with_time("pause file removed, resuming")

                    # warmup ramp (host-side scalar assignment, no retrace);
                    # at step_id == warmup_steps this restores the full
                    # epoch lr and the per-epoch set_lr takes over
                    if self.warmup_steps > 0 and step_id <= self.warmup_steps:
                        self.set_lr(self.lr_at(epoch, step_id))

                    # train_step returns lazy device scalars; materializing
                    # them (float) forces a host sync, so do it only on the
                    # print/NaN intervals — off-interval steps dispatch
                    # back-to-back and the host loop overlaps device compute
                    # (a per-step sync costs a full relay round-trip here).
                    # The NaN abort lags by at most nan_interval batches
                    # (reference checks every batch, trainer.py:210-212) —
                    # the supervisor semantics are otherwise unchanged.
                    losses = self.train_step(data, global_step=step_id)
                    if watchdog is not None:
                        # dispatch RETURNED — host progress; a dead tunnel
                        # blocks INSIDE the device call, so the absence of
                        # this beat (plus the sync one below) is the signal
                        watchdog.beat()
                    if batch % self.nan_interval == 0 and losses:
                        t_val = float(losses["t"])
                        if watchdog is not None:
                            # a materialized device scalar proves the
                            # accelerator is alive
                            watchdog.beat()
                        if math.isnan(t_val):
                            print_with_time(
                                "NaN detected in trainer after train_step "
                                "at epoch", epoch, "batch", batch,
                            )
                            return "nan"
                    if batch % self.print_interval == 0:
                        losses = {k: float(v) for k, v in losses.items()}
                        loss_str = fmt_loss_str(losses)
                        print_with_time(
                            "E", epoch, "B", batch, loss_str, " lr", self._lr
                        )
                        for k, v in losses.items():
                            save.setdefault(k + "_array", []).append(v)

                    if batch % self.eval_interval == 0:
                        test_data = next(test_data_iter)
                        test_losses = {
                            k: float(v)
                            for k, v in self.eval_step(
                                test_data, global_step=step_id
                            ).items()
                        }
                        if watchdog is not None:
                            watchdog.beat()
                        print_with_time(
                            "*** Eval:", "E", epoch, "B", batch,
                            fmt_loss_str(test_losses), " lr",
                        )
                        for k, v in test_losses.items():
                            save.setdefault("eval_" + k + "_array", []).append(v)

                    if batch % self.metric_interval == 0 and (
                        epoch > 0 or batch > 200
                    ):
                        precision, recall, f1 = self.metric_step(
                            self.test_data_loader
                        )
                        if watchdog is not None:
                            # a metric sweep renders the whole test set
                            # (can exceed the stall window while healthy)
                            watchdog.beat()
                        if f1 is not None:
                            print_with_time(
                                "*** Metrics:", "E", epoch, "B", batch,
                                "precision", precision, "recall", recall,
                                "f1", f1,
                            )
                            save.setdefault("precision_array", []).append(
                                precision
                            )
                            save.setdefault("recall_array", []).append(recall)
                            save.setdefault("f1_array", []).append(f1)
                            if f1 > best_f1:
                                best_f1 = f1
                                print_with_time("saving best")
                                self.save_model_state(epochNum="_best")

                    if batch % self.backup_interval == 0 and (
                        epoch > 0 or batch > 0
                    ):
                        print_with_time("saving backup")
                        self.save_model_state(epochNum=str(epoch - 1))

                    if batch % self.save_interval == 0 and (
                        epoch > 0 or batch > 0
                    ):
                        print_with_time("saving")
                        self.save_model_state()
                        if watchdog is not None:
                            # serializing the variable tree materializes
                            # every device buffer
                            watchdog.beat()
                        checkpoints.save_pytree(
                            self.optim_state_path, self.opt_state
                        )
                        checkpoints.save_json(
                            self.lrsched_state_path, {"epoch": epoch}
                        )
                        checkpoints.save_json(
                            self.iter_state_path,
                            {"iter": step_id + 1, "epoch": epoch},
                        )
                        self.extra_save_state()
                        for key, arr in save.items():
                            np.save(
                                osp.join(self.args.logs_path, key + ".npy"),
                                np.array(arr),
                            )

                    if batch % self.vis_interval == 0:
                        print_with_time("generating visualization")
                        if self.fixed_test:
                            test_data = next(iter(self.test_data_loader))
                        else:
                            test_data = next(test_data_iter)
                        vis, vis_vals = self.vis_step(
                            test_data, global_step=step_id
                        )
                        if watchdog is not None:
                            watchdog.beat()
                        if vis is None and vis_vals is None:
                            return "no_vis"
                        if vis_vals is not None:
                            self.writer.add_scalars(
                                "vis", vis_vals, global_step=step_id
                            )
                        if vis is not None:
                            import imageio

                            vis_u8 = (np.clip(vis, 0, 1) * 255).astype(
                                np.uint8
                            )
                            os.makedirs(self.visual_path, exist_ok=True)
                            imageio.imwrite(
                                osp.join(
                                    self.visual_path,
                                    "{:04}_{:04}_vis.png".format(epoch, batch),
                                ),
                                vis_u8,
                            )

                    self.post_batch(epoch, batch)
                    step_id += 1
                    batch += 1
        # drain the dispatch queue: losses are lazy, so without this the
        # process could exit while the tail of the epoch is still executing
        # (any dispatched-but-unread update would be lost with it)
        try:
            if isinstance(losses, dict):
                float(losses["t"])
        except (NameError, UnboundLocalError):
            pass
        return "done"
