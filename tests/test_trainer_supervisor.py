"""Supervisor semantics of the base training loop (SURVEY §5):
NaN abort (bounded by nan_interval), no_vis early-restart signal, and the
lr schedule reaching the update as a plain argument.
"""

import argparse
import math
import os

import numpy as np
import pytest

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.train.trainer import Trainer

TRAIN_CONF = """
train { print_interval = 4
        save_interval = 10000
        backup_interval = 10000
        vis_interval = 10000
        eval_interval = 10000
        metric_interval = 10000
        accu_grad = 1
        nan_interval = 2
        num_epoch_repeats = 1 }
"""


class _ListDataset(list):
    pass


class _StubTrainer(Trainer):
    """Scriptable train_step: emits the given loss sequence."""

    def __init__(self, args, conf, losses, vis=(None, {"x": 1.0})):
        dset = _ListDataset({"images": np.zeros(1)} for _ in range(8))
        super().__init__(dset, dset, args, conf.get_config("train"))
        self._losses = list(losses)
        self._vis = vis
        self.steps_run = 0
        self.saved = 0
        self.lr_seen = []
        self.init_opt_state({"w": np.zeros(2, np.float32)})

    def train_step(self, data, global_step):
        val = self._losses[min(self.steps_run, len(self._losses) - 1)]
        self.steps_run += 1
        self.lr_seen.append(self._lr)
        return {"t": val}

    def eval_step(self, data, global_step):
        return {"t": 0.0}

    def vis_step(self, data, global_step):
        return self._vis

    def save_model_state(self, epochNum=""):
        self.saved += 1


def _args(tmp_path, **kw):
    a = argparse.Namespace(
        name="sup", resume=False, gpu_id=[0],
        logs_path=str(tmp_path / "logs"),
        checkpoints_path=str(tmp_path / "ckpt"),
        visual_path=str(tmp_path / "vis"),
        epochs=1, lr=1e-3, gamma=0.5, ray_batch_size=8, batch_size=1,
        fixed_test=None, seed=0,
    )
    for k, v in kw.items():
        setattr(a, k, v)
    for p in (a.logs_path, a.visual_path,
              os.path.join(a.checkpoints_path, a.name)):
        os.makedirs(p, exist_ok=True)
    return a


class TestSupervisor:
    def test_nan_abort_within_interval(self, tmp_path):
        conf = parse_string(TRAIN_CONF)
        # NaN first appears at step 3; nan_interval=2 -> caught at batch 4
        losses = [1.0, 1.0, 1.0, float("nan"), float("nan"), float("nan")]
        tr = _StubTrainer(_args(tmp_path), conf, losses)
        assert tr.nan_interval == 2
        assert tr.start() == "nan"
        # abort lag bounded: caught no later than nan step + nan_interval
        assert tr.steps_run <= 3 + tr.nan_interval

    def test_no_vis_returns_early_restart_signal(self, tmp_path):
        conf = parse_string(TRAIN_CONF.replace("vis_interval = 10000",
                                              "vis_interval = 2"))
        tr = _StubTrainer(_args(tmp_path), conf, [1.0], vis=(None, None))
        assert tr.start() == "no_vis"

    def test_clean_run_finishes_and_decays_lr(self, tmp_path):
        conf = parse_string(TRAIN_CONF)
        args = _args(tmp_path, epochs=3)
        tr = _StubTrainer(args, conf, [1.0])
        assert tr.start() == "done"
        assert tr.steps_run == 3 * len(tr.train_dataset)
        # per-epoch exponential decay reached the host-side lr holder
        assert math.isclose(tr._lr, args.lr * args.gamma**2)

    def test_linear_warmup_ramps_then_hands_off(self, tmp_path):
        """train.warmup_steps linearly ramps the effective lr over the
        first N GLOBAL steps, then the per-epoch decay owns it again
        (large-batch stabilizer, PERF.md r4)."""
        conf = parse_string(TRAIN_CONF.replace(
            "accu_grad = 1", "accu_grad = 1\n        warmup_steps = 4"))
        args = _args(tmp_path, epochs=2)
        tr = _StubTrainer(args, conf, [1.0])
        assert tr.start() == "done"
        lr = args.lr
        # ramp: (step+1)/4 * lr for steps 0..3
        for i, frac in enumerate((0.25, 0.5, 0.75, 1.0)):
            assert math.isclose(tr.lr_seen[i], lr * frac), (i, tr.lr_seen[:5])
        # steps 4..7 (rest of epoch 0): full epoch-0 lr
        assert all(math.isclose(v, lr) for v in tr.lr_seen[4:8])
        # epoch 1: decay applies, warmup long gone
        assert all(math.isclose(v, lr * args.gamma)
                   for v in tr.lr_seen[8:16])


class TestCheckpointRobustness:
    def test_save_pytree_atomic_no_tmp_left(self, tmp_path):
        from pixelnerf_yolo_tpu.train import checkpoints

        path = str(tmp_path / "_optim")
        checkpoints.save_pytree(path, {"a": np.arange(4, dtype=np.float32)})
        assert os.path.exists(path) and not os.path.exists(path + ".tmp")
        loaded = checkpoints.load_pytree(
            path, {"a": np.zeros(4, np.float32)}
        )
        np.testing.assert_array_equal(loaded["a"], np.arange(4))

    def test_truncated_optim_state_warns_and_reinits(self, tmp_path):
        """A run killed mid-save must not brick the next resume: the
        trainer warns and re-initializes the optimizer state."""
        conf = parse_string(TRAIN_CONF)
        args = _args(tmp_path, resume=True)
        optim_path = os.path.join(args.checkpoints_path, args.name, "_optim")
        with open(optim_path, "wb") as f:
            f.write(b"\x93truncated-msgpack")
        with pytest.warns(UserWarning, match="optimizer state"):
            tr = _StubTrainer(args, conf, [1.0])
        assert tr.opt_state is not None


class TestStallWatchdog:
    """utils.misc.StallWatchdog — the dead-accelerator abort
    (PNY_STALL_ABORT_S). A thread blocked inside the device runtime can't
    be interrupted, so the watchdog hard-exits via an (injectable)
    os._exit."""

    def test_fires_after_stall(self):
        import time

        from pixelnerf_yolo_tpu.utils.misc import StallWatchdog

        fired = []
        wd = StallWatchdog(0.2, poll_s=0.05, _exit=fired.append).start()
        try:
            deadline = time.monotonic() + 5.0
            while not fired and time.monotonic() < deadline:
                time.sleep(0.05)
            assert fired == [3]
        finally:
            wd.stop()

    def test_beat_defers_firing_and_stop_silences(self):
        import time

        from pixelnerf_yolo_tpu.utils.misc import StallWatchdog

        fired = []
        wd = StallWatchdog(0.5, poll_s=0.05, _exit=fired.append).start()
        try:
            for _ in range(8):  # keep beating past the timeout horizon
                time.sleep(0.1)
                wd.beat()
            assert not fired
        finally:
            wd.stop()
        time.sleep(0.8)  # stopped: stale heartbeat must NOT fire
        assert not fired
