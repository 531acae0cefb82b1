"""model.remat: field rematerialization must not change the training math.

jax.checkpoint on the conditioned field recomputes its activations in the
backward pass instead of storing them (the standard TPU memory lever for
large ray batches).  Remat replays the SAME ops, so losses and post-step
parameters must match the non-remat update bit-for-bit-ish (f32 highest).
"""

import numpy as np
import pytest

import jax

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel, make_train_mesh
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer

from synth_data import make_srn_dataset
from test_train_integration import NERF_TRAIN_CONF, make_args


def _train_one_step(tmp, root, remat: bool, policy: str = "",
                    gather: bool = False):
    conf = parse_string(NERF_TRAIN_CONF)
    conf.put("model.remat", remat)
    if policy:
        conf.put("model.remat_policy", policy)
    if gather:
        conf.put("model.remat_gather", True)
    args = make_args(tmp, f"remat_{remat}_{policy or 'full'}_{gather}",
                     extra={"nviews": "2", "batch_size": 1})
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    assert model.remat is remat
    renderer = make_renderer(conf)
    mesh = make_train_mesh(n_devices=1, batch_size=1)
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [2]
    )
    batch = next(iter(DataLoader(dset, batch_size=1)))
    losses = trainer.train_step(batch, 0)
    return (
        {k: float(v) for k, v in losses.items()},
        jax.tree.map(np.asarray, trainer.variables["params"]),
    )


def test_remat_matches_plain_update(tmp_path):
    root = str(tmp_path / "data" / "cars")
    make_srn_dataset(root, stage="train", n_objs=1, n_views=4, img_size=16)
    make_srn_dataset(root, stage="val", n_objs=1, n_views=4, img_size=16)
    make_srn_dataset(root, stage="test", n_objs=1, n_views=4, img_size=16)

    losses_plain, params_plain = _train_one_step(tmp_path, root, False)
    # every saveable policy replays the same math — losses and the
    # post-step params must match plain for full remat AND the selective
    # policies (block = save per-block outputs, dots = save dot outputs)
    for policy in ("", "block", "dots"):
        losses_remat, params_remat = _train_one_step(
            tmp_path, root, True, policy
        )
        for k in losses_plain:
            assert losses_remat[k] == pytest.approx(
                losses_plain[k], rel=1e-6
            ), policy
        # post-Adam-step comparison: remat replays the same math but XLA
        # fuses the recomputed forward into the backward with different
        # reduction orders, and the first Adam step moves params by ~±lr
        # in the SIGN of the gradient — where g ~ 0 that sign can flip on
        # rounding noise, so the bound is ~2*lr = 2e-4 (same rationale as
        # test_sharded_trainer)
        for a, b in zip(jax.tree.leaves(params_plain),
                        jax.tree.leaves(params_remat)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=2.5e-4,
                                       err_msg=policy)


def test_remat_gather_matches_plain_update(tmp_path):
    """model.remat_gather re-gathers the latents inside the checkpoint
    (saved residual = xyz instead of the gathered latents).  The union's
    coarse samples re-gather from the same points the coarse pass used,
    so the math — losses and the post-step params — must match plain."""
    root = str(tmp_path / "data" / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=1, n_views=4,
                         img_size=16)
    losses_plain, params_plain = _train_one_step(tmp_path, root, False)
    losses_rg, params_rg = _train_one_step(
        tmp_path, root, True, gather=True
    )
    for k in losses_plain:
        assert losses_rg[k] == pytest.approx(losses_plain[k], rel=1e-6)
    for a, b in zip(jax.tree.leaves(params_plain),
                    jax.tree.leaves(params_rg)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2.5e-4)


def test_unknown_remat_policy_rejected(tmp_path):
    from pixelnerf_yolo_tpu.models.pixelnerf import _resolve_remat_policy

    with pytest.raises(ValueError, match="remat_policy"):
        _resolve_remat_policy("everything")
    assert _resolve_remat_policy("") is None
    assert _resolve_remat_policy("full") is None


def test_remat_gather_without_remat_rejected():
    """model.remat_gather only exists inside the checkpointed field —
    setting it without model.remat must fail loudly at construction,
    not run silently inert at the plain memory ceiling."""
    conf = parse_string(NERF_TRAIN_CONF)
    conf.put("model.remat_gather", True)
    with pytest.raises(ValueError, match="remat_gather requires"):
        make_model(conf.get_config("model"))


def test_remat_bf16_trains(tmp_path):
    """Production policy (bfloat16) + remat: one full update runs and
    yields a finite loss (the checkpointed field recompute must compose
    with the bf16 cast boundaries and custom precision)."""
    root = str(tmp_path / "data" / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=1, n_views=4,
                         img_size=16)
    conf = parse_string(NERF_TRAIN_CONF)
    conf.put("model.remat", True)
    conf.put("model.compute_dtype", "bfloat16")
    args = make_args(tmp_path, "remat_bf16",
                     extra={"nviews": "2", "batch_size": 1})
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    mesh = make_train_mesh(n_devices=1, batch_size=1)
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [2]
    )
    batch = next(iter(DataLoader(dset, batch_size=1)))
    losses = trainer.train_step(batch, 0)
    assert np.isfinite(float(losses["t"]))
