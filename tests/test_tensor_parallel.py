"""Tensor parallelism: the 'model' mesh axis shards the field MLP's hidden
dimension (Megatron-style: fc_0 column-parallel, fc_1 row-parallel, XLA
psum over 'model' closing each ResnetFC block — parallel.tp_shardings).

The reference has no model-parallel story at all (DataParallel only,
/root/reference/src/render/nerf.py:360-377); this is the TPU-native
extension for fields too wide for one chip.  These tests verify the SAME
update math on 1 device vs an 8-virtual-device ('data', 'rays', 'model')
mesh, and that the params/optimizer state actually live sharded.
"""

import math

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import (
    MODEL_AXIS,
    bind_parallel,
    make_train_mesh,
    tp_shardings,
)
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer

from synth_data import make_srn_dataset, make_yolo_dataset
from test_sharded_trainer import _tree_allclose
from test_train_integration import (
    NERF_TRAIN_CONF,
    YOLO_TRAIN_CONF,
    make_args,
)


def _build_nerf_trainer(tmp, root, n_devices, batch_size, tp=1):
    conf = parse_string(NERF_TRAIN_CONF)
    args = make_args(
        tmp, f"nerf_tp_{n_devices}_{tp}",
        extra={"nviews": "2", "batch_size": batch_size},
    )
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    mesh = make_train_mesh(
        n_devices=n_devices, batch_size=batch_size, model_parallel=tp
    )
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [2]
    )
    return trainer, dset


def _build_yolo_trainer(tmp, root, n_devices, batch_size=1, tp=1):
    conf = parse_string(YOLO_TRAIN_CONF)
    args = make_args(
        tmp, f"yolo_tp_{n_devices}_{batch_size}_{tp}",
        extra={"batch_size": batch_size},
    )
    dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    mesh = make_train_mesh(
        n_devices=n_devices, batch_size=batch_size, model_parallel=tp
    )
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [3]
    )
    return trainer, dset


class TestTPSpecs:
    def test_mesh_axes(self):
        mesh = make_train_mesh(n_devices=8, batch_size=2, model_parallel=2)
        assert dict(mesh.shape) == {"data": 2, "rays": 2, "model": 2}
        # model axis innermost: TP all-reduce rides adjacent devices
        assert mesh.axis_names[-1] == MODEL_AXIS

    def test_indivisible_model_parallel_rejected(self):
        with pytest.raises(ValueError, match="model_parallel"):
            make_train_mesh(n_devices=8, batch_size=1, model_parallel=3)

    def test_param_specs(self):
        mesh = make_train_mesh(n_devices=8, batch_size=1, model_parallel=2)
        tree = {
            "mlp_coarse": {
                "block_0": {
                    "fc_0": {
                        "kernel": np.zeros((16, 32), np.float32),
                        "bias": np.zeros((32,), np.float32),
                    },
                    "fc_1": {
                        "kernel": np.zeros((32, 16), np.float32),
                        "bias": np.zeros((16,), np.float32),
                    },
                },
                "lin_in": {"kernel": np.zeros((8, 16), np.float32)},
            },
            "encoder": {"conv1": {"kernel": np.zeros((3, 3, 3, 8))}},
        }
        sh = tp_shardings(tree, mesh)
        blk = sh["mlp_coarse"]["block_0"]
        assert blk["fc_0"]["kernel"].spec == P(None, MODEL_AXIS)
        assert blk["fc_0"]["bias"].spec == P(MODEL_AXIS)
        assert blk["fc_1"]["kernel"].spec == P(MODEL_AXIS, None)
        assert blk["fc_1"]["bias"].spec == P()
        assert sh["mlp_coarse"]["lin_in"]["kernel"].spec == P()
        assert sh["encoder"]["conv1"]["kernel"].spec == P()

    def test_indivisible_hidden_rejected(self):
        mesh = make_train_mesh(n_devices=8, batch_size=1, model_parallel=2)
        tree = {"fc_0": {"kernel": np.zeros((4, 33), np.float32)}}
        with pytest.raises(ValueError, match="divisible"):
            tp_shardings(tree, mesh)

    def test_no_model_axis_is_replicated(self):
        mesh = make_train_mesh(n_devices=8, batch_size=1)
        tree = {"fc_0": {"kernel": np.zeros((4, 32), np.float32)}}
        sh = tp_shardings(tree, mesh)
        assert sh["fc_0"]["kernel"].spec == P()


class TestNeRFTensorParallel:
    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("nerf_tp")
        root = str(tmp / "data" / "cars")
        for stage in ("train", "val", "test"):
            make_srn_dataset(root, stage=stage, n_objs=2, n_views=6,
                             img_size=32)
        return tmp, root

    def test_update_matches_1_device(self, data_root):
        tmp, root = data_root
        assert len(jax.devices()) >= 8
        t1, dset = _build_nerf_trainer(tmp, root, 1, batch_size=2)
        t8, _ = _build_nerf_trainer(tmp, root, 8, batch_size=2, tp=2)
        assert dict(t8.mesh.shape) == {"data": 2, "rays": 2, "model": 2}
        batch = next(iter(DataLoader(dset, batch_size=2, shuffle=False)))

        l1 = {k: float(v) for k, v in t1.train_step(batch, 0).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch, 0).items()}
        for k in l1:
            assert math.isfinite(l1[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5)
        _tree_allclose(t1.variables["params"], t8.variables["params"])

    def test_params_and_adam_state_live_sharded(self, data_root):
        """The point of TP: per-device param/optimizer memory shrinks.
        fc_0/fc_1 kernels (and their Adam moments) must be laid out with
        a 'model' dimension in their sharding, not replicated."""
        tmp, root = data_root
        t8, dset = _build_yolo_or_nerf = _build_nerf_trainer(
            tmp, root, 8, batch_size=2, tp=2
        )
        batch = next(iter(DataLoader(dset, batch_size=2, shuffle=False)))
        t8.train_step(batch, 0)

        def find(tree, name):
            out = []
            def rec(path, x):
                if isinstance(x, dict):
                    for k, v in x.items():
                        rec(path + "/" + k, v)
                elif name in path and path.endswith("kernel"):
                    out.append((path, x))
            rec("", tree)
            return out

        fc0 = find(t8.variables["params"], "fc_0")
        assert fc0, "no fc_0 kernels found"
        for path, leaf in fc0:
            assert MODEL_AXIS in str(leaf.sharding.spec), (
                path, leaf.sharding)
        # Adam moments shard identically (search the whole optax state
        # tree by path: mu/nu mirror the params tree)
        moments = [
            (jax.tree_util.keystr(path), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                t8.opt_state
            )
            if "fc_0" in jax.tree_util.keystr(path)
            and "kernel" in jax.tree_util.keystr(path)
        ]
        assert moments, "no fc_0 kernel moments found in opt_state"
        for path, leaf in moments:
            assert MODEL_AXIS in str(leaf.sharding.spec), (
                path, leaf.sharding)

    def test_tp_render_matches(self, data_root):
        """RenderParallel on a TP mesh: rays shard over data x rays only,
        params over 'model'; the rendered image must match 1-device."""
        tmp, root = data_root
        t1, dset = _build_nerf_trainer(tmp, root, 1, batch_size=2)
        t8, _ = _build_nerf_trainer(tmp, root, 8, batch_size=2, tp=2)
        batch = next(iter(DataLoader(dset, batch_size=2, shuffle=False)))
        # copy weights so both render the same function
        t8.variables = jax.tree.map(np.asarray, t1.variables)

        import jax.numpy as jnp
        from pixelnerf_yolo_tpu.utils import camera

        images = np.asarray(batch["images"])[:1, :2]
        poses = np.asarray(batch["poses"])[:1, :2]
        focal = jnp.asarray(np.asarray(batch["focal"])[:1])
        rays = camera.gen_rays(
            jnp.asarray(poses[0]), 16, 16, focal[0], 0.8, 1.8
        ).reshape(1, -1, 8)[:, :64]
        key = jax.random.PRNGKey(7)

        outs = []
        for t in (t1, t8):
            cond = t.model.encode(
                t.variables, jnp.asarray(images[0]), jnp.asarray(poses[0]),
                focal[0],
            )
            out = t.render_par(t.variables, cond, rays, key)
            outs.append(np.asarray(out["coarse"]["rgb"]))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)


class TestYOLOTensorParallel:
    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("yolo_tp")
        root = make_yolo_dataset(str(tmp / "data"), n_scenes=2, n_views=4,
                                 img_size=64)
        return tmp, root

    def test_update_matches_1_device(self, data_root):
        tmp, root = data_root
        t1, dset = _build_yolo_trainer(tmp, root, 1)
        t8, _ = _build_yolo_trainer(tmp, root, 8, tp=2)
        assert dict(t8.mesh.shape) == {"data": 1, "rays": 4, "model": 2}
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))

        l1 = {k: float(v) for k, v in t1.train_step(batch).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch).items()}
        for k in l1:
            assert math.isfinite(l1[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5, atol=1e-7)
        _tree_allclose(t1.variables["params"], t8.variables["params"])
