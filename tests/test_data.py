import os

import numpy as np
import pytest

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.data import (
    ColorJitterDataset,
    DataLoader,
    SRNDataset,
    YOLODataset,
    get_split_dataset,
)

from synth_data import make_srn_dataset, make_yolo_dataset

YOLO_DATA_CONF = parse_string(
    """
    model { mlp_coarse { num_scales = 1
                         num_anchors_per_scale = 3 } }
    yolo {
        image_scale = [0.5, 0.5]
        cell_sizes = [32]
        anchors = [
            [[0.02, 0.03], [0.04, 0.07], [0.08, 0.06]],
            [[0.07, 0.15], [0.15, 0.11], [0.14, 0.29]],
            [[0.28, 0.22], [0.38, 0.48], [0.9, 0.78]]
        ]
        ignore_iou_thresh = 0.5
    }
    """
)


@pytest.fixture(scope="module")
def yolo_root(tmp_path_factory):
    return make_yolo_dataset(
        str(tmp_path_factory.mktemp("yolo_data")), n_scenes=2, n_views=4,
        img_size=64,
    )


@pytest.fixture(scope="module")
def srn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("srn_data") / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=2, n_views=6, img_size=32)
    return root


class TestYOLODataset:
    def test_item_structure(self, yolo_root):
        dset = YOLODataset(yolo_root, stage="train", z_near=1, z_far=13.0,
                           conf=YOLO_DATA_CONF)
        assert len(dset) == 2
        item = dset[0]
        assert item["images"].shape == (4, 3, 32, 32)
        assert item["poses"].shape == (4, 4, 4)
        assert item["focal"].shape == (2,)
        np.testing.assert_allclose(item["focal"], [32.0, 32.0])
        np.testing.assert_allclose(item["c"], [16.0, 16.0])
        assert (item["images"] >= -1).all() and (item["images"] <= 1).all()
        # pose row0 negation applied
        raw = np.load(
            os.path.join(item["path"], "extrinsic_0000.npy")
        ).astype(np.float32)
        np.testing.assert_allclose(item["poses"][0][0], -raw[0], atol=1e-6)

        # grid targets: tuple per view, (1,1,3,6) at cell size 32
        targets = item["bboxes"][0]
        assert isinstance(targets, tuple) and len(targets) == 1
        t = targets[0]
        assert t.shape == (1, 1, 3, 6)
        # both boxes land in the single cell; one anchor assigned per box
        assert (t[..., 0] == 1).sum() == 2

    def test_grid_assignment_positions(self, yolo_root):
        """128px image at scale 1.0, cell 32 -> 4x4 grid; box at (.5,.5)
        must land in cell (2,2) with correct offsets."""
        conf = parse_string(
            """
            model { mlp_coarse { num_scales = 1
                                 num_anchors_per_scale = 3 } }
            yolo { image_scale = [1.0, 1.0]
                   cell_sizes = [32]
                   anchors = [[[0.25, 0.3], [0.04, 0.07], [0.08, 0.06]]]
                   ignore_iou_thresh = 0.5 }
            """
        )
        dset = YOLODataset(yolo_root, stage="train", conf=conf)
        # image is 64px at scale 1.0 -> 2x2 grid
        t = dset[0]["bboxes"][0][0]
        assert t.shape == (2, 2, 3, 6)
        cell = t[1, 1]  # y=.5 -> i=1, x=.5 -> j=1
        assigned = cell[cell[:, 0] == 1]
        assert len(assigned) >= 1
        # best anchor for (0.25, 0.3) box is anchor 0 (identical wh)
        assert cell[0, 0] == 1
        np.testing.assert_allclose(cell[0, 1:5], [0.0, 0.0, 0.5, 0.6],
                                   atol=1e-5)

    def test_factory_and_loader(self, yolo_root):
        train, val, test = get_split_dataset(
            "yolo", yolo_root, conf=YOLO_DATA_CONF
        )
        assert isinstance(train, ColorJitterDataset)
        assert train.z_near == 1 and train.z_far == 13.0
        loader = DataLoader(train, batch_size=1, shuffle=True)
        batch = next(iter(loader))
        assert batch["images"].shape == (1, 4, 3, 32, 32)
        assert batch["focal"].shape == (1, 2)
        # collated bbox structure: NV list of scale tuples of (SB, ...)
        assert batch["bboxes"][0][0].shape == (1, 1, 1, 3, 6)
        assert (batch["images"] >= -1.001).all()

    def test_worker_prefetch_matches_sync(self, srn_root):
        """num_workers>0 must yield the same batches in the same order as
        the synchronous path (same shuffle seed).  Uses the deterministic
        SRN dataset — ColorJitter draws are order-dependent by design."""
        from pixelnerf_yolo_tpu.data.srn import SRNDataset

        dset = SRNDataset(srn_root, stage="train", image_size=(32, 32))
        sync = list(DataLoader(dset, batch_size=1, shuffle=True, seed=3))
        thr = list(
            DataLoader(dset, batch_size=1, shuffle=True, seed=3,
                       num_workers=4)
        )
        assert len(sync) == len(thr) == len(dset)
        for a, b in zip(sync, thr):
            np.testing.assert_array_equal(a["images"], b["images"])
            assert a["path"] == b["path"]

    def test_worker_prefetch_jitter_thread_safety(self, yolo_root):
        """Concurrent jitter draws must stay in-distribution (the RNG is
        locked; unsynchronized numpy Generators can corrupt state)."""
        train, _, _ = get_split_dataset("yolo", yolo_root, conf=YOLO_DATA_CONF)
        for batch in DataLoader(train, batch_size=1, num_workers=4):
            assert np.isfinite(batch["images"]).all()
            assert batch["images"].min() >= -1.5 and batch["images"].max() <= 1.5


class TestSRNDataset:
    def test_item_structure(self, srn_root):
        dset = SRNDataset(srn_root, stage="train", image_size=(32, 32))
        assert len(dset) == 2
        assert dset.z_near == 0.8 and dset.z_far == 1.8  # car bounds
        item = dset[0]
        assert item["images"].shape == (6, 3, 32, 32)
        assert item["poses"].shape == (6, 4, 4)
        assert item["masks"].shape == (6, 1, 32, 32)
        assert item["bbox"].shape == (6, 4)
        # coord flip applied: pose @ diag(1,-1,-1,1)
        assert float(item["focal"]) == pytest.approx(32 * 1.2)

    def test_resize_path(self, srn_root):
        dset = SRNDataset(srn_root, stage="train", image_size=(16, 16))
        item = dset[0]
        assert item["images"].shape == (6, 3, 16, 16)
        assert float(item["focal"]) == pytest.approx(32 * 1.2 * 0.5)

    def test_factory(self, srn_root):
        train = get_split_dataset("srn", srn_root, want_split="train")
        assert isinstance(train, SRNDataset)


class TestColorJitter:
    def test_same_jitter_whole_scene_and_range(self, srn_root):
        base = SRNDataset(srn_root, stage="train", image_size=(32, 32))
        jit = ColorJitterDataset(base, rng=np.random.default_rng(3))
        item = jit[0]
        imgs = item["images"]
        assert imgs.shape == (6, 3, 32, 32)
        assert (imgs >= -1.0001).all() and (imgs <= 1.0001).all()
        # white background pixels must stay (nearly) identical across views
        # (same jitter applied to all views)
        corner = imgs[:, :, 0, 0]
        assert np.allclose(corner, corner[0], atol=1e-5)

    def test_adjustments_match_torchvision_formulas(self, rng):
        from pixelnerf_yolo_tpu.data.color_jitter import (
            adjust_brightness,
            adjust_contrast,
            adjust_hue,
            adjust_saturation,
        )

        torch = pytest.importorskip("torch")
        try:
            import torchvision.transforms.functional as TF  # noqa
            has_tv = True
        except ImportError:
            has_tv = False

        img = rng.random((3, 8, 8)).astype(np.float32)
        b = adjust_brightness(img, 1.1)
        assert b.max() <= 1.0 and np.all(b >= img * 1.1 - 1e-6 - (b > 0.999))
        s = adjust_saturation(img, 0.0)  # fully desaturated -> gray
        assert np.allclose(s[0], s[1], atol=1e-6)
        h = adjust_hue(img, 0.0)  # identity hue
        np.testing.assert_allclose(h, np.clip(img, 0, 1), atol=1e-5)
        c = adjust_contrast(img, 1.0)  # identity contrast
        np.testing.assert_allclose(c, np.clip(img, 0, 1), atol=1e-6)

        if has_tv:
            ref = TF.adjust_hue(torch.from_numpy(img), 0.25).numpy()
            np.testing.assert_allclose(adjust_hue(img, 0.25), ref, atol=1e-4)


class TestDVRDataset:
    @pytest.fixture(scope="class")
    def dvr_root(self, tmp_path_factory):
        from synth_data import make_dvr_dataset

        tmp = tmp_path_factory.mktemp("dvr_data")
        return make_dvr_dataset(str(tmp / "nmr"), n_cats=2, n_objs=2,
                                n_views=4, img_size=32)

    @pytest.fixture(scope="class")
    def dtu_root(self, tmp_path_factory):
        from synth_data import make_dvr_dataset

        tmp = tmp_path_factory.mktemp("dtu_data")
        return make_dvr_dataset(str(tmp / "dtu"), sub_format="dtu",
                                n_cats=1, n_objs=2, n_views=4, img_size=32)

    def test_shapenet_item_structure(self, dvr_root):
        from pixelnerf_yolo_tpu.data.dvr import DVRDataset

        dset = DVRDataset(dvr_root, stage="train")
        assert len(dset) == 4  # 2 cats x 2 objs
        item = dset[0]
        assert item["images"].shape == (4, 3, 32, 32)
        assert item["poses"].shape == (4, 4, 4)
        assert item["masks"].shape == (4, 1, 32, 32)
        assert item["bbox"].shape == (4, 4)
        # scale_focal: normalized focal * W/2
        assert float(item["focal"]) == pytest.approx(1.8 * 16)
        # poses are rigid after the NMR coordinate transform
        for p in item["poses"]:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)

    def test_dtu_item_structure(self, dtu_root):
        from pixelnerf_yolo_tpu.data.dvr import DVRDataset

        dset = DVRDataset(dtu_root, stage="train", list_prefix="new_",
                          sub_format="dtu", z_near=0.1, z_far=5.0)
        assert len(dset) == 2
        item = dset[0]
        assert item["images"].shape == (4, 3, 32, 32)
        assert item["focal"].shape == (2,)  # (fx, fy) averaged over views
        assert item["c"].shape == (2,)
        assert "bbox" not in item
        # fx recovered from the projection decomposition: 1.8 * W/2
        assert item["focal"][0] == pytest.approx(1.8 * 16, rel=1e-4)
        assert item["focal"][1] == pytest.approx(1.8 * 1.05 * 16, rel=1e-4)
        for p in item["poses"]:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_dtu_scale_mat_normalization(self, dtu_root):
        """Camera centers must be mapped through the inverse scale_mat:
        t' = (t - trans) / scale (DVRDataset.py:219-228)."""
        from pixelnerf_yolo_tpu.data.dvr import DVRDataset

        dset = DVRDataset(dtu_root, stage="train", list_prefix="new_",
                          sub_format="dtu")
        item = dset[0]
        # synthetic ring of radius 2.2 -> after (t - [.1,-.05,.2]) / 2 the
        # camera distance from the scene center is about 1.1
        centers = item["poses"][:, :3, 3]
        # undo the dtu coord flip diag(1,-1,-1) for the distance check
        dists = np.linalg.norm(
            centers * np.array([1, -1, -1]) + np.array([0.05, 0.025, -0.1]),
            axis=-1,
        )
        assert dists == pytest.approx(
            np.full(4, 2.2 / 2.0), rel=0.25
        )

    def test_decompose_projection_numpy_fallback(self):
        """The cv2-free RQ decomposition must invert K @ [R | -R C]."""
        from pixelnerf_yolo_tpu.data import dvr

        rng = np.random.default_rng(0)
        K = np.array([[500.0, 0, 32], [0, 520.0, 30], [0, 0, 1]])
        # random rotation via QR
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        C = rng.normal(size=3)
        P = K @ np.hstack([Q, (-Q @ C)[:, None]])

        cv2_saved = dvr.cv2
        dvr.cv2 = None
        try:
            K2, R2, t2 = dvr.decompose_projection(P)
        finally:
            dvr.cv2 = cv2_saved
        K2 = K2 / K2[2, 2]
        np.testing.assert_allclose(K2, K, atol=1e-6)
        np.testing.assert_allclose(R2, Q, atol=1e-6)
        np.testing.assert_allclose((t2[:3] / t2[3]).ravel(), C, atol=1e-6)

    def test_decompose_projection_batch_property(self):
        """One LAPACK call decomposes a whole (V, 3, 4) stack: composing
        K @ [R | -R C] per view and decomposing recovers each factor."""
        from pixelnerf_yolo_tpu.data import dvr

        rng = np.random.default_rng(7)
        V = 6
        Ks, Rs, Cs, Ps = [], [], [], []
        for _ in range(V):
            K = np.diag([rng.uniform(300, 900), rng.uniform(300, 900), 1.0])
            K[0, 2], K[1, 2] = rng.uniform(10, 60, 2)
            Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(Q) < 0:
                Q[:, 0] *= -1
            C = rng.normal(size=3)
            Ks.append(K), Rs.append(Q), Cs.append(C)
            Ps.append(K @ np.hstack([Q, (-Q @ C)[:, None]]))

        Kb, Rb, tb = dvr.decompose_projection_batch(np.stack(Ps))
        Kb = Kb / Kb[:, 2:3, 2:3]
        np.testing.assert_allclose(Kb, np.stack(Ks), atol=1e-6)
        np.testing.assert_allclose(Rb, np.stack(Rs), atol=1e-6)
        np.testing.assert_allclose(
            tb[:, :3, 0] / tb[:, 3:, 0], np.stack(Cs), atol=1e-6
        )

    def test_factory_dvr_formats(self, dvr_root, dtu_root):
        train, val, test = get_split_dataset("dvr", dvr_root)
        assert train.z_near == 1.2 and train.z_far == 4.0
        train_dtu, _, _ = get_split_dataset("dvr_dtu", dtu_root)
        assert train_dtu.sub_format == "dtu"
        assert train_dtu.z_near == 0.1 and train_dtu.z_far == 5.0


class TestMultiObjectDataset:
    @pytest.fixture(scope="class")
    def mo_root(self, tmp_path_factory):
        from synth_data import make_multi_object_dataset

        tmp = str(tmp_path_factory.mktemp("mo_data") / "multi")
        for stage in ("train", "val", "test"):
            make_multi_object_dataset(tmp, stage=stage, n_scenes=2,
                                      n_views=4, img_size=32)
        return tmp

    def test_item_structure(self, mo_root):
        from pixelnerf_yolo_tpu.data.multi_object import MultiObjectDataset

        dset = MultiObjectDataset(mo_root, stage="train")
        assert len(dset) == 2
        item = dset[0]
        assert item["images"].shape == (4, 3, 32, 32)
        assert item["masks"].shape == (4, 1, 32, 32)
        assert item["poses"].shape == (4, 4, 4)
        assert item["bbox"].shape == (4, 4)
        # focal from camera_angle_x: .5 * W / tan(.5 * angle)
        assert float(item["focal"]) == pytest.approx(
            0.5 * 32 / np.tan(0.5 * 0.6911)
        )
        # transparent background composited to white (= 1.0 in [-1,1]... the
        # tensor is [-1,1]; white composite puts background at exactly 1.0)
        assert item["images"][0, :, 0, 0] == pytest.approx(1.0)

    def test_n_views_filter(self, mo_root):
        from pixelnerf_yolo_tpu.data.multi_object import MultiObjectDataset

        ok = MultiObjectDataset(mo_root, stage="train", n_views=4)
        assert ok[0] != {}
        bad = MultiObjectDataset(mo_root, stage="train", n_views=7)
        assert bad[0] == {}

    def test_factory(self, mo_root):
        train, val, test = get_split_dataset("multi_obj", mo_root)
        assert train.z_near == 4 and train.z_far == 9
