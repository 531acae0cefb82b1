import numpy as np
import pytest

import jax.numpy as jnp

from pixelnerf_yolo_tpu.detect import (
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    iou,
    nms,
    nms_padded,
)

torch = pytest.importorskip("torch")


def ref_iou_torch(b1, b2):
    """Independent torch check of the xywh IoU formula."""
    b1 = torch.as_tensor(b1, dtype=torch.float64)
    b2 = torch.as_tensor(b2, dtype=torch.float64)
    b1x1, b1y1 = b1[..., 0] - b1[..., 2] / 2, b1[..., 1] - b1[..., 3] / 2
    b1x2, b1y2 = b1[..., 0] + b1[..., 2] / 2, b1[..., 1] + b1[..., 3] / 2
    b2x1, b2y1 = b2[..., 0] - b2[..., 2] / 2, b2[..., 1] - b2[..., 3] / 2
    b2x2, b2y2 = b2[..., 0] + b2[..., 2] / 2, b2[..., 1] + b2[..., 3] / 2
    inter = (torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0) * (
        torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)
    ).clamp(0)
    union = (
        ((b1x2 - b1x1) * (b1y2 - b1y1)).abs()
        + ((b2x2 - b2x1) * (b2y2 - b2y1)).abs()
        - inter
    )
    return (inter / (union + 1e-6)).numpy()


class TestIoU:
    def test_matches_independent_formula(self, rng):
        b1 = rng.random((20, 4))
        b2 = rng.random((20, 4))
        ours = iou(b1, b2)[..., 0]
        np.testing.assert_allclose(ours, ref_iou_torch(b1, b2), atol=1e-9)

    def test_identical_boxes(self):
        b = np.array([0.5, 0.5, 0.2, 0.2])
        assert iou(b, b)[0] == pytest.approx(1.0, abs=1e-4)

    def test_disjoint_boxes(self):
        a = np.array([0.2, 0.2, 0.1, 0.1])
        b = np.array([0.8, 0.8, 0.1, 0.1])
        assert iou(a, b)[0] == pytest.approx(0.0, abs=1e-9)

    def test_anchor_wh_iou(self):
        a = np.array([0.2, 0.4])
        anchors = np.array([[0.2, 0.4], [0.1, 0.2], [0.4, 0.8]])
        got = iou(a, anchors, is_pred=False)
        np.testing.assert_allclose(got, [1.0, 0.25, 0.25], atol=1e-9)

    def test_jnp_version_matches(self, rng):
        from pixelnerf_yolo_tpu.losses.yolo import iou_xywh

        b1 = rng.random((10, 4)).astype(np.float32)
        b2 = rng.random((10, 4)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(iou_xywh(jnp.asarray(b1), jnp.asarray(b2))),
            ref_iou_torch(b1, b2),
            atol=1e-6,
        )


class TestConvertCells:
    def test_target_decode_roundtrip(self):
        """Place a known target box in a cell; decoding must recover the
        normalized box."""
        h = w = 4
        A = 3
        target = np.zeros((1, h, w, A, 6), dtype=np.float32)
        # box at cell (i=1, j=2), anchor 1: x_cell=.5, y_cell=.25, w=2 cells
        target[0, 1, 2, 1] = [1.0, 0.5, 0.25, 2.0, 1.0, 1.0]
        anchors = np.array([[0.1, 0.1], [0.2, 0.2], [0.4, 0.4]], np.float32)
        out = convert_cells_to_bboxes(target, anchors, h, w,
                                      is_predictions=False)
        boxes = np.array(out[0])
        # the assigned entry: class 1, score 1, x=(2+.5)/4, y=(1+.25)/4,
        # w=2/4, h=1/4
        hit = boxes[(boxes[:, 1] == 1.0)]
        assert len(hit) == 1
        np.testing.assert_allclose(
            hit[0], [1.0, 1.0, 0.625, 0.3125, 0.5, 0.25], atol=1e-6
        )

    def test_prediction_decode_uses_sigmoid_exp(self):
        h = w = 2
        A = 1
        pred = np.zeros((1, h, w, A, 7), dtype=np.float32)
        pred[0, 0, 0, 0] = [0.9, 0.0, 0.0, 0.0, 0.0, 2.0, -1.0]
        anchors = np.array([[0.2, 0.4]], np.float32)
        boxes = np.array(convert_cells_to_bboxes(pred, anchors, h, w)[0])
        b = boxes[0]
        assert b[0] == 0.0  # argmax class
        assert b[1] == pytest.approx(0.9)
        assert b[2] == pytest.approx((0.5 + 0) / 2)  # sigmoid(0)=.5
        assert b[4] == pytest.approx(np.exp(0) * 0.2 / 2)
        assert b[5] == pytest.approx(np.exp(0) * 0.4 / 2)

    def test_flattening_order_matches_torch(self, rng):
        """(B,H,W,A,6) -> (B, A*H*W, 6) must flatten like torch reshape."""
        h, w, A = 3, 2, 2
        vals = rng.normal(size=(1, h, w, A, 7)).astype(np.float32)
        anchors = rng.random((A, 2)).astype(np.float32)
        ours = np.array(convert_cells_to_bboxes(vals, anchors, h, w)[0])
        assert ours.shape == (A * h * w, 6)
        # entry 0 corresponds to (h=0, w=0, a=0), entry 1 to (0, 0, 1), ...
        t = torch.from_numpy(vals)
        flat = t.reshape(1, h * w * A, 7)
        np.testing.assert_allclose(ours[:, 1], flat[0, :, 0].numpy())


class TestNMS:
    def boxes(self):
        # [class, score, x, y, w, h]
        return [
            [0, 0.9, 0.5, 0.5, 0.2, 0.2],
            [0, 0.8, 0.51, 0.5, 0.2, 0.2],   # overlaps #0
            [1, 0.7, 0.2, 0.2, 0.1, 0.1],    # separate
            [0, 0.3, 0.5, 0.5, 0.21, 0.2],   # below threshold 0.45
            [0, 0.85, 0.5, 0.5, 1e-5, 0.2],  # degenerate width filtered
        ]

    def test_basic_suppression(self):
        kept, hc, above = nms(self.boxes(), iou_threshold=0.5, threshold=0.45)
        assert hc == 0.9
        assert above == 4  # score>.45 before wh filter
        scores = [b[1] for b in kept]
        assert 0.9 in scores and 0.7 in scores
        assert 0.8 not in scores  # suppressed by 0.9
        assert 0.3 not in scores and 0.85 not in scores

    def test_remove_while_iterating_quirk(self):
        """Three boxes overlapping the winner: the reference's loop removes
        the 1st and 3rd but SKIPS the middle one.  Construct that case and
        check we reproduce it."""
        boxes = [
            [0, 0.9, 0.5, 0.5, 0.2, 0.2],
            [0, 0.8, 0.50, 0.5, 0.2, 0.2],
            [0, 0.7, 0.51, 0.5, 0.2, 0.2],
            [0, 0.6, 0.52, 0.5, 0.2, 0.2],
        ]
        kept, _, _ = nms(boxes, iou_threshold=0.5, threshold=0.1)
        scores = sorted(b[1] for b in kept)
        # winner 0.9 suppresses 0.8; skip lands on 0.7; 0.6 suppressed;
        # next round 0.7 wins
        assert scores == [0.7, 0.9]

    def test_tp_fp_fn_and_prf1(self):
        gt = [
            [0, 1.0, 0.5, 0.5, 0.2, 0.2],
            [1, 1.0, 0.2, 0.2, 0.1, 0.1],
        ]
        pred = [
            [0, 0.9, 0.5, 0.5, 0.21, 0.2],   # matches gt0
            [0, 0.8, 0.85, 0.85, 0.1, 0.1],  # spurious
        ]
        tp, fp, fn = calculate_tp_fp_fn(gt, pred, 0.75, 0.45, 0.2)
        assert (tp, fp, fn) == (1, 1, 1)
        p, r, f1 = calculate_precision_recall_f1(tp, fp, fn)
        assert p == 0.5 and r == 0.5 and f1 == 0.5

    def test_empty_cases(self):
        pred = [[0, 0.9, 0.5, 0.5, 0.2, 0.2]]
        low = [[0, 0.01, 0.5, 0.5, 0.2, 0.2]]
        tp, fp, fn = calculate_tp_fp_fn(low, pred, 0.75, 0.45, 0.2)
        assert (tp, fp, fn) == (0, 1, 0)
        tp, fp, fn = calculate_tp_fp_fn(pred, low, 0.75, 0.45, 0.2)
        assert (tp, fp, fn) == (0, 0, 1)


class TestNMSPadded:
    def test_matches_standard_greedy(self):
        boxes = np.array(
            [
                [0, 0.9, 0.5, 0.5, 0.2, 0.2],
                [0, 0.8, 0.51, 0.5, 0.2, 0.2],
                [1, 0.7, 0.2, 0.2, 0.1, 0.1],
                [0, 0.3, 0.5, 0.5, 0.21, 0.2],
                [0, 0.0, 0, 0, 0, 0],  # padding
            ],
            dtype=np.float32,
        )
        kept, valid = nms_padded(jnp.asarray(boxes), 0.5, 0.45, max_out=8)
        kept = np.asarray(kept)[np.asarray(valid)]
        scores = sorted(kept[:, 1].tolist(), reverse=True)
        assert scores == pytest.approx([0.9, 0.7])

    def test_all_below_threshold(self):
        boxes = np.zeros((4, 6), dtype=np.float32)
        kept, valid = nms_padded(jnp.asarray(boxes), 0.5, 0.45, max_out=4)
        assert not np.asarray(valid).any()


class TestYoloLoss:
    def test_components_match_manual(self, rng):
        from pixelnerf_yolo_tpu.losses import YoloLoss

        A = 3
        loss_fn = YoloLoss(A, 1.0, 20.0, 1.0, 1.0)
        R = 8
        pred = rng.normal(size=(1, R, A, 7)).astype(np.float32)
        pred[..., 0] = rng.random((1, R, A))  # probs in [0,1]
        target = np.zeros((1, R, A, 6), dtype=np.float32)
        target[0, 0, 1] = [1.0, 0.5, 0.5, 0.3, 0.4, 1.0]
        target[0, 3, 0, 0] = -1.0  # ignore flag: neither obj nor no_obj
        anchors = np.array([[0.1, 0.2], [0.3, 0.3], [0.5, 0.4]], np.float32)

        total, box_l, obj_l, noobj_l, cls_l = [
            float(x)
            for x in loss_fn(jnp.asarray(pred), jnp.asarray(target),
                             jnp.asarray(anchors))
        ]

        # manual torch computation following loss.py:121-163
        tp = torch.from_numpy(pred.copy())
        tt = torch.from_numpy(target.copy())
        ta = torch.from_numpy(anchors).reshape(1, 1, A, 2)
        obj = tt[..., 0] == 1
        no_obj = tt[..., 0] == 0
        bce = torch.nn.BCELoss()
        ref_noobj = float(bce(tp[..., 0:1][no_obj], tt[..., 0:1][no_obj]))
        box_preds = torch.cat(
            [torch.sigmoid(tp[..., 1:3]), torch.exp(tp[..., 3:5]) * ta], -1
        )
        b1, b2 = box_preds[obj], tt[..., 1:5][obj]
        inter = (
            torch.min(b1[:, 0] + b1[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2)
            - torch.max(b1[:, 0] - b1[:, 2] / 2, b2[:, 0] - b2[:, 2] / 2)
        ).clamp(0) * (
            torch.min(b1[:, 1] + b1[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2)
            - torch.max(b1[:, 1] - b1[:, 3] / 2, b2[:, 1] - b2[:, 3] / 2)
        ).clamp(0)
        union = (b1[:, 2] * b1[:, 3]).abs() + (b2[:, 2] * b2[:, 3]).abs() - inter
        ious = (inter / (union + 1e-6)).unsqueeze(-1)
        mse = torch.nn.MSELoss()
        ref_obj = float(mse(tp[..., 0:1][obj], ious * tt[..., 0:1][obj]))
        tp[..., 1:3] = torch.sigmoid(tp[..., 1:3])
        tt[..., 3:5] = torch.log(1e-6 + tt[..., 3:5] / ta)
        ref_box = float(mse(tp[..., 1:5][obj], tt[..., 1:5][obj]))
        ce = torch.nn.CrossEntropyLoss()
        ref_cls = float(ce(tp[..., 5:][obj], tt[..., 5][obj].long()))

        assert noobj_l == pytest.approx(ref_noobj, rel=1e-4)
        assert obj_l == pytest.approx(ref_obj, rel=1e-4)
        assert box_l == pytest.approx(ref_box, rel=1e-4)
        assert cls_l == pytest.approx(ref_cls, rel=1e-4)
        assert total == pytest.approx(
            ref_box + 20 * ref_obj + ref_noobj + ref_cls, rel=1e-4
        )

    def test_no_objects_guard(self, rng):
        from pixelnerf_yolo_tpu.losses import YoloLoss

        loss_fn = YoloLoss(3, 1.0, 20.0, 1.0, 1.0)
        pred = rng.normal(size=(1, 4, 3, 7)).astype(np.float32)
        pred[..., 0] = 0.5
        target = np.zeros((1, 4, 3, 6), dtype=np.float32)
        anchors = np.ones((3, 2), dtype=np.float32)
        total, box_l, obj_l, noobj_l, cls_l = loss_fn(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(anchors)
        )
        assert float(box_l) == 0.0 and float(obj_l) == 0.0
        assert float(cls_l) == 0.0
        assert float(noobj_l) > 0.0
        assert np.isfinite(float(total))


class TestDeviceDetectionPath:
    """The padded device decode + NMS + matching pipeline (default in
    metric_step; --host_nms selects the reference-exact host path)."""

    def test_decode_cells_matches_host(self, rng):
        from pixelnerf_yolo_tpu.detect import decode_cells

        anchors = np.array([[0.1, 0.2], [0.3, 0.2], [0.2, 0.4]], np.float32)
        pred = rng.normal(size=(2, 3, 4, 3, 7)).astype(np.float32)
        host = np.asarray(
            convert_cells_to_bboxes(pred, anchors, 3, 4, is_predictions=True)
        )
        dev = np.asarray(
            decode_cells(jnp.asarray(pred), jnp.asarray(anchors),
                         is_predictions=True)
        )
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)

        tgt = np.zeros((1, 3, 4, 3, 6), np.float32)
        tgt[0, 1, 2, 0] = [1, 0.5, 0.25, 0.3, 0.4, 1]
        host_t = np.asarray(
            convert_cells_to_bboxes(tgt, anchors, 3, 4, is_predictions=False)
        )
        dev_t = np.asarray(
            decode_cells(jnp.asarray(tgt), jnp.asarray(anchors),
                         is_predictions=False)
        )
        np.testing.assert_allclose(dev_t, host_t, rtol=1e-6, atol=1e-7)

    def test_tp_fp_fn_padded_matches_host(self, rng):
        """Protocol-threshold parity: same TP/FP/FN as the host pipeline on
        random well-separated scenes (the host NMS quirk never fires for
        disjoint boxes)."""
        from pixelnerf_yolo_tpu.detect import tp_fp_fn_padded

        for trial in range(5):
            r = np.random.default_rng(trial)
            # targets on a coarse grid -> disjoint
            cells = r.choice(16, size=4, replace=False)
            gt = []
            for c in cells:
                gx, gy = (c % 4) / 4 + 0.125, (c // 4) / 4 + 0.125
                gt.append([r.integers(0, 2), 1.0, gx, gy, 0.15, 0.15])
            pred = []
            for i, t in enumerate(gt):
                if i < 2:  # matching preds
                    pred.append([t[0], 0.9, t[2] + 0.01, t[3], 0.15, 0.16])
            pred.append([0, 0.8, 0.95, 0.95, 0.05, 0.05])  # spurious
            pred.append([0, 0.1, 0.5, 0.5, 0.1, 0.1])  # below threshold
            host = calculate_tp_fp_fn(gt, pred, 0.75, 0.45, 0.2)
            dev = tp_fp_fn_padded(
                jnp.asarray(np.asarray(gt, np.float32)),
                jnp.asarray(np.asarray(pred, np.float32)),
                0.75, 0.45, 0.2, max_out=16,
            )
            assert tuple(int(x) for x in dev) == host

    def test_tp_fp_fn_padded_empty_sides(self):
        from pixelnerf_yolo_tpu.detect import tp_fp_fn_padded

        real = np.array([[0, 0.9, 0.5, 0.5, 0.2, 0.2]], np.float32)
        low = np.array([[0, 0.01, 0.5, 0.5, 0.2, 0.2]], np.float32)
        tp, fp, fn = tp_fp_fn_padded(
            jnp.asarray(low), jnp.asarray(real), 0.75, 0.45, 0.2, max_out=4
        )
        assert (int(tp), int(fp), int(fn)) == (0, 1, 0)
        tp, fp, fn = tp_fp_fn_padded(
            jnp.asarray(real), jnp.asarray(low), 0.75, 0.45, 0.2, max_out=4
        )
        assert (int(tp), int(fp), int(fn)) == (0, 0, 1)

    def test_metric_path_max_out_autoscales(self):
        """The trainer's device-NMS metric path must not clip dense scenes:
        max_out auto-scales (power-of-2 buckets) from the candidate count,
        so TP+FP can exceed the configured yolo.nms_max_out floor.
        Evidence basis: scripts/nms_delta.py measured the fixed-64 cap
        diverging up to +0.12 F1 on dense scenes while the uncapped
        device-vs-host quirk delta stays <= 0.003 F1 (PARITY.md)."""
        from types import SimpleNamespace

        from pixelnerf_yolo_tpu.train.yolo_trainer import YOLOTrainer

        stub = SimpleNamespace(
            use_host_nms=False, nms_max_out=4,
            nms_iou_threshold=0.75, nms_threshold=0.45,
            match_iou_threshold=0.2,
        )
        # 12 disjoint confident predictions matching 12 disjoint GT: a
        # fixed max_out=4 would report at most 4 kept; autoscaling must
        # report all 12 as TP
        gt, pred = [], []
        for i in range(12):
            cx, cy = (i % 4) / 4 + 0.125, (i // 4) / 8 + 0.0625
            gt.append([0, 1.0, cx, cy, 0.1, 0.05])
            pred.append([0, 0.9, cx, cy, 0.1, 0.05])
        tp, fp, fn = YOLOTrainer._tp_fp_fn_one(stub, gt, pred)
        assert (tp, fp, fn) == (12, 0, 0)
        # and it must agree with the host path on this quirk-free scene
        assert calculate_tp_fp_fn(gt, pred, 0.75, 0.45, 0.2) == (12, 0, 0)

    def test_host_nms_empty_list_flag(self):
        """Reference parity: bare nms crashes on []; allow_empty returns
        the deliberate-divergence empty result."""
        with pytest.raises(ValueError):
            nms([], 0.5, 0.45)
        kept, hc, above = nms([], 0.5, 0.45, allow_empty=True)
        assert kept == [] and hc == 0.0 and above == 0


class TestMeanAveragePrecision:
    """mAP@0.5 goldens, hand-computed (VOC2010 all-point interpolation)."""

    def test_ap_hand_computed(self):
        from pixelnerf_yolo_tpu.detect import average_precision

        # 5 detections, 3 GT: sorted by score -> TP FP TP FP TP
        # cum_tp = 1 1 2 2 3; cum_fp = 0 1 1 2 2
        # recall    = 1/3 1/3 2/3 2/3 1
        # precision = 1  1/2 2/3 1/2 3/5
        # envelope  = 1   1  2/3 3/5 3/5
        # AP = 1/3*1 + 1/3*(2/3) + 1/3*(3/5) = 0.75556
        scores = [0.9, 0.8, 0.7, 0.6, 0.5]
        flags = [True, False, True, False, True]
        ap = average_precision(scores, flags, n_gt=3)
        np.testing.assert_allclose(ap, 1 / 3 + 2 / 9 + 1 / 5, atol=1e-9)

    def test_ap_perfect_and_empty(self):
        from pixelnerf_yolo_tpu.detect import average_precision

        assert average_precision([0.9, 0.8], [True, True], 2) == 1.0
        assert average_precision([], [], 2) == 0.0
        assert average_precision([0.9], [True], 0) == 0.0
        # all detections wrong -> AP 0
        assert average_precision([0.9, 0.8], [False, False], 2) == 0.0

    def test_matching_is_per_class_and_one_to_one(self):
        from pixelnerf_yolo_tpu.detect import match_image_detections

        gt = [
            [0, 1.0, 0.5, 0.5, 0.2, 0.2],
            [1, 1.0, 0.2, 0.2, 0.1, 0.1],
        ]
        preds = [
            [0, 0.9, 0.5, 0.5, 0.2, 0.2],   # TP (class 0)
            [0, 0.8, 0.5, 0.5, 0.2, 0.2],   # FP: same GT already matched
            [1, 0.7, 0.5, 0.5, 0.2, 0.2],   # FP: right place, wrong class
            [1, 0.6, 0.2, 0.2, 0.1, 0.1],   # TP (class 1)
        ]
        recs, n_gt = match_image_detections(gt, preds, iou_threshold=0.5)
        assert n_gt == {0: 1, 1: 1}
        assert [(c, tp) for c, _, tp in recs] == [
            (0, True), (0, False), (1, False), (1, True)
        ]

    def test_map_from_raw_boxes_golden(self):
        from pixelnerf_yolo_tpu.detect import map_from_raw_boxes

        # image 1: one class-0 GT; pred hits it plus one low-score FP
        gt1 = [[0, 1.0, 0.5, 0.5, 0.2, 0.2]]
        pred1 = [
            [0, 0.9, 0.5, 0.5, 0.2, 0.2],
            [0, 0.3, 0.1, 0.9, 0.05, 0.05],
        ]
        # image 2: one class-1 GT; missed entirely
        gt2 = [[1, 1.0, 0.3, 0.3, 0.2, 0.2]]
        pred2 = []
        map50, per_class = map_from_raw_boxes(
            [gt1, gt2], [pred1, pred2], nms_iou=0.75, iou_threshold=0.5
        )
        # class 0: TP@0.9 then FP@0.3 over 1 GT -> AP 1.0
        # class 1: no detections -> AP 0.0
        np.testing.assert_allclose(per_class[0], 1.0, atol=1e-9)
        np.testing.assert_allclose(per_class[1], 0.0, atol=1e-9)
        np.testing.assert_allclose(map50, 0.5, atol=1e-9)

    def test_duplicate_raw_gt_rows_are_deduped_by_nms(self):
        from pixelnerf_yolo_tpu.detect import map_from_raw_boxes

        # the raw GT decode emits one row per assigned (cell, anchor);
        # duplicates must not inflate n_gt
        gt = [
            [0, 1.0, 0.5, 0.5, 0.2, 0.2],
            [0, 1.0, 0.5, 0.5, 0.2, 0.2],
        ]
        pred = [[0, 0.9, 0.5, 0.5, 0.2, 0.2]]
        map50, per_class = map_from_raw_boxes(
            [gt], [pred], nms_iou=0.75, iou_threshold=0.5
        )
        np.testing.assert_allclose(map50, 1.0, atol=1e-9)

    def test_overlapping_gt_of_different_classes_both_counted(self):
        from pixelnerf_yolo_tpu.detect import map_from_raw_boxes

        # GT dedup is per class: a class-1 GT overlapping a class-0 GT
        # above nms_iou must NOT be suppressed (detect.boxes.nms itself is
        # class-agnostic, so a single joint NMS pass would drop it,
        # undercount n_gt, and flip its correct prediction to FP)
        gt = [
            [0, 1.0, 0.50, 0.50, 0.20, 0.20],
            [1, 1.0, 0.52, 0.50, 0.20, 0.20],  # IoU ~0.82 with the above
        ]
        pred = [
            [0, 0.9, 0.50, 0.50, 0.20, 0.20],
            [1, 0.8, 0.52, 0.50, 0.20, 0.20],
        ]
        map50, per_class = map_from_raw_boxes(
            [gt], [pred], nms_iou=0.5, iou_threshold=0.5
        )
        np.testing.assert_allclose(per_class[0], 1.0, atol=1e-9)
        np.testing.assert_allclose(per_class[1], 1.0, atol=1e-9)
        np.testing.assert_allclose(map50, 1.0, atol=1e-9)

    def test_three_identical_gt_rows_dedup_to_one(self):
        """num_scales >= 3 emits one identical GT row per scale; the mAP
        path must use STANDARD NMS, not detect.boxes.nms, whose faithful
        remove-while-iterating skip keeps every other duplicate (3
        coincident rows -> 2 kept), inflating n_gt and capping AP at 0.5
        for a perfect single detection."""
        from pixelnerf_yolo_tpu.detect import map_from_raw_boxes

        g = [0, 1.0, 0.5, 0.5, 0.2, 0.2]
        pred = [[0, 0.9, 0.5, 0.5, 0.2, 0.2]]
        for dups in (2, 3, 4, 5):
            map50, _ = map_from_raw_boxes(
                [[list(g)] * dups], [pred], nms_iou=0.5, iou_threshold=0.5
            )
            np.testing.assert_allclose(map50, 1.0, atol=1e-9,
                                       err_msg=f"dups={dups}")


class TestCrossScaleNMS:
    """suppress_cross_scale: the multi-scale duplicate pre-pass
    (framework extension — the reference never runs num_scales > 1)."""

    def _boxes(self):
        from pixelnerf_yolo_tpu.detect import suppress_cross_scale

        return suppress_cross_scale

    def test_cross_scale_duplicate_suppressed(self):
        sup = self._boxes()
        # same object at two grids: IoU ~0.55, below nms_iou 0.75 but
        # above cross_iou 0.35 -> keep only the higher-confidence one
        a = [0, 0.9, 0.50, 0.50, 0.20, 0.20]
        b = [0, 0.7, 0.52, 0.50, 0.24, 0.24]
        assert float(
            iou(np.array(a[2:]), np.array(b[2:])).reshape(-1)[0]
        ) > 0.35
        out = sup([[a], [b]], cross_iou=0.35)
        assert len(out) == 1
        np.testing.assert_allclose(out[0], a)

    def test_same_scale_pair_untouched(self):
        sup = self._boxes()
        a = [0, 0.9, 0.50, 0.50, 0.20, 0.20]
        b = [0, 0.7, 0.52, 0.50, 0.24, 0.24]
        out = sup([[a, b], []], cross_iou=0.35)
        assert len(out) == 2  # same-scale overlap belongs to standard NMS

    def test_different_class_pair_untouched(self):
        sup = self._boxes()
        a = [0, 0.9, 0.50, 0.50, 0.20, 0.20]
        b = [1, 0.7, 0.52, 0.50, 0.24, 0.24]
        out = sup([[a], [b]], cross_iou=0.35)
        assert len(out) == 2

    def test_disjoint_cross_scale_pair_untouched(self):
        sup = self._boxes()
        a = [0, 0.9, 0.20, 0.20, 0.10, 0.10]
        b = [0, 0.7, 0.80, 0.80, 0.10, 0.10]
        out = sup([[a], [b]], cross_iou=0.35)
        assert len(out) == 2

    def test_greedy_chain_suppressed_box_cannot_suppress(self):
        sup = self._boxes()
        # A (scale 0) kills B (scale 1); C (scale 0) overlaps B but not A,
        # so C must survive — a dead box suppresses nobody
        a = [0, 0.9, 0.50, 0.50, 0.20, 0.20]
        b = [0, 0.8, 0.58, 0.50, 0.20, 0.20]
        c = [0, 0.7, 0.66, 0.50, 0.20, 0.20]
        iou_ab = float(iou(np.array(a[2:]), np.array(b[2:])).reshape(-1)[0])
        iou_bc = float(iou(np.array(b[2:]), np.array(c[2:])).reshape(-1)[0])
        iou_ac = float(iou(np.array(a[2:]), np.array(c[2:])).reshape(-1)[0])
        assert iou_ab > 0.35 and iou_bc > 0.35 and iou_ac < 0.35
        out = sup([[a, c], [b]], cross_iou=0.35)
        assert len(out) == 2
        classes_scores = sorted(r[1] for r in out)
        np.testing.assert_allclose(classes_scores, [0.7, 0.9])

    def test_disabled_is_plain_flatten(self):
        sup = self._boxes()
        a = [0, 0.9, 0.50, 0.50, 0.20, 0.20]
        b = [0, 0.7, 0.52, 0.50, 0.24, 0.24]
        assert sup([[a], [b]], cross_iou=0.0) == [a, b]
        assert sup([[a, b]], cross_iou=0.35) == [a, b]  # single scale
        assert sup([[], []], cross_iou=0.35) == []

    def test_output_sorted_by_confidence(self):
        sup = self._boxes()
        a = [0, 0.3, 0.10, 0.10, 0.05, 0.05]
        b = [1, 0.9, 0.80, 0.80, 0.10, 0.10]
        out = sup([[a], [b]], cross_iou=0.35)
        assert [r[1] for r in out] == [0.9, 0.3]
