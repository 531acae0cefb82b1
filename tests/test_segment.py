"""Native PointRend instance segmentation (pixelnerf_yolo_tpu.segment).

Hermetic: no detectron2/weights in this environment, so semantics are
pinned by torch oracles (grid_sample), analytic goldens (ROIAlign on
linear ramps, box deltas, level assignment, uncertainty topk), the
checkpoint-geometry contract (port.random_params IS the name->shape
spec), and an end-to-end random-weight run through the full predictor.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pixelnerf_yolo_tpu.segment import port
from pixelnerf_yolo_tpu.segment.backbone import backbone_apply, frozen_bn
from pixelnerf_yolo_tpu.segment.pointrend import (
    mask_point_inference,
    paste_masks,
    point_head_apply,
    point_sample,
    regular_grid_coords,
    sample_box_features,
    uncertain_grid_points,
    uncertainty,
)
from pixelnerf_yolo_tpu.segment.predictor import PointRendPredictor
from pixelnerf_yolo_tpu.segment.rcnn import (
    apply_deltas,
    assign_levels,
    batched_nms,
    cell_anchors,
    grid_anchors,
    nms_xyxy,
    roi_align,
)


@pytest.fixture(scope="module")
def params():
    return port.random_params(np.random.default_rng(0))


class TestPointOps:
    def test_point_sample_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        N, C, H, W, P = 2, 5, 9, 7, 33
        feat = rng.normal(size=(N, C, H, W)).astype(np.float32)
        coords = rng.random((N, P, 2)).astype(np.float32)
        ours = np.asarray(point_sample(jnp.asarray(feat),
                                       jnp.asarray(coords)))
        # the vendored point_sample (point_features.py:19-42):
        # grid_sample(2 * coords - 1, align_corners=False)
        ref = F.grid_sample(
            torch.from_numpy(feat),
            torch.from_numpy(2.0 * coords - 1.0).unsqueeze(2),
            mode="bilinear", align_corners=False,
        )[..., 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_regular_grid_coords_cell_centers(self):
        g = regular_grid_coords(2)
        np.testing.assert_allclose(
            g, [[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]]
        )

    def test_uncertainty_picks_class_channel(self):
        logits = jnp.asarray(
            np.stack([np.full((4, 4), -3.0), np.full((4, 4), 0.5)])[None]
        )  # (1, 2, 4, 4)
        u = uncertainty(logits, np.array([1]))
        np.testing.assert_allclose(np.asarray(u), -0.5)

    def test_uncertain_grid_points_topk_and_coords(self):
        m = np.full((1, 1, 4, 4), -5.0, np.float32)
        m[0, 0, 1, 2] = -0.1  # most uncertain
        m[0, 0, 3, 0] = -0.2
        idx, coords = uncertain_grid_points(jnp.asarray(m), 2)
        assert list(np.asarray(idx)[0]) == [1 * 4 + 2, 3 * 4 + 0]
        np.testing.assert_allclose(
            np.asarray(coords)[0],
            [[(2 + 0.5) / 4, (1 + 0.5) / 4], [0.5 / 4, 3.5 / 4]],
        )

    def test_sample_box_features_center_of_box(self, rng):
        # a feature map that is a linear ramp in x (image pixels / stride);
        # sampling the box center must return the ramp at the center
        H = W = 8
        stride = 4
        ramp = np.broadcast_to(
            np.arange(W, dtype=np.float32), (1, 1, H, W)
        ).copy()
        box = np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)  # center 12
        coords = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
        out = sample_box_features(jnp.asarray(ramp), box, coords, stride)
        # image x=12 -> feature extent coord 12/(8*4)=0.375 -> feature
        # pixel 0.375*8-0.5=2.5 -> ramp value 2.5
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 2.5, atol=1e-6)

    def test_paste_masks_inside_outside(self):
        masks = jnp.ones((1, 1, 28, 28), jnp.float32)
        boxes = np.array([[4.0, 6.0, 12.0, 14.0]], np.float32)
        out = paste_masks(masks, boxes, 20, 20)
        assert out.shape == (1, 20, 20)
        assert out[0, 10, 8] == 1  # inside the box
        assert out[0, 2, 2] == 0 and out[0, 19, 19] == 0  # outside


class TestBoxOps:
    def test_cell_anchors_geometry(self):
        a = cell_anchors(32.0)
        assert a.shape == (3, 4)
        # ar=1.0 row: a 32x32 box centered at 0
        np.testing.assert_allclose(a[1], [-16, -16, 16, 16], atol=1e-5)
        # ar=0.5: w=sqrt(1024/0.5)=45.25, h=0.5*w=22.6 (wide box)
        w = a[0, 2] - a[0, 0]
        h = a[0, 3] - a[0, 1]
        np.testing.assert_allclose(h / w, 0.5, atol=1e-5)
        np.testing.assert_allclose(w * h, 1024.0, rtol=1e-5)

    def test_grid_anchors_order_and_offset(self):
        g = grid_anchors(2, 3, stride=8, size=16.0)
        assert g.shape == (2 * 3 * 3, 4)
        # first anchor: centered at pixel (0, 0) (detectron2 offset=0)
        np.testing.assert_allclose(
            (g[0, 0] + g[0, 2]) / 2, 0.0, atol=1e-5
        )
        # anchors 3..5 sit at x=stride (W-major before H)
        np.testing.assert_allclose(
            (g[3, 0] + g[3, 2]) / 2, 8.0, atol=1e-5
        )

    def test_apply_deltas_golden(self):
        boxes = np.array([[0.0, 0.0, 10.0, 20.0]], np.float32)
        # dx=0.1 shifts cx by 1; dw=log(2) doubles the width
        deltas = np.array([[0.1, 0.0, np.log(2.0), 0.0]], np.float32)
        out = apply_deltas(deltas, boxes)
        np.testing.assert_allclose(out, [[-4.0, 0.0, 16.0, 20.0]],
                                   atol=1e-5)

    def test_apply_deltas_roi_weights(self):
        boxes = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
        deltas = np.array([[[1.0, 0.0, 0.0, 0.0]]], np.float32)  # (R,1,4)
        out = apply_deltas(deltas, boxes, weights=(10.0, 10.0, 5.0, 5.0))
        # dx/10 = 0.1 -> cx 5 -> 6
        np.testing.assert_allclose(out[0, 0], [1.0, 0.0, 11.0, 10.0],
                                   atol=1e-5)

    def test_assign_levels_canonical(self):
        boxes = np.array(
            [
                [0, 0, 224, 224],   # canonical -> 4
                [0, 0, 112, 112],   # half -> 3
                [0, 0, 10, 10],     # tiny -> clamp 2
                [0, 0, 1000, 1000]  # huge -> clamp 5
            ],
            np.float32,
        )
        np.testing.assert_array_equal(assign_levels(boxes), [4, 3, 2, 5])

    def test_nms_keeps_best_and_suppresses(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32
        )
        scores = np.array([0.9, 0.95, 0.5], np.float32)
        keep = nms_xyxy(boxes, scores, 0.5)
        assert list(keep) == [1, 2]  # best first, overlap suppressed

    def test_batched_nms_separates_classes(self):
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        keep = batched_nms(boxes, scores, np.array([0, 1]), 0.5)
        assert len(keep) == 2  # identical boxes, different classes

    def test_roi_align_constant_and_ramp(self):
        H = W = 8
        const = jnp.full((1, 1, H, W), 3.25, jnp.float32)
        box = np.array([[2.0, 2.0, 6.0, 6.0]], np.float32)
        out = roi_align(const, box, 2, spatial_scale=1.0)
        np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-6)
        # linear ramp in x: each output bin must average to its bin center
        ramp = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.float32), (1, 1, H, W)
        )
        out = np.asarray(roi_align(ramp, box, 2, spatial_scale=1.0))
        # aligned=True: roi [1.5, 5.5] in pixel-center coords, 2 bins of
        # width 2 -> bin centers x = 2.5, 4.5
        np.testing.assert_allclose(out[0, 0, 0], [2.5, 4.5], atol=1e-5)
        np.testing.assert_allclose(out[0, 0, 1], [2.5, 4.5], atol=1e-5)


class TestHeads:
    def test_frozen_bn_golden(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 2, 3, 3)).astype(np.float32))
        p = {
            "weight": jnp.asarray([2.0, 1.0]),
            "bias": jnp.asarray([0.5, -1.0]),
            "running_mean": jnp.asarray([1.0, 0.0]),
            "running_var": jnp.asarray([4.0, 1.0]),
        }
        got = np.asarray(frozen_bn(x, p, eps=0.0))
        xn = np.asarray(x)
        exp = np.stack(
            [(xn[:, 0] - 1.0) / 2.0 * 2.0 + 0.5, xn[:, 1] * 1.0 - 1.0],
            axis=1,
        )
        np.testing.assert_allclose(got, exp, atol=1e-5)

    def test_backbone_pyramid_shapes(self, params):
        x = jnp.zeros((1, 3, 64, 64), jnp.float32)
        feats = backbone_apply(params["backbone"], x)
        assert feats["p2"].shape == (1, 256, 16, 16)
        assert feats["p3"].shape == (1, 256, 8, 8)
        assert feats["p4"].shape == (1, 256, 4, 4)
        assert feats["p5"].shape == (1, 256, 2, 2)
        assert feats["p6"].shape == (1, 256, 1, 1)

    def test_point_head_coarse_reconcat_shapes(self, params, rng):
        fine = jnp.asarray(rng.normal(size=(2, 256, 5)).astype(np.float32))
        coarse = jnp.asarray(rng.normal(size=(2, 80, 5)).astype(np.float32))
        out = point_head_apply(
            params["roi_heads"]["mask_point_head"], fine, coarse
        )
        assert out.shape == (2, 80, 5)

    def test_mask_point_inference_shapes(self, params, rng):
        p2 = jnp.asarray(rng.normal(size=(1, 256, 16, 16)).astype(np.float32))
        boxes = np.array([[4.0, 4.0, 40.0, 40.0],
                          [10.0, 0.0, 60.0, 30.0]], np.float32)
        masks = mask_point_inference(
            params["roi_heads"], p2, boxes, np.array([2, 17])
        )
        # 7 -> 224 after 5 subdivision doublings, sigmoid range
        assert masks.shape == (2, 1, 224, 224)
        m = np.asarray(masks)
        assert (m >= 0).all() and (m <= 1).all()


class TestPortAndPredictor:
    def test_random_params_pass_validation(self, params):
        # random_params runs port_detectron2_state_dict -> _validate
        assert "backbone" in params and "rpn_head" in params

    def test_port_rejects_missing_key(self):
        rng = np.random.default_rng(1)
        from pixelnerf_yolo_tpu.segment.port import (
            port_detectron2_state_dict,
        )

        sd = {"backbone.bottom_up.stem.conv1.weight":
              rng.standard_normal((64, 3, 7, 7)).astype(np.float32)}
        with pytest.raises(KeyError):
            port_detectron2_state_dict(sd)

    def test_end_to_end_random_weights(self, params, rng):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        pred = PointRendPredictor(
            params=params, score_thresh=0.0, min_size=64, max_size=96
        )
        out = pred.detect(img)
        R = len(out["boxes"])
        assert out["scores"].shape == (R,)
        assert out["classes"].shape == (R,)
        assert out["masks"].shape == (R, 48, 64)
        assert out["masks"].dtype == np.uint8
        if R:
            # boxes in ORIGINAL pixel coords, clipped
            assert (out["boxes"][:, 2] <= 64 + 1e-3).all()
            assert (out["boxes"][:, 3] <= 48 + 1e-3).all()
            assert set(np.unique(out["masks"])) <= {0, 1}
        # the wrapper contract: uint8 {0, 255} masks
        masks = pred.segment(img)
        assert all(m.shape == (48, 64) for m in masks)

    def test_class_filter(self, params, rng):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        pred = PointRendPredictor(
            params=params, score_thresh=0.0, min_size=64, max_size=96,
            filter_class=2,
        )
        out = pred.detect(img)
        assert (out["classes"] == 2).all()
