"""YOLO (detection-mode) trainer.

Parity: /root/reference/train/trainlib/YoloTrainer.py:9-354.
  * per scene & per scale: rays for the SELECTED source views as render
    targets (gen_rays_yolo at cell-scaled H/W/focal/c), grid targets
    reshaped per cell (YoloTrainer.py:93-129)
  * loss accumulated per ray_batch_size chunk; the reference backprops each
    chunk with retain_graph (YoloTrainer.py:186) so the applied gradient is
    the SUM over chunks of chunk losses — here that is literally
    grad(sum_of_chunk_losses) inside one jitted update (chunks padded with
    ignore-flag targets, which drop out of every masked mean)
  * vis_step / metric_step: render a dest view per scale, decode cells,
    NMS, draw; TP/FP/FN accumulation over metric_views triples

Multi-chip: the update is jitted over the trainer's ('data', 'rays') mesh —
ray chunks sharded on 'data', rays within a chunk on 'rays' (the
reference's DataParallel dim=1 scatter, src/render/yolo.py:116-121); source
views/params/optimizer replicated; XLA inserts the gradient psum over ICI.
Mesh padding uses ignore-flag (prob = -1) rows/chunks, which contribute
exactly zero to every masked mean, so sharded loss == unsharded loss.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..detect.boxes import (
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    suppress_cross_scale,
    draw_bounding_boxes,
    nms,
)
from ..losses.yolo import YoloLoss
from ..utils import camera
from . import checkpoints
from .trainer import Trainer
import optax


class YOLOTrainer(Trainer):
    def __init__(self, args, conf, dset, val_dset, model, renderer,
                 render_par, nviews):
        super().__init__(dset, val_dset, args, conf.get_config("train"))
        self.renderer = renderer
        self.model = model
        self.conf = conf
        self.dset = dset
        self.nviews = nviews
        self.render_par = render_par
        self.mesh = getattr(render_par, "mesh", None)
        if self.mesh is None:
            from ..parallel import make_mesh

            self.mesh = make_mesh(n_devices=1)
        self._data_n = dict(self.mesh.shape).get("data", 1)
        # ray-sharding extent excludes a 'model' (tensor-parallel) axis:
        # TP shards the hidden dim, not rays
        self._rays_n = dict(self.mesh.shape).get(
            "rays", self.mesh.devices.size // self._data_n
        )

        self.renderer_state_path = os.path.join(
            args.checkpoints_path, args.name, "_renderer"
        )

        self.z_near = dset.z_near
        self.z_far = dset.z_far

        self.num_scales = conf["model.mlp_coarse.num_scales"]
        self.num_anchors_per_scale = conf[
            "model.mlp_coarse.num_anchors_per_scale"
        ]
        self.cell_sizes = conf["yolo.cell_sizes"][: self.num_scales]
        self.anchors = np.asarray(
            conf["yolo.anchors"][: self.num_scales], dtype=np.float32
        )  # (num_scales, A, 2)

        self.ray_batch_size = conf["yolo.ray_batch_size"]
        # detection metrics: padded device NMS by default (SURVEY §3.4 —
        # box decode + NMS as a jittable kernel); --host_nms selects the
        # reference-exact host list path
        self.use_host_nms = bool(getattr(args, "host_nms", False))
        self.nms_max_out = conf.get_int("yolo.nms_max_out", 64)
        self.yolo_loss = YoloLoss.from_conf(conf, self.num_anchors_per_scale)
        self.early_restart = conf["yolo.early_restart"]
        self.nms_iou_threshold = conf["yolo.nms_iou_threshold"]
        self.nms_threshold = conf["yolo.nms_threshold"]
        # cross-scale duplicate suppression (extension knob, off by
        # default; see detect.boxes.suppress_cross_scale) — only
        # meaningful under num_scales > 1
        self.cross_scale_nms_iou = conf.get_float(
            "yolo.cross_scale_nms_iou", 0.0
        )
        # per-scale confidence pre-filter (extension knob, r5): a list of
        # num_scales confidences applied to each grid's decoded boxes
        # BEFORE cross-scale suppression + NMS.  The multi-scale FP flood
        # is above-global-threshold boxes at the finer grids
        # (CONVERGENCE.md 3-scale footnote), so raising tau on /16 and /8
        # independently of /32 is the direct counter; calibrate with
        # eval/eval_yolo.py --calibrate_scales.  Unset = global
        # nms_threshold only (reference behavior,
        # /root/reference/conf/exp/yolo.conf:49-52 has one threshold).
        pst = conf.get_list("yolo.nms_threshold_per_scale", None)
        self.nms_threshold_per_scale = (
            ([float(t) for t in pst] + [0.0] * self.num_scales)
            [: self.num_scales] if pst else None
        )
        self.metric_views = conf["yolo.metric_views"]
        self.match_iou_threshold = conf["yolo.match_iou_threshold"]

        print("n_coarse", conf["renderer.n_coarse"])
        print("nms_iou_threshold", self.nms_iou_threshold)
        print("nms_threshold", self.nms_threshold)
        print("match_iou_threshold", self.match_iou_threshold)
        if self.cross_scale_nms_iou > 0:
            print("cross_scale_nms_iou", self.cross_scale_nms_iou)
        if self.nms_threshold_per_scale is not None:
            print("nms_threshold_per_scale", self.nms_threshold_per_scale)

        self.variables = model.init(
            jax.random.PRNGKey(getattr(args, "seed", 0)),
            jnp.zeros((1, 3, 64, 64), jnp.float32),
            load_pretrained=not checkpoints.has_weights(args),
        )
        self.variables = checkpoints.load_weights(args, self.variables)
        self.init_opt_state(self.variables["params"])

        self._rng = np.random.default_rng(getattr(args, "seed", 0) + 1)
        self._key = jax.random.PRNGKey(getattr(args, "seed", 0) + 2)
        self._update_fn = None
        self._eval_fn = None
        self._update_fn_repl = None  # ragged-batch (scenes-replicated) jit
        self._eval_fn_repl = None

    def save_model_state(self, epochNum: str = ""):
        checkpoints.save_weights(self.args, self.variables, epochNum=epochNum)

    def extra_save_state(self):
        checkpoints.save_json(self.renderer_state_path, {})

    # -- jitted update -----------------------------------------------------------

    def _build_update(self, scene_sharded: bool = True):
        model, renderer = self.model, self.renderer
        yolo_loss = self.yolo_loss
        optimizer = self.optimizer
        A = self.num_anchors_per_scale
        mesh = self.mesh

        # mesh shardings: scenes over 'data' (the scene superbatch — like
        # the NeRF trainer), rays within a chunk over 'rays'; params
        # replicated.  The reference only ever trains YOLO with SB=1
        # (YoloTrainer.py:157); here SB>1 batches scenes on the mesh.
        #
        # scene_sharded=False is the RAGGED-batch variant (SB not divisible
        # by the data axis, e.g. a short last DataLoader batch): scenes are
        # replicated and the ray axis shards over BOTH mesh axes.  Padding
        # the scene axis with duplicates instead would feed the duplicates
        # into train-mode BatchNorm batch statistics, perturbing every real
        # scene's loss/grads — this variant keeps the update bit-identical
        # to the unsharded math (all padding is loss-masked rays only).
        names = mesh.axis_names
        data_ax = "data" if "data" in names else None
        rays_ax = "rays" if "rays" in names else None
        repl = NamedSharding(mesh, P())
        # tensor parallelism: a 'model' mesh axis shards the field MLP's
        # hidden dim (see nerf_trainer / parallel.tp_shardings)
        if "model" in names:
            from ..parallel import tp_shardings

            var_sh = tp_shardings(self.variables, mesh)
            opt_sh = tp_shardings(self.opt_state, mesh)
        else:
            var_sh = opt_sh = repl
        if scene_sharded:
            s_scene = NamedSharding(mesh, P(data_ax))
            s_rays = NamedSharding(mesh, P(data_ax, None, rays_ax))
        else:
            both = tuple(a for a in (data_ax, rays_ax) if a is not None)
            s_scene = repl
            s_rays = NamedSharding(mesh, P(None, None, both or None))

        def compute_losses(vs, batch_stats, src_images, src_poses, focal,
                           c, rays, targets, anchors, n_real, rng,
                           is_train):
            """rays (SB, k, chunk, 8); targets (SB, k, chunk, A, 6) padded
            with prob=-1 rows (ignored by every loss mask); anchors
            (k, A, 2) per chunk slot (identical across scenes by
            construction); n_real = number of un-padded (scene, chunk)
            pairs (for reported means)."""
            # freeze_enc parity: eval-mode BN when the encoder is frozen
            # (reference train/train.py:70-72 calls encoder.eval())
            enc_train = is_train and not model.stop_encoder_grad
            if enc_train:
                cond, mutated = model.encode(
                    vs, src_images, src_poses, focal, c=c, train=True
                )
            else:
                cond = model.encode(
                    vs, src_images, src_poses, focal, c=c, train=False
                )
                mutated = batch_stats

            SBd, k, chunk = rays.shape[:3]
            render = renderer(
                model, vs, cond, rays.reshape(SBd, k * chunk, 8), rng
            )  # (SB, k*chunk, A, 7)
            render = render.reshape(SBd * k, chunk, A, 7)

            losses = jax.vmap(
                lambda r, t, a: jnp.stack(yolo_loss(r, t, a))
            )(
                render,
                targets.reshape(SBd * k, chunk, A, 6),
                jnp.broadcast_to(anchors[None], (SBd, k) + anchors.shape[1:])
                .reshape(SBd * k, *anchors.shape[1:]),
            )  # (SB*k, 5)
            # grad parity with per-chunk backward: SUM of chunk losses
            # (pad chunks are all-ignore -> contribute exactly 0)
            total_for_grad = jnp.sum(losses[:, 0])
            # reported values: averaged over REAL chunks
            # (YoloTrainer.py:204-208)
            mean_losses = jnp.sum(losses, axis=0) / n_real
            loss_dict = {
                "t": mean_losses[0],
                "box_loss": mean_losses[1],
                "object_loss": mean_losses[2],
                "no_object_loss": mean_losses[3],
                "class_loss": mean_losses[4],
            }
            return total_for_grad, mutated, loss_dict

        def update(variables, opt_state, src_images, src_poses, focal, c,
                   rays, targets, anchors, n_real, lr, rng):
            def loss_fn(params):
                vs = {
                    "params": params,
                    "batch_stats": variables["batch_stats"],
                }
                total, mutated, loss_dict = compute_losses(
                    vs, variables["batch_stats"], src_images, src_poses,
                    focal, c, rays, targets, anchors, n_real, rng, True,
                )
                return total, (mutated, loss_dict)

            (_, (mutated, loss_dict)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(variables["params"])
            with jax.named_scope("optimizer"):
                updates, opt_state = optimizer.update(
                    grads, opt_state, variables["params"]
                )
                # lr applied here (adam = scale_by_adam + scale(-lr)) so
                # set_lr is a plain argument change, never a retrace
                updates = jax.tree.map(lambda u: (-lr) * u, updates)
                params = optax.apply_updates(variables["params"], updates)
            return (
                {"params": params, "batch_stats": mutated},
                opt_state,
                loss_dict,
            )

        def eval_losses(variables, src_images, src_poses, focal, c, rays,
                        targets, anchors, n_real, rng):
            # loss-only eval: no donation, no grad, no variable round trip
            _, _, loss_dict = compute_losses(
                variables, variables["batch_stats"], src_images, src_poses,
                focal, c, rays, targets, anchors, n_real, rng, False,
            )
            return loss_dict

        data_shardings = (
            s_scene,  # src_images (SB, NS, 3, H, W)
            s_scene,  # src_poses
            s_scene,  # focal
            s_scene,  # c
            s_rays,  # rays (SB, k, chunk, 8)
            s_rays,  # targets (SB, k, chunk, A, 6)
            repl,  # anchors (k, A, 2)
            repl,  # n_real
        )
        train_fn = jax.jit(
            update,
            donate_argnums=(0, 1),
            in_shardings=(var_sh, opt_sh) + data_shardings + (repl, repl),
            out_shardings=(var_sh, opt_sh, repl),
        )
        eval_fn = jax.jit(
            eval_losses,
            in_shardings=(var_sh,) + data_shardings + (repl,),
            out_shardings=repl,
        )
        return train_fn, eval_fn

    # -- batch assembly ------------------------------------------------------------

    def _scale_rays_targets(self, poses, bboxes_scale, focal, c, H, W,
                            scale_idx, view_sel):
        """Rays + per-cell targets for the selected views at one scale.

        Parity: YoloTrainer.py:93-129.
        """
        cs = self.cell_sizes[scale_idx]
        H_scaled, W_scaled = H // cs, W // cs
        focal_scaled = focal / cs
        c_scaled = c / cs
        target_poses = poses[view_sel]
        # host numpy ray gen: no per-step device round-trip in assembly
        cam_rays = camera.gen_rays_yolo_np(
            target_poses, W_scaled, H_scaled, focal_scaled, c_scaled,
            self.z_near, self.z_far,
        ).reshape(-1, 8)
        target_bbox = bboxes_scale[view_sel]  # (nv, Hs, Ws, A, 6)
        bbox_gt = target_bbox.reshape(-1, self.num_anchors_per_scale, 6)
        return cam_rays, bbox_gt

    def _assemble(self, data):
        all_images = np.asarray(data["images"])  # (SB, NV, 3, H, W)
        all_poses = np.asarray(data["poses"])  # (SB, NV, 4, 4)
        all_bboxes = data["bboxes"]  # NV list of num_scales tuples, (SB,...)
        all_focals = np.asarray(data["focal"])  # (SB, 2)
        all_c = np.asarray(data["c"])  # (SB, 2)
        SB, NV, _, H, W = all_images.shape

        curr_nviews = self.nviews[
            int(self._rng.integers(0, len(self.nviews)))
        ]
        image_ord = np.empty((SB, curr_nviews), dtype=np.int64)

        scene_rays, scene_targets = [], []
        scale_list = None
        for scene_idx in range(SB):
            poses = all_poses[scene_idx]
            focal = all_focals[scene_idx]
            c = all_c[scene_idx]
            image_ord[scene_idx] = self._rng.choice(
                NV, curr_nviews, replace=False
            )
            rays_list, targets_list, scales = [], [], []
            for scale_idx in range(self.num_scales):
                bboxes_at_scale = np.stack(
                    [
                        np.asarray(all_bboxes[i][scale_idx])[scene_idx]
                        for i in range(len(all_bboxes))
                    ]
                )  # (NV, Hs, Ws, A, 6)
                rays, targets = self._scale_rays_targets(
                    poses, bboxes_at_scale, focal, c, H, W, scale_idx,
                    image_ord[scene_idx],
                )
                # each scale's rays are padded + chunked separately so every
                # chunk belongs to exactly one scale (its own anchors, like
                # the reference's per-scale chunk loop, YoloTrainer.py:147-202)
                R = self.ray_batch_size
                pad = (-rays.shape[0]) % R
                if pad:
                    rays = np.concatenate(
                        [rays, np.repeat(rays[:1], pad, 0)], 0
                    )
                    pad_t = np.zeros(
                        (pad,) + targets.shape[1:], dtype=targets.dtype
                    )
                    pad_t[..., 0] = -1.0  # ignore: out of every loss mask
                    targets = np.concatenate([targets, pad_t], 0)
                rays_list.append(rays)
                targets_list.append(targets)
                scales.extend([scale_idx] * (rays.shape[0] // R))
            scene_rays.append(np.concatenate(rays_list, axis=0))
            scene_targets.append(np.concatenate(targets_list, axis=0))
            scale_list = scales  # identical for every scene (same NV/H/W)

        # (SB, k, R, ...): every scene contributes the same k chunk slots
        R = self.ray_batch_size
        rays = np.stack(scene_rays)  # (SB, k*R, 8)
        targets = np.stack(scene_targets)
        k = rays.shape[1] // R
        rays = rays.reshape(SB, k, R, 8)
        targets = targets.reshape(
            SB, k, R, self.num_anchors_per_scale, 6
        )
        chunk_anchors = self.anchors[np.asarray(scale_list)]  # (k, A, 2)

        # mesh padding: only loss-masked RAYS are ever padded.  A ragged
        # scene batch (SB not divisible by the data axis — a short last
        # DataLoader batch) switches to the scenes-replicated sharding
        # variant instead of duplicating scenes: duplicate pad scenes
        # would enter train-mode BatchNorm batch statistics and perturb
        # the real scenes' losses/grads (measured ~1-2% per component for
        # SB=3 padded to 4).
        n_real = SB * k
        scene_sharded = SB % self._data_n == 0
        chunk_mult = (
            self._rays_n if scene_sharded else self._rays_n * self._data_n
        )
        pad_c = (-R) % chunk_mult
        if pad_c:
            idx = np.arange(pad_c) % R
            rays = np.concatenate([rays, rays[:, :, idx]], axis=2)
            pad_t = np.zeros(
                (SB, k, pad_c) + targets.shape[3:], targets.dtype
            )
            pad_t[..., 0] = -1.0
            targets = np.concatenate([targets, pad_t], axis=2)
        # host-side view select (batched_index_select_nd semantics)
        src_images = all_images[np.arange(SB)[:, None], image_ord]
        src_poses = all_poses[np.arange(SB)[:, None], image_ord]
        return (src_images, src_poses, all_focals, all_c, rays, targets,
                chunk_anchors, n_real, scene_sharded)

    def calc_losses(self, data, is_train=True):
        assert "images" in data
        (src_images, src_poses, focal, c, rays, targets,
         chunk_anchors, n_real, scene_sharded) = self._assemble(data)
        if scene_sharded:
            if self._update_fn is None:
                self._update_fn, self._eval_fn = self._build_update()
            update_fn, eval_fn = self._update_fn, self._eval_fn
        else:
            # ragged-batch variant (scenes replicated); lazily built —
            # its batches have distinct shapes, so no extra retraces
            if getattr(self, "_update_fn_repl", None) is None:
                self._update_fn_repl, self._eval_fn_repl = (
                    self._build_update(scene_sharded=False)
                )
            update_fn, eval_fn = self._update_fn_repl, self._eval_fn_repl
        self._key, sub = jax.random.split(self._key)
        inputs = (
            jnp.asarray(src_images),
            jnp.asarray(src_poses),
            jnp.asarray(focal),
            jnp.asarray(c),
            jnp.asarray(rays),
            jnp.asarray(targets),
            jnp.asarray(chunk_anchors),  # per-chunk (scale) anchors
            jnp.float32(n_real),
        )
        if is_train:
            if scene_sharded:
                self._stash_update_avals(
                    update_fn,
                    (self.variables, self.opt_state, *inputs,
                     jnp.float32(self._lr), sub),
                )
            self.variables, self.opt_state, loss_dict = update_fn(
                self.variables, self.opt_state, *inputs,
                jnp.float32(self._lr), sub,
            )
        else:
            loss_dict = eval_fn(self.variables, *inputs, sub)
        # lazy device scalars (base loop materializes on its print interval)
        return dict(loss_dict)

    def train_step(self, data, global_step=None):
        return self.calc_losses(data, is_train=True)

    def eval_step(self, data, global_step=None):
        return self.calc_losses(data, is_train=False)

    # -- vis / metrics ---------------------------------------------------------------

    def vis_step(self, data, global_step=None, idx=None, srcs=None,
                 dest=None, only_bbox=False):
        if "images" not in data:
            return {}
        batch_idx = (
            int(self._rng.integers(0, len(data["images"])))
            if idx is None
            else idx
        )
        all_images = np.asarray(data["images"][batch_idx])  # (NV, 3, H, W)
        all_poses = np.asarray(data["poses"][batch_idx])
        all_bboxes = data["bboxes"]
        focal = np.asarray(data["focal"][batch_idx])  # (2,)
        c = np.asarray(data["c"][batch_idx])  # (2,)
        NV, _, H, W = all_images.shape

        curr_nviews = self.nviews[int(self._rng.integers(0, len(self.nviews)))]
        views_src = (
            np.sort(self._rng.choice(NV, curr_nviews, replace=False))
            if srcs is None
            else np.asarray(srcs)
        )
        view_dest = (
            int(self._rng.choice(views_src)) if dest is None else int(dest)
        )

        cond = self.model.encode(
            self.variables,
            jnp.asarray(all_images[views_src][None]),
            jnp.asarray(all_poses[views_src][None]),
            jnp.asarray(focal[None]),
            c=jnp.asarray(c[None]),
        )

        boxes_gt, boxes_predicted = [], []
        for scale_idx in range(self.num_scales):
            cs = self.cell_sizes[scale_idx]
            H_scaled, W_scaled = H // cs, W // cs
            cam_rays = camera.gen_rays_yolo(
                jnp.asarray(all_poses), W_scaled, H_scaled,
                jnp.asarray(focal / cs), jnp.asarray(c / cs),
                self.z_near, self.z_far,
            )
            test_rays = cam_rays[view_dest].reshape(-1, 8)
            self._key, sub = jax.random.split(self._key)
            render = self.render_par(self.variables, cond, test_rays, sub)
            render = np.asarray(render).reshape(
                1, H_scaled, W_scaled, self.num_anchors_per_scale, 7
            )
            gt_grid = np.asarray(all_bboxes[view_dest][scale_idx])[
                batch_idx : batch_idx + 1
            ]
            boxes_gt.append(
                convert_cells_to_bboxes(
                    gt_grid, self.anchors[scale_idx], H_scaled, W_scaled,
                    is_predictions=False,
                )[0]
            )
            boxes_predicted.append(
                convert_cells_to_bboxes(
                    render, self.anchors[scale_idx], H_scaled, W_scaled,
                    is_predictions=True,
                )[0]
            )

        boxes_gt = [b for sub_l in boxes_gt for b in sub_l]
        if only_bbox == "per_scale":
            # calibration path: raw per-scale decode lists, no per-scale
            # filter / cross-scale suppression (the caller sweeps those)
            return boxes_gt, boxes_predicted
        if self.nms_threshold_per_scale is not None:
            boxes_predicted = [
                [b for b in sc if b[1] >= t]
                for sc, t in zip(
                    boxes_predicted, self.nms_threshold_per_scale
                )
            ]
        if self.num_scales > 1 and self.cross_scale_nms_iou > 0:
            # one object fires at every grid resolution; kill the
            # cross-scale duplicates before the standard NMS (GT rows
            # decode identically across scales, IoU 1.0, so the standard
            # NMS already dedups those)
            boxes_predicted = suppress_cross_scale(
                boxes_predicted, self.cross_scale_nms_iou
            )
        else:
            boxes_predicted = [b for sub_l in boxes_predicted for b in sub_l]

        if only_bbox:
            return boxes_gt, boxes_predicted

        boxes_gt, hc, bat = nms(
            boxes_gt, self.nms_iou_threshold, self.nms_threshold
        )
        print("highest confidence:", hc)
        print("bboxes above threshold", self.nms_threshold, ":", bat)
        boxes_predicted, hc, bat = nms(
            boxes_predicted, self.nms_iou_threshold, self.nms_threshold
        )
        print("highest confidence:", hc)
        print("bboxes above threshold", self.nms_threshold, ":", bat)
        print("boxes predicted:", len(boxes_predicted))

        if self.early_restart and len(boxes_predicted) == 0 and len(boxes_gt) > 0:
            print("no boxes predicted")
            return None, None

        dest_img = all_images[view_dest].transpose(1, 2, 0) * 0.5 + 0.5
        boxes_gt_visual = draw_bounding_boxes(dest_img, boxes_gt)
        boxes_predicted_visual = draw_bounding_boxes(dest_img, boxes_predicted)
        source_views = (
            (all_images[views_src] * 0.5 + 0.5)
            .transpose(0, 2, 3, 1)
            .reshape(-1, H, W, 3)
        )
        vis = np.hstack(
            [*source_views, dest_img, boxes_gt_visual, boxes_predicted_visual]
        )
        return vis, None

    def _iter_metric_boxes(self, data_loader):
        """Render every (scene x view-triple x dest) of the metric protocol
        once, yielding raw (bbox_gt, bbox_pred) decode lists."""
        for data in data_loader:
            for views in self.metric_views:
                views = np.array(views)
                for dest in views:
                    yield self.vis_step(
                        data, idx=0, srcs=views, dest=dest, only_bbox=True
                    )

    def _tp_fp_fn_one(self, bbox_gt, bbox_pred, print_hc=False):
        if self.use_host_nms:
            return calculate_tp_fp_fn(
                bbox_gt, bbox_pred, self.nms_iou_threshold,
                self.nms_threshold, self.match_iou_threshold,
                print_hc=print_hc,
            )
        from ..detect.nms_jax import tp_fp_fn_padded

        gt_arr = np.asarray(bbox_gt, dtype=np.float32)
        pred_arr = np.asarray(bbox_pred, dtype=np.float32)
        if print_hc:
            hc = float(pred_arr[:, 1].max()) if len(pred_arr) else 0.0
            print(f"highest confidence: {hc}")
        # max_out auto-scales to the candidate count (power-of-2 bucketed
        # to bound recompiles) so the static kept-box cap never clips a
        # dense scene: scripts/nms_delta.py measured the capped-64 path
        # diverging up to +0.12 F1 on dense synthetic scenes while the
        # UNCAPPED device-vs-host (quirk) delta stays <= 0.003 F1 at every
        # density (PARITY.md "Device vs host NMS metric delta").
        # yolo.nms_max_out remains the floor (and the serving-path cap).
        need = max(len(gt_arr), len(pred_arr), 1)
        max_out = max(int(self.nms_max_out), 1)
        while max_out < need:
            max_out *= 2
        tp, fp, fn = tp_fp_fn_padded(
            jnp.asarray(gt_arr),
            jnp.asarray(pred_arr),
            self.nms_iou_threshold,
            self.nms_threshold,
            self.match_iou_threshold,
            max_out=max_out,
        )
        tp, fp, fn = int(tp), int(fp), int(fn)
        return tp, fp, fn

    def _f1_from_boxes(self, boxes, print_hc=False):
        total_tp = total_fp = total_fn = 0
        if not self.use_host_nms and not getattr(
            self, "_device_nms_logged", False
        ):
            # attribution aid (ADVICE r2): the device path uses quirk-free
            # NMS, so metrics can diverge from the reference's list NMS
            # (util.py:691-720 remove-while-iterating skip) — say so once
            print(
                "metric_step: device NMS (quirk-free, max_out auto-"
                "scaled from the candidate count, measured quirk delta "
                "<= 0.003 F1 — PARITY.md); pass --host_nms for "
                "reference-exact metrics"
            )
            self._device_nms_logged = True
        for bbox_gt, bbox_pred in boxes:
            tp, fp, fn = self._tp_fp_fn_one(bbox_gt, bbox_pred, print_hc)
            total_tp += tp
            total_fp += fp
            total_fn += fn
        print("total_tp", total_tp, "total_fp", total_fp, "total_fn", total_fn)
        return calculate_precision_recall_f1(total_tp, total_fp, total_fn)

    def metric_step(self, data_loader, print_hc=False):
        return self._f1_from_boxes(
            self._iter_metric_boxes(data_loader), print_hc
        )

    def _map_from_boxes(self, boxes, iou_threshold=0.5):
        from ..detect.map import map_from_raw_boxes

        per_gt, per_pred = zip(*boxes) if boxes else ((), ())
        return map_from_raw_boxes(
            list(per_gt), list(per_pred), self.nms_iou_threshold,
            iou_threshold,
        )

    def map_step(self, data_loader, iou_threshold=0.5):
        """mAP@iou_threshold over the same (scene x view-triple x dest)
        protocol as metric_step.  Unlike the single-confidence F1 path,
        predictions keep a ~0 confidence floor so the full
        precision-recall curve is swept (detect/map.py).

        :return (mAP, {class: AP})
        """
        return self._map_from_boxes(
            list(self._iter_metric_boxes(data_loader)), iou_threshold
        )

    def calibrate_scales(self, data_loader, grid, iou_threshold=0.5):
        """Per-scale confidence calibration (eval-time, no retrain).

        Renders the metric protocol ONCE collecting raw per-scale decode
        lists, then grid-searches per-scale confidence pre-filters
        tau_s ∈ grid (applied before cross-scale suppression + NMS) and
        scores each combo's P/R/F1 + mAP@iou.  The multi-scale FP flood
        diagnosis (CONVERGENCE.md 3-scale footnote) says the finer grids
        emit above-global-threshold FPs — this measures whether raising
        their taus independently fixes F1 without a retrain.

        The F1 matching uses the HOST path (calculate_tp_fp_fn) so the
        grid sweep costs no device dispatches; host-vs-device metric
        delta is ≤0.003 F1 (PARITY.md).

        :param grid iterable of candidate confidences (the global
          nms_threshold still applies downstream, so values below it are
          only meaningful as "no extra filter")
        :return (results, best): results = list of dicts {taus,
          precision, recall, f1, map50, per_class}, best = the dict with
          the highest (f1, map50)
        """
        import itertools

        raw = [
            self.vis_step(data, idx=0, srcs=np.array(views), dest=dest,
                          only_bbox="per_scale")
            for data in data_loader
            for views in map(np.array, self.metric_views)
            for dest in views
        ]
        results = []
        for taus in itertools.product(grid, repeat=self.num_scales):
            boxes = []
            for gt, per_scale in raw:
                filt = [
                    [b for b in sc if b[1] >= t]
                    for sc, t in zip(per_scale, taus)
                ]
                if self.num_scales > 1 and self.cross_scale_nms_iou > 0:
                    pred = suppress_cross_scale(
                        filt, self.cross_scale_nms_iou
                    )
                else:
                    pred = [b for sub in filt for b in sub]
                boxes.append((gt, pred))
            tp = fp = fn = 0
            for gt, pred in boxes:
                t_, f_, n_ = calculate_tp_fp_fn(
                    gt, pred, self.nms_iou_threshold, self.nms_threshold,
                    self.match_iou_threshold,
                )
                tp, fp, fn = tp + t_, fp + f_, fn + n_
            precision = tp / (tp + fp) if tp + fp else 0.0
            recall = tp / (tp + fn) if tp + fn else 0.0
            f1 = (
                2 * precision * recall / (precision + recall)
                if precision + recall else 0.0
            )
            map50, per_class = self._map_from_boxes(boxes, iou_threshold)
            results.append({
                "taus": taus, "precision": precision, "recall": recall,
                "f1": f1, "map50": map50, "per_class": per_class,
                "tp": tp, "fp": fp, "fn": fn,
            })
        best = max(results, key=lambda r: (r["f1"], r["map50"]))
        return results, best

    def metric_and_map_step(self, data_loader, iou_threshold=0.5,
                            print_hc=False):
        """F1 + mAP from ONE rendering pass over the metric protocol
        (metric_step and map_step back-to-back would render the whole
        test set twice).

        :return ((precision, recall, f1), (mAP, {class: AP}))
        """
        boxes = list(self._iter_metric_boxes(data_loader))
        return (
            self._f1_from_boxes(boxes, print_hc),
            self._map_from_boxes(boxes, iou_threshold),
        )


def make_trainer(args, conf, dset, val_dset, model, renderer, render_par,
                 nviews):
    """Factory parity: /root/reference/train/train_util.py:5-12."""
    from .nerf_trainer import PixelNeRFTrainer

    trainer_type = conf.get_string("renderer.type", "nerf")
    if trainer_type == "nerf":
        return PixelNeRFTrainer(
            args, conf, dset, val_dset, model, renderer, render_par, nviews
        )
    if trainer_type == "yolo":
        return YOLOTrainer(
            args, conf, dset, val_dset, model, renderer, render_par, nviews
        )
    raise NotImplementedError("Unsupported trainer type")
