"""PixelNeRF (NeRF-mode) trainer.

Parity: /root/reference/train/trainlib/PixelNerfTrainer.py:10-289.
  * per-object ray sampling: bbox-biased until no_bbox_step, else uniform
    over NV*H*W pixels (PixelNerfTrainer.py:69-117).  NOTE: while bbox
    sampling is active ONLY bbox-interior pixels get gradient, so the
    background stays unlearned and full-frame eval PSNR looks poor even at
    tiny train loss — by design; pass --no_bbox_step 0 to supervise all
    pixels from step 0 (e.g. when overfitting a single scene).
  * random source-view subset per scene (image_ord)
  * loss: MSE(coarse)*lambda_coarse + MSE(fine)*lambda_fine
  * vis_step: full-image render of a random unseen view with depth/alpha
    colormap panels and PSNR

TPU design: host assembles (rays, rgb_gt, src views) as numpy; ONE jitted
update function runs encode (BatchNorm train mode) + render + loss + grad
+ Adam update on device.  The reference's loss.backward + optim.step pair
becomes the fused update.

Multi-chip: the update is jitted over the trainer's ('data', 'rays') mesh —
scenes sharded on 'data' (encoder convs parallelize), rays/targets on
'rays' (the reference's DataParallel dim=1 scatter,
/root/reference/src/render/nerf.py:360-377), params/optimizer replicated;
XLA inserts the gradient psum over ICI.  Ragged batches are padded to the
mesh shape with zero-weight rays whose loss contribution drops out exactly
(duplicated pad scenes do perturb train-mode BN batch stats — the same
class of divergence as torch DataParallel's per-replica BN).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.rgb import get_rgb_loss, weighted_rgb_loss
from ..parallel import make_mesh
from ..utils import camera
from ..utils.image import cmap
from ..utils.metrics import psnr as psnr_fn
from ..utils.sampling import bbox_sample
from . import checkpoints
from .trainer import Trainer


class PixelNeRFTrainer(Trainer):
    def __init__(self, args, conf, dset, val_dset, model, renderer,
                 render_par, nviews):
        super().__init__(dset, val_dset, args, conf.get_config("train"))
        self.renderer = renderer
        self.model = model
        self.conf = conf
        self.dset = dset
        self.val_dset = val_dset
        self.nviews = nviews
        self.render_par = render_par
        self.mesh = getattr(render_par, "mesh", None)
        if self.mesh is None:
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

        self.lambda_coarse = conf.get_float("loss.lambda_coarse")
        self.lambda_fine = conf.get_float("loss.lambda_fine", 1.0)
        print(
            "lambda coarse {} and fine {}".format(
                self.lambda_coarse, self.lambda_fine
            )
        )
        self.rgb_coarse_crit = get_rgb_loss(conf.get_config("loss.rgb"), True)
        fine_loss_conf = conf.get_config("loss.rgb")
        if "rgb_fine" in conf.get_config("loss"):
            print("using fine loss")
            fine_loss_conf = conf.get_config("loss.rgb_fine")
        self.rgb_fine_crit = get_rgb_loss(fine_loss_conf, False)

        self.renderer_sched_state = {"iter_idx": 0, "last_sched": 0}
        if args.resume and os.path.exists(self.renderer_state_path):
            self.renderer_sched_state = checkpoints.load_json(
                self.renderer_state_path
            )
            self.renderer, self.renderer_sched_state = renderer.sched_step(
                self.renderer_sched_state, 0
            )

        self.z_near = dset.z_near
        self.z_far = dset.z_far
        self.use_bbox = args.no_bbox_step > 0

        # model state (pretrained graft skipped when a checkpoint will
        # immediately overwrite it)
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

    # -- persistence ----------------------------------------------------------

    def save_model_state(self, epochNum: str = ""):
        checkpoints.save_weights(self.args, self.variables, epochNum=epochNum)

    def extra_save_state(self):
        checkpoints.save_json(
            self.renderer_state_path, self.renderer_sched_state
        )

    def post_batch(self, epoch, batch):
        new_renderer, self.renderer_sched_state = self.renderer.sched_step(
            self.renderer_sched_state, self.args.batch_size
        )
        if new_renderer is not self.renderer:
            self.renderer = new_renderer
            # sample counts changed: retrace both jit variants
            self._update_fn = None
            self._update_fn_repl = None

    # -- the jitted update -----------------------------------------------------

    def _build_update(self, scene_sharded: bool = True):
        model, renderer = self.model, self.renderer
        lambda_coarse, lambda_fine = self.lambda_coarse, self.lambda_fine
        coarse_crit, fine_crit = self.rgb_coarse_crit, self.rgb_fine_crit
        optimizer = self.optimizer
        mesh = self.mesh

        # mesh shardings: scenes over 'data', rays within a scene over
        # 'rays', params/optimizer/rng replicated (ICI psum on gradients).
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
        # hidden dim (fc_0 column- / fc_1 row-parallel; XLA inserts the
        # per-block psum over ICI) — params, grads and Adam moments all
        # live sharded, so a TP mesh also CUTS per-device optimizer memory
        if "model" in names:
            from ..parallel import tp_shardings

            var_sh = tp_shardings(self.variables, mesh)
            opt_sh = tp_shardings(self.opt_state, mesh)
        else:
            var_sh = opt_sh = repl
        if scene_sharded:
            s_scene = NamedSharding(mesh, P(data_ax))
            s_rays = NamedSharding(mesh, P(data_ax, rays_ax))
        else:
            both = tuple(a for a in (data_ax, rays_ax) if a is not None)
            s_scene = repl
            s_rays = NamedSharding(mesh, P(None, both or None))

        def compute_losses(vs, batch_stats, src_images, src_poses, focal,
                           c, rays, rgb_gt, w, rng, is_train):
            # freeze_enc parity: the reference also calls encoder.eval()
            # (train/train.py:70-72), so a frozen encoder must run with
            # eval-mode BN and keep its running stats untouched
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
            out = renderer(
                model, vs, cond, rays, rng, want_weights=False,
                train=is_train,
            )
            rc = weighted_rgb_loss(
                coarse_crit, out["coarse"]["rgb"], rgb_gt, w
            )
            loss_dict = {"rc": rc * lambda_coarse}
            loss = rc * lambda_coarse
            if "fine" in out:
                rf = weighted_rgb_loss(
                    fine_crit, out["fine"]["rgb"], rgb_gt, w
                )
                loss = rc * lambda_coarse + rf * lambda_fine
                loss_dict["rf"] = rf * lambda_fine
            loss_dict["t"] = loss
            return loss, mutated, loss_dict

        def update(variables, opt_state, src_images, src_poses, focal, c,
                   rays, rgb_gt, w, lr, rng):
            def loss_fn(params):
                vs = {
                    "params": params,
                    "batch_stats": variables["batch_stats"],
                }
                loss, mutated, loss_dict = compute_losses(
                    vs, variables["batch_stats"], src_images, src_poses,
                    focal, c, rays, rgb_gt, w, rng, True,
                )
                return loss, (mutated, loss_dict)

            (loss, (mutated, loss_dict)), grads = jax.value_and_grad(
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
            new_vars = {"params": params, "batch_stats": mutated}
            return new_vars, opt_state, loss_dict

        def eval_losses(variables, src_images, src_poses, focal, c, rays,
                        rgb_gt, w, rng):
            # loss-only eval: no donation, no grad, no variable round trip
            # (r2 routed eval through the donated update and paid a full
            # variable-tree copy per eval_step)
            _, _, loss_dict = compute_losses(
                variables, variables["batch_stats"], src_images, src_poses,
                focal, c, rays, rgb_gt, w, rng, False,
            )
            return loss_dict

        data_shardings = (
            s_scene,  # src_images (SB, ...)
            s_scene,  # src_poses
            s_scene,  # focal
            s_scene,  # c
            s_rays,  # rays (SB, R, 8)
            s_rays,  # rgb_gt
            s_rays,  # w
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

    # -- batch assembly (host side) ---------------------------------------------

    def _assemble(self, data, is_train, global_step):
        all_images = np.asarray(data["images"])  # (SB, NV, 3, H, W)
        SB, NV, _, H, W = all_images.shape
        all_poses = np.asarray(data["poses"])
        all_bboxes = data.get("bbox")
        all_focals = np.asarray(data["focal"])
        all_c = np.asarray(data["c"]) if "c" in data else None

        if self.use_bbox and global_step >= self.args.no_bbox_step:
            self.use_bbox = False
            print(">>> Stopped using bbox sampling @ iter", global_step)
        if not is_train or not self.use_bbox:
            all_bboxes = None

        curr_nviews = self.nviews[
            int(self._rng.integers(0, len(self.nviews)))
        ]
        image_ord = np.empty((SB, curr_nviews), dtype=np.int64)

        all_rgb_gt, all_rays = [], []
        for obj_idx in range(SB):
            images = all_images[obj_idx]
            poses = all_poses[obj_idx]
            focal = all_focals[obj_idx]
            c = all_c[obj_idx] if all_c is not None else None
            image_ord[obj_idx] = self._rng.choice(
                NV, curr_nviews, replace=False
            )
            images_0to1 = images * 0.5 + 0.5

            # host numpy ray gen: the device version would force a relay
            # round-trip per step and serialize the dispatch pipeline
            cam_rays = camera.gen_rays_np(
                poses, W, H, focal, self.z_near, self.z_far, c=c
            )  # (NV, H, W, 8)
            rgb_gt_all = images_0to1.transpose(0, 2, 3, 1).reshape(-1, 3)

            if all_bboxes is not None:
                pix = bbox_sample(
                    np.asarray(all_bboxes[obj_idx]),
                    self.args.ray_batch_size,
                    rng=self._rng,
                )
                pix_inds = pix[:, 0] * H * W + pix[:, 1] * W + pix[:, 2]
            else:
                pix_inds = self._rng.integers(
                    0, NV * H * W, size=self.args.ray_batch_size
                )
            all_rgb_gt.append(rgb_gt_all[pix_inds])
            all_rays.append(cam_rays.reshape(-1, 8)[pix_inds])

        rays = np.stack(all_rays)  # (SB, R, 8)
        rgb_gt = np.stack(all_rgb_gt)  # (SB, R, 3)
        # host-side view select (batched_index_select_nd semantics)
        src_images = all_images[np.arange(SB)[:, None], image_ord]
        src_poses = all_poses[np.arange(SB)[:, None], image_ord]

        # pad to the mesh shape; only loss-masked rays (w=0) are ever
        # padded.  A ragged scene batch (SB not divisible by the data
        # axis) switches to the scenes-replicated sharding variant instead
        # of duplicating scenes — duplicates would enter train-mode
        # BatchNorm batch statistics and perturb the real scenes' math.
        scene_sharded = SB % self._data_n == 0
        ray_mult = (
            self._rays_n if scene_sharded else self._rays_n * self._data_n
        )
        w = np.ones(rays.shape[:2], dtype=np.float32)
        pad_r = (-rays.shape[1]) % ray_mult
        if pad_r:
            # wrap indices so pad_r > n_rays (tiny ray_batch_size on a
            # wide mesh) still yields a full-length pad
            idx = np.arange(pad_r) % rays.shape[1]
            rays = np.concatenate([rays, rays[:, idx]], axis=1)
            rgb_gt = np.concatenate([rgb_gt, rgb_gt[:, idx]], axis=1)
            w = np.concatenate(
                [w, np.zeros((w.shape[0], pad_r), np.float32)], axis=1
            )
        return (src_images, src_poses, all_focals, all_c, rays, rgb_gt, w,
                scene_sharded)

    def calc_losses(self, data, is_train=True, global_step=0):
        if "images" not in data:
            return {}
        (src_images, src_poses, focal, c, rays, rgb_gt, w,
         scene_sharded) = self._assemble(data, is_train, global_step)
        if scene_sharded:
            if self._update_fn is None:
                self._update_fn, self._eval_fn = self._build_update()
            update_fn, eval_fn = self._update_fn, self._eval_fn
        else:
            # ragged-batch variant (scenes replicated); lazily built —
            # its batches have distinct shapes, so no extra retraces
            if self._update_fn_repl is None:
                self._update_fn_repl, self._eval_fn_repl = (
                    self._build_update(scene_sharded=False)
                )
            update_fn, eval_fn = self._update_fn_repl, self._eval_fn_repl
        self._key, sub = jax.random.split(self._key)
        inputs = (
            jnp.asarray(src_images),
            jnp.asarray(src_poses),
            jnp.asarray(focal),
            jnp.asarray(c) if c is not None else None,
            jnp.asarray(rays),
            jnp.asarray(rgb_gt),
            jnp.asarray(w),
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
        # lazy device scalars: the base loop materializes them on its print
        # interval so off-interval steps never block on a host transfer
        return dict(loss_dict)

    def train_step(self, data, global_step):
        return self.calc_losses(data, is_train=True, global_step=global_step)

    def eval_step(self, data, global_step):
        return self.calc_losses(data, is_train=False, global_step=global_step)

    # -- visualization -----------------------------------------------------------

    def vis_step(self, data, global_step=None, idx=None):
        if "images" not in data:
            return {}
        batch_idx = (
            int(self._rng.integers(0, len(data["images"])))
            if idx is None
            else idx
        )
        images = np.asarray(data["images"][batch_idx])  # (NV, 3, H, W)
        poses = np.asarray(data["poses"][batch_idx])
        focal = np.asarray(data["focal"][batch_idx : batch_idx + 1])
        c = None
        if "c" in data:
            c = np.asarray(data["c"][batch_idx : batch_idx + 1])
        NV, _, H, W = images.shape
        cam_rays = np.asarray(
            camera.gen_rays(
                jnp.asarray(poses), W, H, jnp.asarray(focal).squeeze(),
                self.z_near, self.z_far,
                c=jnp.asarray(c).squeeze(0) if c is not None else None,
            )
        )
        images_0to1 = images * 0.5 + 0.5

        curr_nviews = self.nviews[int(self._rng.integers(0, len(self.nviews)))]
        views_src = np.sort(self._rng.choice(NV, curr_nviews, replace=False))
        view_dest = int(self._rng.integers(0, NV - curr_nviews))
        for vs in range(curr_nviews):
            view_dest += view_dest >= views_src[vs]

        source_views = (
            images_0to1[views_src].transpose(0, 2, 3, 1).reshape(-1, H, W, 3)
        )
        gt = images_0to1[view_dest].transpose(1, 2, 0).reshape(H, W, 3)

        cond = self.model.encode(
            self.variables,
            jnp.asarray(images[views_src][None]),
            jnp.asarray(poses[views_src][None]),
            # keep the (1, 2) shape: a squeezed (2,) DTU focal would be
            # misread as two per-scene scalars (reference never squeezes,
            # PixelNerfTrainer.py:236-247)
            jnp.asarray(focal),
            c=jnp.asarray(c) if c is not None else None,
        )
        test_rays = jnp.asarray(
            cam_rays[view_dest].reshape(1, H * W, -1)
        )
        self._key, sub = jax.random.split(self._key)
        render_dict = self.render_par(self.variables, cond, test_rays, sub)

        coarse = render_dict["coarse"]
        using_fine = "fine" in render_dict

        alpha_coarse_np = np.asarray(coarse["weights"][0]).sum(-1).reshape(H, W)
        rgb_coarse_np = np.asarray(coarse["rgb"][0]).reshape(H, W, 3)
        depth_coarse_np = np.asarray(coarse["depth"][0]).reshape(H, W)

        print(
            "c rgb min {} max {}".format(rgb_coarse_np.min(), rgb_coarse_np.max())
        )
        alpha_coarse_cmap = cmap(alpha_coarse_np)[..., ::-1] / 255
        depth_coarse_cmap = cmap(depth_coarse_np)[..., ::-1] / 255
        vis_list = [
            *source_views, gt, depth_coarse_cmap, rgb_coarse_np,
            alpha_coarse_cmap,
        ]
        if rgb_coarse_np.min() == 0 and rgb_coarse_np.max() == 0:
            print("coarse rgb is all 0")
            return None, None
        vis_coarse = np.hstack(vis_list)
        vis = vis_coarse

        if using_fine:
            fine = render_dict["fine"]
            alpha_fine_np = np.asarray(fine["weights"][0]).sum(-1).reshape(H, W)
            depth_fine_np = np.asarray(fine["depth"][0]).reshape(H, W)
            rgb_fine_np = np.asarray(fine["rgb"][0]).reshape(H, W, 3)
            print(
                "f rgb min {} max {}".format(rgb_fine_np.min(), rgb_fine_np.max())
            )
            if rgb_fine_np.min() == 0 and rgb_fine_np.max() == 0:
                print("fine rgb is all 0")
                return None, None
            vis_fine = np.hstack(
                [
                    *source_views, gt, cmap(depth_fine_np)[..., ::-1] / 255,
                    rgb_fine_np, cmap(alpha_fine_np)[..., ::-1] / 255,
                ]
            )
            vis = np.vstack((vis_coarse, vis_fine))
            rgb_psnr = rgb_fine_np
        else:
            rgb_psnr = rgb_coarse_np

        psnr = psnr_fn(rgb_psnr, gt)
        print("psnr", psnr)
        return vis, {"psnr": psnr}

    def metric_step(self, data_loader, print_hc=False):
        return None, None, None
