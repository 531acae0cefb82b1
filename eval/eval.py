"""Full NeRF evaluation: renders all target views per object, PSNR+SSIM.

Flag and behavior parity with /root/reference/eval/eval.py:30-360 —
fixed or per-object (viewlist LUT) source views, finish.txt resumability,
--coarse mode (64c/128f), PNG/depth-EXR/compare outputs.

python eval/eval.py -n <expname> -c <conf> -D <datadir> -F srn -P "64"
"""

import dataclasses
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import imageio
import numpy as np

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.config.args import parse_args
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel
from pixelnerf_yolo_tpu.render.nerf import NeRFRenderer
from pixelnerf_yolo_tpu.train import checkpoints
from pixelnerf_yolo_tpu.utils import camera
from pixelnerf_yolo_tpu.utils.image import cmap
from pixelnerf_yolo_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn


def extra_args(parser):
    parser.add_argument("--split", type=str, default="test",
                        help="Split of data to use train | val | test")
    parser.add_argument("--source", "-P", type=str, default="64",
                        help="Source view(s) for each object. Alternatively, "
                        "specify -L to viewlist file and leave this blank.")
    parser.add_argument("--eval_view_list", type=str, default=None,
                        help="Path to eval view list")
    parser.add_argument("--coarse", action="store_true",
                        help="Coarse network as fine")
    parser.add_argument("--no_compare_gt", action="store_true",
                        help="Skip GT comparison and only render images")
    parser.add_argument("--multicat", action="store_true",
                        help="Prepend category id to object id.")
    parser.add_argument("--viewlist", "-L", type=str, default="",
                        help="Path to source view list e.g. src_dvr.txt; "
                        "overrides source/P")
    parser.add_argument("--output", "-O", type=str, default="eval",
                        help="If specified, saves generated images to dir")
    parser.add_argument("--include_src", action="store_true",
                        help="Include source views in calculation")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="Video scale relative to input size")
    parser.add_argument("--write_depth", action="store_true",
                        help="Write depth image")
    parser.add_argument("--write_compare", action="store_true",
                        help="Write GT comparison image")
    parser.add_argument("--free_pose", action="store_true",
                        help="Poses may change between objects")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main():
    args, conf = parse_args(
        extra_args, default_conf="conf/default_mv.conf",
        default_expname="shapenet",
    )
    args.resume = True

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split,
        training=False,
    )
    data_loader = DataLoader(dset, batch_size=1, shuffle=False)

    output_dir = args.output.strip()
    has_output = len(output_dir) > 0

    total_psnr = total_ssim = 0.0
    cnt = 0
    finished = set()
    finish_file = None
    if has_output:
        finish_path = os.path.join(output_dir, "finish.txt")
        os.makedirs(output_dir, exist_ok=True)
        if os.path.exists(finish_path):
            with open(finish_path, "r") as f:
                lines = [x.strip().split() for x in f.readlines()]
            lines = [x for x in lines if len(x) == 4]
            finished = set(x[0] for x in lines)
            total_psnr = sum(float(x[1]) for x in lines)
            total_ssim = sum(float(x[2]) for x in lines)
            cnt = sum(int(x[3]) for x in lines)
            if cnt > 0:
                print("resume psnr", total_psnr / cnt, "ssim", total_ssim / cnt)
            else:
                total_psnr = total_ssim = 0.0
        finish_file = open(finish_path, "a", buffering=1)
        print("Writing images to", output_dir)

    # opt-in dead-accelerator abort (same PNY_STALL_ABORT_S contract as
    # the trainer): long unattended eval sweeps otherwise hang forever if
    # the device tunnel dies.  Started BEFORE the first device call so a
    # tunnel that is already dead at launch is also caught.
    from pixelnerf_yolo_tpu.utils.misc import stall_watchdog_from_env

    watchdog = stall_watchdog_from_env()

    model = make_model(conf.get_config("model"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64), jnp.float32)
    , load_pretrained=False,  # checkpoint load follows
    )
    if watchdog is not None:
        watchdog.beat()  # init + checkpoint load materialized on device
    variables = checkpoints.load_weights(args, variables)

    renderer = NeRFRenderer.from_conf(
        conf.get_config("renderer"),
        lindisp=getattr(dset, "lindisp", False),
        eval_batch_size=args.ray_batch_size,
    )
    if args.coarse:
        model.mlp_fine = None
        renderer = dataclasses.replace(renderer, n_coarse=64, n_fine=128)
    if renderer.n_coarse < 64:
        renderer = dataclasses.replace(renderer, n_coarse=64)

    render_par = bind_parallel(
        renderer, model, gpus=args.gpu_id, simple_output=True
    )

    z_near, z_far = dset.z_near, dset.z_far

    use_source_lut = len(args.viewlist) > 0
    source_lut = {}
    if use_source_lut:
        print("Using views from list", args.viewlist)
        with open(args.viewlist, "r") as f:
            tmp = [x.strip().split() for x in f.readlines()]
        source_lut = {
            x[0] + "/" + x[1]: np.array(list(map(int, x[2:])), dtype=np.int64)
            for x in tmp
        }
        source = None
    else:
        source = np.array(sorted(map(int, args.source.split())), dtype=np.int64)

    NV = dset[0]["images"].shape[0]
    if args.eval_view_list is not None:
        with open(args.eval_view_list, "r") as f:
            eval_views = np.array(list(map(int, f.readline().split())))
        target_view_mask_init = np.zeros(NV, dtype=bool)
        target_view_mask_init[eval_views] = True
    else:
        target_view_mask_init = np.ones(NV, dtype=bool)

    key = jax.random.PRNGKey(args.seed)
    all_rays = None
    novel_view_idxs = None
    src_view_mask = None
    focal_j = c_j = None
    total_objs = len(data_loader)

    for obj_idx, data in enumerate(data_loader):
        print(
            "OBJECT", obj_idx, "OF", total_objs, "PROGRESS",
            obj_idx / total_objs * 100.0, "%", data["path"][0],
        )
        dpath = data["path"][0]
        obj_basename = os.path.basename(dpath)
        cat_name = os.path.basename(os.path.dirname(dpath))
        obj_name = (
            cat_name + "_" + obj_basename if args.multicat else obj_basename
        )
        if has_output and obj_name in finished:
            print("(skip)")
            continue
        images = np.asarray(data["images"][0])  # (NV, 3, H, W)
        NV, _, H, W = images.shape

        if args.scale != 1.0:
            H, W = int(H * args.scale), int(W * args.scale)

        if all_rays is None or use_source_lut or args.free_pose:
            if use_source_lut:
                source = source_lut[cat_name + "/" + obj_basename]

            src_view_mask = np.zeros(NV, dtype=bool)
            src_view_mask[source] = True

            focal = np.asarray(data["focal"][0], dtype=np.float32)
            c = np.asarray(data["c"][0]) if "c" in data else None

            poses = np.asarray(data["poses"][0])
            src_poses = poses[src_view_mask]

            target_view_mask = target_view_mask_init.copy()
            if not args.include_src:
                target_view_mask *= ~src_view_mask
            novel_view_idxs = np.nonzero(target_view_mask)[0]
            tgt_poses = poses[target_view_mask]

            all_rays = np.asarray(
                camera.gen_rays(
                    jnp.asarray(tgt_poses.reshape(-1, 4, 4)), W, H,
                    jnp.asarray(focal * args.scale), z_near, z_far,
                    c=jnp.asarray(c * args.scale) if c is not None else None,
                )
            ).reshape(-1, 8)
            # leading [None] like the reference (eval.py:227-234): a (2,)
            # DTU focal means (fx, fy), not two per-view scalars
            focal_j = jnp.asarray(focal)[None]
            c_j = jnp.asarray(c)[None] if c is not None else None

        n_gen_views = len(novel_view_idxs)
        cond = model.encode(
            variables,
            jnp.asarray(images[src_view_mask][None]),
            jnp.asarray(np.asarray(data["poses"][0])[src_view_mask][None]),
            focal_j,
            c=c_j,
        )

        all_rgb, all_depth = [], []
        for start in range(0, all_rays.shape[0], args.ray_batch_size):
            rays = jnp.asarray(all_rays[start : start + args.ray_batch_size])
            key, sub = jax.random.split(key)
            rgb, depth = render_par(variables, cond, rays[None], sub)
            # keep device arrays: materializing per chunk costs a host
            # round-trip each (one final transfer instead)
            all_rgb.append(rgb[0])
            all_depth.append(depth[0])
            if watchdog is not None:
                # dispatch RETURNED: a dead tunnel blocks inside the call
                watchdog.beat()

        all_rgb = np.asarray(jnp.concatenate(all_rgb, axis=0))
        all_depth = np.asarray(jnp.concatenate(all_depth, axis=0))
        if watchdog is not None:
            # the np.asarray above materialized every chunk of this object
            watchdog.beat()
        all_depth = ((all_depth - z_near) / (z_far - z_near)).reshape(
            n_gen_views, H, W
        )
        all_rgb = np.clip(all_rgb.reshape(n_gen_views, H, W, 3), 0.0, 1.0)

        obj_out_dir = os.path.join(output_dir, obj_name)
        if has_output:
            os.makedirs(obj_out_dir, exist_ok=True)
            for i in range(n_gen_views):
                out_file = os.path.join(
                    obj_out_dir, "{:06}.png".format(int(novel_view_idxs[i]))
                )
                imageio.imwrite(out_file, (all_rgb[i] * 255).astype(np.uint8))
                if args.write_depth:
                    # EXR like the reference (eval.py:305); many cv2
                    # builds ship without the OpenEXR codec — fall back
                    # to a raw .npy so --write_depth still works
                    exr_path = os.path.join(
                        obj_out_dir,
                        "{:06}_depth.exr".format(int(novel_view_idxs[i])),
                    )
                    try:
                        import cv2

                        if not cv2.imwrite(exr_path, all_depth[i]):
                            raise RuntimeError("cv2.imwrite returned False")
                    except Exception as e:  # codec missing / cv2 absent
                        if not getattr(main, "_warned_exr", False):
                            print("EXR unavailable ({}); writing raw "
                                  ".npy depth instead".format(e))
                            main._warned_exr = True
                        np.save(os.path.splitext(exr_path)[0] + ".npy",
                                all_depth[i])
                    imageio.imwrite(
                        os.path.join(
                            obj_out_dir,
                            "{:06}_depth_norm.png".format(
                                int(novel_view_idxs[i])
                            ),
                        ),
                        cmap(all_depth[i]),
                    )

        curr_ssim = curr_psnr = 0.0
        if not args.no_compare_gt:
            images_0to1 = images * 0.5 + 0.5
            gt_views = images_0to1[target_view_mask]  # (n, 3, Hn, Wn) native
            if args.scale != 1.0 and gt_views.shape[-2:] != (H, W):
                # rays were generated at the scaled H,W; resize GT to match
                # (the reference rescales only rays and would crash here —
                # deliberate divergence so the shipped --scale flag works)
                from pixelnerf_yolo_tpu.ops.resize import (
                    resize_area,
                    resize_bilinear,
                )

                resize = resize_area if args.scale < 1.0 else resize_bilinear
                gt_views = np.asarray(resize(jnp.asarray(gt_views), (H, W)))
            rgb_gt_all = gt_views.transpose(0, 2, 3, 1)
            for view_idx in range(n_gen_views):
                curr_ssim += ssim_fn(
                    all_rgb[view_idx], rgb_gt_all[view_idx],
                    multichannel=True, data_range=1,
                )
                curr_psnr += psnr_fn(all_rgb[view_idx], rgb_gt_all[view_idx])
                if args.write_compare and has_output:
                    out_im = np.hstack(
                        (all_rgb[view_idx], rgb_gt_all[view_idx])
                    )
                    imageio.imwrite(
                        os.path.join(
                            obj_out_dir,
                            "{:06}_compare.png".format(
                                int(novel_view_idxs[view_idx])
                            ),
                        ),
                        (out_im * 255).astype(np.uint8),
                    )
        curr_psnr /= n_gen_views
        curr_ssim /= n_gen_views
        total_psnr += curr_psnr
        total_ssim += curr_ssim
        cnt += 1
        if not args.no_compare_gt:
            print(
                "curr psnr", curr_psnr, "ssim", curr_ssim,
                "running psnr", total_psnr / cnt,
                "running ssim", total_ssim / cnt,
            )
        if finish_file is not None:
            finish_file.write(
                "{} {} {} {}\n".format(obj_name, curr_psnr, curr_ssim, 1)
            )
    if watchdog is not None:
        watchdog.stop()
    print("final psnr", total_psnr / cnt, "ssim", total_ssim / cnt)


if __name__ == "__main__":
    main()
