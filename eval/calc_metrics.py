"""Map-reduce quality metrics over rendered output directories.

Parity: /root/reference/eval/calc_metrics.py:24-340 — map phase writes a
per-object metrics.txt (psnr/ssim[/lpips]) comparing rendered PNGs against
the dataset ground truth; reduce phase aggregates into all_metrics.txt with
per-category summaries for --multicat.

LPIPS: native JAX LPIPS-vgg (pixelnerf_yolo_tpu/nn/lpips.py; weights via
scripts/port_lpips.py), falling back to the torch lpips package when the
npz is absent but the package is importable; otherwise lpips is skipped
and noted in the output.
"""

import argparse
import glob
import os
import os.path as osp
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import imageio.v2 as imageio
import numpy as np

from pixelnerf_yolo_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn

parser = argparse.ArgumentParser(
    description="Calculate PSNR for rendered images."
)
parser.add_argument("--datadir", "-D", type=str, required=True,
                    help="Dataset directory (used directly)")
parser.add_argument("--output", "-O", type=str, default="eval",
                    help="Root path of rendered output (from eval.py)")
parser.add_argument("--dataset_format", "-F", type=str, default="dvr",
                    help="Dataset format, nerf | srn | dvr")
parser.add_argument("--list_name", type=str, default="softras_test",
                    help="Filter list prefix for DVR")
parser.add_argument("--gpu_id", type=int, default=0,
                    help="Only single device supported for this script.")
parser.add_argument("--overwrite", action="store_true",
                    help="overwrite existing metrics.txt")
parser.add_argument("--exclude_dtu_bad", action="store_true",
                    help="exclude hardcoded DTU bad views")
parser.add_argument("--multicat", action="store_true",
                    help="Prepend category id to object id.")
parser.add_argument("--viewlist", "-L", type=str, default="",
                    help="Source view list; excludes sources from eval")
parser.add_argument("--eval_view_list", type=str, default=None)
parser.add_argument("--primary", "-P", type=str, default="",
                    help="List of views to exclude")
parser.add_argument("--lpips_batch_size", type=int, default=32)
parser.add_argument("--reduce_only", "-R", action="store_true",
                    help="skip the map (per-obj metric computation)")
parser.add_argument("--metadata", type=str, default="metadata.yaml")
parser.add_argument("--dtu_sort", action="store_true")
args = parser.parse_args()

# DTU views the reference hard-excludes (calc_metrics.py --exclude_dtu_bad)
DTU_BAD_VIEWS = [3, 4, 5, 6, 7, 16, 17, 18, 19, 20, 21, 36, 37, 38, 39]

if args.dataset_format == "dvr":
    list_name = args.list_name + ".lst"
    img_dir_name = "image"
elif args.dataset_format == "srn":
    list_name = ""
    img_dir_name = "rgb"
else:
    raise NotImplementedError(
        "Not supported data format " + args.dataset_format
    )

data_root = args.datadir
render_root = args.output

# LPIPS-vgg (reference calc_metrics.py:186,236-246): native JAX first
# (weights via scripts/port_lpips.py), torch lpips package as fallback.
HAS_LPIPS = False
try:
    from pixelnerf_yolo_tpu.nn.lpips import load_lpips, lpips_distance

    _lpips_params, _lpips_path = load_lpips()
    print("LPIPS: native vgg,", _lpips_path)

    def lpips_fn(rgb, gt):
        import jax.numpy as jnp

        a = jnp.asarray(rgb.transpose(2, 0, 1))[None] * 2 - 1
        b = jnp.asarray(gt.transpose(2, 0, 1))[None] * 2 - 1
        return float(lpips_distance(_lpips_params, a, b)[0])

    HAS_LPIPS = True
except FileNotFoundError as _e:
    _native_err = str(_e)
    try:
        import lpips as lpips_pkg
        import torch

        _lpips_model = lpips_pkg.LPIPS(net="vgg")

        def lpips_fn(rgb, gt):
            a = torch.from_numpy(rgb.transpose(2, 0, 1))[None] * 2 - 1
            b = torch.from_numpy(gt.transpose(2, 0, 1))[None] * 2 - 1
            return float(_lpips_model(a, b))

        HAS_LPIPS = True
    except Exception:
        print("LPIPS unavailable (reported as 0.0):", _native_err)

        def lpips_fn(rgb, gt):
            return 0.0


def load_exclude_views():
    exclude = {}
    if args.viewlist:
        with open(args.viewlist, "r") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 3:
                    exclude[parts[0] + "/" + parts[1]] = set(
                        map(int, parts[2:])
                    )
    return exclude


def iter_objects():
    """Yield (obj_name, gt_img_dir, rendered_dir)."""
    for rend_dir in sorted(glob.glob(osp.join(render_root, "*"))):
        if not osp.isdir(rend_dir):
            continue
        obj_name = osp.basename(rend_dir)
        if args.multicat:
            cat, obj = obj_name.split("_", 1)
            gt_dir = osp.join(data_root, cat, obj, img_dir_name)
        else:
            gt_dir = None
            for cand in glob.glob(osp.join(data_root, "*")):
                p = osp.join(cand, obj_name, img_dir_name)
                if osp.isdir(p):
                    gt_dir = p
                    break
            if gt_dir is None:
                p = osp.join(data_root, obj_name, img_dir_name)
                if osp.isdir(p):
                    gt_dir = p
        if gt_dir is None or not osp.isdir(gt_dir):
            print("WARNING: no GT found for", obj_name)
            continue
        yield obj_name, gt_dir, rend_dir


def run_map():
    excl_lut = load_exclude_views()
    primary_excl = set(map(int, args.primary.split())) if args.primary else set()
    for obj_name, gt_dir, rend_dir in iter_objects():
        out_path = osp.join(rend_dir, "metrics.txt")
        if osp.exists(out_path) and not args.overwrite:
            continue
        gt_paths = sorted(
            p for p in glob.glob(osp.join(gt_dir, "*"))
            if p.endswith((".png", ".jpg"))
        )
        n_psnr = n_ssim = n_lpips = 0.0
        cnt = 0
        for rend_path in sorted(glob.glob(osp.join(rend_dir, "*.png"))):
            base = osp.basename(rend_path)
            if not base[:6].isdigit():
                continue
            if "_" in base:  # depth/compare variants
                continue
            view_idx = int(base[:6])
            if view_idx in primary_excl:
                continue
            if args.exclude_dtu_bad and view_idx in DTU_BAD_VIEWS:
                continue
            if view_idx >= len(gt_paths):
                continue
            rgb = imageio.imread(rend_path)[..., :3] / 255.0
            gt = imageio.imread(gt_paths[view_idx])[..., :3] / 255.0
            if rgb.shape != gt.shape:
                # dataset loaders resize on the fly (e.g. SRN to 128);
                # match by resizing the on-disk GT to the rendered size
                import cv2

                gt = cv2.resize(
                    gt, (rgb.shape[1], rgb.shape[0]),
                    interpolation=cv2.INTER_AREA,
                )
            n_psnr += psnr_fn(rgb, gt)
            n_ssim += ssim_fn(rgb, gt, multichannel=True, data_range=1)
            if HAS_LPIPS:
                n_lpips += lpips_fn(
                    rgb.astype(np.float32), gt.astype(np.float32)
                )
            cnt += 1
        if cnt == 0:
            continue
        with open(out_path, "w") as f:
            f.write("psnr {}\n".format(n_psnr / cnt))
            f.write("ssim {}\n".format(n_ssim / cnt))
            if HAS_LPIPS:
                f.write("lpips {}\n".format(n_lpips / cnt))
        print(obj_name, "psnr", n_psnr / cnt, "ssim", n_ssim / cnt)


def run_reduce():
    out_metrics_path = osp.join(render_root, "all_metrics.txt")
    sums: dict = {}
    cat_sums: dict = {}
    counts: dict = {}
    total = 0
    for obj_name, _gt, rend_dir in iter_objects():
        metrics_path = osp.join(rend_dir, "metrics.txt")
        if not osp.exists(metrics_path):
            continue
        cat = obj_name.split("_", 1)[0] if args.multicat else "all"
        with open(metrics_path, "r") as f:
            for line in f:
                name, val = line.strip().split()
                sums[name] = sums.get(name, 0.0) + float(val)
                key = cat + "." + name
                cat_sums[key] = cat_sums.get(key, 0.0) + float(val)
        counts[cat] = counts.get(cat, 0) + 1
        total += 1
    if total == 0:
        print("No per-object metrics found; run the map phase first")
        return
    lines = []
    for name, val in sorted(sums.items()):
        lines.append("{} {}".format(name, val / total))
    if args.multicat:
        for key, val in sorted(cat_sums.items()):
            cat = key.split(".")[0]
            lines.append("{} {}".format(key, val / counts[cat]))
    text = "\n".join(lines)
    with open(out_metrics_path, "w") as f:
        f.write(text + "\n")
    if not HAS_LPIPS:
        print("(lpips unavailable in this environment; skipped)")
    print(text)
    print("Wrote", out_metrics_path)


if __name__ == "__main__":
    if not args.reduce_only:
        run_map()
    run_reduce()
