"""Approximate PSNR+SSIM evaluation for development (one random target
view per object).

Parity: /root/reference/eval/eval_approx.py:30-153.
"""

import dataclasses
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

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
from pixelnerf_yolo_tpu.utils.indexing import batched_index_select_nd
from pixelnerf_yolo_tpu.utils.metrics import psnr as psnr_fn, ssim as ssim_fn


def extra_args(parser):
    parser.add_argument("--split", type=str, default="val",
                        help="Split of data to use train | val | test")
    parser.add_argument("--source", "-P", type=str, default="64",
                        help="Source view(s), increasing order. -1 = random 1")
    parser.add_argument("--batch_size", type=int, default=4, help="Batch size")
    parser.add_argument("--seed", type=int, default=1234,
                        help="Random seed for target view selection")
    parser.add_argument("--coarse", action="store_true",
                        help="Coarse network as fine")
    return parser


def main():
    args, conf = parse_args(extra_args)
    args.resume = True

    model = make_model(conf.get_config("model"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64), jnp.float32)
    , load_pretrained=False,  # checkpoint load follows
    )
    variables = checkpoints.load_weights(args, variables)
    if args.coarse:
        model.mlp_fine = None

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split,
        training=False,
    )
    data_loader = DataLoader(dset, batch_size=args.batch_size, shuffle=False)

    renderer = NeRFRenderer.from_conf(
        conf.get_config("renderer"), eval_batch_size=args.ray_batch_size
    )
    if renderer.n_coarse < 64:
        renderer = dataclasses.replace(renderer, n_coarse=64)
    if args.coarse:
        renderer = dataclasses.replace(renderer, n_coarse=64, n_fine=128)
    render_par = bind_parallel(
        renderer, model, gpus=args.gpu_id, simple_output=True
    )

    z_near, z_far = dset.z_near, dset.z_far
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    source = np.array(list(map(int, args.source.split())), dtype=np.int64)
    random_source = len(source) == 1 and source[0] == -1

    total_psnr = total_ssim = 0.0
    cnt = 0
    for data in data_loader:
        images = np.asarray(data["images"])  # (SB, NV, 3, H, W)
        poses = np.asarray(data["poses"])
        focals = np.asarray(data["focal"], dtype=np.float32)
        c = np.asarray(data["c"]) if "c" in data else None
        SB, NV, _, H, W = images.shape

        if random_source:
            src = rng.integers(0, NV, size=(SB, 1))
        else:
            src = np.broadcast_to(source[None], (SB, len(source))).copy()
            if (source < 0).any() or (source >= NV).any():
                # torch index_select raises here; a silent jnp gather
                # would zero-fill poses and NaN the whole render
                raise SystemExit(
                    f"source view(s) {source.tolist()} out of range for "
                    f"dataset with {NV} views (pass -P with valid indices)"
                )
        tgt = rng.integers(0, NV, size=(SB,))

        src_images = np.asarray(
            batched_index_select_nd(jnp.asarray(images), jnp.asarray(src))
        )
        src_poses = np.asarray(
            batched_index_select_nd(jnp.asarray(poses), jnp.asarray(src))
        )
        cond = model.encode(
            variables, jnp.asarray(src_images), jnp.asarray(src_poses),
            jnp.asarray(focals),
            c=jnp.asarray(c) if c is not None else None,
        )

        tgt_poses = poses[np.arange(SB), tgt]  # (SB, 4, 4)
        rays = np.stack(
            [
                np.asarray(
                    camera.gen_rays(
                        jnp.asarray(tgt_poses[b : b + 1]), W, H,
                        jnp.asarray(focals[b]), z_near, z_far,
                        c=jnp.asarray(c[b]) if c is not None else None,
                    )
                ).reshape(-1, 8)
                for b in range(SB)
            ]
        )  # (SB, H*W, 8)

        key, sub = jax.random.split(key)
        rgb, _depth = render_par(variables, cond, jnp.asarray(rays), sub)
        rgb = np.clip(np.asarray(rgb).reshape(SB, H, W, 3), 0, 1)

        gt = (images[np.arange(SB), tgt] * 0.5 + 0.5).transpose(0, 2, 3, 1)
        for b in range(SB):
            total_psnr += psnr_fn(rgb[b], gt[b])
            total_ssim += ssim_fn(rgb[b], gt[b], multichannel=True,
                                  data_range=1)
            cnt += 1
        print("curr psnr", total_psnr / cnt, "ssim", total_ssim / cnt)
    print("final psnr", total_psnr / cnt, "ssim", total_ssim / cnt)


if __name__ == "__main__":
    main()
