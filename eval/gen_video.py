"""360-degree novel-view trajectory rendering to mp4.

Parity: /root/reference/eval/gen_video.py:22-325 — pose_spherical orbit
ring (elevation/radius/num_views flags), source-view encoding, chunked
render, mp4 + source-view contact sheet.  (The reference's dead hard-coded
Windows-path experiment block, gen_video.py:214-268, is intentionally not
reproduced.  Its OTHER dead block — the IDR DTU fly-through under
`if False:`, gen_video.py:131-169 — is resurrected as the live opt-in
--dtu_trajectory flag, utils/camera.dtu_trajectory.)
"""

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
from pixelnerf_yolo_tpu.data import get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel
from pixelnerf_yolo_tpu.render.nerf import NeRFRenderer
from pixelnerf_yolo_tpu.train import checkpoints
from pixelnerf_yolo_tpu.utils import camera


def extra_args(parser):
    parser.add_argument("--subset", "-S", type=int, default=0,
                        help="Subset in data to use")
    parser.add_argument("--split", type=str, default="train",
                        help="Split of data to use train | val | test")
    parser.add_argument("--source", "-P", type=str, default="64",
                        help="Source view(s) in image, in increasing order. "
                        "-1 to do random")
    parser.add_argument("--num_views", type=int, default=40,
                        help="Number of video frames (rotated views)")
    parser.add_argument("--elevation", type=float, default=-10.0,
                        help="Elevation angle (negative is above)")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="Video scale relative to input size")
    parser.add_argument("--radius", type=float, default=0.0,
                        help="Distance of camera from origin, default is "
                        "average of z_far, z_near of dataset (non-DTU)")
    parser.add_argument("--fps", type=int, default=30, help="FPS of video")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dtu_trajectory", action="store_true",
        help="Use the IDR DTU fly-through (periodic quaternion spline) "
        "instead of the 360 orbit.  The reference ships this trajectory "
        "dead (gen_video.py:131-169 under `if False:`); here it is live.",
    )
    return parser


def main():
    args, conf = parse_args(extra_args)
    args.resume = True

    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split,
        training=False,
    )
    data = dset[args.subset]
    print("Data instance loaded:", data["path"])

    images = np.asarray(data["images"])  # (NV, 3, H, W)
    poses = np.asarray(data["poses"])
    focal = np.asarray(data["focal"], dtype=np.float32)
    c = np.asarray(data["c"], dtype=np.float32) if "c" in data else None

    NV, _, H, W = images.shape
    if args.scale != 1.0:
        H, W = int(H * args.scale), int(W * args.scale)

    model = make_model(conf.get_config("model"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64), jnp.float32)
    , load_pretrained=False,  # checkpoint load follows
    )
    variables = checkpoints.load_weights(args, variables)

    renderer = NeRFRenderer.from_conf(
        conf.get_config("renderer"), lindisp=getattr(dset, "lindisp", False),
        eval_batch_size=args.ray_batch_size,
    )
    render_par = bind_parallel(
        renderer, model, gpus=args.gpu_id, simple_output=True
    )

    z_near, z_far = dset.z_near, dset.z_far
    print("Generating rays")

    if args.dtu_trajectory:
        # IDR DTU fly-through (the reference's dead block, made live)
        print("Using DTU camera trajectory")
        render_poses = camera.dtu_trajectory(args.num_views)
        args.num_views = render_poses.shape[0]
    else:
        # 360-degree orbit ring (gen_video.py:171-196)
        radius = (
            args.radius if args.radius > 0 else (z_near + z_far) * 0.5
        )
        render_poses = np.stack(
            [
                camera.pose_spherical(angle, args.elevation, radius)
                for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
            ]
        )
    # opt-in dead-accelerator abort (PNY_STALL_ABORT_S): started BEFORE
    # the first device call so a tunnel already dead at launch is caught
    from pixelnerf_yolo_tpu.utils.misc import stall_watchdog_from_env

    watchdog = stall_watchdog_from_env()

    render_rays = np.asarray(
        camera.gen_rays(
            jnp.asarray(render_poses), W, H, jnp.asarray(focal * args.scale),
            z_near, z_far,
            c=jnp.asarray(c * args.scale) if c is not None else None,
        )
    ).reshape(-1, 8)
    if watchdog is not None:
        watchdog.beat()  # ray gen materialized on device

    if args.source == "-1":
        rng = np.random.default_rng(args.seed)
        source = np.array([rng.integers(0, NV)])
    else:
        source = np.array(sorted(map(int, args.source.split())))
    print("Using source views:", source)

    cond = model.encode(
        variables,
        jnp.asarray(images[source][None]),
        jnp.asarray(poses[source][None]),
        # leading [None]: a (2,) DTU focal is (fx, fy), not per-view scalars
        jnp.asarray(focal)[None],
        c=jnp.asarray(c)[None] if c is not None else None,
    )

    key = jax.random.PRNGKey(args.seed)
    frames = []
    for start in range(0, render_rays.shape[0], args.ray_batch_size):
        rays = jnp.asarray(render_rays[start : start + args.ray_batch_size])
        key, sub = jax.random.split(key)
        rgb, _depth = render_par(variables, cond, rays[None], sub)
        frames.append(rgb[0])  # device array: one transfer at the end
        if watchdog is not None:
            watchdog.beat()  # a dead tunnel blocks inside the dispatch
    frames = np.clip(
        np.asarray(jnp.concatenate(frames, 0)).reshape(args.num_views, H, W, 3), 0, 1
    )
    if watchdog is not None:
        watchdog.stop()

    print("Writing video")
    vid_name = "v" + args.name + "_v{}".format(
        "_".join(map(str, source.tolist()))
    )
    vid_path = os.path.join(args.visual_path, args.name, vid_name + ".mp4")
    viewimg_path = os.path.join(
        args.visual_path, args.name, "video" + vid_name + "_view.jpg"
    )
    os.makedirs(os.path.dirname(vid_path), exist_ok=True)
    try:
        imageio.mimwrite(
            vid_path, (frames * 255).astype(np.uint8), fps=args.fps, quality=8
        )
    except (ValueError, ImportError):
        # no ffmpeg backend in this environment: fall back to GIF
        vid_path = vid_path[:-4] + ".gif"
        imageio.mimwrite(vid_path, (frames * 255).astype(np.uint8),
                         fps=args.fps)

    img_np = (images[source] * 0.5 + 0.5).transpose(0, 2, 3, 1)
    img_np = np.hstack(list(img_np))
    imageio.imwrite(viewimg_path, (img_np * 255).astype(np.uint8))

    print("Wrote to", vid_path, "view:", viewimg_path)


if __name__ == "__main__":
    main()
