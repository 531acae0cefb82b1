"""Render an orbit video from a single real (preprocessed) photo.

Parity: /root/reference/eval/eval_real.py:22-171 — takes the
scripts/preproc.py output (*_normalize.png), assigns a dummy identity
camera with the given focal, and renders a pose_spherical orbit.
"""

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import imageio.v2 as imageio
import numpy as np

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.config.args import parse_args
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel
from pixelnerf_yolo_tpu.render.nerf import NeRFRenderer
from pixelnerf_yolo_tpu.train import checkpoints
from pixelnerf_yolo_tpu.utils import camera
from pixelnerf_yolo_tpu.utils.image import image_to_tensor_balanced


def extra_args(parser):
    parser.add_argument("--input", "-I", type=str,
                        default=os.path.join("input", "car_normalize.png"),
                        help="Input image (normalized by scripts/preproc.py)")
    parser.add_argument("--output", "-O", type=str, default="output",
                        help="Output directory")
    parser.add_argument("--size", type=int, default=128,
                        help="Input image maxdim")
    parser.add_argument("--out_size", type=str, default="128",
                        help="Output image size, either 1 or 2 numbers")
    parser.add_argument("--focal", type=float, default=131.25,
                        help="Focal length")
    parser.add_argument("--radius", type=float, default=1.3,
                        help="Camera distance")
    parser.add_argument("--z_near", type=float, default=0.8)
    parser.add_argument("--z_far", type=float, default=1.8)
    parser.add_argument("--elevation", type=float, default=-10.0,
                        help="Elevation angle (negative is above)")
    parser.add_argument("--num_views", type=int, default=24,
                        help="Number of video frames")
    parser.add_argument("--fps", type=int, default=15, help="FPS of video")
    parser.add_argument("--gif", action="store_true",
                        help="Store gif instead of mp4")
    parser.add_argument("--no_vid", action="store_true",
                        help="Skip writing the video, only frames")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main():
    args, conf = parse_args(
        extra_args, default_expname="srn_car",
        default_data_format="srn",
    )
    args.resume = True

    model = make_model(conf.get_config("model"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64), jnp.float32)
    , load_pretrained=False,  # checkpoint load follows
    )
    variables = checkpoints.load_weights(args, variables)

    renderer = NeRFRenderer.from_conf(
        conf.get_config("renderer"), eval_batch_size=args.ray_batch_size
    )
    render_par = bind_parallel(
        renderer, model, gpus=args.gpu_id, simple_output=True
    )

    # load + resize input to size x size
    img = imageio.imread(args.input)[..., :3]
    import cv2

    img = cv2.resize(img, (args.size, args.size),
                     interpolation=cv2.INTER_AREA)
    image = image_to_tensor_balanced(img)  # (3, H, W) in [-1, 1]
    H = W = args.size

    out_sizes = list(map(int, args.out_size.split()))
    out_w = out_sizes[0]
    out_h = out_sizes[-1]

    focal = np.float32(args.focal)
    # dummy identity source camera (eval_real.py:127-129)
    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[2, 3] = args.radius

    cond = model.encode(
        variables,
        jnp.asarray(image[None][None]),
        jnp.asarray(cam_pose[None][None]),
        jnp.asarray(focal),
    )

    _coord_from_blender = np.asarray(camera.coord_from_blender())
    render_poses = np.stack(
        [
            _coord_from_blender
            @ camera.pose_spherical(angle, args.elevation, args.radius)
            for angle in np.linspace(-180, 180, args.num_views + 1)[:-1]
        ]
    )
    scale = out_w / W
    render_rays = np.asarray(
        camera.gen_rays(
            jnp.asarray(render_poses), out_w, out_h,
            jnp.asarray(focal * scale), args.z_near, args.z_far,
        )
    ).reshape(-1, 8)

    key = jax.random.PRNGKey(args.seed)
    frames = []
    for start in range(0, render_rays.shape[0], args.ray_batch_size):
        rays = jnp.asarray(render_rays[start : start + args.ray_batch_size])
        key, sub = jax.random.split(key)
        rgb, _ = render_par(variables, cond, rays[None], sub)
        frames.append(rgb[0])  # device array: one transfer at the end
    frames = np.clip(
        np.asarray(jnp.concatenate(frames, 0)).reshape(args.num_views, out_h, out_w, 3),
        0, 1,
    )

    os.makedirs(args.output, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.input))[0]
    frames_u8 = (frames * 255).astype(np.uint8)
    for i, fr in enumerate(frames_u8):
        imageio.imwrite(
            os.path.join(args.output, f"{base}_{i:04d}.png"), fr
        )
    if not args.no_vid:
        if args.gif:
            vid_path = os.path.join(args.output, base + "_vid.gif")
            imageio.mimwrite(vid_path, frames_u8, fps=args.fps)
        else:
            vid_path = os.path.join(args.output, base + "_vid.mp4")
            try:
                imageio.mimwrite(vid_path, frames_u8, fps=args.fps, quality=8)
            except (ValueError, ImportError):
                vid_path = vid_path[:-4] + ".gif"
                imageio.mimwrite(vid_path, frames_u8, fps=args.fps)
        print("Wrote", vid_path)


if __name__ == "__main__":
    main()
