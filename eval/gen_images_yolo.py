"""Interactive detection visualization: prompts NMS thresholds in a loop
and writes annotated panels.

Parity: /root/reference/eval/gen_images_yolo.py:24-129.
"""

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import imageio
import numpy as np

from pixelnerf_yolo_tpu.config.args import parse_args
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer
from pixelnerf_yolo_tpu.utils.misc import count_parameters


def extra_args(parser):
    parser.add_argument("--batch_size", "-B", type=int, default=4,
                        help="Object batch size ('SB')")
    parser.add_argument("--nviews", "-V", type=str, default="1",
                        help="Number of source views (multiview)")
    parser.add_argument("--freeze_enc", action="store_true", default=None)
    parser.add_argument("--no_bbox_step", type=int, default=100000)
    parser.add_argument("--fixed_test", action="store_true", default=None)
    parser.add_argument("--subset", "-S", type=int, default=0,
                        help="Subset in data to use")
    parser.add_argument("--source", "-P", type=str, default="0",
                        help="Source view(s) in image, in increasing order.")
    parser.add_argument("--dest", type=int, default=0,
                        help="Destination view to use")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def main():
    args, conf = parse_args(extra_args, training=True,
                            default_ray_batch_size=128)

    dset, val_dset, test_dset = get_split_dataset(
        args.dataset_format, args.datadir, conf=conf
    )
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf, lindisp=getattr(dset, "lindisp", False))
    render_par = bind_parallel(renderer, model, gpus=args.gpu_id)
    nviews = list(map(int, args.nviews.split()))
    args.resume = True
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, nviews
    )
    print("Number of model parameters:",
          count_parameters(trainer.variables["params"]))

    print("\n------------ Generating images ------------")
    test_data_loader = DataLoader(test_dset, batch_size=1, shuffle=False)
    data = next(iter(test_data_loader))
    source = np.array(args.source.split(), dtype="int")
    dest = args.dest

    while True:
        try:
            nmst = float(input("Enter nmst: "))
            nmsiou = float(input("Enter nmsiou: "))
        except EOFError:
            break
        except ValueError:
            # any non-numeric input (e.g. "q") exits cleanly — the
            # reference would crash on the float() here
            print("non-numeric input, exiting")
            break

        trainer.nms_threshold = nmst
        trainer.nms_iou_threshold = nmsiou

        vis, _ = trainer.vis_step(data, idx=0, srcs=source, dest=dest)

        os.makedirs(os.path.join(args.visual_path, "yolo_vis"), exist_ok=True)
        vis_u8 = (np.clip(vis, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(
            os.path.join(
                args.visual_path, "yolo_vis",
                "{:04}_{:04}_vis_{}_{}.png".format(
                    args.subset, dest, nmsiou, nmst
                ),
            ),
            vis_u8,
        )


if __name__ == "__main__":
    main()
