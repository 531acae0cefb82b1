"""Training entry point.

Flag and behavior parity with /root/reference/train/train.py:21-95:
extra flags -B/-V/--freeze_enc/--no_bbox_step/--fixed_test, the NaN-abort
stop, and the early-restart supervisor loop (rebuild everything with
resume=False when the trainer reports "no_vis").
"""

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

from pixelnerf_yolo_tpu.config.args import parse_args
from pixelnerf_yolo_tpu.data import get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel, make_train_mesh
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer


def extra_args(parser):
    parser.add_argument(
        "--batch_size", "-B", type=int, default=4, help="Object batch size ('SB')"
    )
    parser.add_argument(
        "--nviews",
        "-V",
        type=str,
        default="1",
        help="Number of source views (multiview); '1 2 3' for random",
    )
    parser.add_argument(
        "--freeze_enc",
        action="store_true",
        default=None,
        help="Freeze encoder weights and only train MLP",
    )
    parser.add_argument(
        "--no_bbox_step",
        type=int,
        default=100000,
        help="Step to stop using bbox sampling",
    )
    parser.add_argument(
        "--fixed_test",
        action="store_true",
        default=None,
        help="Freeze encoder weights and only train MLP",
    )
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")
    parser.add_argument(
        "--model_parallel",
        type=int,
        default=1,
        help="Tensor-parallel degree: shard the field MLP's hidden dim "
        "over a 'model' mesh axis (Megatron-style fc_0 column- / fc_1 "
        "row-parallel; must divide the device count and d_hidden)",
    )
    parser.add_argument("--host_nms", action="store_true",
                        help="Use the reference-exact host list NMS for "
                        "metric intervals instead of the padded device NMS")
    parser.add_argument(
        "--debug_nans",
        action="store_true",
        help="Enable jax NaN checking (the analog of the reference's "
        "pervasive NaN debug prints; slows training)",
    )
    return parser


def build_and_train(args, conf, resume):
    args.resume = resume
    dset, val_dset, _ = get_split_dataset(
        args.dataset_format, args.datadir, conf=conf
    )
    print(
        "dset z_near {}, z_far {}, lindisp {}".format(
            dset.z_near, dset.z_far, getattr(dset, "lindisp", False)
        )
    )

    model = make_model(
        conf.get_config("model"),
        stop_encoder_grad=bool(args.freeze_enc),
    )
    if args.freeze_enc:
        print("Encoder frozen")

    renderer = make_renderer(conf, lindisp=getattr(dset, "lindisp", False))
    # ('data', 'rays'[, 'model']) training mesh: the trainers shard their
    # jitted update over it (scenes/chunks on 'data', rays on 'rays', the
    # field MLP's hidden dim on 'model' when --model_parallel > 1); render
    # calls shard rays over all non-model axes
    mesh = make_train_mesh(
        n_devices=len(args.gpu_id), batch_size=args.batch_size,
        model_parallel=getattr(args, "model_parallel", 1),
    )
    render_par = bind_parallel(renderer, model, gpus=args.gpu_id, mesh=mesh)

    nviews = list(map(int, args.nviews.split()))
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, nviews
    )
    return trainer.start()


def main():
    args, conf = parse_args(
        extra_args,
        training=True,
        default_ray_batch_size=128,
    )
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    stop = build_and_train(args, conf, resume=args.resume)
    # early-restart supervisor (train/train.py:86-95)
    while stop == "no_vis":
        print("Restarting training from scratch (early_restart)")
        stop = build_and_train(args, conf, resume=False)
    if stop == "nan":
        print("Stopped after NaN loss")


if __name__ == "__main__":
    main()
