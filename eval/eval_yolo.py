"""Detection evaluation: precision/recall/F1 over the test split.

Parity: /root/reference/eval/eval_yolo.py:25-94 (same bootstrap as
train/train.py, then trainer.metric_step with print_hc).
"""

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

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
    parser.add_argument("--freeze_enc", action="store_true", default=None,
                        help="Freeze encoder weights and only train MLP")
    parser.add_argument("--no_bbox_step", type=int, default=100000,
                        help="Step to stop using bbox sampling")
    parser.add_argument("--fixed_test", action="store_true", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--host_nms", action="store_true",
                        help="Use the reference-exact host list NMS for "
                        "metrics instead of the padded device NMS")
    parser.add_argument("--calibrate_scales", default=None,
                        help="Comma-separated confidence grid (e.g. "
                        "'0.45,0.6,0.75,0.9'): render the metric "
                        "protocol once, then grid-search per-scale "
                        "confidence pre-filters (yolo."
                        "nms_threshold_per_scale) and report each "
                        "combo's F1 + mAP@0.5.  Eval-time calibration "
                        "for multi-scale confs — no retrain.")
    return parser


def main():
    args, conf = parse_args(extra_args, training=True,
                            default_ray_batch_size=128)

    dset, val_dset, test_dset = get_split_dataset(
        args.dataset_format, args.datadir, conf=conf
    )
    print(
        "dset z_near {}, z_far {}, lindisp {}".format(
            dset.z_near, dset.z_far, getattr(dset, "lindisp", "N/A")
        )
    )

    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf, lindisp=getattr(dset, "lindisp", False))
    render_par = bind_parallel(renderer, model, gpus=args.gpu_id)

    nviews = list(map(int, args.nviews.split()))
    args.resume = True  # evaluation always loads the trained weights
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, nviews
    )
    print("Number of model parameters:",
          count_parameters(trainer.variables["params"]))

    print("\n------------ Eval ------------")
    test_data_loader = DataLoader(test_dset, batch_size=1, shuffle=False)

    if args.calibrate_scales:
        grid = [float(t) for t in args.calibrate_scales.split(",")]
        results, best = trainer.calibrate_scales(test_data_loader, grid)
        print("taus\tP\tR\tF1\tmAP@0.5\tTP/FP/FN")
        for r in sorted(results, key=lambda r: (-r["f1"], -r["map50"])):
            print("{}\t{:.3f}\t{:.3f}\t{:.3f}\t{:.4f}\t{}/{}/{}".format(
                ",".join(f"{t:g}" for t in r["taus"]), r["precision"],
                r["recall"], r["f1"], r["map50"], r["tp"], r["fp"],
                r["fn"],
            ))
        print("best per-scale thresholds: [{}]  F1 {:.3f}  mAP@0.5 "
              "{:.4f}  (set yolo.nms_threshold_per_scale)".format(
                  ", ".join(f"{t:g}" for t in best["taus"]),
                  best["f1"], best["map50"]))
        return
    # the north star pins mAP@0.5 (BASELINE.md); the reference only
    # reports single-confidence P/R/F1 (util.py:765-805) — report both,
    # from ONE rendering pass over the metric protocol
    (precision, recall, f1), (map50, per_class) = trainer.metric_and_map_step(
        test_data_loader, iou_threshold=0.5, print_hc=True
    )
    print("Precision\tRecall\tF1\tmAP@0.5")
    print("{}\t{}\t{}\t{:.4f}".format(precision, recall, f1, map50))
    for cls, ap in per_class.items():
        print("  AP@0.5 class {}: {:.4f}".format(cls, ap))


if __name__ == "__main__":
    main()
