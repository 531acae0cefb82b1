"""Copy the canonical fixed eval view lists from a reference checkout.

The reference ships fixed source-view index files (viewlist/src_dvr.txt,
src_gen.txt, srn_eval_views.txt, 2obj_eval_views.txt) that make eval
deterministic (/root/reference/viewlist/).  They are dataset metadata, not
code; rather than vendoring ~34k lines of indices into this repo, this tool
copies them from any pixel-nerf(-yolo) checkout:

  python scripts/make_viewlists.py --reference /path/to/pixel-nerf-yolo
"""

import argparse
import os
import shutil

FILES = [
    "src_dvr.txt",
    "src_gen.txt",
    "srn_eval_views.txt",
    "2obj_eval_views.txt",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", type=str, required=True,
                        help="path to a pixel-nerf / pixel-nerf-yolo checkout")
    parser.add_argument("--out", type=str,
                        default=os.path.join(
                            os.path.dirname(__file__), "..", "viewlist"
                        ))
    args = parser.parse_args()

    src_dir = os.path.join(args.reference, "viewlist")
    os.makedirs(args.out, exist_ok=True)
    for name in FILES:
        src = os.path.join(src_dir, name)
        if not os.path.exists(src):
            print("missing in reference:", name)
            continue
        shutil.copyfile(src, os.path.join(args.out, name))
        print("copied", name)


if __name__ == "__main__":
    main()
