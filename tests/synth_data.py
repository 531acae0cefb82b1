"""Synthetic on-disk datasets for hermetic tests (the reference's tests
require its real dataset on disk, SURVEY.md §4 — ours do not)."""

from __future__ import annotations

import os

import numpy as np


def _look_at(origin, target=np.zeros(3), up=np.array([0, 1, 0.0])):
    back = origin - target
    back = back / np.linalg.norm(back)
    right = np.cross(up, back)
    right = right / np.linalg.norm(right)
    upv = np.cross(back, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, upv, back, origin
    return c2w


def make_yolo_dataset(root, n_scenes=2, n_views=4, img_size=64, seed=0,
                      randomize=False):
    """YOLO-format dataset: per-scene image_%04d.png + extrinsic_%04d.npy +
    intrinsic_0000.npy + projected_bboxes_%04d.txt, with train/val/test.lst.

    randomize=True draws a per-scene random layout of 2-4 boxes mixing
    LARGE (0.2-0.35, the 32px-cell regime) and SMALL (0.06-0.12, the
    16px-cell regime) sizes — the multi-scale convergence recipe
    (conf/exp/yolo_2scale.conf) needs small boxes or the second scale has
    nothing to detect.  Default False keeps the fixed two-box layout the
    hermetic tests pin.
    """
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    scene_names = []
    K = np.array(
        [[float(img_size), 0, img_size / 2],
         [0, float(img_size), img_size / 2],
         [0, 0, 1]],
        dtype=np.float64,
    )
    for s in range(n_scenes):
        name = f"scene_{s:03d}"
        scene_names.append(name)
        sdir = os.path.join(root, name)
        os.makedirs(sdir, exist_ok=True)
        np.save(os.path.join(sdir, "intrinsic_0000.npy"), K)
        if randomize:
            scene_boxes = []
            palette = [[250, 60, 60], [60, 220, 80], [70, 110, 240],
                       [240, 200, 60]]
            for b in range(int(rng.integers(2, 5))):
                small = b % 2 == 1  # alternate large / small
                bw = float(rng.uniform(0.06, 0.12) if small
                           else rng.uniform(0.2, 0.35))
                bh = float(rng.uniform(0.06, 0.12) if small
                           else rng.uniform(0.2, 0.35))
                cx = float(rng.uniform(bw / 2 + 0.02, 1 - bw / 2 - 0.02))
                cy = float(rng.uniform(bh / 2 + 0.02, 1 - bh / 2 - 0.02))
                scene_boxes.append(
                    (int(rng.integers(0, 2)), cx, cy, bw, bh,
                     palette[b % len(palette)])
                )
        for v in range(n_views):
            theta = 2 * np.pi * v / n_views
            origin = np.array(
                [7 * np.sin(theta), 1.0, 7 * np.cos(theta)], dtype=np.float32
            )
            ext = np.linalg.inv(_look_at(origin)).astype(np.float64)
            # the loader negates row 0 (YOLODataset.py:114); store the
            # negated form so it recovers the true extrinsic
            ext_store = ext.copy()
            ext_store[0] = -ext_store[0]
            np.save(os.path.join(sdir, f"extrinsic_{v:04d}.npy"), ext_store)

            img = rng.integers(
                0, 255, size=(img_size, img_size, 3), dtype=np.uint8
            )
            # draw every labeled box so every label has visual signal
            # (an undrawn label caps recall for convergence experiments)
            boxes = scene_boxes if randomize else [
                (0, 0.5, 0.5, 0.25, 0.3, [250, 60, 60]),
                (1, 0.3, 0.6, 0.1, 0.12, [60, 220, 80]),
            ]
            for _, cx, cy, bw, bh, color in boxes:
                x0 = int((cx - bw / 2) * img_size)
                x1 = int((cx + bw / 2) * img_size)
                y0 = int((cy - bh / 2) * img_size)
                y1 = int((cy + bh / 2) * img_size)
                img[y0:y1, x0:x1] = color
            imageio.imwrite(os.path.join(sdir, f"image_{v:04d}.png"), img)

            with open(
                os.path.join(sdir, f"projected_bboxes_{v:04d}.txt"), "w"
            ) as f:
                for cls, cx, cy, bw, bh, _ in boxes:
                    f.write(f"{cls} {cx} {cy} {bw} {bh}\n")

    for split, names in [
        ("train", scene_names),
        ("val", scene_names[:1]),
        ("test", scene_names[:1]),
    ]:
        with open(os.path.join(root, f"{split}.lst"), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


def make_multi_object_dataset(root, stage="train", n_scenes=2, n_views=4,
                              img_size=32, seed=0):
    """Blender/NeRF-synthetic multi-object format: <root>/<stage>/<scene>/
    transforms.json (camera_angle_x + frames) and per-frame RGBA
    <name>_obj.png (reference MultiObjectDataset.py:14-117)."""
    import json

    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    for s in range(n_scenes):
        sdir = os.path.join(root, stage, f"scene_{s:03d}")
        os.makedirs(sdir, exist_ok=True)
        obj_color = rng.integers(30, 220, size=3, dtype=np.uint8)
        frames = []
        for v in range(n_views):
            theta = 2 * np.pi * v / n_views + 0.11
            origin = np.array(
                [6.5 * np.sin(theta), 1.0, 6.5 * np.cos(theta)],
                dtype=np.float64,
            )
            c2w = _look_at(origin)
            name = f"r_{v:03d}"
            frames.append(
                {
                    "file_path": f"./{name}",
                    "transform_matrix": c2w.tolist(),
                }
            )
            img = np.zeros((img_size, img_size, 4), np.uint8)
            r = img_size // 4
            cc = img_size // 2
            img[cc - r : cc + r, cc - r : cc + r, :3] = obj_color
            img[cc - r : cc + r, cc - r : cc + r, 3] = 255
            imageio.imwrite(os.path.join(sdir, f"{name}_obj.png"), img)
        with open(os.path.join(sdir, "transforms.json"), "w") as f:
            json.dump(
                {"camera_angle_x": 0.6911, "frames": frames}, f
            )
    return root


def make_dvr_dataset(root, stage="train", sub_format="shapenet", n_cats=2,
                     n_objs=2, n_views=4, img_size=32, seed=0,
                     list_prefix=None):
    """DVR/NMR-format dataset: <root>/<cat>/<prefix><stage>.lst plus per-
    object image/ mask/ cameras.npz.

    shapenet: world_mat_i = 4x4 world->cam extrinsic, camera_mat_i =
    normalized K (fx == fy).  dtu: world_mat_i = 3x4 projection K @ [R|t]
    plus scale_mat_i; no masks (reference DVRDataset.py:158-238).
    """
    import imageio.v2 as imageio

    if list_prefix is None:
        list_prefix = "new_" if sub_format == "dtu" else "softras_"
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    fx_n = 1.8  # normalized focal (scale_focal multiplies by W/2)
    for ci in range(n_cats):
        cat_dir = os.path.join(root, f"cat{ci:02d}")
        os.makedirs(cat_dir, exist_ok=True)
        names = []
        for oi in range(n_objs):
            name = f"obj_{oi:03d}"
            names.append(name)
            odir = os.path.join(cat_dir, name)
            os.makedirs(os.path.join(odir, "image"), exist_ok=True)
            if sub_format != "dtu":
                os.makedirs(os.path.join(odir, "mask"), exist_ok=True)
            cams = {}
            obj_color = rng.integers(30, 220, size=3, dtype=np.uint8)
            for v in range(n_views):
                theta = 2 * np.pi * v / n_views + 0.17
                origin = np.array(
                    [2.2 * np.sin(theta), 0.4, 2.2 * np.cos(theta)],
                    dtype=np.float64,
                )
                c2w = _look_at(origin).astype(np.float64)
                w2c = np.linalg.inv(c2w)
                if sub_format == "dtu":
                    K = np.array(
                        [[fx_n, 0, 0.02], [0, fx_n * 1.05, -0.03], [0, 0, 1]]
                    )
                    P = K @ w2c[:3]
                    cams[f"world_mat_{v}"] = P
                    S = np.eye(4)
                    S[0, 0] = S[1, 1] = S[2, 2] = 2.0
                    S[:3, 3] = [0.1, -0.05, 0.2]
                    cams[f"scale_mat_{v}"] = S
                else:
                    cams[f"world_mat_{v}"] = w2c
                    cams[f"camera_mat_{v}"] = np.array(
                        [[fx_n, 0, 0], [0, fx_n, 0], [0, 0, 1.0]]
                    )
                img = np.full((img_size, img_size, 3), 255, np.uint8)
                r = img_size // 4
                cc = img_size // 2
                img[cc - r : cc + r, cc - r : cc + r] = obj_color
                imageio.imwrite(
                    os.path.join(odir, "image", f"{v:04d}.png"), img
                )
                if sub_format != "dtu":
                    mask = np.zeros((img_size, img_size), np.uint8)
                    mask[cc - r : cc + r, cc - r : cc + r] = 255
                    imageio.imwrite(
                        os.path.join(odir, "mask", f"{v:04d}.png"), mask
                    )
            np.savez(os.path.join(odir, "cameras.npz"), **cams)
        with open(
            os.path.join(cat_dir, list_prefix + stage + ".lst"), "w"
        ) as f:
            f.write("\n".join(names) + "\n")
    return root


def make_srn_dataset(root, stage="train", n_objs=2, n_views=6, img_size=32,
                     seed=0):
    """SRN-format dataset: <root>_<stage>/obj/{intrinsics.txt,rgb/,pose/}."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    base = root + "_" + stage
    os.makedirs(base, exist_ok=True)
    for o in range(n_objs):
        # one color per OBJECT (view-consistent; a per-view color would be
        # unlearnable for a 3D-consistent field)
        obj_color = rng.integers(0, 200, size=3, dtype=np.uint8)
        odir = os.path.join(base, f"obj_{o:03d}")
        os.makedirs(os.path.join(odir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(odir, "pose"), exist_ok=True)
        with open(os.path.join(odir, "intrinsics.txt"), "w") as f:
            f.write(f"{img_size * 1.2} {img_size / 2} {img_size / 2} 0.\n")
            f.write("0. 0. 0.\n")
            f.write("1.\n")
            f.write(f"{img_size} {img_size}\n")
        for v in range(n_views):
            theta = 2 * np.pi * v / n_views
            origin = np.array(
                [1.3 * np.sin(theta), 0.3, 1.3 * np.cos(theta)],
                dtype=np.float32,
            )
            c2w = _look_at(origin)
            np.savetxt(
                os.path.join(odir, "pose", f"{v:06d}.txt"),
                c2w.reshape(1, 16),
            )
            img = np.full((img_size, img_size, 3), 255, dtype=np.uint8)
            # non-white blob in the middle (mask extraction needs it)
            r = img_size // 4
            cy = cx = img_size // 2
            img[cy - r : cy + r, cx - r : cx + r] = obj_color
            imageio.imwrite(
                os.path.join(odir, "rgb", f"{v:06d}.png"), img
            )
    return root
