"""DVR/NMR ShapeNet + DTU dataset.

Parity: /root/reference/src/data/DVRDataset.py:11-275 — split lists per
category, cameras.npz handling (ShapeNet world_mat_inv vs DTU projection
decomposition + scale_mat normalization), per-subformat coordinate
transforms, focal averaging for DTU.
"""

from __future__ import annotations

import glob
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .base import (
    area_resize_chw,
    image_to_tensor_balanced,
    imageio,
    mask_bbox,
    mask_to_tensor,
)


def decompose_projection(P: np.ndarray):
    """cv2.decomposeProjectionMatrix equivalent: P (3,4) -> K, R, cam center t
    (homogeneous 4-vector)."""
    if cv2 is not None:
        K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
        return K, R, t
    # numpy fallback: RQ decomposition of the left 3x3
    M = P[:, :3]
    # RQ via flipped QR
    Pm = np.flipud(np.eye(3))
    A = Pm @ M
    Q, R_ = np.linalg.qr(A.T)
    K = Pm @ R_.T @ Pm
    R = Pm @ Q.T
    # enforce positive diagonal of K
    sign = np.diag(np.sign(np.diag(K)))
    K = K @ sign
    R = sign @ R
    c = -np.linalg.inv(M) @ P[:, 3]
    t = np.concatenate([c, [1.0]])[:, None]
    return K, R, t


class DVRDataset:
    def __init__(
        self,
        path,
        stage="train",
        list_prefix="softras_",
        image_size=None,
        sub_format="shapenet",
        scale_focal=True,
        max_imgs=100000,
        z_near=1.2,
        z_far=4.0,
        skip_step=None,
        conf=None,
        rng=None,
    ):
        self.base_path = path
        assert os.path.exists(self.base_path)

        cats = [x for x in glob.glob(os.path.join(path, "*")) if os.path.isdir(x)]
        file_lists = [
            os.path.join(x, list_prefix + stage + ".lst") for x in cats
        ]

        all_objs = []
        for file_list in file_lists:
            if not os.path.exists(file_list):
                continue
            base_dir = os.path.dirname(file_list)
            cat = os.path.basename(base_dir)
            with open(file_list, "r") as f:
                objs = [
                    (cat, os.path.join(base_dir, x.strip()))
                    for x in f.readlines()
                ]
            all_objs.extend(objs)

        self.all_objs = all_objs
        self.stage = stage
        self.image_to_tensor = image_to_tensor_balanced
        print(
            "Loading DVR dataset", self.base_path, "stage", stage,
            len(self.all_objs), "objs", "type:", sub_format,
        )

        self.image_size = image_size
        if sub_format == "dtu":
            # (DVRDataset.py:81-89)
            self._coord_trans_world = np.diag(
                np.array([1, -1, -1, 1], dtype=np.float32)
            )
            self._coord_trans_cam = np.diag(
                np.array([1, -1, -1, 1], dtype=np.float32)
            )
        else:
            self._coord_trans_world = np.array(
                [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                dtype=np.float32,
            )
            self._coord_trans_cam = np.diag(
                np.array([1, -1, -1, 1], dtype=np.float32)
            )
        self.sub_format = sub_format
        self.scale_focal = scale_focal
        self.max_imgs = max_imgs
        self.z_near = z_near
        self.z_far = z_far
        self.lindisp = False
        self._rng = rng if rng is not None else np.random.default_rng()

    def __len__(self):
        return len(self.all_objs)

    def __getitem__(self, index):
        cat, root_dir = self.all_objs[index]

        rgb_paths = sorted(
            x
            for x in glob.glob(os.path.join(root_dir, "image", "*"))
            if x.endswith((".jpg", ".png"))
        )
        mask_paths = sorted(glob.glob(os.path.join(root_dir, "mask", "*.png")))
        if len(mask_paths) == 0:
            mask_paths = [None] * len(rgb_paths)

        if len(rgb_paths) <= self.max_imgs:
            sel_indices = np.arange(len(rgb_paths))
        else:
            sel_indices = self._rng.choice(
                len(rgb_paths), self.max_imgs, replace=False
            )
            rgb_paths = [rgb_paths[i] for i in sel_indices]
            mask_paths = [mask_paths[i] for i in sel_indices]

        all_cam = np.load(os.path.join(root_dir, "cameras.npz"))

        all_imgs, all_poses, all_masks, all_bboxes = [], [], [], []
        focal = None
        fx = fy = cx = cy = 0.0
        mask_path = None

        for idx, (rgb_path, mask_path) in enumerate(zip(rgb_paths, mask_paths)):
            i = sel_indices[idx]
            img = imageio.imread(rgb_path)[..., :3]
            if self.scale_focal:
                x_scale = img.shape[1] / 2.0
                y_scale = img.shape[0] / 2.0
                xy_delta = 1.0
            else:
                x_scale = y_scale = 1.0
                xy_delta = 0.0

            mask = None
            if mask_path is not None:
                mask = imageio.imread(mask_path)
                if mask.ndim == 2:
                    mask = mask[..., None]
                mask = mask[..., :1]

            if self.sub_format == "dtu":
                P = all_cam["world_mat_" + str(i)][:3]
                K, R, t = decompose_projection(P)
                K = K / K[2, 2]
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = R.transpose()
                pose[:3, 3] = (t[:3] / t[3])[:, 0]
                scale_mtx = (
                    all_cam["scale_mat_" + str(i)]
                    if "scale_mat_" + str(i) in all_cam
                    else None
                )
                if scale_mtx is not None:
                    norm_trans = scale_mtx[:3, 3:]
                    norm_scale = np.diagonal(scale_mtx[:3, :3])[..., None]
                    pose[:3, 3:] -= norm_trans
                    pose[:3, 3:] /= norm_scale
                fx += K[0, 0] * x_scale
                fy += K[1, 1] * y_scale
                cx += (K[0, 2] + xy_delta) * x_scale
                cy += (K[1, 2] + xy_delta) * y_scale
            else:
                wmat_inv_key = "world_mat_inv_" + str(i)
                wmat_key = "world_mat_" + str(i)
                if wmat_inv_key in all_cam:
                    extr_inv_mtx = all_cam[wmat_inv_key]
                else:
                    extr_inv_mtx = all_cam[wmat_key]
                    if extr_inv_mtx.shape[0] == 3:
                        extr_inv_mtx = np.vstack(
                            (extr_inv_mtx, np.array([0, 0, 0, 1]))
                        )
                    extr_inv_mtx = np.linalg.inv(extr_inv_mtx)
                intr_mtx = all_cam["camera_mat_" + str(i)]
                fxi, fyi = intr_mtx[0, 0], intr_mtx[1, 1]
                assert abs(fxi - fyi) < 1e-9
                fxi = fxi * x_scale
                if focal is None:
                    focal = fxi
                else:
                    assert abs(fxi - focal) < 1e-5
                pose = extr_inv_mtx

            pose = (
                self._coord_trans_world
                @ pose.astype(np.float32)
                @ self._coord_trans_cam
            )

            all_imgs.append(self.image_to_tensor(img))
            all_poses.append(pose)
            if mask is not None:
                all_masks.append(mask_to_tensor(mask))
                all_bboxes.append(mask_bbox(mask, rgb_path))

        c = None
        if self.sub_format != "shapenet":
            n = len(rgb_paths)
            focal = np.array([fx / n, fy / n], dtype=np.float32)
            c = np.array([cx / n, cy / n], dtype=np.float32)
            all_bboxes = None
        else:
            focal = np.float32(focal)
            all_bboxes = np.stack(all_bboxes) if all_bboxes else None

        all_imgs = np.stack(all_imgs)
        all_poses = np.stack(all_poses)
        all_masks = np.stack(all_masks) if all_masks else None

        if self.image_size is not None and all_imgs.shape[-2:] != tuple(
            self.image_size
        ):
            scale = self.image_size[0] / all_imgs.shape[-2]
            focal = focal * scale
            if self.sub_format != "shapenet":
                c = c * scale
            elif all_bboxes is not None:
                all_bboxes = all_bboxes * scale
            all_imgs = area_resize_chw(all_imgs, tuple(self.image_size))
            if all_masks is not None:
                all_masks = area_resize_chw(all_masks, tuple(self.image_size))

        result = {
            "path": root_dir,
            "img_id": index,
            "focal": focal,
            "images": all_imgs,
            "poses": all_poses,
        }
        if all_masks is not None:
            result["masks"] = all_masks
        if self.sub_format != "shapenet":
            result["c"] = c
        else:
            result["bbox"] = all_bboxes
        return result
