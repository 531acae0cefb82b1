"""Camera and ray-generation math (pure jnp, jit-friendly).

TPU-native re-implementation of the reference geometry layer
(/root/reference/src/util/util.py:86-351,808-876).  All functions are pure,
take/return jnp arrays, use static shapes, and are safe to call under jit.
Vectorized over batch where the reference used host loops
(gen_rays_yolo's per-image loop, util.py:845-871).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """Append 1 to the last axis: (..., 3) -> (..., 4).

    Parity: util.py:86-92.
    """
    return jnp.concatenate(
        [points, jnp.ones_like(points[..., :1])], axis=-1
    )


def gen_grid(*args, ij_indexing: bool = False) -> jnp.ndarray:
    """N-d grid of linspace points; each arg is (lo, hi, sz).

    Returns (prod sz_i, len(args)).  Parity: util.py:95-112.
    """
    axes = [np.linspace(lo, hi, sz, dtype=np.float32) for lo, hi, sz in args]
    mesh = np.meshgrid(*axes, indexing="ij" if ij_indexing else "xy")
    return jnp.asarray(np.vstack(mesh).reshape(len(args), -1).T)


def _expand_focal(f, c, width: int, height: int):
    """Normalize focal/principal-point formats to ((fx, fy), (cx, cy))."""
    if c is None:
        c = jnp.asarray([width * 0.5, height * 0.5], dtype=jnp.float32)
    else:
        c = jnp.asarray(c, dtype=jnp.float32).squeeze()
        if c.ndim == 0:
            c = jnp.stack([c, c])
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = jnp.stack([f, f])
    elif f.shape[-1] == 1:
        f = jnp.concatenate([f, f], axis=-1)
    return f, c


@partial(jax.jit, static_argnums=(0, 1))
def unproj_map(width: int, height: int, f, c=None) -> jnp.ndarray:
    """Per-pixel unit ray directions in the camera frame (X, -Y, -Z).

    Output [y, x] holds the unit direction of that pixel's camera ray.
    Parity: util.py:115-145 (OpenGL-ish camera: x right, y up, z backward).
    """
    f, c = _expand_focal(f, c, width, height)
    x = (jnp.arange(width, dtype=jnp.float32) - c[0]) / f[0]
    y = (jnp.arange(height, dtype=jnp.float32) - c[1]) / f[1]
    X, Y = jnp.meshgrid(x, y, indexing="xy")  # (H, W)
    Z = jnp.ones_like(X)
    unproj = jnp.stack([X, -Y, -Z], axis=-1)  # (H, W, 3)
    return unproj / jnp.linalg.norm(unproj, axis=-1, keepdims=True)


@partial(jax.jit, static_argnums=(1, 2), static_argnames=("ndc",))
def gen_rays(
    poses: jnp.ndarray,
    width: int,
    height: int,
    focal,
    z_near,
    z_far,
    c=None,
    ndc: bool = False,
) -> jnp.ndarray:
    """Camera rays for NeRF mode.

    :param poses (B, 4, 4) camera-to-world
    :return (B, H, W, 8) = [origin(3), unit dir(3), near(1), far(1)]
    Parity: util.py:240-278.
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    num_images = poses.shape[0]
    focal = jnp.asarray(focal, dtype=jnp.float32).squeeze()
    dirs_cam = unproj_map(width, height, focal, c=c)  # (H, W, 3)
    centers = jnp.broadcast_to(
        poses[:, None, None, :3, 3], (num_images, height, width, 3)
    )
    # rotate camera-frame dirs to world: R @ d
    raydirs = jnp.einsum(
        "bij,hwj->bhwi", poses[:, :3, :3], dirs_cam, precision="highest"
    )

    if ndc:
        z_near, z_far = 0.0, 1.0
        centers, raydirs = ndc_rays(width, height, focal, 1.0, centers, raydirs)

    nears = jnp.full((num_images, height, width, 1), z_near, dtype=jnp.float32)
    fars = jnp.full((num_images, height, width, 1), z_far, dtype=jnp.float32)
    return jnp.concatenate([centers, raydirs, nears, fars], axis=-1)


def ndc_rays(width, height, focal, near, rays_o, rays_d):
    """Shift rays to the z=-near plane and map to NDC space.

    Standard NeRF NDC transform (bmild/nerf).  The reference calls an
    undefined ``ndc_rays`` for this path (util.py:262 — dead code as shipped,
    ndc is never enabled in its configs); we provide the real formula.
    """
    focal = jnp.asarray(focal, dtype=jnp.float32)
    fx = focal if focal.ndim == 0 else focal.reshape(-1)[0]
    fy = focal if focal.ndim == 0 else focal.reshape(-1)[-1]
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -fx * 2.0 / width * rays_o[..., 0] / rays_o[..., 2]
    o1 = -fy * 2.0 / height * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -fx * 2.0 / width * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -fy * 2.0 / height * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]
    return (
        jnp.stack([o0, o1, o2], axis=-1),
        jnp.stack([d0, d1, d2], axis=-1),
    )


@partial(jax.jit, static_argnums=(1, 2))
def gen_rays_yolo(
    poses: jnp.ndarray,
    width: int,
    height: int,
    focal,
    c,
    z_near,
    z_far,
) -> jnp.ndarray:
    """Camera rays for YOLO mode.

    Semantics parity with util.py:808-876 (each a deliberate reference
    behavior, see SURVEY.md §7 "quirks"):
      * pixel centers at +0.49 (not +0.5)
      * directions via K^-1 then rotated by inverse extrinsics — NOT normalized
      * poses here are world-to-camera extrinsics; origins come from the
        inverse extrinsic translation
    Vectorized over the batch (the reference loops per image on host).
    :param poses (B, 4, 4) world-to-camera extrinsic matrices
    :return (B, H, W, 8)
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    B = poses.shape[0]
    focal = jnp.asarray(focal, dtype=jnp.float32).reshape(-1)
    c = jnp.asarray(c, dtype=jnp.float32).reshape(-1)

    K = jnp.array(
        [
            [focal[0], 0.0, c[0]],
            [0.0, focal[1], c[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    K_inv = jnp.linalg.inv(K)

    gx = jnp.arange(width, dtype=jnp.float32) + 0.49
    gy = jnp.arange(height, dtype=jnp.float32) + 0.49
    X, Y = jnp.meshgrid(gx, gy, indexing="xy")  # (H, W)
    pix = jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)  # (H, W, 3)
    dirs_cam = jnp.einsum("ij,hwj->hwi", K_inv, pix, precision="highest")  # (H, W, 3)

    inv_ext = jnp.linalg.inv(poses)  # (B, 4, 4)
    dirs_world = jnp.einsum(
        "bij,hwj->bhwi", inv_ext[:, :3, :3], dirs_cam, precision="highest"
    )
    origins = jnp.broadcast_to(inv_ext[:, None, None, :3, 3], (B, height, width, 3))

    nears = jnp.full((B, height, width, 1), z_near, dtype=jnp.float32)
    fars = jnp.full((B, height, width, 1), z_far, dtype=jnp.float32)
    return jnp.concatenate([origins, dirs_world, nears, fars], axis=-1)


# ---------------------------------------------------------------------------
# numpy twins for the host-side training assembly.  The trainers build ray
# batches on the host every step; calling the jitted device versions there
# costs a device round-trip per step (through the axon relay ~65 ms each)
# and serializes the dispatch pipeline.  Same math, numpy arithmetic
# (equivalence tested in tests/test_camera.py).
# ---------------------------------------------------------------------------


def gen_rays_np(poses, width: int, height: int, focal, z_near, z_far,
                c=None) -> np.ndarray:
    """Host-side gen_rays (no NDC; trainers never enable it)."""
    poses = np.asarray(poses, dtype=np.float32)
    f = np.asarray(focal, dtype=np.float32).squeeze()
    if f.ndim == 0:
        f = np.stack([f, f])
    elif f.shape[-1] == 1:
        f = np.concatenate([f, f], axis=-1)
    if c is None:
        cc = np.asarray([width * 0.5, height * 0.5], dtype=np.float32)
    else:
        cc = np.asarray(c, dtype=np.float32).squeeze()
        if cc.ndim == 0:
            cc = np.stack([cc, cc])
    x = (np.arange(width, dtype=np.float32) - cc[0]) / f[0]
    y = (np.arange(height, dtype=np.float32) - cc[1]) / f[1]
    X, Y = np.meshgrid(x, y, indexing="xy")
    unproj = np.stack([X, -Y, -np.ones_like(X)], axis=-1)
    dirs_cam = unproj / np.linalg.norm(unproj, axis=-1, keepdims=True)

    B = poses.shape[0]
    centers = np.broadcast_to(
        poses[:, None, None, :3, 3], (B, height, width, 3)
    )
    raydirs = np.einsum("bij,hwj->bhwi", poses[:, :3, :3], dirs_cam)
    nears = np.full((B, height, width, 1), z_near, dtype=np.float32)
    fars = np.full((B, height, width, 1), z_far, dtype=np.float32)
    return np.concatenate(
        [centers, raydirs.astype(np.float32), nears, fars], axis=-1
    )


def gen_rays_yolo_np(poses, width: int, height: int, focal, c, z_near,
                     z_far) -> np.ndarray:
    """Host-side gen_rays_yolo (same quirks: +0.49 centers, unnormalized
    dirs, inverse extrinsics)."""
    poses = np.asarray(poses, dtype=np.float32)
    B = poses.shape[0]
    f = np.asarray(focal, dtype=np.float32).reshape(-1)
    cc = np.asarray(c, dtype=np.float32).reshape(-1)
    K = np.array(
        [[f[0], 0.0, cc[0]], [0.0, f[1], cc[1]], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    K_inv = np.linalg.inv(K)
    gx = np.arange(width, dtype=np.float32) + 0.49
    gy = np.arange(height, dtype=np.float32) + 0.49
    X, Y = np.meshgrid(gx, gy, indexing="xy")
    pix = np.stack([X, Y, np.ones_like(X)], axis=-1)
    dirs_cam = np.einsum("ij,hwj->hwi", K_inv, pix)
    inv_ext = np.linalg.inv(poses)
    dirs_world = np.einsum("bij,hwj->bhwi", inv_ext[:, :3, :3], dirs_cam)
    origins = np.broadcast_to(
        inv_ext[:, None, None, :3, 3], (B, height, width, 3)
    )
    nears = np.full((B, height, width, 1), z_near, dtype=np.float32)
    fars = np.full((B, height, width, 1), z_far, dtype=np.float32)
    return np.concatenate(
        [origins, dirs_world.astype(np.float32), nears, fars], axis=-1
    )


# ---------------------------------------------------------------------------
# Pose constructors (host-side, tiny) — parity with util.py:148-351
# ---------------------------------------------------------------------------


def coord_from_blender() -> jnp.ndarray:
    return jnp.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )


def coord_to_blender() -> jnp.ndarray:
    return jnp.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )


def look_at(origin, target, world_up=None) -> np.ndarray:
    """4x4 camera-to-world for a camera at ``origin`` looking at ``target``."""
    if world_up is None:
        world_up = np.array([0, 1, 0], dtype=np.float32)
    origin = np.asarray(origin, dtype=np.float32)
    back = origin - np.asarray(target, dtype=np.float32)
    back /= np.linalg.norm(back)
    right = np.cross(world_up, back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    c2w = np.empty((4, 4), dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = back
    c2w[:3, 3] = origin
    c2w[3, :] = [0, 0, 0, 1]
    return c2w


def trans_t(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def rot_phi(phi: float) -> np.ndarray:
    cp, sp = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, cp, -sp, 0], [0, sp, cp, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )


def rot_theta(th: float) -> np.ndarray:
    ct, st = np.cos(th), np.sin(th)
    return np.array(
        [[ct, 0, -st, 0], [0, 1, 0, 0], [st, 0, ct, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )


def rot_kappa(kappa: float) -> np.ndarray:
    ck, sk = np.cos(kappa), np.sin(kappa)
    return np.array(
        [[ck, -sk, 0, 0], [sk, ck, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )


_SPHERICAL_FLIP = np.array(
    [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
)
_SPHERICAL2_FLIP = np.array(
    [[-1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
)


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """360-degree orbit pose (NeRF convention).  Parity: util.py:323-337."""
    c2w = trans_t(radius)
    c2w = rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
    return _SPHERICAL_FLIP @ c2w


def pose_spherical2(theta: float, kappa: float, radius: float) -> np.ndarray:
    """Parity: util.py:340-351."""
    c2w = trans_t(radius)
    c2w = rot_kappa(kappa / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
    return _SPHERICAL2_FLIP @ c2w


# IDR's hard-coded DTU fly-through keyframes: times, camera quaternions
# [w,x,y,z] (periodic — last == first) and radial scales.  The reference
# ships this trajectory DEAD (/root/reference/eval/gen_video.py:131-169
# sits under `if False:`); here it is a live, opt-in alternative to the
# orbit (eval/gen_video.py --dtu_trajectory).
_DTU_TRAJ_T = np.array([0, 2, 3, 5, 6], dtype=np.float32)
_DTU_TRAJ_QUAT = np.array(
    [
        [0.9698, 0.2121, 0.1203, -0.0039],
        [0.7020, 0.1578, 0.4525, 0.5268],
        [0.6766, 0.3176, 0.5179, 0.4161],
        [0.9085, 0.4020, 0.1139, -0.0025],
        [0.9698, 0.2121, 0.1203, -0.0039],
    ],
    dtype=np.float32,
)
_DTU_TRAJ_SCALE = np.array([2.0] * 5, dtype=np.float32)


def dtu_trajectory(num_views: int) -> np.ndarray:
    """IDR DTU fly-through poses (F, 4, 4), F = 6 * max(num_views // 5, 1).

    Periodic cubic-spline interpolation of the quaternion keyframes above
    (renormalized per frame), camera centered at R[:, 2] * scale — the
    semantics of the reference's dead block
    (/root/reference/eval/gen_video.py:136-169), made live.  (The dead
    block would have crashed its own reshape: it emits n_inter*6 frames
    but records num_views = n_inter*5; callers here use the returned
    frame count.)
    """
    from scipy.interpolate import CubicSpline

    n_inter = max(num_views // 5, 1)
    # endpoint=False: the spline is periodic (last keyframe == first),
    # so including t = T[-1] would duplicate frame 0 at the loop seam
    t_out = np.linspace(
        _DTU_TRAJ_T[0], _DTU_TRAJ_T[-1], n_inter * int(_DTU_TRAJ_T[-1]),
        endpoint=False,
    ).astype(np.float32)
    s_new = CubicSpline(_DTU_TRAJ_T, _DTU_TRAJ_SCALE, bc_type="periodic")(
        t_out
    )
    q_new = CubicSpline(_DTU_TRAJ_T, _DTU_TRAJ_QUAT, bc_type="periodic")(
        t_out
    )
    q_new = q_new / np.linalg.norm(q_new, 2, axis=1)[:, None]

    R = np.asarray(quat_to_rot(jnp.asarray(q_new, jnp.float32)))
    poses = np.tile(np.eye(4, dtype=np.float32), (len(t_out), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = R[:, :, 2] * s_new[:, None].astype(np.float32)
    return poses


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize quaternions (B, 4) [w,x,y,z] -> rotation matrices (B, 3, 3).

    Parity: util.py:512-532.
    """
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qr, qi, qj, qk = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qj**2 + qk**2)
    r01 = 2 * (qj * qi - qk * qr)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qj * qi + qk * qr)
    r11 = 1 - 2 * (qi**2 + qk**2)
    r12 = 2 * (qj * qk - qi * qr)
    r20 = 2 * (qk * qi - qj * qr)
    r21 = 2 * (qj * qk + qi * qr)
    r22 = 1 - 2 * (qi**2 + qj**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (B, 3, 3) -> quaternions (B, 4).  Parity: util.py:535-556."""
    w = jnp.sqrt(1.0 + R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]) / 2.0
    x = (R[:, 2, 1] - R[:, 1, 2]) / (4 * w)
    y = (R[:, 0, 2] - R[:, 2, 0]) / (4 * w)
    z = (R[:, 1, 0] - R[:, 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)
