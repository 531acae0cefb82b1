"""Multi-chip parallelism: ray sharding over a jax.sharding Mesh.

The reference scales with single-process torch DataParallel, scattering the
ray batch along dim 1 and replicating the module (+ its captured encoder
latents) per GPU (/root/reference/src/render/nerf.py:360-377,
src/render/yolo.py:116-121).  The TPU-native equivalent: a 1-D device mesh
with a "rays" axis; rays are sharded over it, params/latents replicated,
and XLA inserts the all-gather of rendered chunks over ICI (the DP gather).

``bind_parallel`` returns a callable with the same role as the reference's
``_RenderWrapper`` (+DataParallel): call it with (variables, cond, rays,
rng) and get rendered outputs, transparently sharded when the mesh has more
than one device.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
DATA_AXIS = "data"


def make_mesh(devices=None, n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ray axis.  Multi-pod meshes would add a DCN axis
    here; single-axis keeps all collectives on ICI (SURVEY.md §2.9)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def make_train_mesh(
    n_devices: Optional[int] = None,
    batch_size: int = 1,
    devices=None,
) -> Mesh:
    """2-D ('data', 'rays') training mesh.

    The 'data' axis shards the scene superbatch (SB) — the encoder convs
    parallelize over it; the 'rays' axis shards the ray batch within each
    scene (the reference's DataParallel dim=1 scatter,
    /root/reference/src/render/nerf.py:373-377).  The data-axis size is the
    largest divisor of n_devices that divides batch_size, so SB always
    shards evenly; everything else goes to rays.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    n = devices.size
    data = 1
    for d in range(min(n, max(batch_size, 1)), 0, -1):
        if n % d == 0 and batch_size % d == 0:
            data = d
            break
    return Mesh(devices.reshape(data, n // data), (DATA_AXIS, RAY_AXIS))


def _pad_to_multiple(x: jnp.ndarray, axis: int, multiple: int):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, mode="edge"), n


class RenderParallel:
    """Mesh-sharded renderer binding (the _RenderWrapper + DataParallel
    equivalent).

    NeRF mode: rays (SB, B, 8) sharded on B.  simple_output returns
    (rgb, depth) from the fine pass if present (nerf.py:21-48).
    YOLO mode: rays (B, 8) (or (1, B, 8)) sharded on B; returns (B, A, 7).
    """

    def __init__(
        self,
        renderer,
        model,
        mesh: Optional[Mesh] = None,
        simple_output: bool = False,
        want_weights: bool = False,
        train: bool = False,
    ):
        self.renderer = renderer
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(n_devices=1)
        self.simple_output = simple_output
        self.want_weights = want_weights
        self.train = train
        self.is_yolo = not hasattr(renderer, "using_fine")
        self._jitted = None

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    def _build(self):
        repl = NamedSharding(self.mesh, P())
        # rays shard over ALL mesh axes: render batches carry no scene
        # structure worth a separate axis (a 2-D train mesh's 'data' axis
        # simply joins the ray sharding here)
        axes = tuple(self.mesh.axis_names)
        if self.is_yolo:
            ray_sharding = NamedSharding(self.mesh, P(axes))

            def fn(variables, cond, rays, rng):
                return self.renderer(self.model, variables, cond, rays, rng)

        else:
            ray_sharding = NamedSharding(self.mesh, P(None, axes))

            def fn(variables, cond, rays, rng):
                return self.renderer(
                    self.model,
                    variables,
                    cond,
                    rays,
                    rng,
                    want_weights=self.want_weights and not self.simple_output,
                    train=self.train,
                )

        self._jitted = jax.jit(
            fn,
            in_shardings=(repl, repl, ray_sharding, repl),
            out_shardings=repl,
        )

    def __call__(self, variables, cond, rays, rng):
        if self._jitted is None:
            self._build()

        if self.is_yolo:
            rays = rays.reshape(-1, 8)
            if rays.shape[0] == 0:
                A = self.renderer.num_anchors_per_scale
                return jnp.zeros((0, A, 7), dtype=rays.dtype)
            rays_p, n = _pad_to_multiple(rays, 0, self.n_shards)
            out = self._jitted(variables, cond, rays_p, rng)
            return out[:n]

        # NeRF: (SB, B, 8)
        if rays.shape[0] == 0 or rays.shape[1] == 0:
            return (
                jnp.zeros((0, 3), dtype=rays.dtype),
                jnp.zeros((0,), dtype=rays.dtype),
            )
        rays_p, n = _pad_to_multiple(rays, 1, self.n_shards)
        outputs = self._jitted(variables, cond, rays_p, rng)
        outputs = jax.tree.map(
            lambda t: t[:, :n] if t.ndim >= 2 else t, outputs
        )
        if self.simple_output:
            branch = "fine" if self.renderer.using_fine else "coarse"
            return outputs[branch]["rgb"], outputs[branch]["depth"]
        return outputs


def bind_parallel(
    renderer,
    model,
    gpus=None,
    simple_output: bool = False,
    mesh: Optional[Mesh] = None,
    want_weights: bool = True,
    train: bool = False,
) -> RenderParallel:
    """API-parity wrapper: ``gpus`` (the reference's --gpu_id list) selects
    how many mesh devices to shard rays over."""
    if mesh is None:
        n = len(gpus) if gpus is not None else 1
        n = min(n, len(jax.devices()))
        mesh = make_mesh(n_devices=n)
        if mesh.devices.size > 1:
            print("Using multi-device ray sharding", mesh)
    return RenderParallel(
        renderer,
        model,
        mesh=mesh,
        simple_output=simple_output,
        want_weights=want_weights,
        train=train,
    )
