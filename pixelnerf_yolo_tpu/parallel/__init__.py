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
MODEL_AXIS = "model"


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
    model_parallel: int = 1,
) -> Mesh:
    """('data', 'rays'[, 'model']) training mesh.

    The 'data' axis shards the scene superbatch (SB) — the encoder convs
    parallelize over it; the 'rays' axis shards the ray batch within each
    scene (the reference's DataParallel dim=1 scatter,
    /root/reference/src/render/nerf.py:373-377).  The data-axis size is the
    largest divisor of n_devices that divides batch_size, so SB always
    shards evenly; everything else goes to rays.

    model_parallel > 1 appends a 'model' axis of that size: the field
    MLP's hidden dimension shards over it Megatron-style (fc_0
    column-parallel, fc_1 row-parallel — see ``tp_shardings``), with
    XLA's psum over ICI closing each block.  The axis is INNERMOST so
    the per-block all-reduce rides adjacent-device links.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    n = devices.size
    tp = max(int(model_parallel), 1)
    if n % tp != 0:
        raise ValueError(
            f"model_parallel={tp} must divide the device count {n}"
        )
    n_dp = n // tp
    data = 1
    for d in range(min(n_dp, max(batch_size, 1)), 0, -1):
        if n_dp % d == 0 and batch_size % d == 0:
            data = d
            break
    if tp == 1:
        return Mesh(devices.reshape(data, n_dp // data),
                    (DATA_AXIS, RAY_AXIS))
    return Mesh(
        devices.reshape(data, n_dp // data, tp),
        (DATA_AXIS, RAY_AXIS, MODEL_AXIS),
    )


def tp_shardings(tree, mesh: Mesh):
    """Tensor-parallel shardings for a params / variables / optimizer-state
    pytree over a mesh with a 'model' axis.

    The field MLP (nn/resnetfc.py ResnetBlockFC) is the only weight-heavy
    module; its blocks shard Megatron-style over the hidden dimension:

      * ``fc_0`` — column-parallel: kernel (d_in, d_hidden/TP) per device,
        bias sharded; the inter-matmul activation lives sharded on
        'model' and the softplus/relu applies shard-locally.
      * ``fc_1`` — row-parallel: kernel (d_hidden/TP, d_out) per device;
        the partial products psum over 'model' (XLA inserts the
        all-reduce from these specs — no hand-written collective).

    Everything else (residual stream, lin_in/lin_z/lin_out, encoder convs,
    BN stats, Adam counts) is replicated.  Works on ANY pytree whose leaf
    paths end in the flax param path (Adam mu/nu mirror the params tree,
    so one rule covers params and optimizer state alike).
    """
    names = mesh.axis_names
    if MODEL_AXIS not in names:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, tree)
    tp = dict(mesh.shape)[MODEL_AXIS]

    def spec_for(path, leaf) -> NamedSharding:
        keys = [
            getattr(p, "key", getattr(p, "name", "")) for p in path
        ]
        joined = "/".join(str(k) for k in keys)
        ndim = getattr(leaf, "ndim", 0)
        if "fc_0/kernel" in joined and ndim == 2:
            if leaf.shape[1] % tp:
                raise ValueError(
                    f"d_hidden {leaf.shape[1]} not divisible by "
                    f"model_parallel {tp} ({joined})"
                )
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if "fc_0/bias" in joined and ndim == 1:
            return NamedSharding(mesh, P(MODEL_AXIS))
        if "fc_1/kernel" in joined and ndim == 2:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


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
        # ray-sharding extent: every mesh axis except 'model' (the TP
        # axis shards the hidden dim, not rays)
        n = self.mesh.devices.size
        return n // dict(self.mesh.shape).get(MODEL_AXIS, 1)

    def _build(self, variables):
        repl = NamedSharding(self.mesh, P())
        # params: replicated, or TP-sharded when the mesh has a 'model'
        # axis (fc_0/fc_1 shard the hidden dim — see tp_shardings)
        var_sh = (
            tp_shardings(variables, self.mesh)
            if MODEL_AXIS in self.mesh.axis_names
            else repl
        )
        # rays shard over all non-model mesh axes: render batches carry no
        # scene structure worth a separate axis (a train mesh's 'data' axis
        # simply joins the ray sharding here)
        axes = tuple(
            a for a in self.mesh.axis_names if a != MODEL_AXIS
        )
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
            in_shardings=(var_sh, repl, ray_sharding, repl),
            out_shardings=repl,
        )

    def __call__(self, variables, cond, rays, rng):
        if self._jitted is None:
            self._build(variables)

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
