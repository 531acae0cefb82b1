"""AOT serving export: the jitted render step as a portable artifact.

`jax.export` serializes the traced render computation (StableHLO +
calling convention) so a serving process can load and run it WITHOUT the
model-building Python tree — and, because export supports cross-platform
lowering, a CPU-only build box can emit the TPU artifact.  The reference
has no counterpart (its torch models serve eagerly from the full source
tree); this is the TPU-native deployment story: the artifact pins the
compiled graph's semantics (shapes, dtypes, custom calls) independently
of framework-code drift, and `load_render` rehydrates it into a plain
callable.

Contents of an artifact (one `.pnyx` file):
  - a JSON header: framework version, render mode, the flat argument
    layout (treedef + per-leaf shape/dtype) so a loader can validate its
    inputs before dispatch
  - the model weights (msgpack, flax.serialization) so the artifact is
    self-contained — `load_render`'s call uses them when the caller
    passes variables=None
  - the serialized exported computation (StableHLO bytes)

The exported signature matches the driver entry (`__graft_entry__.entry`):
  fn(variables, images, poses, focal, rays, key) -> render pytree
with `variables` flattened into the positional calling convention by
jax.export itself (pytrees are supported natively).

CLI:
  python -m pixelnerf_yolo_tpu.serve --conf conf/exp/srn.conf \
      --checkpoint <dir> --platform tpu --rays 16384 --out model.pnyx
"""

from __future__ import annotations

import json
import os
import sys


_MAGIC = b"PNYEXPORT1\n"


def build_render_fn(conf, *, want_weights: bool = False):
    """(fn, model) — the pure serving step for this conf.

    fn(variables, images, poses, focal, rays, key): encode the source
    views, then render the ray batch — the same composition the bench
    headline and `__graft_entry__.entry` measure.  YoloRenderer takes no
    want_weights kwarg (render/yolo.py:68), so the YOLO path — detected
    the same way parallel/__init__.py:169 does — must not pass it."""
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.render import make_renderer

    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    is_yolo = not hasattr(renderer, "using_fine")

    def fn(variables, images, poses, focal, rays, key):
        cond = model.encode(variables, images, poses, focal)
        if is_yolo:
            return renderer(model, variables, cond, rays, key)
        return renderer(
            model, variables, cond, rays, key, want_weights=want_weights
        )

    return fn, model


def _export_call(jitted, specs, platforms):
    """jax.export across the 0.x API renames (platforms kwarg vs
    lowering_platforms).  The kwarg is chosen by signature inspection
    BEFORE tracing, so a TypeError raised while tracing the user fn
    propagates instead of being mistaken for the API-rename case."""
    import inspect

    from jax import export as jexport

    try:
        params = inspect.signature(jexport.export).parameters
        kw = "platforms" if "platforms" in params else "lowering_platforms"
    except (TypeError, ValueError):  # C-level signature: assume current
        kw = "platforms"
    return jexport.export(jitted, **{kw: list(platforms)})(*specs)


def export_render(conf, variables, example_args, *,
                  platforms=("tpu",), want_weights: bool = False) -> bytes:
    """Serialize the render step for `platforms` (no execution needed —
    cross-lowering means exporting FOR tpu works on a cpu-only box).

    :param example_args (images, poses, focal, rays, key) concrete or
      ShapeDtypeStruct leaves; shapes are baked into the artifact (XLA
      static-shape contract — serve at the exported ray batch and pad,
      exactly like the renderer's row-budget chunking does)
    :return artifact bytes (header + serialized exported computation)
    """
    import jax

    fn, _ = build_render_fn(conf, want_weights=want_weights)
    specs = (variables,) + tuple(example_args)
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), specs
    )
    exp = _export_call(jax.jit(fn), specs, platforms)
    blob = exp.serialize()

    # bake the weights so the artifact is self-contained: variables are
    # plain nested dicts of arrays, so msgpack round-trips them without a
    # template (load side: flax.serialization.msgpack_restore)
    import numpy as np
    from flax import serialization as fser

    weights = fser.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, variables)
    )

    flat, treedef = jax.tree_util.tree_flatten(specs)
    header = json.dumps({
        "format": 2,
        "platforms": list(platforms),
        "want_weights": bool(want_weights),
        "weights_len": len(weights),
        "arg_layout": {
            "treedef": str(treedef),
            "leaves": [[list(l.shape), str(l.dtype)] for l in flat],
        },
    }).encode()
    return (_MAGIC + len(header).to_bytes(8, "big") + header
            + weights + blob)


def load_weights_from_artifact(artifact: bytes):
    """The baked model variables of a format-2 artifact (nested dict of
    numpy arrays), or None for a pre-weights (format-1) artifact."""
    from flax import serialization as fser

    header, weights, _ = _split_artifact(artifact)
    if not weights:
        return None
    return fser.msgpack_restore(weights)


def _split_artifact(artifact: bytes):
    if not artifact.startswith(_MAGIC):
        raise ValueError("not a pixelnerf_yolo_tpu serving artifact")
    off = len(_MAGIC)
    hlen = int.from_bytes(artifact[off:off + 8], "big")
    header = json.loads(artifact[off + 8:off + 8 + hlen].decode())
    rest = artifact[off + 8 + hlen:]
    wlen = int(header.get("weights_len", 0))
    return header, rest[:wlen], rest[wlen:]


def load_render(artifact: bytes):
    """Rehydrate an artifact into (call, header).  `call` takes the same
    (variables, images, poses, focal, rays, key) arguments the exporter
    saw (any pytree with matching leaves) and runs the sealed
    computation on the current backend — which must be one of the
    artifact's platforms.  Pass variables=None to run with the weights
    baked into the artifact (format 2)."""
    from jax import export as jexport

    header, weights, blob = _split_artifact(artifact)
    exp = jexport.deserialize(blob)
    baked = [None]  # lazily decoded once

    def call(variables, images, poses, focal, rays, key):
        if variables is None:
            if not weights:
                raise ValueError(
                    "artifact has no baked weights; pass variables"
                )
            if baked[0] is None:
                from flax import serialization as fser

                baked[0] = fser.msgpack_restore(weights)
            variables = baked[0]
        return exp.call(variables, images, poses, focal, rays, key)

    return call, header


def _cli(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Export the serving render step as an AOT artifact"
    )
    parser.add_argument("--conf", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir (train/checkpoints layout); "
                             "the trained weights are BAKED into the "
                             "artifact.  Required unless --init-weights")
    parser.add_argument("--init-weights", action="store_true",
                        help="bake a fresh random init instead of a "
                             "checkpoint (graph/shape export, smoke use)")
    parser.add_argument("--platform", default="tpu",
                        choices=("tpu", "cpu"),
                        help="lowering target (default tpu; exporting FOR "
                             "tpu works on a cpu-only box)")
    parser.add_argument("--rays", type=int, default=16384)
    parser.add_argument("--views", type=int, default=1)
    parser.add_argument("--size", type=int, default=128,
                        help="source image H=W")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    # trace/lower on CPU regardless of what accelerator the box exposes
    # (the axon plugin registers before env vars are read — force via
    # config, same as tests/conftest.py)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from pixelnerf_yolo_tpu.config.hocon import parse_file

    conf = parse_file(args.conf)
    fn, model = build_render_fn(conf)

    NS, H, W = args.views, args.size, args.size
    images = jnp.zeros((1, NS, 3, H, W), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, NS, 1, 1))
    focal = jnp.float32(1.2 * H)
    rays = jnp.zeros((1, args.rays, 8), jnp.float32)
    key = jax.random.PRNGKey(0)

    if not args.checkpoint and not args.init_weights:
        parser.error("--checkpoint is required (the weights are baked "
                     "into the artifact); pass --init-weights for an "
                     "explicit fresh-init graph export")

    variables = model.init(jax.random.PRNGKey(0), images[0])
    if args.checkpoint:
        # reference checkpoint layout: <checkpoints_path>/<name>/pixel_nerf_latest
        from pixelnerf_yolo_tpu.train.checkpoints import load_weights

        ck = os.path.normpath(args.checkpoint)
        if not os.path.exists(os.path.join(ck, "pixel_nerf_latest")):
            parser.error(
                f"no pixel_nerf_latest under {ck!r} — a serving export "
                "must bake real weights (or pass --init-weights)"
            )
        ns = argparse.Namespace(
            checkpoints_path=os.path.dirname(ck) or ".",
            name=os.path.basename(ck),
            resume=True,
        )
        variables = load_weights(ns, variables)

    blob = export_render(
        conf, variables, (images, poses, focal, rays, key),
        platforms=(args.platform,),
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    n_params = sum(
        np.prod(l.shape) for l in jax.tree_util.tree_leaves(variables)
    )
    print(f"exported {args.platform} artifact: {args.out} "
          f"({len(blob)} bytes, {args.rays} rays/call, "
          f"{int(n_params)} params)")


if __name__ == "__main__":
    _cli(sys.argv[1:])
