"""Blender multi-object ShapeNet scene renderer (offline data tooling).

Capability parity with /root/reference/scripts/render_shapenet.py (785 LoC
of bpy driving): random multi-object placement/rotation/scaling, sun
lighting, ring + Archimedes-spiral test camera trajectories, RGBA object
passes, transforms.json in the MultiObjectDataset format, and process-pool
parallel rendering (--pool, per-scene spawned RNG streams like the
reference's _main_parallel).

Runs INSIDE Blender:
  blender --background --python scripts/render_shapenet.py -- \
      --shapenet_root <root> --out <dir> [options]

The bpy import is deliberately lazy (module global _BPY): this module can
be imported without Blender for --help, for the pure-math helpers, and for
the hermetic dry-run test (tests/test_tooling.py injects a recording fake
bpy and checks the full scene-graph + output protocol).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
from concurrent.futures import ProcessPoolExecutor

_BPY = None  # injected by tests; None -> import bpy on first use


def _get_bpy():
    global _BPY
    if _BPY is None:
        try:
            import bpy
        except ImportError:
            raise SystemExit(
                "render_shapenet.py must run inside Blender: "
                "blender --background --python scripts/render_shapenet.py "
                "-- ..."
            )
        _BPY = bpy
    return _BPY


def parse_args(argv=None):
    if argv is None:
        argv = sys.argv
        if "--" in argv:
            argv = argv[argv.index("--") + 1 :]
        else:
            argv = argv[1:]
    parser = argparse.ArgumentParser()
    parser.add_argument("--shapenet_root", type=str, required=True,
                        help="ShapeNet root (category dirs of OBJ models)")
    parser.add_argument("--out", type=str, default="multi_obj_out")
    parser.add_argument("--n_scenes", type=int, default=10)
    parser.add_argument("--n_objects", type=int, default=2,
                        help="objects per scene")
    parser.add_argument("--n_views", type=int, default=20)
    parser.add_argument("--res", type=int, default=128)
    parser.add_argument("--radius", type=float, default=6.5)
    parser.add_argument("--elevation", type=float, default=-25.0)
    parser.add_argument("--camera_angle_x", type=float, default=0.8575,
                        help="horizontal FoV (radians)")
    parser.add_argument("--placement_radius", type=float, default=1.5)
    parser.add_argument("--scale_min", type=float, default=0.8)
    parser.add_argument("--scale_max", type=float, default=1.2)
    parser.add_argument("--spiral_test", action="store_true",
                        help="Archimedes-spiral test trajectory instead of "
                        "the uniform ring")
    parser.add_argument("--cycles", action="store_true",
                        help="Cycles PBR rendering (default: Eevee/Workbench)")
    parser.add_argument("--hdri", type=str, default=None,
                        help="optional HDRI environment map for Cycles")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--pool", action="store_true",
                        help="Render scenes in a process pool (the "
                        "reference's --pool; forked workers share the "
                        "Blender global setup)")
    parser.add_argument("--pool_workers", type=int, default=16)
    return parser.parse_args(argv)


# -- pure-math camera helpers (testable without bpy) -------------------------


def ring_camera_positions(n_views, radius, elevation_deg):
    """Uniform ring of camera positions around +y-up origin."""
    el = math.radians(-elevation_deg)
    out = []
    for i in range(n_views):
        th = 2 * math.pi * i / n_views
        out.append(
            (
                radius * math.cos(el) * math.sin(th),
                radius * math.cos(el) * math.cos(th),
                radius * math.sin(el),
            )
        )
    return out


def spiral_camera_positions(n_views, radius, turns=2.0, z_span=(0.5, 4.0)):
    """Archimedes spiral: radius shrinks while height rises (the
    reference's test trajectory)."""
    out = []
    for i in range(n_views):
        t = i / max(n_views - 1, 1)
        th = 2 * math.pi * turns * t
        r = radius * (1.0 - 0.5 * t)
        z = z_span[0] + (z_span[1] - z_span[0]) * t
        out.append((r * math.sin(th), r * math.cos(th), z))
    return out


def look_at_matrix(origin, target=(0.0, 0.0, 0.0)):
    """4x4 camera-to-world, Blender convention (camera looks along -Z)."""
    import numpy as np

    origin = np.asarray(origin, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - origin
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-8:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = up
    m[:3, 2] = -fwd
    m[:3, 3] = origin
    return m


def random_placements(rng, n_objects, placement_radius, min_dist=0.8):
    """Rejection-sample non-overlapping XY placements."""
    spots = []
    for _ in range(n_objects):
        for _attempt in range(100):
            x = rng.uniform(-placement_radius, placement_radius)
            y = rng.uniform(-placement_radius, placement_radius)
            if all((x - a) ** 2 + (y - b) ** 2 > min_dist**2 for a, b in spots):
                spots.append((x, y))
                break
        else:
            spots.append((0.0, 0.0))
    return spots


# -- Blender driver ----------------------------------------------------------


def find_models(shapenet_root: str) -> list:
    models = []
    for cat in sorted(os.listdir(shapenet_root)):
        cat_dir = os.path.join(shapenet_root, cat)
        if not os.path.isdir(cat_dir):
            continue
        for obj_id in sorted(os.listdir(cat_dir)):
            for cand in ("models/model_normalized.obj", "model.obj"):
                p = os.path.join(cat_dir, obj_id, cand)
                if os.path.exists(p):
                    models.append(p)
                    break
    return models


def _eevee_engine_name(bpy) -> str:
    """Blender renamed the EEVEE engine enum in 4.2 ("BLENDER_EEVEE_NEXT");
    pre-4.2 only accepts "BLENDER_EEVEE".  Guard on bpy.app.version so the
    script runs on both (the reference targets 2.9x-3.x Blender)."""
    version = tuple(getattr(getattr(bpy, "app", None), "version", (3, 0, 0)))
    return "BLENDER_EEVEE_NEXT" if version >= (4, 2, 0) else "BLENDER_EEVEE"


def _import_obj(bpy, filepath: str):
    """OBJ import operator moved in Blender 4.0: wm.obj_import (new C++
    importer, 3.2+) vs import_scene.obj (legacy python addon, removed in
    4.0)."""
    if hasattr(bpy.ops, "wm") and hasattr(bpy.ops.wm, "obj_import"):
        bpy.ops.wm.obj_import(filepath=filepath)
    else:
        bpy.ops.import_scene.obj(filepath=filepath)


def global_setup(args):
    """Scene-independent render configuration (engine, resolution, HDRI)."""
    bpy = _get_bpy()
    scene = bpy.context.scene
    scene.render.resolution_x = args.res
    scene.render.resolution_y = args.res
    scene.render.film_transparent = True
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.engine = "CYCLES" if args.cycles else _eevee_engine_name(bpy)
    if args.cycles and args.hdri:
        world = scene.world
        world.use_nodes = True
        env = world.node_tree.nodes.new("ShaderNodeTexEnvironment")
        env.image = bpy.data.images.load(args.hdri)
        world.node_tree.links.new(
            env.outputs["Color"],
            world.node_tree.nodes["Background"].inputs["Color"],
        )


def render_scene(args, models, scene_idx: int, seed: int):
    """Build and render ONE scene (pool-submittable; forked workers share
    the global setup like the reference's render_views jobs)."""
    bpy = _get_bpy()
    rng = random.Random(seed)
    scene = bpy.context.scene

    # reset scene objects
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()

    # sun lamps
    for loc, energy in (((4, 4, 6), 3.0), ((-4, -2, 5), 1.5)):
        bpy.ops.object.light_add(type="SUN", location=loc)
        bpy.context.object.data.energy = energy

    # place objects
    spots = random_placements(rng, args.n_objects, args.placement_radius)
    for (x, y) in spots:
        model = rng.choice(models)
        _import_obj(bpy, model)
        obj = bpy.context.selected_objects[0]
        obj.location = (x, y, 0.0)
        obj.rotation_euler = (0.0, 0.0, rng.uniform(0, 2 * math.pi))
        s = rng.uniform(args.scale_min, args.scale_max)
        obj.scale = (s, s, s)

    # camera
    bpy.ops.object.camera_add()
    cam = bpy.context.object
    cam.data.angle_x = args.camera_angle_x
    scene.camera = cam

    positions = (
        spiral_camera_positions(args.n_views, args.radius)
        if args.spiral_test
        else ring_camera_positions(args.n_views, args.radius,
                                   args.elevation)
    )

    sdir = os.path.join(args.out, args.split, f"scene_{scene_idx:04d}")
    os.makedirs(sdir, exist_ok=True)
    frames = []
    for vi, pos in enumerate(positions):
        m = look_at_matrix(pos)
        cam.matrix_world = [list(row) for row in m.T]
        name = f"r_{vi:04d}"
        scene.render.filepath = os.path.join(sdir, name + "_obj.png")
        bpy.ops.render.render(write_still=True)
        frames.append(
            {
                "file_path": "./" + name,
                "transform_matrix": [list(map(float, row)) for row in m],
            }
        )
    with open(os.path.join(sdir, "transforms.json"), "w") as f:
        json.dump(
            {"camera_angle_x": args.camera_angle_x, "frames": frames},
            f, indent=1,
        )
    print("scene", scene_idx, "done")
    return scene_idx


def run(args):
    """Global setup + sequential or pooled scene rendering."""
    models = find_models(args.shapenet_root)
    if not models:
        raise SystemExit("no OBJ models found under " + args.shapenet_root)
    print(len(models), "models found")

    global_setup(args)
    os.makedirs(os.path.join(args.out, args.split), exist_ok=True)

    # independent per-scene RNG streams (reference _main_parallel's
    # SeedSequence spawn) so pooled and sequential runs draw the same
    # randomness per scene
    seed_root = random.Random(args.seed)
    seeds = [seed_root.randrange(2**31) for _ in range(args.n_scenes)]

    if args.pool:
        with ProcessPoolExecutor(max_workers=args.pool_workers) as pool:
            futures = [
                pool.submit(render_scene, args, models, i, seeds[i])
                for i in range(args.n_scenes)
            ]
            for fut in futures:
                fut.result()
    else:
        for i in range(args.n_scenes):
            render_scene(args, models, i, seeds[i])
    print("finished rendering")


def main():  # pragma: no cover - CLI glue
    run(parse_args())


if __name__ == "__main__":
    main()
