"""Stage-level timing of the bunny frame on the live backend.

Times jitted sub-pipelines with the same chained-frames + RTT-subtraction
protocol as bench.py (the axon relay makes block_until_ready a no-op).
Usage: python tools/stagebench.py [scene] [WxH]
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))


def timeit(fn, args, frames=20):
    import jax.numpy as jnp

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    t0 = time.perf_counter()
    _ = float(jnp.sum(leaf))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(frames):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    return (time.perf_counter() - t0 - rtt) / frames * 1e3


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.models.scene import SceneMeta
    from relativitypathtracer_tpu.ops.camera import camera_ray_dirs
    from relativitypathtracer_tpu.ops.mesh_intersect import (
        mesh_intersect_shared, mesh_min_t_general, shared_origin_constants,
    )
    from relativitypathtracer_tpu.ops.pallas.mesh_kernels import (
        chunk_spheres, live_chunk_lists, shared_nearest_hit,
    )
    from relativitypathtracer_tpu.render import (
        FrameState, TILE, _round_up, build_render_fn, object_frames, tile_swizzle,
    )

    name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    size = sys.argv[2] if len(sys.argv) > 2 else "1024x768"
    W, H = (int(x) for x in size.split("x"))
    host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
    scene, meta = build_scene(host)
    state = FrameState.initial()
    print(f"scene={name} {W}x{H} backend={jax.default_backend()}", file=sys.stderr)

    # full frame
    full = build_render_fn(meta, W, H, meta.default_interval, 1)
    print(f"full frame:        {timeit(full, (scene, state)):7.2f} ms")

    # no lights => no shadow pass
    meta_nl = dataclasses.replace(meta, light_ids=())
    build_render_fn.cache_clear()
    nolight = build_render_fn(meta_nl, W, H, meta.default_interval, 1)
    print(f"no-shadow frame:   {timeit(nolight, (scene, state)):7.2f} ms")

    # interval=0 frame (no lights either, by semantics)
    i0 = build_render_fn(meta, W, H, 0, 1)
    print(f"interval-0 frame:  {timeit(i0, (scene, state)):7.2f} ms")

    if meta.mesh_ids:
        ph, pw = _round_up(H, TILE), _round_up(W, TILE)
        dirs = camera_ray_dirs(W, H, pad_width=pw, pad_height=ph)
        dirs_t = jax.device_put(tile_swizzle(dirs.reshape(-1, 3).T, ph, pw))
        k, i = 0, meta.mesh_ids[0]
        perm = jnp.asarray(meta.mesh_perms[k], jnp.int32) if meta.mesh_perms[k] else None
        rng = meta.mesh_tri_ranges[k]

        @jax.jit
        def primary_mesh(scene, state, d):
            L, inv_L, stat_cam = object_frames(scene.objects, state)
            d4 = L[i] @ jnp.concatenate([jnp.full((1, d.shape[1]), -1.0), d], axis=0)
            with jax.default_matmul_precision("highest"):
                return mesh_intersect_shared(
                    scene.mesh, rng, scene.objects.m[i], scene.objects.inv_m[i],
                    stat_cam[i, 1:4], d4[1:4], perm=perm, static=scene.mesh_static[k])

        print(f"primary mesh:      {timeit(primary_mesh, (scene, state, dirs_t)):7.2f} ms")

        @jax.jit
        def livelists(scene, state, d):
            L, inv_L, stat_cam = object_frames(scene.objects, state)
            d4 = L[i] @ jnp.concatenate([jnp.full((1, d.shape[1]), -1.0), d], axis=0)
            from relativitypathtracer_tpu.ops.intersect import apply_affine3, apply_linear3, norm3
            ro = apply_affine3(scene.objects.inv_m[i], stat_cam[i, 1:4])
            dd = apply_linear3(scene.objects.inv_m[i], d4[1:4])
            dh = dd / norm3(dd)
            n_pad = _round_up(dh.shape[1], 1024)
            dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - dh.shape[1])), constant_values=1.0)
            ro_p = jnp.broadcast_to(ro[:, None], (3, n_pad))
            with jax.default_matmul_precision("highest"):
                return live_chunk_lists(scene.mesh_static[k].spheres, dh_p, ro_p)

        print(f"live lists (1x):   {timeit(livelists, (scene, state, dirs_t)):7.2f} ms")

        # shadow-style general kernel with same ray count, origins = hit points
        @jax.jit
        def shadow_mesh(scene, state, d):
            L, inv_L, stat_cam = object_frames(scene.objects, state)
            n = d.shape[1]
            o4 = jnp.concatenate([jnp.zeros((1, n)), d * 2.0 + 1.0], axis=0)
            d4 = L[i] @ jnp.concatenate([jnp.full((1, n), -1.0), -d], axis=0)
            o4 = L[i] @ o4
            with jax.default_matmul_precision("highest"):
                return mesh_min_t_general(
                    scene.mesh, rng, scene.objects.m[i], scene.objects.inv_m[i],
                    o4[1:4], d4[1:4], perm=perm, tmax=jnp.full((n,), 8.0),
                    static=scene.mesh_static[k])

        print(f"general mesh:      {timeit(shadow_mesh, (scene, state, dirs_t)):7.2f} ms")
