"""Mesh-walk iteration statistics on the live backend.

Reconstructs the REAL primary + shadow rays of a frame (same math as
render.shade) and reports, per kernel block, live-chunk counts and actual
while-loop trip counts -- the direct cost driver of the mesh kernels.
Usage: python tools/walkstats.py [scene] [WxH]
"""

from __future__ import annotations

import os
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))


def stats(label, x):
    x = np.asarray(x)
    print(f"{label}: total={x.sum():.0f} mean={x.mean():.1f} p50={np.percentile(x, 50):.0f} "
          f"p90={np.percentile(x, 90):.0f} max={x.max():.0f} nonzero={(x > 0).mean():.2f}")


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.ops.camera import camera_ray_dirs
    from relativitypathtracer_tpu.ops.mesh_intersect import (
        mesh_intersect_shared, mesh_min_t_general,
    )
    from relativitypathtracer_tpu.ops.pallas.mesh_kernels import (
        NB, live_chunk_lists,
    )
    from relativitypathtracer_tpu.ops.intersect import (
        apply_affine3, apply_linear3, norm3, normalize3,
    )
    from relativitypathtracer_tpu.ops.pallas.shadow_chain import (
        pack_chain_mats, pack_light_row, shadow_chain,
    )
    from relativitypathtracer_tpu.render import (
        FrameState, TILE, _round_up, intersect_scene, object_frames, tile_swizzle,
    )

    name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    size = sys.argv[2] if len(sys.argv) > 2 else "1024x768"
    W, H = (int(x) for x in size.split("x"))
    host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
    scene, meta = build_scene(host)
    state = FrameState.initial()
    interval = meta.default_interval
    print(f"scene={name} {W}x{H} backend={jax.default_backend()}", file=sys.stderr)

    ph, pw = _round_up(H, TILE), _round_up(W, TILE)
    dirs = camera_ray_dirs(W, H, pad_width=pw, pad_height=ph)
    dirs_t = jax.device_put(tile_swizzle(dirs.reshape(-1, 3).T, ph, pw))
    n = dirs_t.shape[1]

    @jax.jit
    def frame_parts(scene, state, d):
        with jax.default_matmul_precision("highest"):
            L, inv_L, stat_cam = object_frames(scene.objects, state)
            dir4 = jnp.concatenate([jnp.full((1, n), float(interval)), d], axis=0)
            t, normal, uv, obj, did_hit = intersect_scene(
                scene, meta, L, stat_cam, dir4, interval)
            return L, inv_L, stat_cam, dir4, t, normal, obj, did_hit

    L, inv_L, stat_cam, dir4, t, normal, obj, did_hit = frame_parts(scene, state, dirs_t)

    k, mi = 0, meta.mesh_ids[0]
    perm = jnp.asarray(meta.mesh_perms[k], jnp.int32) if meta.mesh_perms[k] else None
    rng = meta.mesh_tri_ranges[k]
    static = scene.mesh_static[k]

    # --- primary walk ---
    @jax.jit
    def primary(scene, L, stat_cam, dir4):
        with jax.default_matmul_precision("highest"):
            d4 = L[mi] @ dir4
            return mesh_intersect_shared(
                scene.mesh, rng, scene.objects.m[mi], scene.objects.inv_m[mi],
                stat_cam[mi, 1:4], d4[1:4], perm=perm, static=static,
                debug_iters=True)

    *_, p_iters = primary(scene, L, stat_cam, dir4)
    stats("primary iters/block", p_iters)

    @jax.jit
    def primary_counts(scene, L, stat_cam, dir4):
        with jax.default_matmul_precision("highest"):
            d4 = L[mi] @ dir4
            ro = apply_affine3(scene.objects.inv_m[mi], stat_cam[mi, 1:4])
            dd = apply_linear3(scene.objects.inv_m[mi], d4[1:4])
            dh = dd / norm3(dd)
            n_pad = _round_up(n, NB)
            dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)), constant_values=1.0)
            ro_p = jnp.broadcast_to(ro[:, None], (3, n_pad))
            return live_chunk_lists(static.spheres, dh_p, ro_p)[2]

    stats("primary live/block", primary_counts(scene, L, stat_cam, dir4)[:, 0, 0])

    # --- shadow walk, per light (chain math identical to render.shade) ---
    mats = pack_chain_mats(L, inv_L, stat_cam)
    for li in meta.light_ids:
        light_row = pack_light_row(L[li], inv_L[li], scene.objects.m[li][:3, 3])

        @jax.jit
        def shadow(scene, t, normal, obj, did_hit, dir4):
            with jax.default_matmul_precision("highest"):
                hit_pos, ld3, ndotl, tmax, llen = shadow_chain(
                    mats, light_row, dir4, t, normal, obj, interval)
                relevant = did_hit & (obj != li) & (ndotl > 0)
                tmax_m = jnp.where(relevant, tmax, 0.0)
                o4 = L[mi] @ hit_pos
                sdir4 = jnp.concatenate(
                    [jnp.full((1, n), float(interval)), normalize3(ld3)], axis=0)
                d4 = L[mi] @ sdir4
                tt, iters = mesh_min_t_general(
                    scene.mesh, rng, scene.objects.m[mi], scene.objects.inv_m[mi],
                    o4[1:4], d4[1:4], perm=perm, tmax=tmax_m, static=static,
                    debug_iters=True)
                return iters, relevant, tmax_m, o4, d4

        s_iters, relevant, tmax_m, o4, d4 = shadow(scene, t, normal, obj, did_hit, dir4)
        stats(f"shadow iters/block (light {li})", s_iters)
        print(f"  relevant lanes: {np.asarray(relevant).mean():.2f}")

        @jax.jit
        def shadow_counts(scene, o4, d4, tmax_m):
            with jax.default_matmul_precision("highest"):
                ro = apply_affine3(scene.objects.inv_m[mi], o4[1:4])
                dd = apply_linear3(scene.objects.inv_m[mi], d4[1:4])
                dh = dd / norm3(dd)
                n_pad = _round_up(n, NB)
                dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)), constant_values=1.0)
                ro_p = jnp.pad(ro, ((0, 0), (0, n_pad - n)))
                valid_p = jnp.pad(tmax_m > 0, (0, n_pad - n))
                return live_chunk_lists(static.spheres, dh_p, ro_p, valid=valid_p)[2]

        stats(f"shadow live/block (light {li})",
              shadow_counts(scene, o4, d4, tmax_m)[:, 0, 0])
