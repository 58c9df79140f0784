"""Debug helper: dump per-stage intermediates for a scene to .npz.

Usage: python tools/dump_stages.py <scene> <out.npz> [cpu]
Run once normally (TPU) and once with the 'cpu' arg in a fresh process,
then diff the two files to localize backend divergence.
"""
import sys

if len(sys.argv) > 3 and sys.argv[3] == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from relativitypathtracer_tpu import build_scene, load_scene_file
from relativitypathtracer_tpu.render import (
    FrameState, object_frames, intersect_scene, shade, build_render_fn,
    tile_swizzle)
from relativitypathtracer_tpu.ops.camera import camera_ray_dirs
import relativitypathtracer_tpu.ops.mesh_intersect as mi

mi.PALLAS_MODE = False
name, out = sys.argv[1], sys.argv[2]
W, H = 1024, 768
host = load_scene_file(f"/root/reference/Scenes/{name}.txt")
scene, meta = build_scene(host)
state = FrameState.initial()
interval = meta.default_interval


def f(scene, state):
    with jax.default_matmul_precision("highest"):
        L, inv_L, stat_cam = object_frames(scene.objects, state)
        dirs = camera_ray_dirs(W, H, 1).reshape(-1, 3).T
        n = dirs.shape[1]
        dir4 = jnp.concatenate([jnp.full((1, n), float(interval)), dirs], axis=0)
        t, normal, uv, obj, hit = intersect_scene(scene, meta, L, stat_cam, dir4)
        color, aux = shade(scene, meta, L, inv_L, stat_cam, dirs, interval)
        return dict(L=L, stat_cam=stat_cam, dirs=dirs, t=t, normal=normal,
                    uv=uv, obj=obj, hit=hit, color=color)


res = jax.jit(f)(scene, state)
img = np.asarray(
    build_render_fn(meta, W, H, interval, 1, False)(scene, state))
np.savez(out, img=img, backend=jax.default_backend(),
         **{k: np.asarray(v) for k, v in res.items()})
print("saved", out, jax.default_backend())
