import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from relativitypathtracer_tpu import build_scene, load_scene_file
from relativitypathtracer_tpu.render import FrameState, build_render_fn
W, H = 1024, 768
for name in ("arch", "shadows", "bunny"):
    host = load_scene_file(f"/root/reference/Scenes/{name}.txt")
    scene, meta = build_scene(host)
    render = build_render_fn(meta, W, H, meta.default_interval, 1, False)
    state = FrameState.initial()
    img = render(scene, state); _ = float(jnp.sum(img))
    best = 1e9
    for rep in range(2):
        t0 = time.perf_counter(); _ = float(jnp.sum(img)); rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(30):
            img = render(scene, state)
        _ = float(jnp.sum(img))
        best = min(best, (time.perf_counter() - t0 - rtt) / 30 * 1e3)
    print(name, round(best, 2))
