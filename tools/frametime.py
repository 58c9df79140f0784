"""Minimal full-frame timing: one scene, one compiled renderer, repeated
chained-frame samples.
Usage: python tools/frametime.py [scene] [WxH] [reps] [msaa]"""

from __future__ import annotations

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from relativitypathtracer_tpu.render import FrameState, build_render_fn

    name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    size = sys.argv[2] if len(sys.argv) > 2 else "1024x768"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    msaa = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    W, H = (int(x) for x in size.split("x"))
    host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
    scene, meta = build_scene(host)
    state = FrameState.initial()
    render = build_render_fn(meta, W, H, meta.default_interval, msaa)
    img = render(scene, state)
    _ = float(jnp.sum(img))
    rtt = min(
        (lambda t0: (float(jnp.sum(img)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    print(f"scene={name} {W}x{H} msaa={msaa} backend={jax.default_backend()} "
          f"rtt={rtt*1e3:.2f}ms", file=sys.stderr)
    for _r in range(reps):
        t0 = time.perf_counter()
        for _i in range(12):
            img = render(scene, state)
        _ = float(jnp.sum(img))
        print(f"{(time.perf_counter() - t0 - rtt) / 12 * 1e3:7.2f} ms/frame")
