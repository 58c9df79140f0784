"""Minimal full-frame timing: one scene, one compiled renderer, repeated
chained-frame samples (shared estimator: utils/timing.py).
Usage: python tools/frametime.py [scene] [WxH] [reps] [msaa]"""

from __future__ import annotations

import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))

if __name__ == "__main__":
    import jax

    # CPU smoke hook (the axon plugin ignores JAX_PLATFORMS): RPT_PLATFORM=cpu
    if os.environ.get("RPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RPT_PLATFORM"])

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from relativitypathtracer_tpu.render import FrameState, build_render_fn
    from relativitypathtracer_tpu.utils.timing import chained_samples_ms

    name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    size = sys.argv[2] if len(sys.argv) > 2 else "1024x768"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    msaa = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    W, H = (int(x) for x in size.split("x"))
    host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
    scene, meta = build_scene(host)
    render = build_render_fn(meta, W, H, meta.default_interval, msaa)
    print(f"scene={name} {W}x{H} msaa={msaa} backend={jax.default_backend()}",
          file=sys.stderr)
    samples, _ = chained_samples_ms(render, scene, FrameState.initial(),
                                    nbatch=reps, batch=12)
    for ms in samples:
        print(f"{ms:7.2f} ms/frame")
    print(f"best {min(samples):7.2f} ms/frame", file=sys.stderr)
