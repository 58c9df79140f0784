"""Minimal windowed-texture-kernel probe (run after a relay outage).

Compiles and runs footprint_sample_windowed on TWO ray blocks against the
cube.txt atlas (32k rows, Morton layout). Small enough to diagnose a
compile/run wedge without hogging the chip. Usage: python tools/texprobe.py
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if __name__ == "__main__":
    import numpy as np
    import jax.numpy as jnp

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
        footprint_sample_windowed,
    )
    from relativitypathtracer_tpu.ops.texture_sample import bilinear_sample_footprint

    host = load_scene_file("/root/reference/Scenes/cube.txt")
    scene, meta = build_scene(host)
    rng = np.random.default_rng(0)
    n = 2048
    uv = jnp.asarray(rng.uniform(0.01, 0.99, (2, n)).astype(np.float32))
    fp = jnp.broadcast_to(jnp.asarray(scene.tex_fp)[0][:, None], (6, n))
    w = jnp.full((n,), 224, jnp.int32)
    h = jnp.full((n,), 225, jnp.int32)
    t0 = time.time()
    ref = bilinear_sample_footprint(scene.tex_quads, fp, w, h, uv)
    print(f"XLA gather path ok ({time.time() - t0:.1f}s)", flush=True)
    t0 = time.time()
    out = footprint_sample_windowed(scene.tex_quads, fp, w, h, uv)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"windowed kernel ok ({time.time() - t0:.1f}s), max diff {d:.2e}", flush=True)
