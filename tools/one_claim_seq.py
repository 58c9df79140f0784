"""Single-claim TPU verification sequence: everything in ONE process so a
stingy relay grant is never wasted on a bare probe. Prints flush per step;
run detached (nohup) and poll the log. Order: cheapest diagnosis first.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    print(f"[claim] {jax.devices()} ({time.time()-t0:.0f}s)", flush=True)

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
        footprint_sample_windowed,
    )
    from relativitypathtracer_tpu.ops.texture_sample import bilinear_sample_footprint
    from relativitypathtracer_tpu.render import FrameState, build_render_fn

    # --- texprobe (shift-free address path) ---
    host = build_scene(load_scene_file("/root/reference/Scenes/cube.txt"))
    scene, meta = host
    rng = np.random.default_rng(0)
    n = 2048
    uv = jnp.asarray(rng.uniform(0.01, 0.99, (2, n)).astype(np.float32))
    fp = jnp.broadcast_to(jnp.asarray(scene.tex_fp)[0][:, None], (6, n))
    w = jnp.full((n,), 224, jnp.int32)
    h = jnp.full((n,), 225, jnp.int32)
    t0 = time.time()
    ref = bilinear_sample_footprint(scene.tex_quads, fp, w, h, uv)
    _ = float(jnp.sum(ref))
    print(f"[xla-gather] ok ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    out = footprint_sample_windowed(scene.tex_quads, fp, w, h, uv)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"[windowed] ok ({time.time()-t0:.0f}s) max diff {d:.2e}", flush=True)

    # --- frame times ---
    def frametime(name, msaa=1, reps=3, frames=12):
        hostx = load_scene_file(f"/root/reference/Scenes/{name}.txt")
        sc, mt = build_scene(hostx)
        render = build_render_fn(mt, 1024, 768, mt.default_interval, msaa)
        state = FrameState.initial()
        img = render(sc, state)
        _ = float(jnp.sum(img))
        rtts = []
        for _i in range(3):
            t = time.perf_counter()
            _ = float(jnp.sum(img))
            rtts.append(time.perf_counter() - t)
        best = 1e9
        for _r in range(reps):
            t = time.perf_counter()
            for _i in range(frames):
                img = render(sc, state)
            _ = float(jnp.sum(img))
            best = min(best, (time.perf_counter() - t - min(rtts)) / frames * 1e3)
        print(f"[frametime] {name} msaa={msaa}: {best:.2f} ms/frame (min of {reps})",
              flush=True)

    for name in ("arch", "cubes", "bunny"):
        frametime(name)
    frametime("bunny", msaa=2, frames=6)

    # --- bench-equivalent checks INLINE (a bench.py subprocess would need a
    # second relay claim while this process holds one: both would stall) ---
    from relativitypathtracer_tpu.utils.parity import fullres_parity

    for case in ("bunny", "shadows", "rulers"):
        try:
            res = fullres_parity(case, 1024, 768)
            print(f"[parity] {case}: frac={res['frac_bad']} ok={res['ok']}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[parity] {case} ERROR {e}", flush=True)

    try:
        from relativitypathtracer_tpu.utils.largedemo import large_parity_and_time

        print(f"[large] {large_parity_and_time(1024, 768)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[large] ERROR {e}", flush=True)
    print("[done]", flush=True)


if __name__ == "__main__":
    main()
