"""Round-5 post-path levers claim: channel-split texture fetch confirm +
the fused-output-relayout A/B.

ROUND5_POST.json attributed the post-intersect pipeline by full-frame
deltas: bunny texture 1.62 ms (small VMEM route!), unswizzle 0.41 ms,
tonemap 0.12 ms, arch/cubes 1024^2 gather ~4.0 ms. Two levers landed:

  1. CHANNEL-SPLIT small-atlas fetch (shipped, no knob): the one-hot MXU
     dot now runs ONE DEFAULT-precision pass over a (Rq, 24) channel-split
     table instead of 6 HIGHEST-precision passes + an integer unpack --
     exact because split values are ints < 256 (bf16-exact) and a one-hot
     leaves one nonzero product (test_interpret_small_texture_kernel_exact).
     The bunny/shadows baselines here ARE its confirmation (vs 7.18 /
     ROUND5_POST.json bunny).
  2. RPT_FUSED_OUT=1 (A/B, default off): tonemap before ONE fused
     unswizzle+HWC relayout instead of unswizzle + .T (bit-identical,
     test_fused_out_is_bit_identical). A/B'd on bunny + arch.

Artifacts: ROUND5_POST2.json; verdicts via decide_flips.
Usage: python tools/round5_post2.py [budget_s]   (default 1500)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 1500.0
T0 = time.time()
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_DIR = REPO if OFFICIAL else pathlib.Path("/tmp")
ART_PATH = ART_DIR / "ROUND5_POST2.json"
ART: dict = {"budget_s": BUDGET, "steps": {}, "resolution": f"{W}x{H}",
             "complete": False,
             "incomplete_reason": "in progress / killed before finish"}


def left() -> float:
    return BUDGET - (time.time() - T0)


def save() -> None:
    ART_PATH.write_text(json.dumps(ART, indent=1))


def step(name, cost_s, fn):
    if left() < cost_s:
        ART["steps"][name] = {"skipped": f"budget ({left():.0f}s left)"}
        print(f"[{name}] SKIPPED (budget)", flush=True)
        save()
        return None
    t = time.time()
    try:
        res = fn()
        ART["steps"][name] = {"s": round(time.time() - t, 1), "result": res}
        print(f"[{name}] ok ({time.time()-t:.0f}s): {res}", flush=True)
    except Exception as e:  # noqa: BLE001 -- a step must not sink the claim
        traceback.print_exc()
        ART["steps"][name] = {"s": round(time.time() - t, 1),
                              "error": str(e)[:200]}
        print(f"[{name}] ERROR ({time.time()-t:.0f}s): {e}", flush=True)
        res = None
    save()
    return res


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("RPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RPT_PLATFORM"])

    from relativitypathtracer_tpu import __version__, build_scene, load_scene_file
    from relativitypathtracer_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from relativitypathtracer_tpu.render import FrameState, build_render_fn
    from relativitypathtracer_tpu.utils.timing import (
        chained_samples_ms, percentile)

    ART["version"] = __version__

    def devices():
        d = jax.devices()
        ART["platform"] = jax.default_backend()
        if (OFFICIAL and ART["platform"] == "cpu"
                and not os.environ.get("RPT_PLATFORM")):
            raise RuntimeError("official run fell back to the CPU backend")
        return str(d)

    step("devices", 120, devices)
    if "result" not in ART["steps"].get("devices", {}):
        print("no chip -- aborting", flush=True)
        return

    def probe_frame():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, 128, 96, mt.default_interval, 1)
        img = render(sc, FrameState.initial())
        return {"mean_pixel": round(float(jnp.mean(img)), 5)}

    step("probe_frame", 180, probe_frame)

    def frametime(name, reps=3, frames=12):
        host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1)
        samples, _ = chained_samples_ms(render, sc, FrameState.initial(),
                                        nbatch=reps, batch=frames)
        return round(min(samples), 3)

    def render_bunny_once():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1)
        return np.asarray(render(sc, FrameState.initial()))

    def set_env(key, val):
        if val is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = val
        build_render_fn.cache_clear()

    # baselines = the channel-split confirmation (vs ROUND5_POST.json:
    # bunny 7.182, shadows at the r5-confirm ~6.9)
    step("bunny", 150, lambda: frametime("bunny"))
    step("shadows", 150, lambda: frametime("shadows"))

    # on-chip exactness of the split fetch: full-res bunny parity
    def bunny_parity():
        from relativitypathtracer_tpu.utils.parity import fullres_parity

        return fullres_parity("bunny", W, H)

    step("bunny_parity", 240, bunny_parity)

    # ------------- RPT_FUSED_OUT A/B -------------
    base_img = None
    if left() > 90:
        try:
            base_img = render_bunny_once()
        except Exception:  # noqa: BLE001
            traceback.print_exc()
    set_env("RPT_FUSED_OUT", "1")
    step("bunny_fout", 150, lambda: frametime("bunny"))
    step("arch_fout", 150, lambda: frametime("arch"))

    def fout_exact():
        if base_img is None:
            return {"skipped": "no base image"}
        img = render_bunny_once()
        d = np.abs(img - base_img)
        return {"max_diff": float(d.max())}

    step("fout_exact", 90, fout_exact)
    set_env("RPT_FUSED_OUT", None)
    step("arch", 150, lambda: frametime("arch"))

    # ------------- windowed texture, MID atlases (cube.txt 32k rows) ----
    # r4 proved the windowed kernel exact + wedge-free on this exact atlas
    # (texprobe max_diff 0.0) and retired it only for the 1024^2 (524k-row)
    # atlases where minification defeats the row windows; r3 measured
    # cube.txt 3.9 -> ~1 ms on the windowed path. A/B the MID tier.
    step("cube", 120, lambda: frametime("cube"))
    set_env("RPT_WINDOWED_MAX_ROWS", "65536")
    step("cube_windowed", 150, lambda: frametime("cube"))
    set_env("RPT_WINDOWED_MAX_ROWS", None)

    def bench_inline():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1, True)
        samples, (_img, aux) = chained_samples_ms(
            render, sc, FrameState.initial(), nbatch=10, batch=12)
        shadow_rays = int(aux["shadow_rays"])
        samples.sort()
        p50 = percentile(samples, 50)
        return {"frame_ms_p50": round(p50, 3),
                "mrays": round((W * H + shadow_rays) / (p50 * 1e3), 3),
                "p95_ms": round(percentile(samples, 95), 3)}

    step("bench_protocol", 240, bench_inline)

    skipped = [k for k, v in ART["steps"].items() if "skipped" in v]
    if skipped:
        ART["complete"] = False
        ART["incomplete_reason"] = f"budget-skipped: {', '.join(skipped)}"
    else:
        ART["complete"] = True
        ART.pop("incomplete_reason", None)
    ART["done_s"] = round(time.time() - T0, 1)
    save()
    print(f"[done] {ART['done_s']:.0f}s complete={ART['complete']} -> "
          f"{ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
