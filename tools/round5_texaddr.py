"""Round-5 texture-addressing A/B claim: RPT_TEXADDR_FAST.

ROUND5_POST.json's nofetch diagnostic split bunny's 1.17 ms texture share
into 0.11 ms fetch kernel + 1.07 ms XLA ADDRESS math -- the per-ray
pow2-grid derivation and the two variable integer divisions in the Morton
tile_slot. RPT_TEXADDR_FAST=1 hoists the region-derived constants
[sm1 ss r16] into the per-object fused attribute select (3 more rows of
the same MXU matmul) and routes every sampler through the division-free
tile_slot_fast. Bit-exact in CI (test_sampler_9row_fp_matches_6row,
test_texaddr_fast_end_to_end); the same math runs in the arch/cubes
1024^2 gather scenes and in cube.txt's windowed route, so all four are
A/B'd. texaddr_exact re-checks bit-equality on the real chip.

Artifacts: ROUND5_TEXADDR.json; verdict via decide_flips
(RPT_TEXADDR_FAST entry). Usage: python tools/round5_texaddr.py [budget_s]
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
ART_PATH = ART_DIR / "ROUND5_TEXADDR.json"
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

    # Baselines = the 6-row (pre-flip) addressing. RPT_TEXADDR_FAST became
    # the DEFAULT after this sequence's first landed run (ROUND5_TEXADDR.json
    # 2026-08-19: +4.6..8.0% uniform), so the baseline direction is forced
    # explicitly to keep the step-name semantics stable across reruns.
    set_env("RPT_TEXADDR_FAST", "0")
    step("bunny", 150, lambda: frametime("bunny"))
    step("arch", 150, lambda: frametime("arch"))
    step("cubes", 150, lambda: frametime("cubes"))
    step("cube", 120, lambda: frametime("cube"))
    base_img = None
    if left() > 90:
        try:
            base_img = render_bunny_once()
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    # ------------- RPT_TEXADDR_FAST A/B -------------
    set_env("RPT_TEXADDR_FAST", "1")
    step("bunny_texaddr", 150, lambda: frametime("bunny"))
    step("arch_texaddr", 150, lambda: frametime("arch"))
    step("cubes_texaddr", 150, lambda: frametime("cubes"))
    step("cube_texaddr", 120, lambda: frametime("cube"))

    def texaddr_exact():
        if base_img is None:
            return {"skipped": "no base image"}
        img = render_bunny_once()
        d = np.abs(img - base_img)
        return {"max_diff": float(d.max())}

    step("texaddr_exact", 90, texaddr_exact)
    set_env("RPT_TEXADDR_FAST", None)  # back to the (fast) default

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
