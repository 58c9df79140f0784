"""Round-5 levers claim: the reversed-shadow-cone A/B (RPT_REVCONE).

Shadow segments for a point light converge AT the light, so culling with a
second cone whose apex sits at the light (mesh_kernels._revcone_on) is
tight exactly where the forward surface-origin cones are fat -- the
attributed 1.85 ms bunny shadow walk (ATTRIB_r05.json attrib3) is the
target. The lever is cull-only and verdict-exact (tests/test_revcone.py);
this sequence measures whether it PAYS on a real chip:

  1. devices + proof-of-life (CPU-fallback abort for official runs);
  2. baseline frametimes at shipped defaults: bunny, shadows (the two
     mesh-shadow scenes; arch/cubes have no meshes -- the knob is inert
     there and would only add relay noise to the verdict);
  3. RPT_REVCONE=1: bunny_revcone, shadows_revcone;
  4. revcone_exact: full-res bunny image diff, knob on vs off, on chip
     (expected ~0 -- the cull is conservative and the kernel clamps at
     tmax, see test_revcone.py);
  5. XL-tier timing A/B (cache-gated, timing only -- parity is pinned by
     ROUND5_FOLLOWUP.json and CI): the 1.27M-tri shadow walk is where
     block-granularity reversed bits should pay most;
  6. bench protocol at shipped defaults (headline confirm).

Artifacts: ROUND5_LEVERS.json. complete=true ONLY when no step was
budget-skipped. Verdict: tools/decide_flips.py ROUND5_LEVERS.json.
Usage: python tools/round5_levers.py [budget_s]   (default 1800)
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

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
T0 = time.time()
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_DIR = REPO if OFFICIAL else pathlib.Path("/tmp")
ART_PATH = ART_DIR / "ROUND5_LEVERS.json"
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

    def reconfig(**env):
        from relativitypathtracer_tpu.ops.pallas import (
            analytic_kernels, mesh_batch, mesh_kernels, mesh_large)

        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)
        mesh_kernels.shared_nearest_hit.clear_cache()
        mesh_kernels.general_min_t.clear_cache()
        mesh_batch.batched_nearest_shared.clear_cache()
        mesh_batch.batched_min_t_general.clear_cache()
        mesh_large.large_general_min_t.clear_cache()
        mesh_large.large_shared_nearest_hit.clear_cache()
        analytic_kernels.analytic_nearest_shared.clear_cache()
        analytic_kernels.analytic_min_t_general.clear_cache()
        build_render_fn.cache_clear()

    def render_bunny_once():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1)
        return np.asarray(render(sc, FrameState.initial()))

    # ------------- baselines at shipped defaults -------------
    step("bunny", 150, lambda: frametime("bunny"))
    step("shadows", 150, lambda: frametime("shadows"))
    # base image for the exactness diff -- kept OUT of step() so the raw
    # array never lands in the JSON artifact
    base_img = None
    if left() > 90:
        t = time.time()
        try:
            base_img = render_bunny_once()
            ART["steps"]["base_image"] = {
                "s": round(time.time() - t, 1),
                "result": {"mean_pixel": round(float(base_img.mean()), 5)}}
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            ART["steps"]["base_image"] = {"error": str(e)[:200]}
        save()
    else:
        ART["steps"]["base_image"] = {"skipped": f"budget ({left():.0f}s left)"}

    # ------------- RPT_REVCONE=1 -------------
    reconfig(RPT_REVCONE="1")
    step("bunny_revcone", 150, lambda: frametime("bunny"))
    step("shadows_revcone", 150, lambda: frametime("shadows"))

    def revcone_exact():
        if base_img is None:
            return {"skipped": "no base image"}
        img = render_bunny_once()
        d = np.abs(img - base_img)
        return {"max_diff": float(d.max()),
                "frac_diff": float((d.max(-1) > 1e-3).mean())}

    exact = step("revcone_exact", 90, revcone_exact)

    # ------------- XL tier timing A/B (cache-gated) -------------
    from relativitypathtracer_tpu.utils.largedemo import (
        load_large_scene, xl_cache_path)

    def xl_time():
        scene, meta = load_large_scene(levels=4)
        render = build_render_fn(meta, W, H, meta.default_interval, 1)
        samples, _ = chained_samples_ms(render, scene, FrameState.initial(),
                                        nbatch=2, batch=6)
        return round(min(samples), 3)

    xl_cached = OFFICIAL and os.path.exists(xl_cache_path(4))
    if xl_cached:
        step("xl_revcone", 240, xl_time)
    else:
        ART["steps"]["xl_revcone"] = {"skipped": "no XL cache / smoke"}
    reconfig(RPT_REVCONE=None)
    if xl_cached:
        step("xl", 240, xl_time)
    else:
        ART["steps"]["xl"] = {"skipped": "no XL cache / smoke"}
    save()

    # ------------- headline confirm at shipped defaults -------------
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

    skipped = [k for k, v in ART["steps"].items()
               if "skipped" in v and "no XL cache" not in str(v.get("skipped"))]
    if skipped:
        ART["complete"] = False
        ART["incomplete_reason"] = f"budget-skipped: {', '.join(skipped)}"
    else:
        ART["complete"] = True
        ART.pop("incomplete_reason", None)
    ART["done_s"] = round(time.time() - T0, 1)
    if exact is not None and isinstance(exact, dict) \
            and exact.get("max_diff", 1.0) > 1e-3:
        ART["revcone_exactness"] = "FAILED -- do not flip"
    save()
    print(f"[done] {ART['done_s']:.0f}s complete={ART['complete']} -> "
          f"{ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
