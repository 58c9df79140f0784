"""Round-4 follow-up claim: confirm the flipped defaults on-chip.

The first round-4 claim (tools/round4_one_claim.py -> ROUND4_ONECLAIM.json)
measured every knob A/B against the THEN-defaults (no pairing, SUB=4) and
the verdicts flipped RPT_PAIR/RPT_SUB defaults in-code. This short second
claim re-measures the production configuration as it will actually ship:

  1. bench protocol (p50 over 120 chained frames) at the NEW defaults --
     the number the driver's end-of-round bench should reproduce;
  2. per-scene frametimes (bunny/shadows/cubes/arch) at the new defaults;
  3. the one A/B the mechanical rule left open: RPT_SHADOW_CULL=none vs
     the boxfar default, now under pairing+SUB=8 (ROUND4_ONECLAIM showed
     none ahead on both scenes but under the 3% uniform-flip bar);
  4. a device-side interactive figure: 960x540 bunny chained-frame ms
     (the renderer's own fps capability, separating it from the relay
     tunnel's ~113 ms/frame image-fetch that bounds INTERACT_r04.json's
     wall fps) -- merged into INTERACT_r04.json as device_* fields.

Artifacts write incrementally to ROUND4_FOLLOWUP.json. One process, one
relay claim; run only when no other TPU process is live (CLAUDE.md).

Usage: python tools/round4_followup.py [budget_s]   (default 900)
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

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
T0 = time.time()
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_DIR = REPO if OFFICIAL else pathlib.Path("/tmp")
ART_PATH = ART_DIR / "ROUND4_FOLLOWUP.json"
ART: dict = {"budget_s": BUDGET, "steps": {}, "resolution": f"{W}x{H}"}


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

    def frametime(name, msaa=1, reps=3, frames=12, w=W, h=H):
        host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, w, h, mt.default_interval, msaa)
        samples, _ = chained_samples_ms(render, sc, FrameState.initial(),
                                        nbatch=reps, batch=frames)
        return round(min(samples), 3)

    def reconfig(**env):
        from relativitypathtracer_tpu.ops.pallas import (
            analytic_kernels, mesh_batch, mesh_kernels)

        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)
        if "RPT_SUB" in env:
            mesh_kernels.SUB = int(env["RPT_SUB"] or 8)
        mesh_kernels.shared_nearest_hit.clear_cache()
        mesh_kernels.general_min_t.clear_cache()
        mesh_batch.batched_nearest_shared.clear_cache()
        mesh_batch.batched_min_t_general.clear_cache()
        analytic_kernels.analytic_nearest_shared.clear_cache()
        analytic_kernels.analytic_min_t_general.clear_cache()
        build_render_fn.cache_clear()

    # ---- headline at the NEW defaults (pairing on, SUB=8) ----
    def bench_inline():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1, True)
        samples, (_img, aux) = chained_samples_ms(
            render, sc, FrameState.initial(), nbatch=10, batch=12)
        shadow_rays = int(aux["shadow_rays"])
        samples.sort()
        p50 = percentile(samples, 50)
        mrays = (W * H + shadow_rays) / (p50 * 1e3)
        return {"frame_ms_p50": round(p50, 3), "mrays": round(mrays, 3),
                "p95_ms": round(percentile(samples, 95), 3),
                "shadow_rays": shadow_rays}

    step("bench_protocol_newdefaults", 300, bench_inline)
    step("bunny", 120, lambda: frametime("bunny"))
    step("shadows", 120, lambda: frametime("shadows"))
    step("cubes", 120, lambda: frametime("cubes"))
    step("arch", 120, lambda: frametime("arch"))

    # ---- the open A/B: shadow-cull none under the new defaults ----
    reconfig(RPT_SHADOW_CULL="none")
    step("bunny_cull_none", 120, lambda: frametime("bunny"))
    step("shadows_cull_none", 120, lambda: frametime("shadows"))
    reconfig(RPT_SHADOW_CULL=None)

    # ---- does the SUB win extend? 16 = 8x8-lane strips, 4x cull flops ----
    reconfig(RPT_SUB="16")
    step("bunny_sub16", 120, lambda: frametime("bunny"))
    reconfig(RPT_SUB=None)

    # ---- device-side interactive capability (960x540, the INTERACT res) ----
    def device_fps():
        ms = frametime("bunny", w=960, h=540)
        res = {"device_ms_960x540": ms,
               "device_fps_960x540": round(1e3 / ms, 1)}
        ipath = REPO / "INTERACT_r04.json"
        if OFFICIAL and ipath.exists():
            d = json.loads(ipath.read_text())
            d.update(res)
            d["device_note"] = (
                "device_* = renderer-only chained-frame capability on the "
                "chip (utils/timing.py); wall fps above is bound by the "
                "relay tunnel's per-frame image fetch, not the renderer")
            ipath.write_text(json.dumps(d, indent=1))
        return res

    step("device_fps", 120, device_fps)
    ART["done_s"] = round(time.time() - T0, 1)
    save()
    print(f"[done] {ART['done_s']:.0f}s -> {ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
