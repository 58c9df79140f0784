"""Post-optimization confirmation claim: per-scene frametimes + the bench
protocol after the fused attribute-select landed (ATTRIB_r05 attrib3 found
shade's 8 separate one-hot select pipelines at ~1.1 ms/frame on bunny; they
are now ONE (K, O) @ (O, N) MXU dot). Writes ROUND5_CONFIRM.json with the
same complete/skip semantics as the other round-5 sequences.

Usage: python tools/round5_confirm.py [budget_s]   (default 900)
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
# RPT_CONFIRM_ART renames the artifact so later confirms (e.g. the
# texaddr-flip ROUND5_TEXADDR2.json) don't overwrite earlier evidence.
ART_PATH = (REPO if OFFICIAL else pathlib.Path("/tmp")) / os.environ.get(
    "RPT_CONFIRM_ART", "ROUND5_CONFIRM.json")
ART: dict = {"budget_s": BUDGET, "steps": {}, "resolution": f"{W}x{H}",
             "complete": False,
             "incomplete_reason": "in progress / killed before finish"}


def save() -> None:
    ART_PATH.write_text(json.dumps(ART, indent=1))


def step(name, cost_s, fn):
    if BUDGET - (time.time() - T0) < cost_s:
        ART["steps"][name] = {"skipped": "budget"}
        save()
        return None
    t = time.time()
    try:
        res = fn()
        ART["steps"][name] = {"s": round(time.time() - t, 1), "result": res}
        print(f"[{name}] ok ({time.time()-t:.0f}s): {res}", flush=True)
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        ART["steps"][name] = {"error": str(e)[:200]}
        res = None
    save()
    return res


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    step("devices", 60, devices)
    if "result" not in ART["steps"].get("devices", {}):
        return

    def frametime(name, reps=3, frames=12):
        host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1)
        samples, _ = chained_samples_ms(render, sc, FrameState.initial(),
                                        nbatch=reps, batch=frames)
        return round(min(samples), 3)

    step("bunny", 180, lambda: frametime("bunny"))
    step("shadows", 120, lambda: frametime("shadows"))
    step("cubes", 120, lambda: frametime("cubes"))
    step("arch", 120, lambda: frametime("arch"))

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

    step("bench_protocol", 200, bench_inline)

    # quick parity sanity on the fused select (full-res bunny vs oracle)
    def parity_bunny():
        from relativitypathtracer_tpu.utils.parity import fullres_parity

        res = fullres_parity("bunny", W, H)
        return {k: res[k] for k in ("frac_bad", "ok")}

    step("parity_bunny", 240, parity_bunny)

    skipped = [k for k, v in ART["steps"].items() if "skipped" in v]
    ART["complete"] = not skipped
    if skipped:
        ART["incomplete_reason"] = f"budget-skipped: {', '.join(skipped)}"
    else:
        ART.pop("incomplete_reason", None)
    ART["done_s"] = round(time.time() - T0, 1)
    save()
    print(f"[done] complete={ART['complete']} -> {ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
