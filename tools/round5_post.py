"""Round-5 post-pipeline attribution claim: full-frame DIFFERENTIAL shares.

ATTRIB_r05.json put the bunny post-intersect share (texture + shade +
tonemap + unswizzle) at 2.27 ms by subtraction of full-frame timings --
reliable -- but its stage-ISOLATED decomposition (attrib3) was self-
contradictory (unswizzle alone 0.96 ms vs tonemap+unswizzle together
0.21 ms: isolation forces materialization the fused graph never pays).
This sequence attributes the post share the trustworthy way: full-frame
timings with ONE piece stubbed out (render._post_diag, RPT_POST_DIAG):

  bunny_notex  - bunny  = texture sampling + address math share (small
                          VMEM route);
  arch_notex   - arch   = the 1024^2-atlas XLA row-gather share (the
                          arch <= 4.5 ms question: is the gather really
                          ~3 ms of the 6.7 ms frame?);
  cubes_notex  - cubes  = same, second gather scene;
  bunny_noswz  - bunny  = tile_unswizzle share as actually fused;
  bunny_notm   - bunny  = Hable curve share (layout ops kept).

All stubs render WRONG images (bench.py refuses artifacts while one is
set); every measurement here is timing-only and the defaults are restored
before the closing bench confirm.
Artifacts: ROUND5_POST.json. Usage: python tools/round5_post.py [budget_s]
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
ART_PATH = ART_DIR / "ROUND5_POST.json"
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

    def diag(mode):
        """Set/clear the diagnostic stub; the knob is read at trace time
        inside build_render_fn's jit, so the lru cache must drop."""
        if mode:
            os.environ["RPT_POST_DIAG"] = mode
        else:
            os.environ.pop("RPT_POST_DIAG", None)
        build_render_fn.cache_clear()

    # baselines first (warm compiles at defaults)
    step("bunny", 150, lambda: frametime("bunny"))
    step("arch", 150, lambda: frametime("arch"))
    step("cubes", 150, lambda: frametime("cubes"))

    diag("notex")
    step("bunny_notex", 150, lambda: frametime("bunny"))
    step("arch_notex", 150, lambda: frametime("arch"))
    step("cubes_notex", 150, lambda: frametime("cubes"))
    diag("nofetch")
    # address math LIVE, fetch dropped: (nofetch - notex) = address share,
    # (base - nofetch) = fetch share. Round-5 context: the channel-split
    # kernel did NOT move bunny (ROUND5_POST2.json), so the 1.62 ms bunny
    # texture share is NOT the MXU fetch passes -- this splits it.
    step("bunny_nofetch", 150, lambda: frametime("bunny"))
    diag("noswz")
    step("bunny_noswz", 150, lambda: frametime("bunny"))
    diag("notm")
    step("bunny_notm", 150, lambda: frametime("bunny"))
    diag(None)

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

    # derived shares (full-frame deltas; negative = inside noise)
    s = ART["steps"]

    def share(a, b):
        ra, rb = (s.get(a) or {}).get("result"), (s.get(b) or {}).get("result")
        return round(ra - rb, 3) if isinstance(ra, (int, float)) \
            and isinstance(rb, (int, float)) else None

    ART["shares_ms"] = {
        "bunny_texture": share("bunny", "bunny_notex"),
        "bunny_tex_fetch": share("bunny", "bunny_nofetch"),
        "bunny_tex_address": share("bunny_nofetch", "bunny_notex"),
        "arch_texture_gather": share("arch", "arch_notex"),
        "cubes_texture_gather": share("cubes", "cubes_notex"),
        "bunny_unswizzle": share("bunny", "bunny_noswz"),
        "bunny_tonemap": share("bunny", "bunny_notm"),
    }

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
