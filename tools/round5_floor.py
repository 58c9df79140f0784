"""Pipeline-floor probe: frame time when NO ray hits anything.

walkstats (2026-08-19, bunny 1024x768 on-chip) shows the mesh walks are
iteration-thin: primary 1708 while-loop iterations over 768 blocks (14%
live), shadow 1346 (4% relevant lanes). If iterations were the cost, bunny
would be far under its measured 6.4 ms -- so the frame must be dominated
by work-INDEPENDENT machinery: per-block kernel preambles (DMA + box
slabs + init reduces run for every block, empty or not), the dense cull +
counting-sort list builds, kernel launch overhead, and the (N,)-wide XLA
passes of shade. This probe measures that floor directly: the same jitted
renderer, with the camera translated +200 on z so every object sits
BEHIND the image plane -- every block culls empty, every while_loop runs
zero iterations, and what remains is the fixed pipeline cost. The
rendered image is a valid (all-miss) frame, not a diagnostic stub.

floor / frame_ms tells how much of each scene is machinery vs geometry
work, and whether the next optimization should attack launches/preambles
(floor-bound) or culling/iteration costs (work-bound).

Artifacts: ROUND5_FLOOR.json. Usage: python tools/round5_floor.py [budget_s]
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

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 1200.0
T0 = time.time()
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_PATH = (REPO if OFFICIAL else pathlib.Path("/tmp")) / "ROUND5_FLOOR.json"
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
        ART["steps"][name] = {"s": round(time.time() - t, 1),
                              "error": str(e)[:200]}
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
    from relativitypathtracer_tpu.utils.timing import chained_samples_ms

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

    away = FrameState(jnp.zeros(3, jnp.float32),
                      jnp.asarray([0.0, 0.0, 0.0, 200.0], jnp.float32))

    def frametime(name, state, reps=3, frames=12):
        host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, 1)
        samples, img = chained_samples_ms(render, sc, state,
                                          nbatch=reps, batch=frames)
        return {"ms": round(min(samples), 3),
                "mean_pixel": round(float(jnp.mean(img)), 5)}

    for scene in ("bunny", "arch", "cubes", "shadows"):
        step(scene, 150, lambda s=scene: frametime(s, FrameState.initial()))
        step(f"{scene}_away", 150, lambda s=scene: frametime(s, away))

    s = ART["steps"]

    def ratio(a):
        ra = (s.get(a) or {}).get("result") or {}
        rb = (s.get(f"{a}_away") or {}).get("result") or {}
        if isinstance(ra.get("ms"), (int, float)) and isinstance(
                rb.get("ms"), (int, float)):
            return {"frame_ms": ra["ms"], "floor_ms": rb["ms"],
                    "floor_frac": round(rb["ms"] / ra["ms"], 3)}
        return None

    ART["floors"] = {k: ratio(k) for k in ("bunny", "arch", "cubes",
                                           "shadows")}
    skipped = [k for k, v in ART["steps"].items() if "skipped" in v]
    if skipped:
        ART["incomplete_reason"] = f"budget-skipped: {', '.join(skipped)}"
    else:
        ART["complete"] = True
        ART.pop("incomplete_reason", None)
    ART["done_s"] = round(time.time() - T0, 1)
    save()
    print(f"[done] complete={ART['complete']} -> {ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
