"""Round-5 block-size A/B claim: RPT_NB=2048 (two screen tiles per
mesh-kernel block).

ROUND5_FLOOR.json measured the all-miss pipeline floor at 4.33 ms of
bunny's 6.39 (68%) with walkstats showing only ~1.7k walk iterations over
768 blocks -- the frame is dominated by per-block FIXED costs (preamble
DMAs + box slabs + init reduces + Mosaic grid overhead) across five
kernel launches of mostly-empty blocks. Doubling the mesh-kernel block to
2048 lanes halves that block count for the two mesh kernels and the two
live-list builds. Variants:

  nb2048        : NB=2048, SUB=8  (256-lane quad sub-cones -- coarser)
  nb2048_sub16  : NB=2048, SUB=16 (128-lane strips == today's granularity)

Exactness: results are block-grouping-independent (CI:
test_nb2048_matches_jnp); the on-chip nb_exact step diffs a full bunny
frame against the NB=1024 default (tie flips allowed -- threshold is the
parity budget, not bit equality, because bucket order changes can flip
exact fp ties).

Artifacts: ROUND5_NB.json; verdict via decide_flips (RPT_NB entries).
Usage: python tools/round5_nb.py [budget_s]
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
ART_PATH = (REPO if OFFICIAL else pathlib.Path("/tmp")) / "ROUND5_NB.json"
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
    except Exception as e:  # noqa: BLE001 -- a step must not sink the claim
        traceback.print_exc()
        ART["steps"][name] = {"s": round(time.time() - t, 1),
                              "error": str(e)[:200]}
        print(f"[{name}] ERROR: {e}", flush=True)
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
    from relativitypathtracer_tpu.ops.pallas import (
        analytic_kernels, mesh_batch, mesh_kernels)
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

    def reconfig(nb: int, sub: int):
        """Import-time module constants: setattr + full cache clear (the
        test-suite mechanism; single-mesh scenes only touch mesh_kernels,
        but clear everything anyway)."""
        mesh_kernels.NB = nb
        mesh_kernels.SUB = sub
        mesh_kernels.shared_nearest_hit.clear_cache()
        mesh_kernels.general_min_t.clear_cache()
        mesh_batch.batched_nearest_shared.clear_cache()
        mesh_batch.batched_min_t_general.clear_cache()
        analytic_kernels.analytic_nearest_shared.clear_cache()
        analytic_kernels.analytic_min_t_general.clear_cache()
        build_render_fn.cache_clear()

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

    def probe_frame():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, 128, 96, mt.default_interval, 1)
        img = render(sc, FrameState.initial())
        return {"mean_pixel": round(float(jnp.mean(img)), 5)}

    step("probe_frame", 180, probe_frame)

    # Baselines at the defaults (NB=1024, SUB=8).
    step("bunny", 150, lambda: frametime("bunny"))
    step("shadows", 150, lambda: frametime("shadows"))
    base_img = None
    if BUDGET - (time.time() - T0) > 90:
        try:
            base_img = render_bunny_once()
        except Exception:  # noqa: BLE001
            traceback.print_exc()

    reconfig(2048, 8)
    step("bunny_nb2048", 150, lambda: frametime("bunny"))
    step("shadows_nb2048", 150, lambda: frametime("shadows"))

    reconfig(2048, 16)
    step("bunny_nb2048_sub16", 150, lambda: frametime("bunny"))
    step("shadows_nb2048_sub16", 150, lambda: frametime("shadows"))

    def nb_exact():
        if base_img is None:
            return {"skipped": "no base image"}
        img = render_bunny_once()
        d = np.abs(img - base_img)
        # tie flips allowed (bucket-order changes); parity-style budget
        return {"max_diff": float(d.max()),
                "frac_gt_1e3": float(np.mean(d.max(-1) > 1e-3))}

    step("nb_exact", 90, nb_exact)
    reconfig(int(os.environ.get("RPT_NB", "1024") or 1024),
             int(os.environ.get("RPT_SUB", "8") or 8))

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
