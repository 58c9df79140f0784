"""Round-5 followup claim: residual attribution, the analytic-direct A/B,
and the 1.27M-triangle XL tier -- in ONE relay claim, judge-priority order,
incremental writes, honest complete markers.

ROUND5_CLAIM1.json attributed the bunny frame: primary walk 1.88 ms,
shadow pass 2.93 ms, non-mesh residual 2.54 ms. This sequence:

  1. devices + proof-of-life (CPU-fallback abort for official runs);
  2. ATTRIB2 -- decompose the 2.54 ms residual (full intersect_scene vs
     primary-only gives the analytic+merge share; the shadow_chain kernel
     alone; the rest is texture+shade+tonemap by subtraction);
  3. XL tier: 1,271,808-tri subdivided bunny (39,744 chunks ->
     live_chunk_lists3 super-sphere culling) frame time + full-res oracle
     parity (VERDICT r4 item 3: done = frac_bad ~ 0, <= ~4x the 318k
     tier's 71.5 ms);
  4. A/B RPT_ANALYTIC_DIRECT=99 (analytic objects through direct XLA
     intersects; meshes stay on kernels) on bunny/shadows/cubes/arch;
  5. bench protocol at the shipped defaults (the confirmation the r4
     followup owed is in ROUND5_CLAIM1; this re-confirms after the
     round-5 code landed).

Artifacts: ROUND5_FOLLOWUP.json (+ ATTRIB_r05.json gains the attrib2
section). complete=true ONLY when no step was budget-skipped.
Usage: python tools/round5_followup.py [budget_s]   (default 2400)
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

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0
T0 = time.time()
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_DIR = REPO if OFFICIAL else pathlib.Path("/tmp")
ART_PATH = ART_DIR / "ROUND5_FOLLOWUP.json"
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
    from relativitypathtracer_tpu.render import (
        FrameState, TILE, _round_up, build_render_fn, intersect_scene,
        object_frames, tile_swizzle)
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

    # ------------- ATTRIB2: decompose the 2.54 ms residual -------------
    def attrib2():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        scene, meta = build_scene(host)
        state = FrameState.initial()
        interval = meta.default_interval
        ph, pw = _round_up(H, TILE), _round_up(W, TILE)
        from relativitypathtracer_tpu.ops.camera import camera_ray_dirs

        dirs = camera_ray_dirs(W, H, pad_width=pw, pad_height=ph)
        dirs_t = jax.device_put(tile_swizzle(dirs.reshape(-1, 3).T, ph, pw))
        n = dirs_t.shape[1]

        def timed(fn, frames=12, reps=3):
            samples, _ = chained_samples_ms(fn, scene, state, nbatch=reps,
                                            batch=frames)
            return round(min(samples), 3)

        # full nearest-hit stage (mesh kernel + analytic kernel + merge);
        # minus ROUND5_CLAIM1's primary_mesh 1.88 ms = analytic+merge share
        @jax.jit
        def intersect_only(scene, state):
            with jax.default_matmul_precision("highest"):
                L, _inv, stat_cam = object_frames(scene.objects, state)
                d4 = jnp.concatenate(
                    [jnp.full((1, n), float(interval)), dirs_t], axis=0)
                return intersect_scene(scene, meta, L, stat_cam, d4,
                                       interval)[0]

        out = {"intersect_scene_ms": timed(intersect_only)}

        # the fused shadow-setup chain kernel alone (part of the 2.93 ms
        # shadow pass): hit reconstruction + frame-hopping light direction
        @jax.jit
        def chain_only(scene, state):
            from relativitypathtracer_tpu.ops.pallas.shadow_chain import (
                pack_chain_mats, pack_light_row, shadow_chain)

            with jax.default_matmul_precision("highest"):
                L, inv_L, stat_cam = object_frames(scene.objects, state)
                d4 = jnp.concatenate(
                    [jnp.full((1, n), float(interval)), dirs_t], axis=0)
                i = meta.light_ids[0]
                mats = pack_chain_mats(L, inv_L, stat_cam)
                row = pack_light_row(L[i], inv_L[i],
                                     scene.objects.m[i][:3, 3])
                t = jnp.full((n,), 4.0)
                nrm = dirs_t
                obj = jnp.zeros((n,), jnp.int32)
                return shadow_chain(mats, row, d4, t, nrm, obj, interval,
                                    interpret=jax.default_backend() == "cpu")[0]

        out["shadow_chain_ms"] = timed(chain_only)

        # texture+shade+tonemap share by subtraction against the claim-1
        # numbers (noshadow 4.419 - intersect_scene here)
        attrib_path = REPO / "ATTRIB_r05.json"
        if attrib_path.exists():
            prev = json.loads(attrib_path.read_text())
            if prev.get("resolution") == f"{W}x{H}":
                out["analytic_merge_ms"] = round(
                    out["intersect_scene_ms"] - prev["primary_mesh_ms"], 3)
                out["texture_shade_tonemap_ms"] = round(
                    prev["noshadow_ms"] - out["intersect_scene_ms"], 3)
                prev["attrib2"] = out
                attrib_path.write_text(json.dumps(prev, indent=1))
        return out

    step("attrib2", 420, attrib2)

    # ------------- XL tier: 1.27M triangles -------------
    def xl_tier():
        if not OFFICIAL:
            # 1.27M tris through the CPU jnp fallback is hours, not a smoke:
            # the XL path's exactness is pinned by test_large_mesh's forced
            # lists3 cases; this step is chip-only by construction.
            return {"skipped_smoke": True}
        from relativitypathtracer_tpu.utils.largedemo import (
            large_parity_and_time)

        return large_parity_and_time(W, H, levels=4)

    step("xl_tier", 900, xl_tier)

    # ------------- A/B: analytic objects through direct XLA -------------
    step("bunny", 120, lambda: frametime("bunny"))
    reconfig(RPT_ANALYTIC_DIRECT="99")
    step("bunny_adirect", 150, lambda: frametime("bunny"))
    step("shadows_adirect", 150, lambda: frametime("shadows"))
    step("cubes_adirect", 150, lambda: frametime("cubes"))
    step("arch_adirect", 150, lambda: frametime("arch"))
    reconfig(RPT_ANALYTIC_DIRECT=None)
    step("shadows", 120, lambda: frametime("shadows"))
    step("cubes", 120, lambda: frametime("cubes"))
    step("arch", 120, lambda: frametime("arch"))

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
