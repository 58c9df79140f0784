"""Round-5 first claim: stage attribution + the A/Bs round 4 left open.

VERDICT r4 ordered the perf work to start with a COMMITTED attribution of
the remaining 7.42 ms bunny frame (item 2) and to finish what the
half-empty ROUND4_FOLLOWUP.json owed (items 3/6): the RPT_SHADOW_CULL=none
A/B under the new defaults, the device-side interactive fps figure, and the
SUB=16 probe. This sequence lands all of it in ONE relay claim, in
judge-priority order, writing incrementally so a wedge preserves results:

  1. devices + proof-of-life render (CPU-fallback abort for official runs);
  2. ATTRIB_r05.json -- stage timings on bunny 1024x768 (full / no-shadow /
     interval-0 / primary mesh kernel / live-list build / shadow-style
     general kernel) + walk-iteration scalar stats, so the perf hunt is
     attribution-driven instead of blind;
  3. bench protocol at the shipped defaults (PAIR=1, SUB=8) -- the
     flipped-defaults confirmation the followup owed;
  4. per-scene frametimes (bunny/shadows/cubes/arch);
  5. A/Bs: RPT_SHADOW_CULL=none (bunny+shadows), RPT_SUB=16 (bunny),
     folded-vs-loop MSAA (fold pinned via RPT_MSAA_FOLD=1 vs the shipped
     loop default, msaa=2 and 4 on bunny -- VERDICT item 4's evidence);
  6. device-side fps at 960x540 (the renderer-only interactive capability).

Every artifact carries {"complete": bool, "incomplete_reason": ...}
(VERDICT item 6): a budget- or watchdog-killed run is distinguishable from
a finished one because `complete` flips to true ONLY in the final step.

Usage: python tools/round5_claim.py [budget_s]   (default 2400)
Artifacts: ROUND5_CLAIM1.json + ATTRIB_r05.json (official 1024x768 runs
write to the repo; smoke sizes via RPT_ONECLAIM_SIZE write to /tmp).
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
ART_PATH = ART_DIR / "ROUND5_CLAIM1.json"
ATTRIB_PATH = ART_DIR / "ATTRIB_r05.json"
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
        FrameState, TILE, _round_up, build_render_fn, object_frames,
        tile_swizzle)
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
        """Switch a trace-time knob in-process (test-suite mechanism).
        env=None restores the shipped default."""
        from relativitypathtracer_tpu.ops.pallas import (
            analytic_kernels, mesh_batch, mesh_kernels)

        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)
        if "RPT_SUB" in env:  # module constant, read at import time
            mesh_kernels.SUB = int(env["RPT_SUB"] or 8)
        mesh_kernels.shared_nearest_hit.clear_cache()
        mesh_kernels.general_min_t.clear_cache()
        mesh_batch.batched_nearest_shared.clear_cache()
        mesh_batch.batched_min_t_general.clear_cache()
        analytic_kernels.analytic_nearest_shared.clear_cache()
        analytic_kernels.analytic_min_t_general.clear_cache()
        build_render_fn.cache_clear()

    # ---------------- stage attribution (ATTRIB_r05.json) ----------------
    # Decomposes the bunny frame with the SAME chained-frames estimator as
    # the bench headline. Each sub-pipeline is jitted over (scene, state)
    # with the swizzled ray directions closed over as a device constant
    # (state-independent, like build_render_fn's own camera setup).
    ATTRIB: dict = {"resolution": f"{W}x{H}", "scene": "bunny",
                    "complete": False, "version": __version__,
                    "protocol": "utils/timing.chained_samples_ms, "
                                "best of 3x12 chained frames"}

    def attrib_save():
        ATTRIB_PATH.write_text(json.dumps(ATTRIB, indent=1))

    def attribution():
        import dataclasses

        from relativitypathtracer_tpu.ops.camera import camera_ray_dirs
        from relativitypathtracer_tpu.ops.intersect import (
            apply_affine3, apply_linear3, norm3)
        from relativitypathtracer_tpu.ops.mesh_intersect import (
            mesh_intersect_shared, mesh_min_t_general)
        from relativitypathtracer_tpu.ops.pallas.mesh_kernels import (
            NB, live_chunk_lists)

        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        scene, meta = build_scene(host)
        state = FrameState.initial()
        interval = meta.default_interval

        ph, pw = _round_up(H, TILE), _round_up(W, TILE)
        dirs = camera_ray_dirs(W, H, pad_width=pw, pad_height=ph)
        dirs_t = jax.device_put(tile_swizzle(dirs.reshape(-1, 3).T, ph, pw))
        n = dirs_t.shape[1]
        k, mi = 0, meta.mesh_ids[0]
        perm = (jnp.asarray(meta.mesh_perms[k], jnp.int32)
                if meta.mesh_perms[k] else None)
        rng = meta.mesh_tri_ranges[k]
        static = scene.mesh_static[k]

        def timed(fn, frames=12, reps=3):
            samples, _ = chained_samples_ms(fn, scene, state, nbatch=reps,
                                            batch=frames)
            return round(min(samples), 3)

        # full frame at the shipped defaults
        build_render_fn.cache_clear()
        full = timed(build_render_fn(meta, W, H, interval, 1))
        ATTRIB["full_ms"] = full
        attrib_save()

        # no lights => primary walk + analytic + texture + shade, no shadows
        meta_nl = dataclasses.replace(meta, light_ids=())
        build_render_fn.cache_clear()
        noshadow = timed(build_render_fn(meta_nl, W, H, interval, 1))
        ATTRIB["noshadow_ms"] = noshadow
        ATTRIB["shadow_pass_ms"] = round(full - noshadow, 3)
        attrib_save()

        # interval=0: no lights by semantics AND instantaneous rays
        i0 = timed(build_render_fn(meta, W, H, 0, 1))
        ATTRIB["interval0_ms"] = i0
        attrib_save()

        # primary mesh kernel only (the production shared-origin walk)
        @jax.jit
        def primary_only(scene, state):
            with jax.default_matmul_precision("highest"):
                L, _inv, stat_cam = object_frames(scene.objects, state)
                d4 = L[mi] @ jnp.concatenate(
                    [jnp.full((1, n), float(interval)), dirs_t], axis=0)
                return mesh_intersect_shared(
                    scene.mesh, rng, scene.objects.m[mi],
                    scene.objects.inv_m[mi], stat_cam[mi, 1:4], d4[1:4],
                    perm=perm, static=static)[0]

        ATTRIB["primary_mesh_ms"] = timed(primary_only)
        attrib_save()

        # live-list build alone (the per-block cull + ordering pass)
        @jax.jit
        def livelists_only(scene, state):
            with jax.default_matmul_precision("highest"):
                L, _inv, stat_cam = object_frames(scene.objects, state)
                d4 = L[mi] @ jnp.concatenate(
                    [jnp.full((1, n), float(interval)), dirs_t], axis=0)
                ro = apply_affine3(scene.objects.inv_m[mi], stat_cam[mi, 1:4])
                dd = apply_linear3(scene.objects.inv_m[mi], d4[1:4])
                dh = dd / norm3(dd)
                n_pad = _round_up(n, NB)
                dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)),
                               constant_values=1.0)
                ro_p = jnp.broadcast_to(ro[:, None], (3, n_pad))
                return live_chunk_lists(static.spheres, dh_p, ro_p)[0]

        ATTRIB["live_lists_ms"] = timed(livelists_only)
        attrib_save()

        # shadow-style general-origin walk at full ray count (upper bound
        # for one light's occlusion kernel; real tmax culling not applied)
        @jax.jit
        def general_only(scene, state):
            with jax.default_matmul_precision("highest"):
                L, _inv, _sc = object_frames(scene.objects, state)
                o4 = jnp.concatenate(
                    [jnp.zeros((1, n)), dirs_t * 2.0 + 1.0], axis=0)
                d4 = L[mi] @ jnp.concatenate(
                    [jnp.full((1, n), float(interval)), -dirs_t], axis=0)
                o4 = L[mi] @ o4
                return mesh_min_t_general(
                    scene.mesh, rng, scene.objects.m[mi],
                    scene.objects.inv_m[mi], o4[1:4], d4[1:4], perm=perm,
                    tmax=jnp.full((n,), 8.0), static=static)

        ATTRIB["general_walk_synthetic_ms"] = timed(general_only)
        ATTRIB["residual_analytic_texture_shade_ms"] = round(
            noshadow - ATTRIB["primary_mesh_ms"], 3)
        attrib_save()

        # walk-iteration scalar stats: mean while-loop trips per block for
        # the REAL primary rays (single-scalar fetches -- relay-cheap)
        @jax.jit
        def primary_iters(scene, state):
            with jax.default_matmul_precision("highest"):
                L, _inv, stat_cam = object_frames(scene.objects, state)
                d4 = L[mi] @ jnp.concatenate(
                    [jnp.full((1, n), float(interval)), dirs_t], axis=0)
                out = mesh_intersect_shared(
                    scene.mesh, rng, scene.objects.m[mi],
                    scene.objects.inv_m[mi], stat_cam[mi, 1:4], d4[1:4],
                    perm=perm, static=static, debug_iters=True)
                it = out[-1].astype(jnp.float32)
                return (jnp.mean(it), jnp.max(it),
                        jnp.mean(it > 0).astype(jnp.float32))

        mean_it, max_it, frac_live = primary_iters(scene, state)
        ATTRIB["primary_iters"] = {
            "mean_per_block": round(float(mean_it), 2),
            "max": int(max_it), "frac_blocks_live": round(float(frac_live), 3)}
        ATTRIB["complete"] = True
        attrib_save()
        return {"full": full, "noshadow": noshadow,
                "shadow_pass": ATTRIB["shadow_pass_ms"],
                "primary_mesh": ATTRIB["primary_mesh_ms"],
                "live_lists": ATTRIB["live_lists_ms"],
                "residual": ATTRIB["residual_analytic_texture_shade_ms"]}

    step("attribution", 420, attribution)

    # ---------------- headline at the shipped defaults ----------------
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

    step("bench_protocol", 240, bench_inline)
    step("bunny", 120, lambda: frametime("bunny"))
    step("shadows", 120, lambda: frametime("shadows"))
    step("cubes", 120, lambda: frametime("cubes"))
    step("arch", 120, lambda: frametime("arch"))

    # ---------------- the open A/Bs ----------------
    reconfig(RPT_SHADOW_CULL="none")
    step("bunny_cull_none", 120, lambda: frametime("bunny"))
    step("shadows_cull_none", 120, lambda: frametime("shadows"))
    reconfig(RPT_SHADOW_CULL=None)

    reconfig(RPT_SUB="16")
    step("bunny_sub16", 120, lambda: frametime("bunny"))
    reconfig(RPT_SUB=None)

    # folded vs per-sample-loop MSAA (VERDICT r4 item 4). The LOOP became
    # the default after this A/B landed (commit 3654930), so the baseline
    # arm must PIN the fold explicitly -- both arms on the ambient default
    # would measure the loop against itself (the stale-recipe class the r4
    # advisor flagged for PAIR/SUB).
    reconfig(RPT_MSAA_FOLD="1")
    step("bunny_msaa2", 150, lambda: frametime("bunny", msaa=2, frames=6))
    step("bunny_msaa4", 240,
         lambda: frametime("bunny", msaa=4, reps=2, frames=4))
    reconfig(RPT_MSAA_FOLD=None)  # shipped default: the per-sample loop
    step("bunny_msaa2_loop", 150, lambda: frametime("bunny", msaa=2, frames=6))
    step("bunny_msaa4_loop", 240,
         lambda: frametime("bunny", msaa=4, reps=2, frames=4))

    # ---------------- device-side interactive capability ----------------
    def device_fps():
        ms = frametime("bunny", w=960, h=540)
        return {"device_ms_960x540": ms,
                "device_fps_960x540": round(1e3 / ms, 1)}

    step("device_fps", 150, device_fps)

    # complete means EVERY step ran (ok or errored); budget-skips leave the
    # artifact explicitly partial so a judge can tell it from a finished run
    # (VERDICT r4 item 6).
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
