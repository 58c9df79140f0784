"""Round-4 single-claim TPU sequence: EVERY round-4 deliverable in ONE
process, so a stingy relay grant (round 3 saw one claim per ~20-min recovery
window) is never spent on a bare probe or lost to subprocess re-claims.

Ordering is risk-tiered: everything that routes through TPU-proven kernels
(bunny/shadows frametimes + the all-8 parity sweep, msaa, A/B knobs, the
large tier, interactivity, arch/cubes on the default XLA-gather texture
route) runs FIRST; the windowed texture kernel -- the round-3 relay-wedge
suspect, opt-in under the WINDOWED_PROVEN gate -- runs dead LAST as a
boundary, and its arch/cubes A/B only runs if its texprobe is both
wedge-free and exact. Artifacts are written to disk INCREMENTALLY after every step
(ROUND4_ONECLAIM.json + PARITY_r04.json + INTERACT_r04.json), so a
mid-sequence wedge preserves everything already earned.

A/B knobs (RPT_SHADOW_CULL / RPT_PAIR / RPT_SUB) are re-configured
IN-PROCESS: they are read at trace time (RPT_SUB at import time, patched
directly), so clearing the kernel-wrapper jit caches + the renderer's
lru_cache forces a retrace under the new mode -- the same mechanism the
test suite uses -- with no second relay claim.

Usage: nohup python tools/round4_one_claim.py [budget_s] > /tmp/oneclaim4.log &
       (default budget 5400 s; steps are skipped, not truncated, when the
        remaining budget is below their historical cost)
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

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 5400.0
T0 = time.time()
# Smoke mode: RPT_ONECLAIM_SIZE=WxH runs the whole sequence at a small
# resolution with artifacts redirected to /tmp (never clobbers the official
# round artifacts, which are only written at the protocol 1024x768).
W, H = (int(x) for x in
        os.environ.get("RPT_ONECLAIM_SIZE", "1024x768").lower().split("x"))
OFFICIAL = (W, H) == (1024, 768)
ART_DIR = REPO if OFFICIAL else pathlib.Path("/tmp")
ROUND_TAG = "04" if OFFICIAL else "99smoke"
ART_PATH = ART_DIR / "ROUND4_ONECLAIM.json"
ART: dict = {"budget_s": BUDGET, "steps": {}, "resolution": f"{W}x{H}"}


def left() -> float:
    return BUDGET - (time.time() - T0)


def save() -> None:
    ART_PATH.write_text(json.dumps(ART, indent=1))


def step(name: str, cost_s: float, fn):
    """Run one step with its own try/except; record result or error, save."""
    if left() < cost_s:
        ART["steps"][name] = {"skipped": f"budget ({left():.0f}s left, "
                                         f"needs ~{cost_s:.0f}s)"}
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

    # CPU smoke hook (the axon plugin ignores JAX_PLATFORMS): RPT_PLATFORM=cpu
    if os.environ.get("RPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RPT_PLATFORM"])

    from relativitypathtracer_tpu import __version__, build_scene, load_scene_file
    from relativitypathtracer_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    from relativitypathtracer_tpu.render import FrameState, build_render_fn

    ART["version"] = __version__

    def devices():
        d = jax.devices()
        ART["platform"] = jax.default_backend()
        # A sideways-failing axon plugin lets jax FALL BACK to cpu instead
        # of blocking; an official (unpinned) sequence must abort rather
        # than spend hours labelling CPU frames as on-chip results
        # (bench.cpu_fallback is the same policy for the driver bench).
        if (OFFICIAL and ART["platform"] == "cpu"
                and not os.environ.get("RPT_PLATFORM")):
            raise RuntimeError("official run fell back to the CPU backend")
        return str(d)

    step("devices", 120, devices)
    if "result" not in ART["steps"].get("devices", {}):
        print("no chip -- aborting", flush=True)
        return

    import jax.numpy as jnp

    from relativitypathtracer_tpu.utils.timing import (
        chained_samples_ms, percentile)

    def frametime(name, msaa=1, reps=3, frames=12):
        """Best-of-reps chained-frame ms (shared estimator, utils/timing)."""
        host = load_scene_file(str(REF / "Scenes" / f"{name}.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, W, H, mt.default_interval, msaa)
        samples, _ = chained_samples_ms(render, sc, FrameState.initial(),
                                        nbatch=reps, batch=frames)
        return round(min(samples), 3)

    def reconfig(**env):
        """Switch a trace-time knob in-process (test-suite mechanism)."""
        from relativitypathtracer_tpu.ops.pallas import mesh_kernels

        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = str(v)
        if "RPT_SUB" in env:  # module constant, read at import time
            # env=None restores the r4 default (8), matching the module's
            # import-time fallback -- a stale `or 4` here confounded every
            # post-restore A/B at SUB=4 (ADVICE r4, high).
            mesh_kernels.SUB = int(env["RPT_SUB"] or 8)
        from relativitypathtracer_tpu.ops.pallas import (
            analytic_kernels, mesh_batch)

        mesh_kernels.shared_nearest_hit.clear_cache()
        mesh_kernels.general_min_t.clear_cache()
        mesh_batch.batched_nearest_shared.clear_cache()
        mesh_batch.batched_min_t_general.clear_cache()
        analytic_kernels.analytic_nearest_shared.clear_cache()
        analytic_kernels.analytic_min_t_general.clear_cache()
        build_render_fn.cache_clear()

    # ---- tier 0a: proof-of-life render (~45 s incl. compile). Every
    # wedged attempt today died inside jax.devices(), so a grant that gets
    # past `devices` is precious -- bank evidence that the FULL pipeline
    # executes on the chip before the multi-minute protocol compiles ----
    def probe_frame():
        host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
        sc, mt = build_scene(host)
        render = build_render_fn(mt, 128, 96, mt.default_interval, 1)
        t = time.time()
        img = render(sc, FrameState.initial())
        mean = float(jnp.mean(img))  # forces completion through the relay
        # Deliberately NOT a frame-time datum (CLAUDE.md: all frame timing
        # goes through utils/timing.py): this wall number includes compile
        # AND the un-subtracted relay RTT -- it exists only to prove the
        # pipeline executed. bench_protocol right after owns the timings.
        return {"wall_s_incl_compile_and_rtt": round(time.time() - t, 1),
                "mean_pixel": round(mean, 5)}

    step("probe_frame", 90, probe_frame)

    # ---- tier 0: the headline bench protocol FIRST (VERDICT r3 item 1 --
    # the single most important artifact; round 3 showed a recovery window
    # can grant exactly one short claim, so the p50/Mrays number must land
    # within the first minutes, before anything optional) ----
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

    step("bench_protocol", 300, bench_inline)

    # ---- tier 1: round-2-proven kernels ----
    step("bunny", 240, lambda: frametime("bunny"))
    step("shadows", 180, lambda: frametime("shadows"))

    from relativitypathtracer_tpu.utils.parity import MAX_FRAC_BAD, fullres_parity

    parity_results = []

    def parity(name, state=None, tag=None):
        res = fullres_parity(name, W, H, state=state, tag=tag)
        parity_results.append(res)
        # incremental PARITY artifact after every scene
        (ART_DIR / f"PARITY_r{ROUND_TAG}.json").write_text(json.dumps({
            "resolution": f"{W}x{H}", "max_frac_bad": MAX_FRAC_BAD,
            "platform": jax.default_backend(), "version": __version__,
            "scenes": parity_results,
            "ok": all(r["ok"] for r in parity_results),
            "complete": False,
        }, indent=1))
        return res

    step("parity_bunny", 240, lambda: parity("bunny"))
    step("parity_shadows", 180, lambda: parity("shadows"))

    # ---- big-atlas scenes on the (safe, default) XLA-gather route
    # (VERDICT item 2 wants a recorded arch/cubes frametime either way) ----
    step("arch", 300, lambda: frametime("arch"))
    step("cubes", 300, lambda: frametime("cubes"))

    # ---- msaa sublinearity (VERDICT item 6) ----
    step("bunny_msaa2", 240, lambda: frametime("bunny", msaa=2, frames=6))
    step("bunny_msaa4", 300, lambda: frametime("bunny", msaa=4, frames=6))

    # ---- all-8 full-res parity sweep (VERDICT item 3; all scenes route
    # through TPU-proven kernels under the WINDOWED_PROVEN gate) ----
    boosted = FrameState(
        cam_velocity=jnp.array([0.3, 0.1, -0.2], jnp.float32),
        cam_pos=jnp.array([2.5, 0, 0, 0], jnp.float32),
    )
    for name in ("arch", "cube", "cubes", "ladder_paradox", "rulers", "soccer"):
        step(f"parity_{name}", 240, lambda n=name: parity(n))
    step("parity_rulers_boosted", 240,
         lambda: parity("rulers", state=boosted, tag="rulers_boosted"))
    if parity_results:
        p = json.loads((ART_DIR / f"PARITY_r{ROUND_TAG}.json").read_text())
        p["complete"] = len(parity_results) >= 9
        (ART_DIR / f"PARITY_r{ROUND_TAG}.json").write_text(json.dumps(p, indent=1))

    # ---- large-mesh tier ----
    def large():
        from relativitypathtracer_tpu.utils.largedemo import large_parity_and_time

        return large_parity_and_time(W, H)

    step("large_mesh", 600, large)

    # ---- live interactivity (VERDICT item 5): real HTTP viewer in-process ----
    def interact():
        from tools.interact_bench import main as ib_main

        size = "960x540" if OFFICIAL else f"{W}x{H}"
        rc = ib_main(["--scene", "bunny", "--size", size, "--round", ROUND_TAG])
        return {"rc": rc, "artifact": f"INTERACT_r{ROUND_TAG}.json"}

    step("interact", 420, interact)

    # ---- A/B knobs, in-process (VERDICT item 4 + round-4 pairing; builder-
    # facing gate-flip evidence, so they run after every judge-facing
    # artifact is already on disk) ----
    def ab(name, scene, **env):
        def run():
            reconfig(**env)
            try:
                return frametime(scene)
            finally:
                reconfig(RPT_SHADOW_CULL=None, RPT_PAIR=None, RPT_SUB=None,
                         RPT_ABOUND=None, RPT_WINDOWED_MAX_ROWS=None,
                         RPT_ORDER2=None)
        step(name, 240, run)

    # Since the round-4 flips, ambient defaults ARE pairing + SUB=8: the
    # unsuffixed baseline steps above measure that config, and the A/Bs
    # below measure each knob's OTHER direction explicitly (RPT_PAIR=0 /
    # RPT_SUB=4 are the escapes; decide_flips reads these names).
    ab("bunny_cull_none", "bunny", RPT_SHADOW_CULL="none")
    ab("shadows_cull_none", "shadows", RPT_SHADOW_CULL="none")
    ab("bunny_nopair", "bunny", RPT_PAIR="0")
    ab("shadows_nopair", "shadows", RPT_PAIR="0")
    ab("bunny_order2", "bunny", RPT_ORDER2="8")
    ab("shadows_order2", "shadows", RPT_ORDER2="8")
    ab("cubes_nopair", "cubes", RPT_PAIR="0")  # analytic-kernel pairing
    ab("cubes_abound", "cubes", RPT_ABOUND="1")  # sky-lane walk-bound pre-pass
    ab("bunny_sub4", "bunny", RPT_SUB="4")
    ab("bunny_sub16", "bunny", RPT_SUB="16")

    # ================= WEDGE-RISK BOUNDARY =================
    # Everything below exercises the windowed Morton texture kernel (the
    # round-3 relay-wedge suspect, since CPU-fixed: HBM-pinned atlas,
    # XLA-side address math, shift-free tile_slot).
    def texprobe():
        import numpy as np

        from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
            footprint_sample_windowed)
        from relativitypathtracer_tpu.ops.texture_sample import (
            bilinear_sample_footprint)

        host = load_scene_file(str(REF / "Scenes" / "cube.txt"))
        sc, _mt = build_scene(host)
        rng = np.random.default_rng(0)
        n = 2048
        uv = jnp.asarray(rng.uniform(0.01, 0.99, (2, n)).astype(np.float32))
        fp = jnp.broadcast_to(jnp.asarray(sc.tex_fp)[0][:, None], (6, n))
        w = jnp.full((n,), 224, jnp.int32)
        h = jnp.full((n,), 225, jnp.int32)
        ref = bilinear_sample_footprint(sc.tex_quads, fp, w, h, uv)
        _ = float(jnp.sum(ref))
        out = footprint_sample_windowed(sc.tex_quads, fp, w, h, uv,
                                        interpret=not OFFICIAL)
        return {"max_diff": float(jnp.max(jnp.abs(out - ref)))}

    tex_ok = step("texprobe", 420, texprobe)
    if tex_ok is not None and tex_ok.get("max_diff", 1.0) < 1e-5:
        # Proven wedge-free AND correct: A/B the windowed route. A result
        # with a bad max_diff means the kernel RUNS but fetches wrong texels
        # -- timing it would invite flipping WINDOWED_PROVEN on speed alone.
        ab("arch_windowed", "arch", RPT_WINDOWED_MAX_ROWS="1100000")
        ab("cubes_windowed", "cubes", RPT_WINDOWED_MAX_ROWS="1100000")
    else:
        print("texprobe failed or inexact -- windowed kernel stays retired "
              "(keep WINDOWED_PROVEN=False / RPT_WINDOWED_MAX_ROWS=0)",
              flush=True)

    ART["done"] = True
    save()
    print(f"[done] {time.time()-T0:.0f}s, artifacts: ROUND4_ONECLAIM.json "
          f"PARITY_r04.json INTERACT_r04.json", flush=True)


if __name__ == "__main__":
    main()
