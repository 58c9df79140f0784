"""Micro-attribution of bunny's post-intersect block (ATTRIB2 found it at
2.27 ms = texture + one-hot/attr machinery + ambient/emissive + tonemap +
unswizzle -- the frame's largest non-walk cost).

Each stage runs on REAL intersect outputs captured once and re-fed through
jax.lax.optimization_barrier (constants alone would constant-fold -- the
relay timing note in ROADMAP), timed with the same chained-frames
estimator as the bench headline. Stages replicate the corresponding
render.shade fragments (render.py:278-337, 428-429) verbatim so the sum
cross-checks against ATTRIB2's subtraction.

Also times the REAL shadow mesh walk (min_t_scene on the actual shadow-ray
geometry) to split the 2.93 ms shadow pass (chain kernel was 0.47 ms).

Artifact: merges an "attrib3" section into ATTRIB_r05.json (official size)
or /tmp/ATTRIB_r05.json. Usage: python tools/round5_attrib3.py [budget_s]
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
ART_PATH = (REPO if OFFICIAL else pathlib.Path("/tmp")) / "ATTRIB_r05.json"


def main() -> None:
    import jax
    import jax.numpy as jnp

    if os.environ.get("RPT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RPT_PLATFORM"])

    from relativitypathtracer_tpu import build_scene, load_scene_file
    from relativitypathtracer_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache()
    import relativitypathtracer_tpu.render as R
    from relativitypathtracer_tpu.ops.camera import camera_ray_dirs
    from relativitypathtracer_tpu.ops.mesh_intersect import _resolve_pallas
    from relativitypathtracer_tpu.utils.timing import chained_samples_ms

    if (OFFICIAL and jax.default_backend() == "cpu"
            and not os.environ.get("RPT_PLATFORM")):
        raise RuntimeError("official run fell back to the CPU backend")

    # Touch the artifact NOW: the claim loop judges liveness by artifact
    # mtime, and the first stage (backend init + intersect capture + first
    # compile) can exceed its grace window.
    prev0 = (json.loads(ART_PATH.read_text()) if ART_PATH.exists()
             else {"resolution": f"{W}x{H}"})
    prev0.setdefault("attrib3", {})["started"] = True
    ART_PATH.write_text(json.dumps(prev0, indent=1))

    host = load_scene_file(str(REF / "Scenes" / "bunny.txt"))
    scene, meta = build_scene(host)
    state = R.FrameState.initial()
    interval = meta.default_interval
    objects = scene.objects
    ph, pw = R._round_up(H, R.TILE), R._round_up(W, R.TILE)
    dirs = camera_ray_dirs(W, H, pad_width=pw, pad_height=ph)
    dirs_t = jax.device_put(R.tile_swizzle(dirs.reshape(-1, 3).T, ph, pw))
    n = dirs_t.shape[1]

    # Capture REAL intersect outputs once (device constants).
    with jax.default_matmul_precision("highest"):
        L_c, inv_L_c, stat_cam_c = R.object_frames(objects, state)
        dir4_c = jnp.concatenate(
            [jnp.full((1, n), float(interval)), dirs_t], axis=0)
        t_c, normal_c, uv_c, obj_c, hit_c = R.intersect_scene(
            scene, meta, L_c, stat_cam_c, dir4_c, interval)
        t_c.block_until_ready()

    def timed(fn, frames=12, reps=3):
        samples, _ = chained_samples_ms(fn, scene, state, nbatch=reps,
                                        batch=frames)
        return round(min(samples), 3)

    OUT = {}

    def finish():
        OUT["resolution"] = f"{W}x{H}"
        OUT["platform"] = jax.default_backend()
        prev = (json.loads(ART_PATH.read_text()) if ART_PATH.exists()
                else {"resolution": f"{W}x{H}"})
        prev["attrib3"] = OUT
        ART_PATH.write_text(json.dumps(prev, indent=1))

    def stage(name, fn, frames=12, reps=3):
        try:
            OUT[name] = timed(jax.jit(fn), frames=frames, reps=reps)
            print(f"[{name}] {OUT[name]} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            OUT[name] = f"error: {str(e)[:120]}"
        finish()  # incremental: a wedge/watchdog kill preserves prior stages
        if BUDGET - (time.time() - T0) < 0:
            sys.exit(0)

    n_obj = meta.num_objects

    def _onehot(obj):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (n_obj, n), 0)
              == obj[None, :])
        return oh, oh.astype(jnp.float32)

    # Full post-intersect no-light bracket + tonemap + unswizzle
    # (render.py:278-337,428-429 + build_render_fn msaa=1 tail): should
    # reproduce ATTRIB2's 2.27 ms subtraction.
    def post_full(scene, state):
        with jax.default_matmul_precision("highest"):
            t, normal, uv, obj, did_hit = jax.lax.optimization_barrier(
                (t_c, normal_c, uv_c, obj_c, hit_c))
            obj_onehot, obj_onehot_f = _onehot(obj)

            def sel_i32(table):
                return jnp.sum(jnp.where(
                    obj_onehot, jnp.asarray(table, jnp.int32)[:, None], 0),
                    axis=0)

            tex_off = sel_i32(objects.tex_offset)
            textured = tex_off != -1
            tex_w = jnp.maximum(sel_i32(objects.tex_w), 1)
            tex_h = jnp.maximum(sel_i32(objects.tex_h), 1)
            from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
                footprint_sample_small)

            fp = jnp.stack([sel_i32(scene.tex_fp[:, k]) for k in range(6)])
            tex_rgb = footprint_sample_small(
                scene.tex_quads, fp, tex_w, tex_h, uv,
                interpret=jax.default_backend() == "cpu")
            flat_rgb = jnp.matmul(objects.color.T, obj_onehot_f)
            hit_color = jnp.where(textured[None, :], tex_rgb, flat_rgb)
            ambient = scene.ambient
            color = hit_color * ambient
            is_light = jnp.sum(jnp.where(
                obj_onehot, objects.light[:, None], False), axis=0)
            color = color + jnp.where(is_light[None, :], hit_color, 0.0)
            miss = jnp.asarray(R.MISS_COLOR, jnp.float32)
            color = jnp.where(did_hit[None, :], color, miss[:, None])
            img = R.tonemap(R.tile_unswizzle(color, ph, pw).T,
                            scene.white_point).reshape(ph, pw, 3)
            return img[:H, :W]

    stage("post_full", post_full)

    # Texture path alone (fp select + address math + small-footprint kernel)
    def texture_only(scene, state):
        with jax.default_matmul_precision("highest"):
            uv, obj = jax.lax.optimization_barrier((uv_c, obj_c))
            obj_onehot, _ = _onehot(obj)

            def sel_i32(table):
                return jnp.sum(jnp.where(
                    obj_onehot, jnp.asarray(table, jnp.int32)[:, None], 0),
                    axis=0)

            tex_w = jnp.maximum(sel_i32(objects.tex_w), 1)
            tex_h = jnp.maximum(sel_i32(objects.tex_h), 1)
            from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
                footprint_sample_small)

            fp = jnp.stack([sel_i32(scene.tex_fp[:, k]) for k in range(6)])
            return footprint_sample_small(
                scene.tex_quads, fp, tex_w, tex_h, uv,
                interpret=jax.default_backend() == "cpu")

    stage("texture_only", texture_only)

    # Split the texture stage: uv->atlas-row address math (XLA, Morton
    # tile_slot) vs everything else (fp selects + the fetch kernel).
    def addr_only(scene, state):
        from relativitypathtracer_tpu.ops.pallas.texture_kernel import (
            _address_lanes)

        with jax.default_matmul_precision("highest"):
            uv, obj = jax.lax.optimization_barrier((uv_c, obj_c))
            obj_onehot, _ = _onehot(obj)

            def sel_i32(table):
                return jnp.sum(jnp.where(
                    obj_onehot, jnp.asarray(table, jnp.int32)[:, None], 0),
                    axis=0)

            tex_w = jnp.maximum(sel_i32(objects.tex_w), 1)
            tex_h = jnp.maximum(sel_i32(objects.tex_h), 1)
            fp = jnp.stack([sel_i32(scene.tex_fp[:, k]) for k in range(6)])
            return _address_lanes(scene.tex_quads.shape[0], fp, tex_w,
                                  tex_h, uv)

    stage("texture_addr_only", addr_only)

    def sel_only(scene, state):
        with jax.default_matmul_precision("highest"):
            uv, obj = jax.lax.optimization_barrier((uv_c, obj_c))
            obj_onehot, _ = _onehot(obj)

            def sel_i32(table):
                return jnp.sum(jnp.where(
                    obj_onehot, jnp.asarray(table, jnp.int32)[:, None], 0),
                    axis=0)

            return jnp.stack(
                [sel_i32(scene.tex_fp[:, k]) for k in range(6)]
                + [jnp.maximum(sel_i32(objects.tex_w), 1),
                   jnp.maximum(sel_i32(objects.tex_h), 1)])

    stage("texture_sel_only", sel_only)

    # Split tonemap vs the unswizzle relayout.
    def hable_only(scene, state):
        with jax.default_matmul_precision("highest"):
            color = jax.lax.optimization_barrier(normal_c)
            return R.tonemap(color.T, scene.white_point)

    stage("tonemap_math_only", hable_only)

    def unswizzle_only(scene, state):
        with jax.default_matmul_precision("highest"):
            color = jax.lax.optimization_barrier(normal_c)
            return R.tile_unswizzle(color, ph, pw).reshape(3, ph, pw)

    stage("unswizzle_only", unswizzle_only)

    # tonemap + unswizzle alone
    def tonemap_only(scene, state):
        with jax.default_matmul_precision("highest"):
            color = jax.lax.optimization_barrier(normal_c)
            img = R.tonemap(R.tile_unswizzle(color, ph, pw).T,
                            scene.white_point).reshape(ph, pw, 3)
            return img[:H, :W]

    stage("tonemap_unswizzle_only", tonemap_only)

    # REAL shadow mesh walk: min_t_scene on the actual shadow geometry
    # (the chain kernel produced it once; its outputs are the constants).
    from relativitypathtracer_tpu.ops.pallas.shadow_chain import (
        pack_chain_mats, pack_light_row, shadow_chain)

    i_light = meta.light_ids[0]
    with jax.default_matmul_precision("highest"):
        mats_c = pack_chain_mats(L_c, inv_L_c, stat_cam_c)
        row_c = pack_light_row(L_c[i_light], inv_L_c[i_light],
                               objects.m[i_light][:3, 3])
        hp_c, ld3_c, ndotl_c, tmax_c, _llen = shadow_chain(
            mats_c, row_c, dir4_c, t_c, normal_c, obj_c, interval,
            interpret=jax.default_backend() == "cpu")
        relevant_c = hit_c & (obj_c != i_light) & (ndotl_c > 0)
        hp_c.block_until_ready()

    def shadow_walk_real(scene, state):
        with jax.default_matmul_precision("highest"):
            hp, ld3, tmax, relevant = jax.lax.optimization_barrier(
                (hp_c, ld3_c, tmax_c, relevant_c))
            L, _inv, _sc = R.object_frames(scene.objects, state)
            return R.scene_min_t(scene, meta, L, hp, ld3, interval, i_light,
                                 tmax=jnp.where(relevant, tmax, 0.0))

    stage("shadow_walk_real", shadow_walk_real)

    finish()
    print(f"[done] -> {ART_PATH}", flush=True)


if __name__ == "__main__":
    main()
