"""Benchmark: bunny.txt at 1024x768 on the default JAX backend (TPU).

Protocol (BASELINE.md): p50 frame time over repeated frames at a fixed
deterministic state; Mrays/sec counts primary rays + shadow rays actually
traced. The baseline is the native C++ CPU oracle (the OpenCL-on-CPU
stand-in) running the same scene/resolution on this host.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

Timing note: on the axon TPU relay, block_until_ready() does not synchronize;
completion is forced with a tiny scalar fetch and the relay round-trip is
measured separately and subtracted.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
REF = pathlib.Path(os.environ.get("REF_ASSETS", "/root/reference"))
W, H = 1024, 768
FRAMES = 30
BASELINE_CACHE = REPO / "BASELINE_MEASURED.json"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_ours(scene, meta):
    import jax.numpy as jnp

    from relativitypathtracer_tpu.render import FrameState, build_render_fn

    render = build_render_fn(meta, W, H, meta.default_interval, 1, True)
    state = FrameState.initial()
    img, aux = render(scene, state)
    shadow_rays = int(aux["shadow_rays"])
    _ = float(jnp.sum(img))  # settle compile + queue
    t0 = time.perf_counter()
    _ = float(jnp.sum(img))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(FRAMES):
        img, aux = render(scene, state)
    _ = float(jnp.sum(img))
    per_frame_ms = (time.perf_counter() - t0 - rtt) / FRAMES * 1e3
    return per_frame_ms, shadow_rays


def measure_baseline(scene, meta):
    """Run the C++ CPU oracle on the same scene/resolution; cache the result."""
    if BASELINE_CACHE.exists():
        try:
            cached = json.loads(BASELINE_CACHE.read_text())
            if cached.get("width") == W and cached.get("height") == H:
                return cached
        except (ValueError, KeyError):
            pass
    binary = REPO / "native" / "cpu_reference"
    if not binary.exists():
        subprocess.run(["make", "-C", str(REPO / "native")], check=True,
                       capture_output=True)
    from relativitypathtracer_tpu.render import FrameState
    from relativitypathtracer_tpu.utils.scene_blob import write_scene_blob

    blob = "/tmp/bench_baseline.blob"
    write_scene_blob(blob, scene, meta, FrameState.initial(), W, H)
    out = subprocess.run(
        [str(binary), blob, "/tmp/bench_baseline.rgb", "3"],
        check=True, capture_output=True, text=True,
    )
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    stats["note"] = "C++ CPU oracle (reference algorithm), this host"
    BASELINE_CACHE.write_text(json.dumps(stats, indent=1))
    return stats


def main():
    import jax

    from relativitypathtracer_tpu import build_scene, load_scene_file

    scene_path = REF / "Scenes" / "bunny.txt"
    log(f"loading {scene_path}")
    host = load_scene_file(str(scene_path))
    scene, meta = build_scene(host)

    log("measuring baseline (C++ CPU oracle)...")
    base = measure_baseline(scene, meta)
    base_rays = W * H + base["shadow_rays"]
    base_mrays = base_rays / (base["p50_ms"] * 1e3)
    log(f"baseline: {base['p50_ms']:.1f} ms/frame, {base_mrays:.2f} Mrays/s "
        f"({base['threads']} thread(s))")

    log(f"measuring TPU renderer ({jax.default_backend()})...")
    # The axon relay occasionally drops a request mid-run; one retry keeps a
    # transient hiccup from costing the round's benchmark artifact.
    try:
        ms, shadow_rays = measure_ours(scene, meta)
    except Exception as e:  # noqa: BLE001 - relay transients
        log(f"measure attempt 1 failed ({type(e).__name__}: {e}); retrying")
        time.sleep(10)
        ms, shadow_rays = measure_ours(scene, meta)
    rays = W * H + shadow_rays
    mrays = rays / (ms * 1e3)
    log(f"ours: {ms:.2f} ms/frame, {mrays:.2f} Mrays/s ({shadow_rays} shadow rays)")

    # Full-resolution oracle parity (README's >99.8%-within-1e-3 claim),
    # enforced on the real backend every round. Failures degrade to an error
    # field rather than losing the benchmark line.
    from relativitypathtracer_tpu.utils.parity import fullres_parity

    parity = {}
    for scene_name in ("bunny", "shadows"):
        try:
            res = fullres_parity(scene_name, W, H)
        except Exception as e:  # noqa: BLE001
            log(f"full-res parity {scene_name} errored: {e}")
            parity[f"{scene_name}_error"] = str(e)[:120]
            continue
        log(f"full-res parity {scene_name}: frac>1e-3 = {res['frac_bad']:.5f} "
            f"(ok={res['ok']})")
        parity[scene_name] = res["frac_bad"]
        parity[f"{scene_name}_ok"] = res["ok"]

    print(json.dumps({
        "metric": "total Mrays/s, bunny.txt 1024x768 (primary+shadow), p50",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / base_mrays, 3),
        "frame_ms_p50": round(ms, 3),
        "baseline_frame_ms_p50": base["p50_ms"],
        "baseline_mrays": round(base_mrays, 3),
        "fullres_parity_frac_gt_1e3": parity,
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
