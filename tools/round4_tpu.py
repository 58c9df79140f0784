"""Round-4 on-chip verification + measurement sequence, one command.

Subprocess-per-step fallback to tools/round4_one_claim.py (which runs
everything in ONE relay claim; prefer it when grants are scarce): shadow-cull
/ pairing / abound A/Bs, folded-MSAA sublinearity, all-8-scene full-res
parity artifact (PARITY_r04.json), the live interactivity artifact, bench --
then, dead last behind the wedge-risk boundary, texprobe and the opt-in
windowed texture kernel. Every step is a SUBPROCESS with its own timeout, so
a wedge costs one step, not the chip or this driver.

Usage: python tools/round4_tpu.py [step...]     (default: all, in order)
       python tools/round4_tpu.py --skip step [step...]
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

STEPS = [
    # name, argv, timeout_s, extra env
    ("probe", ["python", "-c", "import jax; print(jax.devices())"], 180, {}),
    # big-atlas scenes: default route is the TPU-proven XLA gather
    # (WINDOWED_PROVEN gate); texprobe + the _windowed opt-in steps run LAST
    ("arch", ["python", "tools/frametime.py", "arch", "1024x768", "3"], 540, {}),
    ("cubes", ["python", "tools/frametime.py", "cubes", "1024x768", "3"], 540, {}),
    ("bunny", ["python", "tools/frametime.py", "bunny", "1024x768", "4"], 540, {}),
    # shadow-cull A/B on bunny (the shadow-heavy scene is `shadows`; bunny is
    # the headline). Modes are trace-time: one process per mode.
    ("bunny_cull_none", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_SHADOW_CULL": "none"}),
    ("bunny_cull_tmax", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_SHADOW_CULL": "tmax"}),
    ("shadows_cull", ["python", "tools/frametime.py", "shadows", "1024x768", "3"],
     540, {}),
    ("shadows_cull_none", ["python", "tools/frametime.py", "shadows", "1024x768", "3"],
     540, {"RPT_SHADOW_CULL": "none"}),
    # sub-cone granularity A/B (tighter cones vs 2x cull flops)
    ("bunny_sub8", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_SUB": "8"}),
    # chunk-pairing A/B (two live chunks per walk iteration: halves loop
    # overhead at unchanged culling granularity; exactness pinned by
    # test_pair_mode_matches_jnp)
    ("bunny_pair", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_PAIR": "1"}),
    ("shadows_pair", ["python", "tools/frametime.py", "shadows", "1024x768", "3"],
     540, {"RPT_PAIR": "1"}),
    ("cubes_pair", ["python", "tools/frametime.py", "cubes", "1024x768", "3"],
     540, {"RPT_PAIR": "1"}),
    ("cubes_abound", ["python", "tools/frametime.py", "cubes", "1024x768", "3"],
     540, {"RPT_ABOUND": "1"}),
    # two-level live lists A/B (superchunk ordering + chunk bitmask: kills
    # the O(C^2) per-block sort; exactness pinned by test_order2_matches_jnp)
    ("bunny_order2", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_ORDER2": "8"}),
    ("shadows_order2", ["python", "tools/frametime.py", "shadows", "1024x768", "3"],
     540, {"RPT_ORDER2": "8"}),
    ("bunny_order2_pair", ["python", "tools/frametime.py", "bunny", "1024x768", "3"],
     540, {"RPT_ORDER2": "8", "RPT_PAIR": "1"}),
    # folded-MSAA sublinearity (VERDICT item 6): msaa=2 and 4 vs the msaa=1
    # bunny row above; target msaa=4 <= ~2.5x msaa=1.
    ("bunny_msaa2", ["python", "tools/frametime.py", "bunny", "1024x768", "3", "2"],
     600, {}),
    ("bunny_msaa4", ["python", "tools/frametime.py", "bunny", "1024x768", "3", "4"],
     900, {}),
    # all-8-scene full-res parity artifact (VERDICT item 3)
    ("parity_all", ["python", "-m", "relativitypathtracer_tpu.utils.parity",
                    "--out", "PARITY_r04.json", "all"], 1500, {}),
    # live interactivity artifact (VERDICT item 5)
    ("interact", ["python", "tools/interact_bench.py", "--scene", "bunny",
                  "--size", "960x540", "--round", "04"], 900, {}),
    # headline benchmark (it also re-checks 3-case parity + large mesh)
    ("bench", ["python", "bench.py"], 1500, {}),
    # WEDGE-RISK BOUNDARY: texprobe + the windowed-kernel opt-in steps run
    # dead last so a re-wedge costs nothing already earned (the runner
    # aborts the remaining steps on a texprobe failure or any timeout).
    ("texprobe", ["python", "tools/texprobe.py"], 420, {}),
    ("arch_windowed", ["python", "tools/frametime.py", "arch", "1024x768", "3"],
     540, {"RPT_WINDOWED_MAX_ROWS": "1100000"}),
    ("cubes_windowed", ["python", "tools/frametime.py", "cubes", "1024x768", "3"],
     540, {"RPT_WINDOWED_MAX_ROWS": "1100000"}),
]


def main(argv: list[str]) -> int:
    skip: set[str] = set()
    if argv and argv[0] == "--skip":
        skip = {argv[1]}
        argv = argv[2:]
    selected = argv
    rc = 0
    for name, cmd, timeout, env_extra in STEPS:
        if name in skip or (selected and name not in selected):
            continue
        print(f"=== {name} (timeout {timeout}s) ===", flush=True)
        t0 = time.time()
        env = dict(os.environ, **env_extra)
        try:
            out = subprocess.run(cmd, cwd=REPO, timeout=timeout, env=env,
                                 capture_output=True, text=True)
            tail = "\n".join((out.stdout + out.stderr).splitlines()[-8:])
            print(f"[{name}] rc={out.returncode} in {time.time()-t0:.0f}s\n{tail}",
                  flush=True)
            if out.returncode != 0:
                rc = 1
                if name in ("probe", "texprobe"):
                    print(f"[{name}] failed -- aborting sequence", flush=True)
                    return rc
        except subprocess.TimeoutExpired:
            print(f"[{name}] TIMED OUT after {timeout}s -- aborting sequence "
                  f"(chip may be wedged; do not pile on)", flush=True)
            return 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
