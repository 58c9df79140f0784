"""Generate the scene gallery (screenshots/) -- our analog of the
reference's Screenshots/ directory (/root/reference/README.md:77-124):
a stationary view of every scene, boosted views where the reference shows
one, and animated GIFs for the dynamic scenes. Renders through the CLI so
the gallery exercises the exact user-facing path.

Usage: python tools/gallery.py [--size 512x384] [--platform cpu]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "screenshots"

# (scene, extra CLI args, output name). Scene times are picked for the
# shot, not t=0: soccer's 0.9c ball is seen at its RETARDED position
# (centered ~t=5); shadows' 0.95c light only reaches the geometry ~t=9.
JOBS = [
    # Stationary view of every scene
    *[(s, [], f"{s}.png") for s in
      ("arch", "bunny", "cube", "cubes", "ladder_paradox", "rulers")],
    ("shadows", ["--time", "9"], "shadows.png"),
    ("soccer", ["--time", "5"], "soccer.png"),
    # Boosted views (the reference gallery's "moving view" shots):
    # forward 0.5c shows aberration + the relativistic headlight effect.
    ("arch", ["--velocity", "0,0,0.5"], "arch_boosted.png"),
    ("cube", ["--velocity", "0,0,0.5"], "cube_boosted.png"),
    ("rulers", ["--velocity", "0.5,0,0"], "rulers_boosted.png"),
    # Dynamic scenes as GIFs (advancing scene time, like the reference's
    # cubes.gif / ladder_paradox gifs).
    ("cubes", ["--frames", "45", "--time", "0", "--dt", "0.0333"], "cubes.gif"),
    ("ladder_paradox", ["--frames", "45", "--time", "0", "--dt", "0.0333"],
     "ladder_paradox.gif"),
    ("rulers", ["--frames", "45", "--time", "0", "--dt", "0.0333"], "rulers.gif"),
    # Mesh + full shadow chain is the slowest CPU scene: fewer/smaller
    # frames (the trailing --size overrides the global one; last wins).
    ("shadows", ["--frames", "30", "--time", "6", "--dt", "0.22",
                 "--size", "384x288"], "shadows.gif"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="512x384")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of output names")
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)
    rc = 0
    for scene, extra, name in JOBS:
        if args.only and name not in args.only:
            continue
        kind = "--gif" if name.endswith(".gif") else "--out"
        cmd = [sys.executable, "-m", "relativitypathtracer_tpu.cli",
               "--scene", f"/root/reference/Scenes/{scene}.txt",
               "--size", args.size, kind, str(OUT / name), *extra]
        if args.platform:
            cmd += ["--platform", args.platform]
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        status = "ok" if r.returncode == 0 else f"FAILED rc={r.returncode}"
        print(f"{name}: {status} ({time.time()-t0:.0f}s)", flush=True)
        if r.returncode != 0:
            print(r.stderr[-500:], flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
