"""Post-outage TPU verification sequence (ROADMAP 'PENDING TPU VERIFICATION').

Runs each step as a SUBPROCESS with its own timeout so a wedge costs one
step, not the chip (and not this driver). Order: cheapest/diagnostic first.
Usage: python tools/post_outage.py [step...]   (default: all)
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

STEPS = [
    ("probe", ["python", "-c", "import jax; print(jax.devices())"], 120),
    ("texprobe", ["python", "tools/texprobe.py"], 420),
    ("arch", ["python", "tools/frametime.py", "arch", "1024x768", "3"], 540),
    ("cubes", ["python", "tools/frametime.py", "cubes", "1024x768", "3"], 540),
    ("bunny", ["python", "tools/frametime.py", "bunny", "1024x768", "3"], 540),
    ("bench", ["python", "bench.py"], 1500),
]


def main(selected: list[str]) -> int:
    rc = 0
    for name, cmd, timeout in STEPS:
        if selected and name not in selected:
            continue
        print(f"=== {name} (timeout {timeout}s) ===", flush=True)
        t0 = time.time()
        try:
            out = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                                 capture_output=True, text=True)
            tail = "\n".join((out.stdout + out.stderr).splitlines()[-6:])
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
