"""Routing policy for the footprint texture fetch.

`texture_route` (ops/pallas/texture_kernel.py) is the single decision point
for small-kernel / windowed-kernel / XLA-gather selection. The windowed
kernel is gated OPT-IN until proven on a live chip (WINDOWED_PROVEN /
RPT_WINDOWED_MAX_ROWS -- it is the round-3 relay-wedge suspect), so these
tests pin both defaults: large atlases take the TPU-proven gather by
default, the opt-in engages the windowed kernel, and both paths produce the
same image end-to-end.
"""

import numpy as np
import pytest
from conftest import render_with_mode as _render

from relativitypathtracer_tpu import build_scene, load_scene_file
from relativitypathtracer_tpu.ops.pallas import texture_kernel as tk


def test_route_defaults():
    assert tk.texture_route(100, use_pallas=True) == "small"
    assert tk.texture_route(tk.MAX_ROWS, True) == "small"
    # MID tier (adopted r5 on a measured win at the r4-texprobe-proven
    # size, ROUND5_POST2.json): windowed up to WINDOWED_MID_CAP rows.
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "windowed"
    assert tk.texture_route(tk.WINDOWED_MID_CAP, True) == "windowed"
    # BIG atlases stay on the gather (windowed measured 14-21x slower r4).
    assert tk.texture_route(tk.WINDOWED_MID_CAP + 1, True) == "gather"
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS, True) == "gather"
    # Without Pallas everything is the XLA gather.
    assert tk.texture_route(100, use_pallas=False) == "gather"


def test_route_proven_gate(monkeypatch):
    """Flipping WINDOWED_PROVEN (the post-texprobe commit) restores the
    windowed default below the cap."""
    monkeypatch.setattr(tk, "WINDOWED_PROVEN", True)
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "windowed"
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS, True) == "windowed"
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS + 1, True) == "gather"
    assert tk.texture_route(tk.MAX_ROWS, True) == "small"


def test_route_env_overrides(monkeypatch):
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "5000")
    assert tk.texture_route(4999, True) == "windowed"
    assert tk.texture_route(5001, True) == "gather"
    # The small VMEM kernel is independent of the knob.
    assert tk.texture_route(100, True) == "small"
    # 0 disables even when the gate is flipped on.
    monkeypatch.setattr(tk, "WINDOWED_PROVEN", True)
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "0")
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "gather"
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "")  # empty = gate default
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "windowed"


def test_texaddr_fast_end_to_end(reference_root, monkeypatch):
    """The 9-row fp DEFAULT (per-object tile_params in the fused attribute
    select, division-free per-ray addressing; flipped on the measured
    ROUND5_TEXADDR.json win) must be BIT-identical to the 6-row revert
    path (RPT_TEXADDR_FAST=0), through both the small VMEM kernel (bunny)
    and the XLA gather (cube forced off the windowed route)."""
    for scene_name, force_gather in (("bunny", False), ("cube", True)):
        host = load_scene_file(
            str(reference_root / "Scenes" / f"{scene_name}.txt"))
        scene, meta = build_scene(host)
        if force_gather:
            monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "0")
        fast = _render(scene, meta, "interpret")  # default = 9-row
        monkeypatch.setenv("RPT_TEXADDR_FAST", "0")
        base = _render(scene, meta, "interpret")
        monkeypatch.delenv("RPT_TEXADDR_FAST")
        if force_gather:
            monkeypatch.delenv("RPT_WINDOWED_MAX_ROWS")
        np.testing.assert_array_equal(base, fast, err_msg=scene_name)


def test_windowed_mid_default_end_to_end(reference_root, monkeypatch):
    """cube.txt's mid-size (32k-row) atlas takes the windowed kernel BY
    DEFAULT since r5; forcing it back to the gather (RPT_WINDOWED_MAX_ROWS=0)
    must produce the same image (the fetch is exact in both paths)."""
    host = load_scene_file(str(reference_root / "Scenes" / "cube.txt"))
    scene, meta = build_scene(host)
    rq = int(scene.tex_quads.shape[0])
    assert rq > tk.MAX_ROWS, "cube.txt atlas should exceed the small-kernel cap"
    assert rq <= tk.WINDOWED_MID_CAP, "cube.txt atlas should sit in the MID tier"
    assert tk.texture_route(rq, True) == "windowed"
    via_windowed = _render(scene, meta, "interpret")

    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "0")
    assert tk.texture_route(rq, True) == "gather"
    via_gather = _render(scene, meta, "interpret")
    diff = np.abs(via_windowed - via_gather)
    assert diff.max() < 1e-5, f"windowed default changed the image: max {diff.max()}"
