"""Routing policy for the footprint texture fetch.

`texture_route` (ops/pallas/texture_kernel.py) is the single decision point
for small-kernel / windowed-kernel / XLA-gather selection, including the
RPT_WINDOWED_MAX_ROWS escape hatch (set 0 to retire the windowed kernel on a
chip where it misbehaves). These tests pin the policy and prove the escape
hatch end-to-end: with the hatch engaged a large-atlas scene renders
identically through the XLA gather.
"""

import numpy as np
import pytest

from relativitypathtracer_tpu import FrameState, build_scene, load_scene_file, render_frame
from relativitypathtracer_tpu.ops import mesh_intersect
from relativitypathtracer_tpu.ops.pallas import texture_kernel as tk
from relativitypathtracer_tpu.render import build_render_fn


def test_route_defaults():
    assert tk.texture_route(100, use_pallas=True) == "small"
    assert tk.texture_route(tk.MAX_ROWS, True) == "small"
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "windowed"
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS, True) == "windowed"
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS + 1, True) == "gather"
    # Without Pallas everything is the XLA gather.
    assert tk.texture_route(100, use_pallas=False) == "gather"


def test_route_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "0")
    assert tk.texture_route(tk.MAX_ROWS + 1, True) == "gather"
    # The small VMEM kernel is independent of the hatch.
    assert tk.texture_route(100, True) == "small"
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "5000")
    assert tk.texture_route(4999, True) == "windowed"
    assert tk.texture_route(5001, True) == "gather"
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "")  # empty = default
    assert tk.texture_route(tk.WINDOWED_MAX_ROWS, True) == "windowed"


def _render(scene, meta, mode, w=128, h=64):
    mesh_intersect.PALLAS_MODE = mode
    build_render_fn.cache_clear()
    try:
        return np.asarray(render_frame(scene, meta, FrameState.initial(), w, h))
    finally:
        mesh_intersect.PALLAS_MODE = None
        build_render_fn.cache_clear()


def test_escape_hatch_end_to_end(reference_root, monkeypatch):
    """cube.txt's 1024^2 atlas routes to the windowed kernel by default;
    with RPT_WINDOWED_MAX_ROWS=0 it must take the XLA gather and produce
    the same image (the fetch is exact in both paths)."""
    host = load_scene_file(str(reference_root / "Scenes" / "cube.txt"))
    scene, meta = build_scene(host)
    rq = int(scene.tex_quads.shape[0])
    assert rq > tk.MAX_ROWS, "cube.txt atlas should exceed the small-kernel cap"
    assert tk.texture_route(rq, True) == "windowed"

    via_windowed = _render(scene, meta, "interpret")
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "0")
    assert tk.texture_route(rq, True) == "gather"
    via_gather = _render(scene, meta, "interpret")
    diff = np.abs(via_windowed - via_gather)
    assert diff.max() < 1e-5, f"escape hatch changed the image: max {diff.max()}"
