"""RPT_POST_DIAG (render._post_diag): full-frame differential attribution
stubs for the post-intersect pipeline. Each mode must actually CHANGE the
traced graph (a vacuous stub would attribute a 0 ms share to a real stage),
produce the expected kind of wrong image, and never leak into an official
bench artifact."""

import numpy as np
import pytest
from conftest import render_with_mode as _render

from relativitypathtracer_tpu import build_scene, load_scene_file

pytestmark = pytest.mark.fast


@pytest.fixture()
def bunny(reference_root):
    host = load_scene_file(str(reference_root / "Scenes" / "bunny.txt"))
    return build_scene(host)


def _diag_render(scene, meta, mode, monkeypatch):
    from relativitypathtracer_tpu.render import build_render_fn

    monkeypatch.setenv("RPT_POST_DIAG", mode)
    build_render_fn.cache_clear()  # knob read at trace time
    try:
        return _render(scene, meta, False)
    finally:
        build_render_fn.cache_clear()


def test_notex_drops_texture(bunny, monkeypatch):
    scene, meta = bunny
    base = _render(scene, meta, False)
    got = _diag_render(scene, meta, "notex", monkeypatch)
    assert not np.allclose(base, got), "notex changed nothing (vacuous stub)"


def test_noswz_is_a_pixel_permutation(bunny, monkeypatch):
    """Skipping the unswizzle scrambles pixel POSITIONS but only the padded
    border's values can change (pad lanes swap places with real ones):
    the multiset of interior pixel values must survive."""
    scene, meta = bunny
    base = _render(scene, meta, False)
    got = _diag_render(scene, meta, "noswz", monkeypatch)
    assert not np.allclose(base, got)
    # identical value HISTOGRAM over the unpadded region is too strict (pad
    # lanes mix in); instead check gross stats survive the permutation
    assert abs(float(base.mean()) - float(got.mean())) < 0.05


def test_notm_skips_the_curve(bunny, monkeypatch):
    scene, meta = bunny
    base = _render(scene, meta, False)
    got = _diag_render(scene, meta, "notm", monkeypatch)
    assert not np.allclose(base, got), "notm changed nothing (vacuous stub)"


def test_bench_refuses_post_diag(monkeypatch):
    """bench.py must refuse to record an official artifact while any
    diagnostic stub is active (exit code 5, error JSON)."""
    import json
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "RPT_POST_DIAG": "notex", "RPT_PLATFORM": "cpu",
           "RPT_BENCH_SIZE": "64x32"}
    out = subprocess.run([sys.executable, str(repo / "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=300)
    assert out.returncode == 5, out.stdout + out.stderr
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert "RPT_POST_DIAG" in line["error"]
