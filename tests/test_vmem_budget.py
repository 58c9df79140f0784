"""Static VMEM budgets for every lowered production kernel
(utils/mosaic_lint.py over the cross-platform TPU lowering).

Round 3's relay wedge was a VMEM blowup (a ~16.7 MiB atlas placed in VMEM
by a pl.ANY spec) that no CPU test could see; these tests decode each
kernel's Mosaic module from the lowered StableHLO and assert the declared
vmem refs fit the chip, at the PROTOCOL resolution (1024x768), for every
kernel family and the on-chip A/B knob combos."""

import jax
import pytest
from conftest import clear_kernel_caches

from relativitypathtracer_tpu import FrameState, build_scene, load_scene_file
from relativitypathtracer_tpu.ops import mesh_intersect
from relativitypathtracer_tpu.render import build_render_fn
from relativitypathtracer_tpu.utils.mosaic_lint import (
    assert_vmem_budget, kernel_vmem_footprints)

W, H = 1024, 768  # budgets must hold at the protocol resolution


def _lowered(reference_root, name, env=None, monkeypatch=None, msaa=1):
    if env:
        for k, v in env.items():
            monkeypatch.setenv(k, v)
    scene, meta = build_scene(load_scene_file(
        str(reference_root / "Scenes" / f"{name}.txt")))
    mesh_intersect.PALLAS_MODE = True
    clear_kernel_caches()
    try:
        render = build_render_fn(meta, W, H, meta.default_interval, msaa)
        return jax.jit(render).trace(
            scene, FrameState.initial()).lower(
            lowering_platforms=("tpu",)).as_text()
    finally:
        mesh_intersect.PALLAS_MODE = None
        mesh_intersect.LARGE_MODE = None
        clear_kernel_caches()


def test_entry_memref_parsing_handles_nested_spaces():
    """smem/semaphore refs must not be relabeled vmem: memref types nest
    angle brackets, which a lazy regex truncates."""
    from relativitypathtracer_tpu.utils.mosaic_lint import _entry_memrefs

    sig = ("^bb0(%arg0: i32, "
           "%arg1: memref<1x1x160xi32, #tpu.memory_space<smem>>, "
           "%arg2: memref<512x128xf32, #tpu.memory_space<vmem>>, "
           "%arg3: memref<8x128xbf16>):")
    refs = _entry_memrefs(sig)
    assert refs == [("1x1x160x", "i32", "smem"),
                    ("512x128x", "f32", "vmem"),
                    ("8x128x", "bf16", "vmem")]


def test_linter_catches_oversized_vmem_ref():
    """Teeth: a kernel declaring a >16 MiB VMEM input must FAIL the budget
    -- this is the exact shape of the round-3 wedge."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    big = jax.ShapeDtypeStruct((36000, 128), jnp.float32)  # 17.6 MiB

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[0:8, :]

    def f(x):
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

    txt = jax.jit(f).trace(big).lower(lowering_platforms=("tpu",)).as_text()
    with pytest.raises(AssertionError, match="VMEM budget"):
        assert_vmem_budget(txt)
    reports = kernel_vmem_footprints(txt)
    assert any(r["vmem_bytes"] > 16 * 2**20 for r in reports)


@pytest.mark.parametrize("name", ["bunny", "shadows", "arch", "cubes",
                                  "rulers", "soccer"])
def test_scene_kernels_fit_vmem(name, reference_root):
    reports = assert_vmem_budget(_lowered(reference_root, name))
    assert reports  # at least one kernel actually lowered


@pytest.mark.parametrize("env", [
    # PAIR=1 / SUB=8 are the r4 defaults (covered by the base scene tests);
    # cover the directions the sequence tools actually A/B on a precious
    # relay claim instead (ADVICE r4): revert directions + the SUB=16 probe.
    {"RPT_PAIR": "0"},
    {"RPT_ORDER2": "8"},
    {"RPT_ORDER2": "8", "RPT_PAIR": "0"},
    {"RPT_SHADOW_CULL": "tmax"},
    {"RPT_SHADOW_CULL": "none"},
    {"RPT_ABOUND": "1"},
    {"RPT_SUB": "4"},
    {"RPT_SUB": "16"},
    {"RPT_REVCONE": "1"},
    {"RPT_NB": "2048"},
    {"RPT_NB": "2048", "RPT_SUB": "16"},
])
def test_knob_combo_kernels_fit_vmem(env, reference_root, monkeypatch):
    from relativitypathtracer_tpu.ops.pallas import mesh_kernels

    # SUB/NB are import-time module constants (read from env once); the
    # in-process A/B mechanism -- here and in the sequence tools -- is a
    # setattr + kernel-cache clear.
    if "RPT_SUB" in env:
        monkeypatch.setattr(mesh_kernels, "SUB", int(env["RPT_SUB"]))
    if "RPT_NB" in env:
        monkeypatch.setattr(mesh_kernels, "NB", int(env["RPT_NB"]))
    assert_vmem_budget(_lowered(reference_root, "shadows", env, monkeypatch))


def test_large_tier_kernels_fit_vmem(reference_root):
    mesh_intersect.LARGE_MODE = True
    clear_kernel_caches()
    reports = assert_vmem_budget(_lowered(reference_root, "shadows"))
    # the streamed pools must NOT be in vmem (that was the wedge shape)
    for r in reports:
        assert r["largest_ref_bytes"] < 4 * 2**20, r


def test_windowed_texture_atlas_stays_out_of_vmem(reference_root,
                                                  monkeypatch):
    """Regression for the round-3 fix (atlas pinned to pltpu.HBM,
    a4663a6): route cube.txt onto the windowed kernel at full res and
    assert no kernel declares a multi-MiB VMEM ref."""
    reports = assert_vmem_budget(_lowered(
        reference_root, "cube", {"RPT_WINDOWED_MAX_ROWS": "1100000"},
        monkeypatch))
    for r in reports:
        assert r["largest_ref_bytes"] < 4 * 2**20, (
            f"{r['name']} holds a {r['largest_ref_bytes'] / 2**20:.1f} MiB "
            "VMEM ref -- atlas back in VMEM?")


def test_msaa_kernels_fit_vmem(reference_root):
    assert_vmem_budget(_lowered(reference_root, "bunny", msaa=2))
