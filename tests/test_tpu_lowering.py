"""Cross-platform TPU lowering of the production kernels from the CPU host.

jax can lower a traced function for a platform it has no device for
(`.lower(lowering_platforms=("tpu",))`); for pallas_call that runs the whole
Pallas -> Mosaic dialect pipeline (BlockSpec/layout/primitive lowering
rules), emitting the `tpu_custom_call` ops a real chip would execute. A
kernel change that trips a Mosaic LOWERING error therefore fails here, on
CPU CI, instead of costing a relay claim on the wedged-prone axon chip.

Honest scope: this validates lowering, NOT the Mosaic backend compile
(VMEM budgeting, register allocation, the Mosaic->LLO pass run inside XLA
at device-compile time) -- round 3's relay wedge lived beyond this line.
Still, it statically pins every kernel family and every trace-time knob
combination the on-chip A/B sequence will route through.
"""

import jax
import numpy as np
import pytest
from conftest import clear_kernel_caches

from relativitypathtracer_tpu import FrameState, build_scene, load_scene_file
from relativitypathtracer_tpu.ops import mesh_intersect
from relativitypathtracer_tpu.render import build_render_fn

W, H = 256, 192


def _lower_for_tpu(meta, scene, msaa=1):
    """Trace the production-kernel renderer and lower it for TPU; returns
    the number of tpu_custom_call sites in the StableHLO."""
    render = build_render_fn(meta, W, H, meta.default_interval, msaa)
    lowered = jax.jit(render).trace(
        scene, FrameState.initial()).lower(lowering_platforms=("tpu",))
    return lowered.as_text().count("tpu_custom_call")


@pytest.fixture
def real_kernels():
    mesh_intersect.PALLAS_MODE = True
    clear_kernel_caches()
    yield
    mesh_intersect.PALLAS_MODE = None
    mesh_intersect.LARGE_MODE = None
    clear_kernel_caches()


def _scene(reference_root, name):
    return build_scene(load_scene_file(
        str(reference_root / "Scenes" / f"{name}.txt")))


@pytest.mark.parametrize("name,min_kernels", [
    ("bunny", 4),    # mesh nearest + shadow chain + mesh min_t + analytic
    ("shadows", 4),  # mesh + analytic + shadow rays with tmax
    ("cubes", 1),    # fused analytic nearest (no light -> no min_t pass)
    ("arch", 3),     # analytic + mesh + texture route
])
def test_renderer_lowers_for_tpu(name, min_kernels, reference_root,
                                 real_kernels):
    scene, meta = _scene(reference_root, name)
    n = _lower_for_tpu(meta, scene)
    assert n >= min_kernels, f"{name}: only {n} tpu_custom_call sites"


def test_large_tier_lowers_for_tpu(reference_root, real_kernels):
    """The HBM-streaming kernels (double-buffered DMA, scalar-prefetch
    grids) are the most Mosaic-feature-hungry code in the repo."""
    mesh_intersect.LARGE_MODE = True
    clear_kernel_caches()
    scene, meta = _scene(reference_root, "shadows")
    assert scene.mesh_static[0].gen_rec is not None
    n = _lower_for_tpu(meta, scene)
    assert n >= 2


def test_multimesh_batched_lowers_for_tpu(reference_root, real_kernels):
    """The batched multi-mesh kernels (fused chunk pool, per-chunk object
    ids, SMEM transform table) on the two-mesh fixture scene."""
    from conftest import MULTI_SCENE

    from relativitypathtracer_tpu import parse_scene

    host = parse_scene(MULTI_SCENE, str(reference_root))
    scene, meta = build_scene(host)
    assert scene.mesh_batch is not None  # batch pool actually engaged
    n = _lower_for_tpu(meta, scene)
    assert n >= 2  # batched nearest + batched shadow min-t


@pytest.mark.parametrize("env", [
    # Cover the directions the sequence tools actually flip on a relay
    # claim (revert directions vs the r4 PAIR/SUB defaults + the SUB=16
    # probe), not the defaults the base tests already exercise (ADVICE r4).
    {"RPT_PAIR": "0"},
    {"RPT_ORDER2": "8"},
    {"RPT_ORDER2": "8", "RPT_PAIR": "0"},
    {"RPT_SHADOW_CULL": "none"},
    {"RPT_SHADOW_CULL": "tmax"},
    {"RPT_ABOUND": "1"},
    {"RPT_SUB": "4"},
    {"RPT_SUB": "16"},
    {"RPT_REVCONE": "1"},
    {"RPT_FUSED_OUT": "1"},
    {"RPT_ANALYTIC_DIRECT": "99"},
    {"RPT_TEXADDR_FAST": "0"},  # revert direction; "1" is the default
    {"RPT_NB": "2048"},
    {"RPT_NB": "2048", "RPT_SUB": "16"},
])
def test_knob_combos_lower_for_tpu(env, reference_root, real_kernels,
                                   monkeypatch):
    """Every trace-time knob combination the on-chip A/B sequence flips
    must lower -- a knob that only works in interpret mode would burn a
    relay claim to discover."""
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from relativitypathtracer_tpu.ops.pallas import mesh_kernels

    if "RPT_SUB" in env:  # module constant, read at import time
        monkeypatch.setattr(mesh_kernels, "SUB", int(env["RPT_SUB"]))
    if "RPT_NB" in env:  # likewise import-time
        monkeypatch.setattr(mesh_kernels, "NB", int(env["RPT_NB"]))
    clear_kernel_caches()
    scene, meta = _scene(reference_root, "shadows")
    try:
        n = _lower_for_tpu(meta, scene)
    finally:
        clear_kernel_caches()
    assert n >= 3


def test_windowed_texture_kernel_lowers_for_tpu(reference_root, real_kernels,
                                                monkeypatch):
    """The round-3 relay-wedge suspect: route cube.txt's atlas onto the
    windowed kernel and lower it. (Its wedge was a backend-compile/VMEM
    phenomenon -- beyond lowering's reach -- but the post-fix shift-free
    body must at minimum keep LOWERING cleanly as it evolves.)"""
    monkeypatch.setenv("RPT_WINDOWED_MAX_ROWS", "1100000")
    clear_kernel_caches()
    scene, meta = _scene(reference_root, "cube")
    try:
        n = _lower_for_tpu(meta, scene)
    finally:
        clear_kernel_caches()
    assert n >= 1


def test_msaa_lowers_for_tpu(reference_root, real_kernels):
    scene, meta = _scene(reference_root, "bunny")
    n = _lower_for_tpu(meta, scene, msaa=2)
    assert n >= 4

def test_sharded_renderer_lowers_for_tpu_check_vma(reference_root,
                                                   real_kernels):
    """The PRODUCTION multi-chip config, statically checked: compiled
    pallas kernels under shard_map with check_vma=True (VERDICT r4 item 9).
    Every pallas_call out_shape must declare its vma (ops.pallas.ray_vma);
    a kernel whose declaration goes stale fails here, on CPU CI, instead
    of at the driver's multichip dryrun or on a chip."""
    from jax.sharding import Mesh

    from relativitypathtracer_tpu.parallel.tiles import build_sharded_render_fn

    scene, meta = _scene(reference_root, "bunny")
    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))
    render = build_sharded_render_fn(meta, W, H, meta.default_interval,
                                     mesh, msaa=2, with_aux=True)
    lowered = render.trace(scene, FrameState.initial()).lower(
        lowering_platforms=("tpu",))
    n = lowered.as_text().count("tpu_custom_call")
    assert n >= 4


def test_viewer_polymorphic_renderer_lowers_for_tpu(reference_root,
                                                    real_kernels):
    """The live viewer's resolution-polymorphic renderer (camera dirs as a
    traced argument + device-side stream pooling) with the production
    kernels -- the INTERACT protocol runs this on a relay claim."""
    from relativitypathtracer_tpu.render import (
        TILE, _round_up, build_viewer_render_fn, viewer_dirs)

    scene, meta = _scene(reference_root, "bunny")
    w, h = 256, 192
    ph, pw = _round_up(h, TILE), _round_up(w, TILE)
    for pool in (1, 2):
        render = build_viewer_render_fn(meta, ph, pw, meta.default_interval,
                                        pool)
        dirs = jax.ShapeDtypeStruct((3, ph * pw), "float32")
        lowered = jax.jit(render).trace(
            scene, FrameState.initial(), dirs).lower(
                lowering_platforms=("tpu",))
        assert lowered.as_text().count("tpu_custom_call") >= 4


def test_xl_tier_lowers_for_tpu_at_1p27m_shapes(real_kernels):
    """The 1.27M-triangle tier at its REAL shapes (C=39,744 chunks ->
    live_chunk_lists3 routing, S_SUPER_XL=128, 1,242-word SMEM bitmask
    windows), statically: lowering only traces, so no actual mesh build or
    memory is needed. Catches Mosaic lowering breakage (window sizes,
    scalar loops at the XL grouping) before a relay claim."""
    import jax.numpy as jnp

    from relativitypathtracer_tpu.ops.pallas import mesh_large

    T = 1_271_808  # 4,968 * 4^4 (utils.largedemo LEVELS=4)
    T_pad = -(-T // 32) * 32
    C = T_pad // 32
    assert C > mesh_large.SUPER_CULL_C  # really routes through lists3
    n = 4096  # ray count is shape-independent of the mesh scale
    consts_rec = jax.ShapeDtypeStruct((C * mesh_large.REC_SH, 128), "float32")
    attrs_rec = jax.ShapeDtypeStruct((C * mesh_large.REC_AT, 128), "float32")
    cols_rec = jax.ShapeDtypeStruct((C * mesh_large.REC_GEN, 128), "float32")
    spheres = jax.ShapeDtypeStruct((C, 4), "float32")
    dh = jax.ShapeDtypeStruct((3, n), "float32")
    ro = jax.ShapeDtypeStruct((3,), "float32")
    r10 = jax.ShapeDtypeStruct((10, n), "float32")
    tmax = jax.ShapeDtypeStruct((n,), "float32")

    low = jax.jit(mesh_large.large_shared_nearest_hit,
                  static_argnames=("T",)).trace(
        consts_rec, attrs_rec, spheres, dh, ro, T=T_pad).lower(
        lowering_platforms=("tpu",))
    assert low.as_text().count("tpu_custom_call") >= 1

    low2 = jax.jit(mesh_large.large_general_min_t,
                   static_argnames=("T",)).trace(
        cols_rec, spheres, r10, tmax, T=T_pad).lower(
        lowering_platforms=("tpu",))
    assert low2.as_text().count("tpu_custom_call") >= 1

    from relativitypathtracer_tpu.utils.mosaic_lint import assert_vmem_budget

    assert_vmem_budget(low.as_text())
    assert_vmem_budget(low2.as_text())
