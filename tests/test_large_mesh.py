"""Large-mesh tier (ops.pallas.mesh_large) tests.

The production path for meshes beyond the VMEM-resident kernels' capacity:
superchunk ordering, chunk bitmask skip, per-chunk HBM->VMEM DMA. Forced on
small fixtures via mesh_intersect.LARGE_MODE so the CPU interpret suite
exercises every mechanism (scene-build statics, record packing, the walk,
DMA double-buffering) without a 100k-triangle fixture; the real-scale run
(317,952-tri subdivided bunny, full-res oracle parity) happens on the TPU
in bench.py via utils.largedemo.
"""

import numpy as np
import pytest

from relativitypathtracer_tpu import build_scene, load_scene_file
from relativitypathtracer_tpu.ops import mesh_intersect
from relativitypathtracer_tpu.render import FrameState, build_render_fn, render_frame


@pytest.fixture
def force_large():
    mesh_intersect.PALLAS_MODE = "interpret"
    mesh_intersect.LARGE_MODE = True
    build_render_fn.cache_clear()
    yield
    mesh_intersect.PALLAS_MODE = None
    mesh_intersect.LARGE_MODE = None
    build_render_fn.cache_clear()


def test_large_path_matches_small(reference_root, force_large):
    """Forced-large interpret render == small-path interpret render on
    shadows.txt (mesh + analytic + shadow rays): covers both large kernels,
    the scene-build large statics and the record packers. In interpret mode
    the bf16-split attr dots are exact, so equality is bitwise-tight."""
    host = load_scene_file(str(reference_root / "Scenes" / "shadows.txt"))
    state = FrameState.initial()
    W, H = 96, 64
    scene_l, meta_l = build_scene(host)
    assert scene_l.mesh_static[0].sspheres is not None  # large tier engaged
    large = np.asarray(render_frame(scene_l, meta_l, state, W, H))

    mesh_intersect.LARGE_MODE = False
    build_render_fn.cache_clear()
    scene_s, meta_s = build_scene(host)
    assert scene_s.mesh_static[0].sspheres is None
    small = np.asarray(render_frame(scene_s, meta_s, state, W, H))
    np.testing.assert_allclose(large, small, atol=2e-5)


def test_large_path_boosted_state(reference_root, force_large):
    """Moving-camera state through the large tier (per-frame shared-origin
    records are camera-dependent and repacked every frame)."""
    import jax.numpy as jnp

    host = load_scene_file(str(reference_root / "Scenes" / "shadows.txt"))
    state = FrameState(
        cam_velocity=jnp.array([0.2, 0.05, -0.1], jnp.float32),
        cam_pos=jnp.array([1.5, 0, 0, 0], jnp.float32),
    )
    W, H = 96, 64
    scene_l, meta_l = build_scene(host)
    large = np.asarray(render_frame(scene_l, meta_l, state, W, H))

    mesh_intersect.LARGE_MODE = False
    build_render_fn.cache_clear()
    scene_s, meta_s = build_scene(host)
    small = np.asarray(render_frame(scene_s, meta_s, state, W, H))
    np.testing.assert_allclose(large, small, atol=2e-5)


def test_super_spheres_padding_stays_finite():
    """Regression: C not divisible by S_SUPER -- the last super's sphere
    must stay finite (a far-away pad sphere overflowed its radius to INF,
    turning that super's cull distance into NaN and poisoning the whole
    block's bucket floors: every walk stopped at p=0 and ~5% of large-scene
    pixels rendered the miss color)."""
    import jax.numpy as jnp

    from relativitypathtracer_tpu.ops.pallas.mesh_large import super_spheres

    rng = np.random.default_rng(0)
    C = 45  # not a multiple of S_SUPER
    sph = jnp.asarray(np.concatenate(
        [rng.normal(size=(C, 3)), rng.uniform(0.1, 0.3, (C, 1))],
        axis=1).astype(np.float32))
    ss = np.asarray(super_spheres(sph))
    assert np.isfinite(ss).all()
    # every chunk sphere is contained in its super sphere
    for k in range(C):
        s = ss[k // 32]
        d = np.linalg.norm(np.asarray(sph)[k, :3] - s[:3])
        assert d + float(sph[k, 3]) <= s[3] + 1e-4


def test_subdivision_watertight():
    """Midpoint subdivision: 4x triangles per level, shared-edge midpoints
    deduplicated (watertight), surface points preserved."""
    from relativitypathtracer_tpu.utils.subdiv import subdivide

    verts = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 0.0)]
    faces = [(0, 1, 2), (1, 3, 2)]
    v2, f2 = subdivide(list(verts), list(faces), 2)
    assert len(f2) == 2 * 16
    # shared edge (1, 2) midpoints deduplicated: v = 4 + unique edge midpoints
    # level 1: 5 unique edges -> 9 verts; level 2: 9 + 16 edges... just check
    # no duplicate coordinates (watertightness proxy)
    arr = np.asarray(v2)
    assert len(np.unique(arr.round(9), axis=0)) == len(arr)
    # all vertices stay on the z=0 plane (midpoints preserve the surface)
    assert np.abs(arr[:, 2]).max() == 0.0


def test_large_path_multi_mesh(reference_root, force_large):
    """Multi-mesh scene forced through the large tier: the scene build must
    skip the (VMEM-bound) batch pool and the per-object kernel loop must
    route every mesh through the large kernels, matching the small path."""
    from conftest import MULTI_SCENE
    from relativitypathtracer_tpu.models.dsl import parse_scene

    host = parse_scene(MULTI_SCENE, str(reference_root))
    state = FrameState.initial()
    W, H = 96, 64
    scene_l, meta_l = build_scene(host)
    assert scene_l.mesh_batch is None  # batch pool off for large-tier scenes
    assert all(ms.sspheres is not None for ms in scene_l.mesh_static)
    large = np.asarray(render_frame(scene_l, meta_l, state, W, H))

    mesh_intersect.LARGE_MODE = False
    build_render_fn.cache_clear()
    scene_s, meta_s = build_scene(host)
    small = np.asarray(render_frame(scene_s, meta_s, state, W, H))
    np.testing.assert_allclose(large, small, atol=2e-5)
