"""Randomized differential fuzzing vs the C++ oracle.

The 8 reference scenes and the goldens pin FIXED configurations; this fuzzes
the parameter space -- TRS with nonuniform scale and arbitrary rotation,
relativistic object and camera velocities, light placement, texture mapping,
flash phase, camera boost/position/time -- while holding the scene STRUCTURE
constant (object counts/types, texture dims, mesh topology), so every seed
shares one SceneMeta and therefore ONE XLA compile. Catches
parameter-dependent divergences the fixed corpus cannot: sign conventions in
the boost chain (reference Render.cpp:179-200), frame-hop edges, UV wrap
behavior under rotation, flash timing in the object's proper time
(opencl_kernel.cl:374-386).
"""

import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from relativitypathtracer_tpu import FrameState, build_scene, render_frame
from relativitypathtracer_tpu.models import dsl
from relativitypathtracer_tpu.models.octree import generate_octree
from relativitypathtracer_tpu.models.scene import CUBE, MESH, SPHERE
from relativitypathtracer_tpu.utils.scene_blob import write_scene_blob

W, H = 128, 72
SEEDS = range(6)
# Fuzzed configs hit more contrast edges than the curated scenes (randomly
# overlapping objects, grazing boosts), so the per-pixel budget is looser
# than test_oracle_parity's 0.5% -- but every seed is deterministic, so a
# regression shows up as a step change, not flakiness.
MAX_FRAC_BAD = 0.01
MAX_MEAN_DIFF = 2e-3

# the `oracle` fixture (locate + build the C++ oracle) lives in conftest.py


def _assert_oracle_parity(oracle, scene, meta, state, tmp_path, tag,
                          interval=None):
    """Shared blob -> oracle -> readback -> per-pixel diff block, so the
    thresholds live in exactly one place."""
    blob = tmp_path / f"{tag}.blob"
    out = tmp_path / f"{tag}.rgb"
    write_scene_blob(str(blob), scene, meta, state, W, H, interval=interval)
    subprocess.run([oracle, str(blob), str(out)], check=True,
                   capture_output=True)
    ref = np.fromfile(out, np.float32).reshape(H, W, 3)

    ours = np.asarray(render_frame(scene, meta, state, W, H,
                                   interval=interval))
    diff = np.abs(ref - ours)
    frac_bad = float(np.mean(diff.max(-1) > 1e-3))
    assert np.isfinite(ours).all()
    assert diff.mean() < MAX_MEAN_DIFF, f"{tag}: mean {diff.mean()}"
    assert frac_bad <= MAX_FRAC_BAD, (
        f"{tag}: {frac_bad * 100:.2f}% pixels differ > 1e-3")


def _unit(rng):
    v = rng.normal(size=3)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _vel(rng, vmax):
    """Random velocity; ~1/3 of draws exactly at rest (the common case in
    the reference corpus, and a different code path constant-wise)."""
    if rng.uniform() < 0.33:
        return np.zeros(3, np.float32)
    return (_unit(rng) * rng.uniform(0.05, vmax)).astype(np.float32)


def _trs(rng, z_near=3.5, z_far=7.0, smax=1.4):
    pos = [rng.uniform(-2.2, 2.2), rng.uniform(-1.6, 1.6),
           rng.uniform(z_near, z_far)]
    angle = rng.uniform(0.0, 2 * np.pi)
    axis = _unit(rng)
    scale = rng.uniform(0.25, smax, 3)
    return [*pos, angle, *axis, *scale]


def _fuzz_host(seed: int, n_lights: int = 1):
    """Fixed structure (n_lights light spheres, 2 spheres, textured +
    flashing + plain cubes, 1 mesh), randomized parameters. n_lights is a
    STRUCTURE knob (changes SceneMeta -> separate compile): the reference
    shades with a loop over every light object (opencl_kernel.cl:573-601),
    a path no curated scene exercises past one light."""
    rng = np.random.default_rng(1000 + seed)
    host = dsl.HostScene()

    # fixed 16x16 two-color texture; colors randomized (texel VALUES are
    # scene data for parity purposes, not structure)
    c0 = rng.integers(0, 256, 3, dtype=np.uint8)
    c1 = rng.integers(0, 256, 3, dtype=np.uint8)
    tex = np.empty((16, 16, 3), np.uint8)
    tex[:] = c0
    tex[::2, ::2] = c1
    tex[1::2, 1::2] = c1
    host.texture_values.extend([0, 16, 16])
    host.textures.extend(tex.tobytes())

    # fixed fan mesh (identical topology AND vertices for every seed, so
    # the Morton permutation in SceneMeta is seed-independent and all seeds
    # share one compiled renderer)
    mesh = host.mesh
    k = 10
    mesh.vertices.append((0.0, 0.0, 0.0))
    for i in range(k + 1):
        a = 2 * np.pi * i / k
        mesh.vertices.append((float(np.cos(a)), float(np.sin(a)),
                              0.15 * float(np.sin(3 * a))))
    mesh.uvs.append((0.5, 0.5))
    for i in range(k + 1):
        a = 2 * np.pi * i / k
        mesh.uvs.append((0.5 + 0.5 * float(np.cos(a)),
                         0.5 + 0.5 * float(np.sin(a))))
    mesh.normals.append((0.0, 0.0, 1.0))
    for i in range(k):
        for (v, uv) in ((0, 0), (i + 1, i + 1), (i + 2, i + 2)):
            mesh.triangles.extend([v, uv, 0])
    root = generate_octree(mesh, 0)
    mesh.mesh_indices.append(root)
    mesh.root_tri_ranges[root] = (0, len(mesh.triangles) // 9)

    def obj(kind, trs, **kw):
        o = dsl.HostObject(kind)
        dsl._apply_trs(o, trs)
        for key, val in kw.items():
            setattr(o, key, val)
        return o

    color = lambda: rng.uniform(0.1, 1.0, 3).astype(np.float32)
    host.objects = [
        # lights ride high so most geometry is lit from above
        obj(SPHERE, [rng.uniform(-2, 2), rng.uniform(2.0, 3.5),
                     rng.uniform(3.5, 7.0), 0, 0, 1, 0, 0.25, 0.25, 0.25],
            color=rng.uniform(0.5, 1.0, 3).astype(np.float32), light=True,
            velocity=_vel(rng, 0.5))
        for _ in range(n_lights)
    ] + [
        obj(SPHERE, _trs(rng), color=color(), velocity=_vel(rng, 0.7)),
        obj(SPHERE, _trs(rng), color=color(), velocity=_vel(rng, 0.7)),
        obj(CUBE, _trs(rng), tex_offset=0, tex_w=16, tex_h=16,
            velocity=_vel(rng, 0.6)),
        obj(CUBE, _trs(rng), color=color(), velocity=_vel(rng, 0.6),
            flash_period=float(rng.uniform(1.0, 3.0)),
            flash_duration=float(rng.uniform(0.3, 0.8))),
        obj(CUBE, _trs(rng), color=color(), velocity=_vel(rng, 0.6)),
        obj(MESH, _trs(rng, smax=1.8), color=color(),
            velocity=_vel(rng, 0.6), mesh_root=root),
    ]
    host.ambient = float(rng.uniform(0.15, 0.6))
    host.white_point = rng.uniform(1.0, 2.5, 3).astype(np.float32)

    state = FrameState(
        cam_velocity=jnp.asarray(_vel(rng, 0.5)),
        cam_pos=jnp.asarray(np.array(
            [rng.uniform(0.0, 3.0), rng.uniform(-0.4, 0.4),
             rng.uniform(-0.4, 0.4), rng.uniform(-0.5, 0.5)], np.float32)),
    )
    return host, state


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_scene_matches_oracle(seed, oracle, tmp_path):
    host, state = _fuzz_host(seed)
    scene, meta = build_scene(host)
    _assert_oracle_parity(oracle, scene, meta, state, tmp_path,
                          f"fuzz{seed}")


@pytest.mark.parametrize("seed", [2, 5])
def test_fuzz_interval_zero_matches_oracle(seed, oracle, tmp_path):
    """interval=0 (the DSL `I` command / the reference's 'i' toggle,
    Render.cpp:140): rays become simultaneous-time, ambient goes to 1.0 and
    the light loop is skipped -- a whole shading branch the fuzz seeds
    otherwise never take."""
    host, state = _fuzz_host(seed)
    scene, meta = build_scene(host)
    _assert_oracle_parity(oracle, scene, meta, state, tmp_path,
                          f"fuzzi{seed}", interval=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_two_lights_match_oracle(seed, oracle, tmp_path):
    """Multi-light shading: two independent shadow chains must accumulate
    exactly as the reference's per-light loop does."""
    host, state = _fuzz_host(seed, n_lights=2)
    scene, meta = build_scene(host)
    assert len(meta.light_ids) == 2
    _assert_oracle_parity(oracle, scene, meta, state, tmp_path,
                          f"fuzz2l{seed}")


@pytest.mark.parametrize("seed", [0, 3])
def test_fuzz_scene_interpret_kernels_match_jnp(seed):
    """Close the chain onto the production kernels: the oracle test above
    pins the jnp path per seed; this runs the real Pallas kernel bodies
    (interpret mode) on fuzzed parameters -- randomized transforms/boosts
    reach the kernels as different ray bundles and walk bounds than any
    curated scene. Two seeds keep the interpret-mode cost bounded."""
    from conftest import render_with_mode

    host, state = _fuzz_host(seed)
    scene, meta = build_scene(host)
    ref = render_with_mode(scene, meta, False, state=state)
    got = render_with_mode(scene, meta, "interpret", state=state)
    diff = np.abs(ref - got)
    frac_bad = float(np.mean(diff.max(-1) > 1e-3))
    assert diff.mean() < 1e-4, f"seed {seed}: mean diff {diff.mean()}"
    assert frac_bad <= 0.002, (
        f"seed {seed}: {frac_bad * 100:.2f}% pixels differ > 1e-3")


@pytest.mark.parametrize("seed", [1, 4])
def test_fuzz_scene_sharded_matches_single(seed):
    """Sharded equivalence on fuzzed parameters: random boosts + a boosted
    camera must survive the diagonal block dealing bitwise-close, not just
    the curated scenes' stationary states."""
    from relativitypathtracer_tpu.parallel.tiles import (
        build_sharded_render_fn, default_mesh)

    host, state = _fuzz_host(seed)
    scene, meta = build_scene(host)
    single = np.asarray(render_frame(scene, meta, state, W, H))
    mesh = default_mesh(8)
    render = build_sharded_render_fn(meta, W, H, meta.default_interval, mesh)
    sharded = np.asarray(render(scene, state))
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_fuzz_seeds_share_one_renderer():
    """The whole point of fixing the structure: every seed must produce an
    IDENTICAL SceneMeta, or the parametrized cases silently pay a fresh XLA
    compile each (and the fuzz corpus stops guarding the single production
    trace path)."""
    metas = set()
    for seed in SEEDS:
        host, _ = _fuzz_host(seed)
        metas.add(build_scene(host)[1])
    assert len(metas) == 1, "SceneMeta varies across fuzz seeds"
