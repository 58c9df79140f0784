"""The octree neighbor-walk must agree with the brute-force matmul path."""

import jax.numpy as jnp
import numpy as np
import pytest

from relativitypathtracer_tpu import FrameState, build_scene, load_scene_file
from relativitypathtracer_tpu.ops.mesh_intersect import mesh_intersect_shared
from relativitypathtracer_tpu.ops.octree_traverse import octree_intersect
from relativitypathtracer_tpu.ops.relmath import inverse4, trs


@pytest.fixture(scope="module")
def pear_scene(reference_root):
    host = load_scene_file(str(reference_root / "Scenes" / "shadows.txt"))
    return build_scene(host)


def _ray_fan(n, origin_z=-4.0):
    rng = np.random.default_rng(11)
    dirs = rng.uniform(-0.35, 0.35, (3, n)).astype(np.float32)
    dirs[2] = 1.0
    return jnp.asarray(dirs)


def test_walk_matches_brute_force(pear_scene):
    scene, meta = pear_scene
    i = meta.mesh_ids[0]
    root = meta.mesh_roots[0]
    tri_range = meta.mesh_tri_ranges[0]
    m4 = scene.objects.m[i]
    inv_m = scene.objects.inv_m[i]
    # Object space of the pear instance: shoot rays from in front of it.
    o3 = jnp.array([2.0, -1.5, 2.0], jnp.float32)
    d3 = _ray_fan(512)

    t_w, n_w, uv_w, v_w, conv = octree_intersect(scene.mesh, root, m4, inv_m, o3, d3)
    assert bool(conv), "walk exhausted its iteration cap"
    t_b, n_b, uv_b, v_b = mesh_intersect_shared(
        scene.mesh, tri_range, m4, inv_m, o3, d3, use_pallas=False
    )

    v_w = np.asarray(v_w)
    v_b = np.asarray(v_b)
    agree = v_w == v_b
    assert agree.mean() > 0.995, f"hit/miss disagreement {1 - agree.mean():.4f}"
    both = v_w & v_b
    assert both.sum() > 50  # the fan actually hits the pear
    np.testing.assert_allclose(
        np.asarray(t_w)[both], np.asarray(t_b)[both], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(n_w)[:, both], np.asarray(n_b)[:, both], atol=1e-3
    )


def test_walk_origin_inside_octree(pear_scene):
    """Origin deep inside the root AABB. NOTE: the reference's own walk can
    miss hits in this configuration (the inside-descent lands in an interior
    leaf and the neighbor walk exits early) -- our walk faithfully reproduces
    that, so the contract here is: every hit the walk DOES report must agree
    with brute force exactly, and it must find a substantial share."""
    scene, meta = pear_scene
    i = meta.mesh_ids[0]
    root = meta.mesh_roots[0]
    m4 = scene.objects.m[i]
    inv_m = scene.objects.inv_m[i]
    center = np.asarray((scene.mesh.node_min[root] + scene.mesh.node_max[root]) / 2)
    o3 = jnp.asarray(np.asarray(m4)[:3, :3] @ center + np.asarray(m4)[:3, 3])
    d3 = _ray_fan(128)
    t_w, _, _, v_w, conv = octree_intersect(scene.mesh, root, m4, inv_m, o3, d3)
    assert bool(conv)
    t_b, _, _, v_b = mesh_intersect_shared(
        scene.mesh, meta.mesh_tri_ranges[0], m4, inv_m, o3, d3, use_pallas=False
    )
    v_w = np.asarray(v_w)
    v_b = np.asarray(v_b)
    assert not (v_w & ~v_b).any()  # walk never invents hits
    assert v_w.sum() >= 0.3 * v_b.sum()
    both = v_w & v_b
    np.testing.assert_allclose(
        np.asarray(t_w)[both], np.asarray(t_b)[both], rtol=1e-4, atol=1e-5
    )


def test_walk_miss_everything(pear_scene):
    scene, meta = pear_scene
    i = meta.mesh_ids[0]
    root = meta.mesh_roots[0]
    o3 = jnp.array([100.0, 100.0, 100.0], jnp.float32)
    d3 = jnp.asarray(np.tile(np.array([[0], [0], [1.0]], np.float32), (1, 16)))
    t, _, _, valid, conv = octree_intersect(
        scene.mesh, root, scene.objects.m[i], scene.objects.inv_m[i], o3, d3
    )
    assert bool(conv)
    assert not bool(np.asarray(valid).any())


def test_walk_bunny_scale(reference_root):
    """Bunny-scale walk (4,968 tris, depth-6 octree): the cap must not be the
    thing ending the walk, and every reported hit must match brute force.
    Also pins the cap-exhaustion signal: a tiny cap must report converged
    False rather than silently returning truncated results."""
    host = load_scene_file(str(reference_root / "Scenes" / "bunny.txt"))
    scene, meta = build_scene(host)
    i = meta.mesh_ids[0]
    root = meta.mesh_roots[0]
    m4 = scene.objects.m[i]
    inv_m = scene.objects.inv_m[i]
    o3 = jnp.array([0.0, 0.5, -1.0], jnp.float32)
    d3 = _ray_fan(512)

    t_w, _, _, v_w, conv = octree_intersect(scene.mesh, root, m4, inv_m, o3, d3)
    assert bool(conv), "bunny walk exhausted the iteration cap"
    perm = jnp.asarray(meta.mesh_perms[0], jnp.int32) if meta.mesh_perms[0] else None
    t_b, _, _, v_b = mesh_intersect_shared(
        scene.mesh, meta.mesh_tri_ranges[0], m4, inv_m, o3, d3,
        use_pallas=False, perm=perm,
    )
    v_w = np.asarray(v_w)
    v_b = np.asarray(v_b)
    assert (v_w == v_b).mean() > 0.995
    both = v_w & v_b
    assert both.sum() > 50
    np.testing.assert_allclose(
        np.asarray(t_w)[both], np.asarray(t_b)[both], rtol=1e-4, atol=1e-5
    )

    # Cap exhaustion must be loud: converged False, not a quiet best-effort.
    _, _, _, _, conv_small = octree_intersect(
        scene.mesh, root, m4, inv_m, o3, d3, iteration_cap=4
    )
    assert not bool(conv_small)
