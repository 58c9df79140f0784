"""Batched analytic primitive intersectors (sphere, cube).

Wavefront re-design of the reference per-pixel intersectors
(/root/reference/opencl_kernel.cl:310-359): instead of one divergent work-item
per pixel, every function here evaluates a whole ray batch against one object
with dense vector math, and is vmapped over objects by the scene-intersection
layer. Invalid lanes are masked (dist = +inf) rather than branched.

Inputs are the spatial components of the 4D rest-frame ray (origin `o3`,
direction `d3`); the object-space transform by InvM happens inside, exactly as
in the reference intersectors.
"""

from __future__ import annotations

import jax.numpy as jnp

from .relmath import dot3, normalize3, transform_dir3, transform_normal3, transform_point3

EPSILON = 1e-7
INF = 1e20


def sphere_intersect(inv_m, o3, d3):
    """Unit-sphere intersection in object space.

    Mirrors intersect_sphere (/root/reference/opencl_kernel.cl:335-359).
    inv_m: (4, 4); o3: (3,) or (N, 3); d3: (N, 3).
    Returns (t, normal, uv, valid): t is the 4D ray parameter (dist/scale).
    """
    ro = transform_point3(inv_m, o3)  # (..., 3)
    ray_to_sphere = -ro
    d = transform_dir3(inv_m, d3)  # (N, 3)
    scale = jnp.linalg.norm(d, axis=-1)
    dh = d / scale[..., None]
    b = dot3(ray_to_sphere, dh)
    c = dot3(ray_to_sphere, ray_to_sphere) - 1.0
    disc = b * b - c
    hit_sphere = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = b - sq
    far = b + sq
    use_near = near > EPSILON
    dist = jnp.where(use_near, near, far)
    valid = hit_sphere & (use_near | (far > EPSILON))

    obj_pt = ro + dh * dist[..., None]
    t = dist / scale
    normal = normalize3(transform_normal3(inv_m, obj_pt))
    u = 0.5 + jnp.arctan2(obj_pt[..., 2], obj_pt[..., 0]) / (2.0 * jnp.pi)
    v = jnp.arcsin(jnp.clip(obj_pt[..., 1], -1.0, 1.0)) / jnp.pi + 0.5
    uv = jnp.stack([u, v], axis=-1)
    t = jnp.where(valid, t, INF)
    return t, normal, uv, valid


def cube_intersect(inv_m, o3, d3):
    """Unit-cube [-1, 1]^3 slab intersection (Majercik et al.).

    Mirrors intersect_cube (/root/reference/opencl_kernel.cl:312-333),
    including the winding test that makes inside-out hits work.
    """
    ro = transform_point3(inv_m, o3)
    d = transform_dir3(inv_m, d3)
    scale = jnp.linalg.norm(d, axis=-1)
    dh = d / scale[..., None]

    ro_b = jnp.broadcast_to(ro, dh.shape)
    winding = jnp.where(jnp.max(jnp.abs(ro_b), axis=-1) < 1.0, -1.0, 1.0)
    sgn = -jnp.sign(dh)
    dcand = (winding[..., None] * sgn - ro_b) / dh  # (N, 3); inf/nan lanes masked below

    def face_test(axis, a1, a2):
        da = dcand[..., axis]
        p1 = jnp.abs(ro_b[..., a1] + dh[..., a1] * da)
        p2 = jnp.abs(ro_b[..., a2] + dh[..., a2] * da)
        # isless(nan, 1) is False, matching OpenCL's all(isless(...)) semantics
        return (da >= 0.0) & (p1 < 1.0) & (p2 < 1.0)

    tx = face_test(0, 1, 2)
    ty = face_test(1, 2, 0)
    tz = face_test(2, 0, 1)

    sx = jnp.where(tx, sgn[..., 0], 0.0)
    sy = jnp.where(~tx & ty, sgn[..., 1], 0.0)
    sz = jnp.where(~tx & ~ty & tz, sgn[..., 2], 0.0)
    sgn_out = jnp.stack([sx, sy, sz], axis=-1)

    dist = jnp.where(sx != 0.0, dcand[..., 0], jnp.where(sy != 0.0, dcand[..., 1], dcand[..., 2]))
    valid = (sx != 0.0) | (sy != 0.0) | (sz != 0.0)

    obj_pt = ro_b + dh * dist[..., None]
    t = dist / scale
    normal = normalize3(transform_normal3(inv_m, sgn_out))
    uv_x = (obj_pt[..., [1, 2]] + 1.0) / 2.0
    uv_y = (obj_pt[..., [0, 2]] + 1.0) / 2.0
    uv_z = (obj_pt[..., [0, 1]] + 1.0) / 2.0
    uv = jnp.where(
        (sx != 0.0)[..., None], uv_x, jnp.where((sy != 0.0)[..., None], uv_y, uv_z)
    )
    t = jnp.where(valid, t, INF)
    return t, normal, uv, valid
