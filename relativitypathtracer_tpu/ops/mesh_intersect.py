"""Batched ray/triangle-mesh intersection, designed for the MXU.

The reference walks a stackless octree per pixel with a divergent while-loop
(/root/reference/opencl_kernel.cl:200-308). On TPU the FLOPs want to live in
big dense matmuls, so the primary formulation here factors Moller-Trumbore
(/root/reference/opencl_kernel.cl:106-126) into per-triangle constants and a
single ray-matrix product:

* Shared-origin rays (all primary rays of one object share origin
  `stationaryCam`): with tvec = o - A constant per triangle,
      det   = d . cross(e2, e1)
      u_num = d . cross(e2, o - A)
      v_num = d . qvec,  qvec = (o - A) x e1      (per-triangle constant)
      t_num = e2 . qvec                            (per-triangle scalar)
  so the whole test is one (N,3) @ (3,3T) matmul plus elementwise masking.

* General rays (per-pixel shadow-ray origins): lift each ray to the 10-vector
  r = [d, m, o, 1] with moment m = cross(o, d); then det/u_num/v_num/t_num are
  all linear in r, i.e. one (N,10) @ (10,4T) matmul (Plucker-style).

Both paths stream triangle chunks with a running best-hit reduce so the (N,T)
intermediates never hit HBM at full size. Semantics (epsilon test on det,
backface hits allowed, u/v/t acceptance order) match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .relmath import (
    cross3,
    dot3,
    normalize3,
    transform_dir3,
    transform_normal3,
    transform_point3,
)

EPSILON = 1e-7
INF = 1e20

_PREC = jax.lax.Precision.HIGHEST


def _tri_vertices(mesh, tri_lo: int, tri_hi: int):
    tv = mesh.tri_v[tri_lo:tri_hi]
    A = mesh.vertices[tv[:, 0]]
    B = mesh.vertices[tv[:, 1]]
    C = mesh.vertices[tv[:, 2]]
    return A, B, C


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def mesh_intersect_shared(mesh, tri_range, m4, inv_m, o3, d3, *, tri_chunk=2048, ray_block=16384):
    """Nearest-hit of rays with shared origin against triangles [lo, hi).

    o3: (3,) rest-frame spatial origin; d3: (N, 3) rest-frame spatial dirs
    (not normalized - the Lorentz boost scales them).
    Returns (t, normal, uv, valid): t is the 4D ray parameter, converted via
    world-space distance like intersect_octree (opencl_kernel.cl:301-303);
    normal/uv are barycentric-interpolated vertex attributes.
    """
    lo, hi = int(tri_range[0]), int(tri_range[1])
    T = hi - lo
    if T == 0:
        n = d3.shape[0]
        return (jnp.full((n,), INF), jnp.zeros((n, 3)), jnp.zeros((n, 2)),
                jnp.zeros((n,), bool))

    ro = transform_point3(inv_m, o3)  # (3,)
    d = transform_dir3(inv_m, d3)  # (N, 3)
    scale = jnp.linalg.norm(d, axis=-1)
    dh = d / scale[..., None]

    A, B, C = _tri_vertices(mesh, lo, hi)
    e1 = B - A
    e2 = C - A
    qvec = cross3(ro - A, e1)  # (T, 3)
    c_det = cross3(e2, e1)
    c_u = cross3(e2, ro - A)
    c_t = dot3(e2, qvec)  # (T,)

    # (3, 3T) constant matrix: one matmul yields det/u_num/v_num per triangle.
    const = jnp.concatenate([c_det, c_u, qvec], axis=0).T  # (3, 3T)

    Tc = min(tri_chunk, _round_up(T, 128))
    n_chunks = -(-T // Tc)
    pad_T = n_chunks * Tc
    const_chunks = jnp.pad(const.reshape(3, 3, T), ((0, 0), (0, 0), (0, pad_T - T)),
                           constant_values=0.0).reshape(3, 3, n_chunks, Tc)
    c_t_chunks = jnp.pad(c_t, (0, pad_T - T), constant_values=0.0).reshape(n_chunks, Tc)
    tri_valid = (jnp.arange(pad_T) < T).reshape(n_chunks, Tc)

    def best_for_rays(dh_blk):
        n = dh_blk.shape[0]

        def chunk_step(carry, xs):
            best_t, best_u, best_v, best_tri = carry
            cst, ctt, tvalid, base = xs
            # cst layout is [component k, factor f, tri t]
            prods = jnp.einsum("nk,kft->fnt", dh_blk, cst, precision=_PREC)
            det, u_num, v_num = prods[0], prods[1], prods[2]  # (n, Tc)
            inv_det = 1.0 / det
            u = u_num * inv_det
            v = v_num * inv_det
            dist = ctt[None, :] * inv_det
            ok = (jnp.abs(det) >= EPSILON) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                & (u + v <= 1.0) & (dist >= 0.0) & tvalid[None, :]
            dist = jnp.where(ok, dist, INF)
            idx = jnp.argmin(dist, axis=1)  # (n,)
            dmin = jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0]
            umin = jnp.take_along_axis(u, idx[:, None], axis=1)[:, 0]
            vmin = jnp.take_along_axis(v, idx[:, None], axis=1)[:, 0]
            better = dmin < best_t
            return (
                jnp.where(better, dmin, best_t),
                jnp.where(better, umin, best_u),
                jnp.where(better, vmin, best_v),
                jnp.where(better, base + idx, best_tri),
            ), None

        init = (jnp.full((n,), INF), jnp.zeros((n,)), jnp.zeros((n,)),
                jnp.zeros((n,), jnp.int32))
        bases = (jnp.arange(n_chunks) * Tc).astype(jnp.int32)
        (bt, bu, bv, btri), _ = jax.lax.scan(
            chunk_step, init,
            (jnp.moveaxis(const_chunks, 2, 0), c_t_chunks, tri_valid, bases),
        )
        return bt, bu, bv, btri

    N = dh.shape[0]
    if N > ray_block:
        nb = -(-N // ray_block)
        dh_p = jnp.pad(dh, ((0, nb * ray_block - N), (0, 0)), constant_values=1.0)
        bt, bu, bv, btri = jax.lax.map(best_for_rays, dh_p.reshape(nb, ray_block, 3))
        bt, bu, bv, btri = (x.reshape(nb * ray_block)[:N] for x in (bt, bu, bv, btri))
    else:
        bt, bu, bv, btri = best_for_rays(dh)

    valid = bt < INF
    tri = jnp.clip(btri + lo, 0, mesh.tri_v.shape[0] - 1)

    # Barycentric attribute interpolation (opencl_kernel.cl:287-299).
    w0 = 1.0 - bu - bv
    tn = mesh.tri_n[tri]
    nrm = (
        w0[:, None] * mesh.normals[tn[:, 0]]
        + bu[:, None] * mesh.normals[tn[:, 1]]
        + bv[:, None] * mesh.normals[tn[:, 2]]
    )
    normal = normalize3(transform_normal3(inv_m, nrm))
    tuv = mesh.tri_uv[tri]
    uv = (
        w0[:, None] * mesh.uvs[tuv[:, 0]]
        + bu[:, None] * mesh.uvs[tuv[:, 1]]
        + bv[:, None] * mesh.uvs[tuv[:, 2]]
    )

    # World-distance conversion (opencl_kernel.cl:301-303).
    obj_pt = ro + bt[:, None] * dh
    world_pt = transform_point3(m4, obj_pt)
    t = jnp.linalg.norm(world_pt - o3, axis=-1) / jnp.linalg.norm(d3, axis=-1)
    t = jnp.where(valid, t, INF)
    return t, normal, uv, valid


def mesh_min_t_general(mesh, tri_range, m4, inv_m, o3, d3, *, tri_chunk=2048, ray_block=16384):
    """Minimum hit parameter t for rays with per-ray origins (shadow rays).

    o3: (N, 3) rest-frame spatial origins; d3: (N, 3) spatial dirs.
    Returns t (N,), INF where no hit. Uses the 10-dim Plucker lift so the
    inner product is a single matmul per triangle chunk.
    """
    lo, hi = int(tri_range[0]), int(tri_range[1])
    T = hi - lo
    n = d3.shape[0]
    if T == 0:
        return jnp.full((n,), INF)

    ro = transform_point3(inv_m, o3)  # (N, 3)
    d = transform_dir3(inv_m, d3)
    scale = jnp.linalg.norm(d, axis=-1)
    dh = d / scale[..., None]
    mom = cross3(ro, dh)  # (N, 3)
    r10 = jnp.concatenate([dh, mom, ro, jnp.ones((n, 1))], axis=-1)  # (N, 10)

    A, B, C = _tri_vertices(mesh, lo, hi)
    e1 = B - A
    e2 = C - A
    zeros = jnp.zeros_like(A)
    zcol = jnp.zeros((T, 1))
    # Columns of the (10, 4) per-triangle operator: det, u_num, v_num, t_num.
    col_det = jnp.concatenate([cross3(e2, e1), zeros, zeros, zcol], axis=-1)
    col_u = jnp.concatenate([cross3(A, e2), e2, zeros, zcol], axis=-1)
    col_v = jnp.concatenate([-cross3(A, e1), -e1, zeros, zcol], axis=-1)
    col_t = jnp.concatenate(
        [zeros, zeros, cross3(e1, e2), -dot3(e2, cross3(A, e1))[:, None]], axis=-1
    )
    cols = jnp.stack([col_det, col_u, col_v, col_t], axis=1)  # (T, 4, 10)

    Tc = min(tri_chunk, _round_up(T, 128))
    n_chunks = -(-T // Tc)
    pad_T = n_chunks * Tc
    cols_p = jnp.pad(cols, ((0, pad_T - T), (0, 0), (0, 0))).reshape(n_chunks, Tc, 4, 10)
    tri_valid = (jnp.arange(pad_T) < T).reshape(n_chunks, Tc)

    def best_for_rays(r10_blk):
        nb = r10_blk.shape[0]

        def chunk_step(best_t, xs):
            cp, tvalid = xs
            out = jnp.einsum("nk,tfk->ntf", r10_blk, cp, precision=_PREC)  # (nb, Tc, 4)
            det = out[..., 0]
            inv_det = 1.0 / det
            u = out[..., 1] * inv_det
            v = out[..., 2] * inv_det
            dist = out[..., 3] * inv_det
            ok = (jnp.abs(det) >= EPSILON) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                & (u + v <= 1.0) & (dist >= 0.0) & tvalid[None, :]
            dist = jnp.where(ok, dist, INF)
            return jnp.minimum(best_t, jnp.min(dist, axis=1)), None

        best, _ = jax.lax.scan(chunk_step, jnp.full((nb,), INF), (cols_p, tri_valid))
        return best

    if n > ray_block:
        nb = -(-n // ray_block)
        r10_p = jnp.pad(r10, ((0, nb * ray_block - n), (0, 0)), constant_values=1.0)
        bt = jax.lax.map(best_for_rays, r10_p.reshape(nb, ray_block, 10)).reshape(nb * ray_block)[:n]
    else:
        bt = best_for_rays(r10)

    valid = bt < INF
    # Convert object-space distance to the shared ray parameter (world ratio).
    obj_pt = ro + bt[:, None] * dh
    world_pt = transform_point3(m4, obj_pt)
    t = jnp.linalg.norm(world_pt - o3, axis=-1) / jnp.linalg.norm(d3, axis=-1)
    return jnp.where(valid, t, INF)
