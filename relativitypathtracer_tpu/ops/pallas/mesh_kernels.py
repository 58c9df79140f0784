"""Pallas TPU kernels for streaming ray/triangle intersection.

The jnp mesh path (ops.mesh_intersect) materializes (T_chunk, N) matmul
products in HBM -- ~3*T*N*4 bytes of traffic per frame, which dominates frame
time. These kernels stream triangle chunks against a VMEM-resident ray block
and keep every intermediate on-chip: per grid step the only HBM traffic is
the ray block in and the best-hit carry out.

This is the TPU-native answer to the reference's divergent per-pixel octree
walk (/root/reference/opencl_kernel.cl:200-308): instead of pointer chasing
(gathers, which TPUs hate), triangles are Morton-ordered so each fixed-size
chunk is spatially tight, and a scalar chunk-bounding-sphere vs
ray-block-cone test skips whole chunks before any MXU work -- hierarchical
culling at tile granularity with zero scattered memory access.

Kernel 1 (shared origin): per-triangle constants (det/u/v rows + t scalar)
against unit ray dirs -- three (Tc, 3) @ (3, NB) MXU products per chunk.
Barycentric surface attributes (normal, uv) are accumulated IN-KERNEL via a
(15, Tc) @ (Tc, NB) one-hot product, so no per-ray attribute gathers remain.
Kernel 2 (general origin): (Tc, 10) @ (10, NB) Plucker products for
per-pixel shadow rays, min-t only, with origin-expanded cone culling.

Acceptance semantics are the reference Moller-Trumbore
(/root/reference/opencl_kernel.cl:106-126): epsilon test on det, backface
hits allowed, u/v in-triangle tests, dist >= 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-7
INF = 1e20
NB = 1024  # rays per block; VMEM budget ~6 (Tc, NB) f32 intermediates
TC = 128  # triangles per chunk (culling granularity)
N_ATTR = 15  # [normal(3) + uv(2)] x [base, du, dv]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_overlaps_cone(ccx, ccy, ccz, cr, ax, ay, az, cos_a, ox, oy, oz):
    """Conservative scalar test: chunk bounding sphere (center c, radius cr)
    vs the one-sided cone (apex o, axis a, half-angle alpha) bounding a ray
    block. True if the sphere may intersect the cone."""
    dx = ccx - ox
    dy = ccy - oy
    dz = ccz - oz
    dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inside = dlen <= cr
    # angle(d, axis) <= alpha + asin(cr / dlen) => overlap (conservative)
    cos_d = (dx * ax + dy * ay + dz * az) / jnp.maximum(dlen, 1e-12)
    sin_b = jnp.minimum(cr / jnp.maximum(dlen, 1e-12), 1.0)
    # cos(theta - beta) >= cos_a form without trig: use
    # cos(angle_between) >= cos(alpha + beta) <=> theta <= alpha + beta.
    # Compute via: theta - beta <= alpha  <=>  cos(theta)cos(beta)+... ; use
    # the algebraic identity with clamped values.
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    # cos(alpha + beta) = cos_a*cos_b - sin_a*sin_b
    return inside | (cos_d >= cos_a * cos_b - sin_a * sin_b)


def _mt_mask(det, u, v, dist, tri_ok):
    return (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (dist >= 0.0) & tri_ok
    )


def _shared_kernel(meta_ref, order_ref, mind_ref, cone_ref, consts_ref, ct_ref,
                   attr_ref, dh_ref,
                   t_ref, u_ref, v_ref, tri_ref, attr_out_ref,
                   *, T: int, T_pad: int):
    """meta_ref (SMEM): per-chunk bounding spheres (n_chunks, 4) cx cy cz r.
    order_ref/mind_ref (SMEM): chunks sorted front-to-back from the shared
    apex + each chunk's minimum apex distance, enabling early termination
    once every ray in the block has a closer hit.
    cone_ref (SMEM): per-block cones (n_blocks, 8): ox oy oz ax ay az cos_a."""
    dh = dh_ref[:]  # (3, NB)
    nb = dh.shape[1]
    n_chunks = T_pad // TC
    blk = pl.program_id(0)
    ox = cone_ref[blk, 0]
    oy = cone_ref[blk, 1]
    oz = cone_ref[blk, 2]
    ax = cone_ref[blk, 3]
    ay = cone_ref[blk, 4]
    az = cone_ref[blk, 5]
    cos_a = cone_ref[blk, 6]

    def body(j, carry):
        k = order_ref[j]

        def live(carry):
            best_t, best_u, best_v, best_tri, best_attr, _mb = carry
            base = k * TC
            cd = consts_ref[pl.ds(base, TC), :]  # (Tc, 3)
            cu = consts_ref[pl.ds(T_pad + base, TC), :]
            cv = consts_ref[pl.ds(2 * T_pad + base, TC), :]
            ct = ct_ref[0, pl.ds(base, TC)]  # (Tc,)

            def dot3(m):
                return jax.lax.dot_general(m, dh, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

            det = dot3(cd)
            u_num = dot3(cu)
            v_num = dot3(cv)
            inv_det = 1.0 / det
            u = u_num * inv_det
            v = v_num * inv_det
            dist = ct[:, None] * inv_det
            tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0)) < T
            dist = jnp.where(_mt_mask(det, u, v, dist, tri_ok), dist, INF)
            idx = jnp.argmin(dist, axis=0)  # (NB,)
            onehot = jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0) == idx[None, :]
            dmin = jnp.min(dist, axis=0)
            umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
            vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
            better = dmin < best_t
            # Interpolation-ready attributes of the winning triangle, via one
            # (15, Tc) @ (Tc, NB) product -- replaces per-ray gathers.
            attrs = attr_ref[:, pl.ds(base, TC)]  # (15, Tc)
            attr_sel = jax.lax.dot_general(
                attrs, jnp.where(onehot, 1.0, 0.0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (15, NB)
            new_t = jnp.where(better, dmin, best_t)
            return (
                new_t,
                jnp.where(better, umin, best_u),
                jnp.where(better, vmin, best_v),
                jnp.where(better, base + idx, best_tri),
                jnp.where(better[None, :], attr_sel, best_attr),
                jnp.max(new_t),
            )

        hit = _chunk_overlaps_cone(
            meta_ref[k, 0], meta_ref[k, 1], meta_ref[k, 2], meta_ref[k, 3],
            ax, ay, az, cos_a, ox, oy, oz,
        )
        # Early termination: chunks are front-to-back, so once every ray in
        # the block has a hit closer than this chunk's nearest point, all
        # remaining chunks are behind the found surfaces.
        hit = hit & (mind_ref[k] <= carry[5])
        return jax.lax.cond(hit, live, lambda c: c, carry)

    init = (
        jnp.full((nb,), INF, jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.int32),
        jnp.zeros((N_ATTR, nb), jnp.float32),
        jnp.float32(INF),
    )
    bt, bu, bv, btri, battr, _ = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[0, :] = bt
    u_ref[0, :] = bu
    v_ref[0, :] = bv
    tri_ref[0, :] = btri
    attr_out_ref[:, :] = battr


def block_cones(dh, ro):
    """Bounding cone per NB-ray block: (cones (n_blocks, 8) f32) with rows
    [ox oy oz ax ay az cos_alpha 0]. dh: (3, N) unit dirs; ro: (3,) apex."""
    n = dh.shape[1]
    n_blocks = n // NB
    d = dh.reshape(3, n_blocks, NB)
    mean = jnp.mean(d, axis=2)  # (3, n_blocks)
    axis = mean / jnp.maximum(jnp.sqrt(jnp.sum(mean * mean, axis=0)), 1e-12)
    cos_a = jnp.min(jnp.sum(d * axis[:, :, None], axis=0), axis=1)  # (n_blocks,)
    o = jnp.broadcast_to(ro[:, None], (3, n_blocks))
    return jnp.concatenate(
        [o.T, axis.T, cos_a[:, None], jnp.zeros((n_blocks, 1))], axis=1
    )


def chunk_spheres(A, B, C, T, T_pad):
    """Bounding sphere per TC-triangle chunk: (n_chunks, 4) cx cy cz r.
    Padding triangles collapse to the chunk's first vertex (harmless)."""
    def padv(x):
        return jnp.pad(x, ((0, T_pad - T), (0, 0)), mode="edge" if T else "constant")

    A, B, C = padv(A), padv(B), padv(C)
    n_chunks = T_pad // TC
    pts = jnp.stack([A, B, C]).reshape(3, n_chunks, TC, 3)
    lo = jnp.min(jnp.min(pts, axis=0), axis=1)  # (n_chunks, 3)
    hi = jnp.max(jnp.max(pts, axis=0), axis=1)
    c = (lo + hi) / 2.0
    r = jnp.sqrt(jnp.sum(((hi - lo) / 2.0) ** 2, axis=1))
    return jnp.concatenate([c, r[:, None]], axis=1)


@jax.jit
def shared_nearest_hit(consts, c_t, attrs, spheres, dh, ro):
    """consts: (3*T_pad, 3); c_t: (T_pad,); attrs: (15, T_pad);
    spheres: (n_chunks, 4); dh: (3, N) unit object-space dirs; ro: (3,).

    Returns (best_t, best_u, best_v, best_tri, attr (15, N)).
    """
    T_pad = c_t.shape[0]
    n = dh.shape[1]
    n_pad = _round_up(n, NB)
    dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    cones = block_cones(dh_p, ro)  # (n_blocks, 8)

    # Front-to-back chunk order from the shared apex (identical for every
    # block because all rays share the origin).
    dc = spheres[:, :3] - ro[None, :]
    mind = jnp.maximum(jnp.sqrt(jnp.sum(dc * dc, axis=1)) - spheres[:, 3], 0.0)
    order = jnp.argsort(mind).astype(jnp.int32)
    mind_sorted_src = mind  # indexed by chunk id inside the kernel

    kernel = functools.partial(_shared_kernel, T=T_pad, T_pad=T_pad)
    out_vec = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    bt, bu, bv, btri, battr = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((T_pad // TC, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (n_chunks,) order
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (n_chunks,) min distance
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (n_blocks, 8) cones
            pl.BlockSpec((consts.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ATTR, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_vec, out_vec, out_vec, out_vec,
                   pl.BlockSpec((N_ATTR, NB), lambda i: (0, i), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((N_ATTR, n_pad), jnp.float32),
        ),
    )(spheres, order, mind_sorted_src, cones, consts, c_t[None, :], attrs, dh_p)
    return bt[0, :n], bu[0, :n], bv[0, :n], btri[0, :n], battr[:, :n]


def _general_kernel(meta_ref, cone_ref, cols_ref, r10_ref, tmax_ref, t_ref,
                    *, T: int, T_pad: int):
    r10 = r10_ref[:]  # (10, NB)
    nb = r10.shape[1]
    n_chunks = T_pad // TC
    blk = pl.program_id(0)
    ox = cone_ref[blk, 0]
    oy = cone_ref[blk, 1]
    oz = cone_ref[blk, 2]
    ax = cone_ref[blk, 3]
    ay = cone_ref[blk, 4]
    az = cone_ref[blk, 5]
    cos_a = cone_ref[blk, 6]
    o_rad = cone_ref[blk, 7]  # radius of the origin cloud around the apex

    def body(k, best_t):
        def live(best_t):
            base = k * TC

            def prod(m):
                return jax.lax.dot_general(m, r10, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

            det = prod(cols_ref[pl.ds(base, TC), :])
            u_num = prod(cols_ref[pl.ds(T_pad + base, TC), :])
            v_num = prod(cols_ref[pl.ds(2 * T_pad + base, TC), :])
            t_num = prod(cols_ref[pl.ds(3 * T_pad + base, TC), :])
            inv_det = 1.0 / det
            u = u_num * inv_det
            v = v_num * inv_det
            dist = t_num * inv_det
            tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0)) < T
            dist = jnp.where(_mt_mask(det, u, v, dist, tri_ok), dist, INF)
            return jnp.minimum(best_t, jnp.min(dist, axis=0))

        hit = _chunk_overlaps_cone(
            meta_ref[k, 0], meta_ref[k, 1], meta_ref[k, 2], meta_ref[k, 3] + o_rad,
            ax, ay, az, cos_a, ox, oy, oz,
        )
        # Skip chunks entirely beyond every ray's current bound (for shadow
        # rays the bound starts at the light distance, so occluder search
        # never looks past the light).
        dx = meta_ref[k, 0] - ox
        dy = meta_ref[k, 1] - oy
        dz = meta_ref[k, 2] - oz
        mind = jnp.sqrt(dx * dx + dy * dy + dz * dz) - meta_ref[k, 3] - o_rad
        hit = hit & (mind <= jnp.max(best_t))
        return jax.lax.cond(hit, live, lambda c: c, best_t)

    t_ref[0, :] = jax.lax.fori_loop(0, n_chunks, body, tmax_ref[0, :])


def general_block_cones(dh, ro):
    """Cone per block for per-ray-origin batches: apex = origin centroid,
    8th slot = origin cloud radius. dh/ro: (3, N)."""
    n = dh.shape[1]
    n_blocks = n // NB
    d = dh.reshape(3, n_blocks, NB)
    o = ro.reshape(3, n_blocks, NB)
    oc = jnp.mean(o, axis=2)  # (3, n_blocks)
    o_rad = jnp.sqrt(jnp.max(jnp.sum((o - oc[:, :, None]) ** 2, axis=0), axis=1))
    mean = jnp.mean(d, axis=2)
    axis = mean / jnp.maximum(jnp.sqrt(jnp.sum(mean * mean, axis=0)), 1e-12)
    cos_a = jnp.min(jnp.sum(d * axis[:, :, None], axis=0), axis=1)
    return jnp.concatenate(
        [oc.T, axis.T, cos_a[:, None], o_rad[:, None]], axis=1
    )


@jax.jit
def general_min_t(cols_grouped, spheres, r10, tmax_obj=None):
    """cols_grouped: (4*T_pad, 10) factor-grouped; spheres: (n_chunks, 4);
    r10: (10, N) lifted rays [dh, o x dh, o, 1]; tmax_obj: optional (N,)
    object-space search bound per ray (e.g. the light distance for shadow
    rays) -- the result is min(nearest hit, tmax_obj). Returns per-ray min
    object-space distance."""
    T_pad = cols_grouped.shape[0] // 4
    n = r10.shape[1]
    n_pad = _round_up(n, NB)
    r10_p = jnp.pad(r10, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    cones = general_block_cones(r10_p[0:3], r10_p[6:9])
    if tmax_obj is None:
        tmax_obj = jnp.full((n,), INF, jnp.float32)
    tmax_p = jnp.pad(tmax_obj, (0, n_pad - n))[None, :]

    kernel = functools.partial(_general_kernel, T=T_pad, T_pad=T_pad)
    bt = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((T_pad // TC, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (n_blocks, 8) cones
            pl.BlockSpec((cols_grouped.shape[0], 10), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
    )(spheres, cones, cols_grouped, r10_p, tmax_p)
    return bt[0, :n]
