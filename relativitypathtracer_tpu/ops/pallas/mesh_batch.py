"""Batched multi-mesh Pallas kernels: N mesh instances, ONE kernel.

The per-object mesh path (render.intersect_scene / scene_min_t) unrolls a
kernel call per mesh object -- compile time and launch overhead scale with
instance count, and a block that intersects only one object still pays every
object's live-list pass. These kernels concatenate ALL mesh objects'
Morton-ordered chunk constants into one factor-grouped pool with a per-chunk
object id, so a scene with N mesh instances costs one kernel launch and one
fused live-chunk walk per ray block.

Semantics preserved from the reference's linear object loop with per-object
rest-frame transforms (/root/reference/opencl_kernel.cl:379-424):
- Each chunk's triangles are intersected in THEIR OWN object's rest frame:
  the resident ray block carries every object's transformed rays ((8*O, NB)
  rows, 8-row stride so per-chunk selection is an aligned dynamic sublane
  slice), and the chunk's object id (SMEM) picks the right rows.
- Distances from different rest frames are not comparable (each frame has
  its own scale), so every ray row-block carries a per-lane scale s mapping
  object-space distance to the SHARED 4D ray parameter
  (t = dist * |M_R @ dh| / |d3|, the same conversion finalize_best_hit does
  after the single-mesh kernels); the in-kernel nearest reduce and early
  termination run directly on shared t.
- Front-to-back live lists span the whole pool: per-object cone culling
  (each object's cone from its own transformed rays), minds scaled to
  shared units by the block's MINIMUM per-lane scale (a lower bound, so the
  bucket-floor early-termination test stays sound).

Layout mirrors ops.pallas.mesh_kernels (same TC, NB, factor grouping);
acceptance semantics are the reference Moller-Trumbore
(/root/reference/opencl_kernel.cl:106-126). Zero-padding rows yield det = 0
-> NaN u/v/dist -> every acceptance comparison false, so no tri_ok iota is
needed against the concatenated pool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mesh_kernels import (
    INF, NB, TC, N_ATTR, _cone_cull, _mask_invalid_lanes, _mt_mask,
    _round_up, bucket_order, chunk_interleave,
)

ROWS_SH = 8   # ray rows per object, shared kernel: [dh(3), s(1), ro(3), pad]
ROWS_GEN = 16  # ray rows per object, general kernel: [r10(10), s(1), pad(5)]


def live_chunk_lists_multi(spheres, chunk_counts, d_os, o_os, s_os,
                           valid=None, enabled=None):
    """Fused live lists over the concatenated pool.

    spheres: (C, 4) object-space chunk spheres (object-major concat);
    chunk_counts: static tuple -- chunks per object, in concat order;
    d_os/o_os: (O, 3, n_pad) per-object dirs / origins; s_os: (O, n_pad)
    per-lane object->shared scale; valid: optional (n_pad,) bool;
    enabled: optional static bool tuple -- a disabled object's chunks are
    never live (how shadow rays exclude the light object itself, mirroring
    the reference's `i == lightIndex` skip, opencl_kernel.cl:497).
    Returns (order, key, counts) rank-3 like mesh_kernels.live_chunk_lists,
    with `key` (bucket floors) in SHARED ray-parameter units.
    """
    O = d_os.shape[0]
    n_blocks = d_os.shape[2] // NB
    minds, overlaps = [], []
    c0 = 0
    for g in range(O):
        nck = chunk_counts[g]
        if enabled is not None and not enabled[g]:
            minds.append(jnp.full((n_blocks, nck), INF))
            overlaps.append(jnp.zeros((n_blocks, nck), bool))
            c0 += nck
            continue
        d = d_os[g].reshape(3, n_blocks, NB)
        o = o_os[g].reshape(3, n_blocks, NB)
        s = s_os[g].reshape(n_blocks, NB)
        if valid is not None:
            d, o = _mask_invalid_lanes(d, o, valid)
            s = jnp.where(valid.reshape(n_blocks, NB), s, INF)
        mind_g, over_g = _cone_cull(spheres[c0:c0 + nck], d, o)
        c0 += nck
        s_min = jnp.min(s, axis=1, keepdims=True)  # (B, 1) lower bound
        minds.append(mind_g * s_min)
        overlaps.append(over_g)
    return bucket_order(jnp.concatenate(minds, axis=1),
                        jnp.concatenate(overlaps, axis=1))


def _shared_batch_kernel(order_ref, minds_ref, count_ref, cobj_ref, box_ref,
                         consts_ref, attr_ref, rays_ref,
                         t_ref, u_ref, v_ref, tri_ref, obj_ref, attr_out_ref,
                         *, O: int, Tsum_pad: int):
    """Walk the fused live-chunk list; per chunk, intersect in the chunk's
    object frame and reduce nearest on the SHARED ray parameter.
    box_ref: (O, 9) SMEM rows [union lo(3), hi(3), ro(3)] per object."""
    nb = NB
    n_live = count_ref[0, 0, 0]

    # Per-lane search bound (shared units): for each object, the slab far
    # distance vs its chunk-sphere union box, scaled per lane; a lane's
    # bound is the farthest any object could still produce a hit.
    bound_vec = jnp.zeros((nb,), jnp.float32)
    for g in range(O):  # static unroll: O is small
        blk = rays_ref[ROWS_SH * g:ROWS_SH * (g + 1), :]
        dh = blk[0:3]
        s = blk[3]
        far = jnp.full((nb,), INF, jnp.float32)
        near = jnp.full((nb,), -INF, jnp.float32)
        for ax in range(3):
            inv = 1.0 / dh[ax]
            t0 = (box_ref[g, ax] - box_ref[g, 6 + ax]) * inv
            t1 = (box_ref[g, 3 + ax] - box_ref[g, 6 + ax]) * inv
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hits_box = (near <= far) & (far > 0)
        contrib = jnp.where(hits_box, (far * 1.001 + 1e-3) * s, 0.0)
        bound_vec = jnp.maximum(bound_vec, contrib)

    def cond(state):
        j, mb = state[0], state[1]
        return (j < n_live) & (minds_ref[0, 0, order_ref[0, 0, j]] < mb)

    def body(state):
        j, mb, best_t, best_u, best_v, best_tri, best_obj, best_attr = state
        k = order_ref[0, 0, j]
        g = cobj_ref[0, 0, k]
        blk = rays_ref[pl.ds(ROWS_SH * g, ROWS_SH), :]
        dh = blk[0:3]
        s = blk[3]
        base = k * TC
        # Interleaved det/u/v rows: one (3*Tc, 3) @ (3, NB) MXU pass.
        cblk = consts_ref[pl.ds(3 * base, 3 * TC), :]
        ct = consts_ref[pl.ds(3 * Tsum_pad + base, TC), 0]

        prods = jax.lax.dot_general(cblk, dh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        det = prods[:TC]
        u_num = prods[TC:2 * TC]
        v_num = prods[2 * TC:]
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = ct[:, None] * inv_det  # object-space units
        ok = _mt_mask(det, u, v, dist, True)
        tsh = jnp.where(ok, dist * s[None, :], INF)  # shared units (s > 0)
        tmin = jnp.min(tsh, axis=0)
        better = tmin < best_t
        idx = jnp.argmin(tsh, axis=0)
        onehot = jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0) == idx[None, :]
        umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
        vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        attrs = attr_ref[pl.ds(base, TC), :]
        attr_sel = jax.lax.dot_general(
            attrs, jnp.where(onehot, 1.0, 0.0), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (15, NB)
        new_t = jnp.where(better, tmin, best_t)
        return (
            j + 1,
            jnp.max(jnp.minimum(new_t, bound_vec)),
            new_t,
            jnp.where(better, umin, best_u),
            jnp.where(better, vmin, best_v),
            jnp.where(better, base + idx, best_tri),
            jnp.where(better, g, best_obj),
            jnp.where(better[None, :], attr_sel, best_attr),
        )

    init = (
        jnp.int32(0),
        jnp.max(bound_vec),
        jnp.full((nb,), INF, jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.full((nb,), -1, jnp.int32),
        jnp.full((nb,), -1, jnp.int32),
        jnp.zeros((N_ATTR, nb), jnp.float32),
    )
    _, _, bt, bu, bv, btri, bobj, battr = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = bt
    u_ref[0, :] = bu
    v_ref[0, :] = bv
    tri_ref[0, :] = btri
    obj_ref[0, :] = bobj
    attr_out_ref[:, :] = battr


@functools.partial(jax.jit, static_argnames=("chunk_counts", "interpret"))
def batched_nearest_shared(consts, attrs, spheres, boxes, rays,
                           chunk_counts: tuple, interpret=False):
    """Nearest hit over ALL mesh objects for shared-per-object-origin rays.

    consts: (4*Tsum_pad, 3) factor-grouped pool; attrs: (Tsum_pad, 15);
    spheres: (C, 4); boxes: (O, 9); rays: (8*O, N) rows [dh(3), s(1), ro(3),
    0] per object; chunk_counts: static tuple, chunks per object.
    Returns (t_shared, u, v, tri (pool row), obj slot, attr (15, N));
    tri/obj are -1 where no hit.
    """
    Tsum_pad = attrs.shape[0]
    O = boxes.shape[0]
    n = rays.shape[1]
    n_pad = _round_up(n, NB)
    pad = n_pad - n
    consts = jnp.concatenate(
        [chunk_interleave(consts[:3 * Tsum_pad], Tsum_pad, 3, TC),
         consts[3 * Tsum_pad:]], axis=0)
    rays_p = jnp.pad(rays, ((0, 0), (0, pad)), constant_values=1.0)
    d_os = jnp.stack([rays_p[ROWS_SH * g:ROWS_SH * g + 3] for g in range(O)])
    o_os = jnp.stack([rays_p[ROWS_SH * g + 4:ROWS_SH * g + 7] for g in range(O)])
    s_os = jnp.stack([rays_p[ROWS_SH * g + 3] for g in range(O)])
    order, minds, counts = live_chunk_lists_multi(spheres, chunk_counts,
                                                  d_os, o_os, s_os)
    chunk_obj = sum(((g,) * c for g, c in enumerate(chunk_counts)), ())
    cobj = jnp.asarray(chunk_obj, jnp.int32)[None, None, :]

    kernel = functools.partial(_shared_batch_kernel, O=O, Tsum_pad=Tsum_pad)
    C = spheres.shape[0]
    out_vec = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    bt, bu, bv, btri, bobj, battr = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((O, 9), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((consts.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tsum_pad, N_ATTR), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_SH * O, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_vec, out_vec, out_vec, out_vec, out_vec,
                   pl.BlockSpec((N_ATTR, NB), lambda i: (0, i), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((N_ATTR, n_pad), jnp.float32),
        ),
        interpret=interpret,
    )(order, minds, counts, cobj, boxes, consts, attrs, rays_p)
    return (bt[0, :n], bu[0, :n], bv[0, :n], btri[0, :n], bobj[0, :n],
            battr[:, :n])


def _general_batch_kernel(order_ref, minds_ref, count_ref, cobj_ref, box_ref,
                          cols_ref, rays_ref, tmax_ref, t_ref,
                          *, O: int, Tsum_pad: int):
    nb = NB
    n_live = count_ref[0, 0, 0]
    tmax = tmax_ref[0, :]

    # Per-lane walk bound: min(tmax, max over objects of that object's
    # chunk-union-box exit in SHARED units) -- see _general_kernel. Disabled
    # objects carry an empty box (lo > hi) and contribute nothing.
    bound_vec = jnp.zeros((nb,), jnp.float32)
    for g in range(O):  # static unroll
        blk = rays_ref[ROWS_GEN * g:ROWS_GEN * (g + 1), :]
        far = jnp.full((nb,), INF, jnp.float32)
        near = jnp.full((nb,), -INF, jnp.float32)
        for ax in range(3):
            inv = 1.0 / blk[ax]
            t0 = (box_ref[g, ax] - blk[6 + ax]) * inv
            t1 = (box_ref[g, 3 + ax] - blk[6 + ax]) * inv
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hits_box = (near <= far) & (far > 0)
        contrib = jnp.where(hits_box, (far * 1.001 + 1e-3) * blk[10], 0.0)
        bound_vec = jnp.maximum(bound_vec, contrib)
    tmax_eff = jnp.minimum(tmax, bound_vec)

    def cond(state):
        j, mb = state[0], state[1]
        return (j < n_live) & (minds_ref[0, 0, order_ref[0, 0, j]] < mb)

    def body(state):
        j, mb, best_t = state
        k = order_ref[0, 0, j]
        g = cobj_ref[0, 0, k]
        blk = rays_ref[pl.ds(ROWS_GEN * g, ROWS_GEN), :]
        r10 = blk[0:10]
        s = blk[10]
        base = k * TC
        # Interleaved det/u/v/t rows: one full-array (128, 10) MXU pass.
        prods = jax.lax.dot_general(
            cols_ref[pl.ds(4 * base, 4 * TC), :], r10, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        det = prods[:TC]
        u_num = prods[TC:2 * TC]
        v_num = prods[2 * TC:3 * TC]
        t_num = prods[3 * TC:]
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = t_num * inv_det
        ok = _mt_mask(det, u, v, dist, True)
        tsh = jnp.where(ok, dist * s[None, :], INF)
        new_t = jnp.minimum(best_t, jnp.min(tsh, axis=0))
        return j + 1, jnp.max(jnp.minimum(new_t, tmax_eff)), new_t

    init = (jnp.int32(0), jnp.max(tmax_eff), jnp.full((nb,), INF, jnp.float32))
    _, _, bt = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = jnp.minimum(bt, tmax)


@functools.partial(jax.jit, static_argnames=("chunk_counts", "enabled", "interpret"))
def batched_min_t_general(cols, spheres, rays, tmax, chunk_counts: tuple,
                          enabled: tuple = None, valid=None, interpret=False):
    """Min SHARED-parameter hit over all mesh objects, per-ray origins.

    cols: (4*Tsum_pad, 10) factor-grouped pool; spheres: (C, 4);
    rays: (16*O, N) rows [r10(10), s(1), 0(5)] per object; tmax: (N,)
    shared-parameter search bound (0 = masked lane); chunk_counts: static
    tuple, chunks per object; enabled: static bool tuple (False = object
    excluded, e.g. the light itself); valid: optional (N,) bool for the
    culling cones. Returns (N,) min(t_shared, tmax).
    """
    Tsum_pad = cols.shape[0] // 4
    O = rays.shape[0] // ROWS_GEN
    n = rays.shape[1]
    n_pad = _round_up(n, NB)
    pad = n_pad - n
    cols = chunk_interleave(cols, Tsum_pad, 4, TC)
    rays_p = jnp.pad(rays, ((0, 0), (0, pad)), constant_values=1.0)
    tmax_p = jnp.pad(tmax, (0, pad))[None, :]
    valid_p = None if valid is None else jnp.pad(valid, (0, pad))
    d_os = jnp.stack([rays_p[ROWS_GEN * g:ROWS_GEN * g + 3] for g in range(O)])
    o_os = jnp.stack([rays_p[ROWS_GEN * g + 6:ROWS_GEN * g + 9] for g in range(O)])
    s_os = jnp.stack([rays_p[ROWS_GEN * g + 10] for g in range(O)])
    order, minds, counts = live_chunk_lists_multi(
        spheres, chunk_counts, d_os, o_os, s_os, valid=valid_p, enabled=enabled)
    chunk_obj = sum(((g,) * c for g, c in enumerate(chunk_counts)), ())
    cobj = jnp.asarray(chunk_obj, jnp.int32)[None, None, :]
    # Per-object chunk-union boxes (object space); disabled objects get an
    # empty box so they contribute nothing to the walk bound.
    boxes = []
    c0 = 0
    for g in range(O):
        sph_g = spheres[c0:c0 + chunk_counts[g]]
        c0 += chunk_counts[g]
        if enabled is not None and not enabled[g]:
            boxes.append(jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0]))
            continue
        lo = jnp.min(sph_g[:, :3] - sph_g[:, 3:4], axis=0)
        hi = jnp.max(sph_g[:, :3] + sph_g[:, 3:4], axis=0)
        boxes.append(jnp.concatenate([lo, hi]))
    boxes = jnp.stack(boxes)  # (O, 6)

    kernel = functools.partial(_general_batch_kernel, O=O, Tsum_pad=Tsum_pad)
    C = spheres.shape[0]
    bt = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((O, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((cols.shape[0], 10), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_GEN * O, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(order, minds, counts, cobj, boxes, cols, rays_p, tmax_p)
    return bt[0, :n]
