"""Streaming mesh kernels for LARGE meshes (constants stay in HBM).

The VMEM-resident kernels (ops.pallas.mesh_kernels) map the whole per-mesh
constant pool into VMEM: at ~170 B/triangle (shared) and ~160 B/triangle
(general) they stop fitting the ~16 MB/core VMEM around ~50k triangles, and
the live-list build's O(C^2) permutation inversion (bucket_order) explodes
with the chunk count. This module scales the same wavefront design to
arbitrary triangle counts -- the reference handles this case with its
depth-6 octree + per-ray stackless walk (/root/reference/Octree.cpp:171-248,
opencl_kernel.cl:172-308); the TPU-native equivalent keeps dense ray blocks
and adds a SUPERCHUNK tier instead of a per-ray tree descent:

- Triangles stay Morton-ordered in TC-chunks; S_SUPER consecutive chunks
  form a superchunk. Front-to-back ordering (bucket_order) runs at SUPER
  granularity: C_s = C / S_SUPER keeps the O(C_s^2) inversion and the SMEM
  per-block windows bounded.
- Chunk-level tightness is preserved by a per-(block, chunk) overlap BITMASK
  (block-cone vs chunk-sphere, packed 32 bits/int32, SMEM): the kernel walks
  a linear cursor over the super-ordered chunk positions and skips dead
  chunks with a scalar advance loop -- a dead chunk costs a few scalar
  cycles instead of an MXU/VPU iteration.
- Per-chunk constants are DMA'd HBM->VMEM inside the walk, double-buffered
  (two scratch slots + two DMA semaphores): slot i&1 is consumed while the
  NEXT live chunk's record streams into the slot just freed. Records are
  (REC_*, cols) slices of a per-chunk-packed pool, one DMA each.
- Everything else (Moller-Trumbore VPU FMAs, bf16-split attr select,
  occlusion retirement, per-lane union-box bounds, early termination on
  bucket floors) matches the VMEM kernels -- see mesh_kernels.py.

Acceptance semantics are the reference Moller-Trumbore
(/root/reference/opencl_kernel.cl:106-126).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ray_vma

from .mesh_kernels import (
    INF, NB, TC, N_ATTR, _mt_mask, _round_up, _safe_inv,
    _walk_scaffold, live_chunk_lists2, live_chunk_lists3, split_bf16,
)

# Diagnostic switches (set before first trace): DEBUG_SYNC forces
# synchronous per-chunk DMA (no prefetch) to separate pipelining races from
# logic bugs; DEBUG_NO_EARLYSTOP walks every live chunk, isolating the
# bucket-floor early termination (this is how the round-3 NaN super-sphere
# floor bug was found; the super level now REDUCES the chunk cull, see
# mesh_kernels.live_chunk_lists2, so that failure mode is gone by design).
DEBUG_SYNC = False
DEBUG_NO_EARLYSTOP = False
S_SUPER = 32     # chunks per superchunk (ordering granularity)
LARGE_T = 24576  # T_pad above which the VMEM-resident kernels stop fitting
# Above this chunk count the DENSE chunk-granularity cull matrix stops
# scaling (at C ~ 40k chunks / 1.27M tris it is ~0.5-1 GB of f32 transients
# per frame and the bitmask build dominates): switch to super-sphere culling
# with S_SUPER_XL-chunk groups (live_chunk_lists3), which keeps C_s ~ 311 at
# the 1.27M-triangle tier -- the same ordering width the proven 318k tier
# runs at. ~2M chunks is the envelope of the (B, C) block-granularity bits
# pass itself; beyond that a third grouping level is needed.
SUPER_CULL_C = 16384
S_SUPER_XL = 128


def _super_s(C: int) -> int:
    """Ordering granularity for a C-chunk pool (static, trace-time)."""
    return S_SUPER if C <= SUPER_CULL_C else S_SUPER_XL

# DMA'd per-chunk records are LANE-major -- (coefficient-rows, 128) with the
# chunk's TC triangles on lanes -- because Mosaic requires DMA regions to be
# 128-lane aligned (a (rows, 3) sublane-major slice is not expressible). The
# kernel transposes each record back to triangle-major with one small tile
# transpose per iteration (tens of cycles).
REC_SH = 16   # shared rows/chunk: det(3) u(3) v(3) ct(1) + pad to 16
REC_GEN = 24  # general rows/chunk: det(3) u(6) v(6) t(4) + pad to 24
REC_AT = 32   # attr rows/chunk: 30 bf16-split components + pad to 32


def pack_shared_records(consts, T_pad):
    """(4*T_pad, 3) factor-grouped shared constants -> (C*REC_SH, 128)
    lane-major per-chunk DMA records (rows: det c0..2, u c0..2, v c0..2, ct)."""
    C = T_pad // TC
    det = consts[0:T_pad].reshape(C, TC, 3).transpose(0, 2, 1)
    u = consts[T_pad:2 * T_pad].reshape(C, TC, 3).transpose(0, 2, 1)
    v = consts[2 * T_pad:3 * T_pad].reshape(C, TC, 3).transpose(0, 2, 1)
    ct = consts[3 * T_pad:4 * T_pad, 0].reshape(C, 1, TC)
    rec = jnp.concatenate(
        [det, u, v, ct, jnp.zeros((C, REC_SH - 10, TC), consts.dtype)], axis=1)
    return jnp.pad(rec, ((0, 0), (0, 0), (0, 128 - TC))).reshape(C * REC_SH, 128)


def pack_general_records(cols, T_pad):
    """(4*T_pad, 10) factor-grouped Plucker operators -> (C*REC_GEN, 128)
    lane-major records keeping only each factor's nonzero columns
    (det r10[0:3], u/v r10[0:6], t r10[6:10])."""
    C = T_pad // TC
    det = cols[0:T_pad, 0:3].reshape(C, TC, 3).transpose(0, 2, 1)
    u = cols[T_pad:2 * T_pad, 0:6].reshape(C, TC, 6).transpose(0, 2, 1)
    v = cols[2 * T_pad:3 * T_pad, 0:6].reshape(C, TC, 6).transpose(0, 2, 1)
    t = cols[3 * T_pad:4 * T_pad, 6:10].reshape(C, TC, 4).transpose(0, 2, 1)
    rec = jnp.concatenate(
        [det, u, v, t, jnp.zeros((C, REC_GEN - 19, TC), cols.dtype)], axis=1)
    return jnp.pad(rec, ((0, 0), (0, 0), (0, 128 - TC))).reshape(C * REC_GEN, 128)


def pack_attr_records(attrs_split, T_pad):
    """(T_pad, 30) bf16-split attrs -> (C*REC_AT, 128) lane-major records."""
    C = T_pad // TC
    a = attrs_split.reshape(C, TC, 2 * N_ATTR).transpose(0, 2, 1)
    a = jnp.pad(a, ((0, 0), (0, REC_AT - 2 * N_ATTR), (0, 128 - TC)))
    return a.reshape(C * REC_AT, 128)


def large_live_lists(spheres, dh_p, o_p, valid=None, lane_bound=None,
                     endpoints=None, seg_len=None):
    """Super-level front-to-back order + chunk-level live bits.

    Ordering (and its O(C_s^2) inversion) runs at superchunk granularity;
    per-chunk tightness comes from a (B, C) block-cone overlap bitmask the
    kernel consults with cheap scalar reads. Delegates to the shared
    two-level builder (mesh_kernels.live_chunk_lists2): ONE chunk-level
    cull pass whose min/any group reductions give the super floors --
    tighter than culling separate superchunk bounding spheres, and
    structurally immune to the round-3 pad-sphere NaN floors.
    lane_bound (optional (n_pad,) f32) is each lane's maximum useful ray
    parameter (segment culling, see mesh_kernels.live_chunk_lists).
    Above SUPER_CULL_C chunks the dense chunk-granularity cull is replaced
    by super-sphere culling + block-granularity bits (live_chunk_lists3)
    at S_SUPER_XL grouping -- the 1M+-triangle tier.
    Returns (order, minds, counts, bits)."""
    C = spheres.shape[0]
    if C <= SUPER_CULL_C:
        return live_chunk_lists2(spheres, dh_p, o_p, valid, lane_bound,
                                 s=S_SUPER, endpoints=endpoints,
                                 seg_len=seg_len)
    return live_chunk_lists3(spheres, dh_p, o_p, valid, lane_bound,
                             s=S_SUPER_XL, endpoints=endpoints,
                             seg_len=seg_len)


def _shared_large_kernel(order_ref, minds_ref, count_ref, bits_ref, box_ref,
                         consts_hbm, attrs_hbm, dh_ref,
                         t_ref, u_ref, v_ref, tri_ref, attr_out_ref,
                         rec_ref, attr_scr, rec_sems, attr_sems,
                         *, C: int, S: int, T: int):
    dh = dh_ref[:]
    nb = dh.shape[1]
    n_live, end, chunk_at, advance = _walk_scaffold(order_ref, count_ref,
                                                    bits_ref, C, S)

    # Per-lane union-box bound (see mesh_kernels._shared_kernel).
    far = jnp.full((nb,), INF, jnp.float32)
    near = jnp.full((nb,), -INF, jnp.float32)
    for ax in range(3):
        inv = _safe_inv(dh[ax])
        t0 = (box_ref[0, ax] - box_ref[0, 6 + ax]) * inv
        t1 = (box_ref[0, 3 + ax] - box_ref[0, 6 + ax]) * inv
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hits_box = (near <= far) & (far > 0)
    bound_vec = jnp.where(hits_box, far * 1.001 + 1e-3, 0.0)

    def issue(slot, p):
        # Always-issue (clamped): wasted tail transfers beat predicated DMA.
        k = jnp.clip(chunk_at(jnp.minimum(p, jnp.maximum(end - 1, 0))), 0, C - 1)
        pltpu.make_async_copy(consts_hbm.at[pl.ds(k * REC_SH, REC_SH), :],
                              rec_ref.at[slot],
                              rec_sems.at[slot]).start()
        pltpu.make_async_copy(attrs_hbm.at[pl.ds(k * REC_AT, REC_AT), :],
                              attr_scr.at[slot],
                              attr_sems.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(consts_hbm.at[pl.ds(0, REC_SH), :],
                              rec_ref.at[slot],
                              rec_sems.at[slot]).wait()
        pltpu.make_async_copy(attrs_hbm.at[pl.ds(0, REC_AT), :],
                              attr_scr.at[slot],
                              attr_sems.at[slot]).wait()

    p0 = advance(jnp.int32(0))
    p1 = advance(p0 + 1)
    issue(jnp.int32(0), p0)
    issue(jnp.int32(1), p1)

    def cond(state):
        i, p_cur, p_nxt, mb = state[:4]
        if DEBUG_NO_EARLYSTOP:
            return p_cur < end
        # p_cur == end (exhausted walk) would index one past the order
        # window when every super is live; the & already rejects via
        # p_cur < end, but the SMEM read must stay in bounds.
        sid = order_ref[0, 0, jnp.minimum(p_cur // S, minds_ref.shape[2] - 1)]
        return (p_cur < end) & (minds_ref[0, 0, sid] < mb)

    def body(state):
        i, p_cur, p_nxt, mb, best_t, best_u, best_v, best_tri, best_attr = state
        slot = i & 1
        if DEBUG_SYNC:
            issue(slot, p_cur)
        wait(slot)
        # records arrive lane-major; one small tile transpose each back to
        # triangle-major (rows = tris) for the broadcast FMAs
        rec = jnp.transpose(rec_ref[slot])[0:TC]    # (Tc, REC_SH)
        attrs = jnp.transpose(attr_scr[slot])[0:TC, 0:2 * N_ATTR]  # (Tc, 30)
        k = chunk_at(p_cur)
        base = k * TC
        # Moller-Trumbore via exact VPU FMAs (see mesh_kernels).
        det = (rec[:, 0:1] * dh[0:1] + rec[:, 1:2] * dh[1:2]
               + rec[:, 2:3] * dh[2:3])
        u_num = (rec[:, 3:4] * dh[0:1] + rec[:, 4:5] * dh[1:2]
                 + rec[:, 5:6] * dh[2:3])
        v_num = (rec[:, 6:7] * dh[0:1] + rec[:, 7:8] * dh[1:2]
                 + rec[:, 8:9] * dh[2:3])
        ct = rec[:, 9]  # (Tc,)
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = ct[:, None] * inv_det
        tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0)) < T
        dist = jnp.where(_mt_mask(det, u, v, dist, tri_ok), dist, INF)
        dmin = jnp.min(dist, axis=0)
        better = dmin < best_t
        idx = jnp.argmin(dist, axis=0)
        onehot = jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0) == idx[None, :]
        onehot_f = jnp.where(onehot, 1.0, 0.0)
        umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
        vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        attr_sel = (
            jax.lax.dot_general(attrs[:, :N_ATTR], onehot_f,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
            + jax.lax.dot_general(attrs[:, N_ATTR:], onehot_f,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)
        )
        # prefetch the next live chunk into the slot just consumed
        p_nn = advance(p_nxt + 1)
        if not DEBUG_SYNC:
            issue(slot, p_nn)
        new_t = jnp.where(better, dmin, best_t)
        return (
            i + 1, p_nxt, p_nn,
            jnp.max(jnp.minimum(new_t, bound_vec)),
            new_t,
            jnp.where(better, umin, best_u),
            jnp.where(better, vmin, best_v),
            jnp.where(better, base + idx, best_tri),
            jnp.where(better[None, :], attr_sel, best_attr),
        )

    init = (
        jnp.int32(0), p0, p1,
        jnp.max(bound_vec),
        jnp.full((nb,), INF, jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.full((nb,), -1, jnp.int32),
        jnp.zeros((N_ATTR, nb), jnp.float32),
    )
    st = jax.lax.while_loop(cond, body, init)
    _, _, _, _, bt, bu, bv, btri, battr = st
    # Exactly two issued-but-unconsumed DMAs remain in flight for ANY trip
    # count (init issues 2, each body waits 1 + issues 1): drain them so the
    # kernel exits with clean semaphores.
    wait(jnp.int32(0))
    wait(jnp.int32(1))
    t_ref[0, :] = bt
    u_ref[0, :] = bu
    v_ref[0, :] = bv
    tri_ref[0, :] = btri
    attr_out_ref[:, :] = battr


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def large_shared_nearest_hit(consts_rec, attrs_split, spheres,
                             dh, ro, T: int, interpret=False):
    """consts_rec: (C*REC_SH, 128) lane-major records (pack_shared_records);
    attrs_rec: (C*REC_AT, 128) lane-major bf16-split attr records
    (pack_attr_records); spheres: (C, 4) chunk spheres; dh: (3, N) unit
    object-space dirs; ro: (3,).
    Returns (t, u, v, tri, attr (15, N))."""
    C = spheres.shape[0]
    n = dh.shape[1]
    n_pad = _round_up(n, NB)
    dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    ro_p = jnp.broadcast_to(ro[:, None], (3, n_pad))
    order, minds, counts, bits = large_live_lists(spheres, dh_p, ro_p)
    lo = jnp.min(spheres[:, :3] - spheres[:, 3:4], axis=0)
    hi = jnp.max(spheres[:, :3] + spheres[:, 3:4], axis=0)
    box = jnp.concatenate([lo, hi, ro])[None, :]

    C_s = order.shape[2]
    kernel = functools.partial(_shared_large_kernel, C=C, S=_super_s(C), T=T)
    out_vec = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    bt, bu, bv, btri, battr = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((1, 1, C_s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C_s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bits.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # consts stay in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),   # attrs stay in HBM
            pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_vec, out_vec, out_vec, out_vec,
                   pl.BlockSpec((N_ATTR, NB), lambda i: (0, i), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dh_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dh_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dh_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32, vma=ray_vma(dh_p)),
            jax.ShapeDtypeStruct((N_ATTR, n_pad), jnp.float32,
                                 vma=ray_vma(dh_p)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, REC_SH, 128), jnp.float32),
            pltpu.VMEM((2, REC_AT, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(order, minds, counts, bits, box, consts_rec, attrs_split, dh_p)
    return bt[0, :n], bu[0, :n], bv[0, :n], btri[0, :n], battr[:, :n]


def _general_large_kernel(order_ref, minds_ref, count_ref, bits_ref, box_ref,
                          cols_hbm, r10_ref, tmax_ref, t_ref,
                          rec_ref, rec_sems, *, C: int, S: int, T: int):
    r10 = r10_ref[:]
    nb = r10.shape[1]
    tmax = tmax_ref[0, :]
    tcut = tmax_ref[1, :]
    n_live, end, chunk_at, advance = _walk_scaffold(order_ref, count_ref,
                                                    bits_ref, C, S)

    far = jnp.full((nb,), INF, jnp.float32)
    near = jnp.full((nb,), -INF, jnp.float32)
    for ax in range(3):
        inv = _safe_inv(r10[ax])
        t0 = (box_ref[0, ax] - r10[6 + ax]) * inv
        t1 = (box_ref[0, 3 + ax] - r10[6 + ax]) * inv
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hits_box = (near <= far) & (far > 0)
    tmax_eff = jnp.minimum(tmax, jnp.where(hits_box, far * 1.001 + 1e-3, 0.0))

    def issue(slot, p):
        k = jnp.clip(chunk_at(jnp.minimum(p, jnp.maximum(end - 1, 0))), 0, C - 1)
        pltpu.make_async_copy(cols_hbm.at[pl.ds(k * REC_GEN, REC_GEN), :],
                              rec_ref.at[slot],
                              rec_sems.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(cols_hbm.at[pl.ds(0, REC_GEN), :],
                              rec_ref.at[slot],
                              rec_sems.at[slot]).wait()

    p0 = advance(jnp.int32(0))
    p1 = advance(p0 + 1)
    issue(jnp.int32(0), p0)
    issue(jnp.int32(1), p1)

    def cond(state):
        i, p_cur, p_nxt, mb = state[:4]
        # in-bounds clamp: see _shared_large_kernel.cond
        sid = order_ref[0, 0, jnp.minimum(p_cur // S, minds_ref.shape[2] - 1)]
        return (p_cur < end) & (minds_ref[0, 0, sid] < mb)

    def body(state):
        i, p_cur, p_nxt, mb, best_t = state
        slot = i & 1
        if DEBUG_SYNC:
            issue(slot, p_cur)
        wait(slot)
        blk = jnp.transpose(rec_ref[slot])[0:TC]  # (Tc, REC_GEN) tri-major
        k = chunk_at(p_cur)
        base = k * TC

        def fma(col0, r0, n):
            acc = blk[:, col0:col0 + 1] * r10[r0:r0 + 1]
            for j in range(1, n):
                acc = acc + blk[:, col0 + j:col0 + j + 1] * r10[r0 + j:r0 + j + 1]
            return acc

        det = fma(0, 0, 3)
        u_num = fma(3, 0, 6)
        v_num = fma(9, 0, 6)
        t_num = fma(15, 6, 4)
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = t_num * inv_det
        tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (TC, nb), 0)) < T
        dist = jnp.where(_mt_mask(det, u, v, dist, tri_ok), dist, INF)
        new_t = jnp.minimum(best_t, jnp.min(dist, axis=0))
        p_nn = advance(p_nxt + 1)
        if not DEBUG_SYNC:
            issue(slot, p_nn)
        live_bound = jnp.where(new_t < tcut, 0.0, jnp.minimum(new_t, tmax_eff))
        return i + 1, p_nxt, p_nn, jnp.max(live_bound), new_t

    init = (jnp.int32(0), p0, p1, jnp.max(tmax_eff),
            jnp.full((nb,), INF, jnp.float32))
    _, _, _, _, bt = jax.lax.while_loop(cond, body, init)
    wait(jnp.int32(0))
    wait(jnp.int32(1))
    t_ref[0, :] = jnp.minimum(bt, tmax)


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def large_general_min_t(cols_rec, spheres, r10, tmax_obj=None,
                        valid=None, tcut_obj=None, T: int = 0,
                        interpret=False):
    """cols_rec: (C*REC_GEN, 128) lane-major records (pack_general_records);
    see mesh_kernels.general_min_t for the tmax/tcut contract."""
    C = spheres.shape[0]
    n = r10.shape[1]
    n_pad = _round_up(n, NB)
    r10_p = jnp.pad(r10, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    bounded = tmax_obj is not None
    if tmax_obj is None:
        tmax_obj = jnp.full((n,), INF, jnp.float32)
    if tcut_obj is None:
        tcut_obj = jnp.zeros((n,), jnp.float32)
    tmax_p = jnp.stack([jnp.pad(tmax_obj, (0, n_pad - n)),
                        jnp.pad(tcut_obj, (0, n_pad - n))])
    valid_p = None if valid is None else jnp.pad(valid, (0, n_pad - n))
    lo = jnp.min(spheres[:, :3] - spheres[:, 3:4], axis=0)
    hi = jnp.max(spheres[:, :3] + spheres[:, 3:4], axis=0)
    box = jnp.concatenate([lo, hi])[None, :]
    from .mesh_kernels import _general_lane_bound, _revcone_on

    endpoints = seg_len = None
    if bounded and valid is not None and _revcone_on():
        # Reversed-cone shadow culling (see mesh_kernels._revcone_on):
        # endpoint = the light position in object space, exact per lane.
        endpoints = r10_p[6:9] + r10_p[0:3] * tmax_p[0][None, :]
        seg_len = tmax_p[0]
    order, minds, counts, bits = large_live_lists(
        spheres, r10_p[0:3], r10_p[6:9], valid=valid_p,
        lane_bound=_general_lane_bound(tmax_p[0], r10_p, lo, hi),
        endpoints=endpoints, seg_len=seg_len)

    C_s = order.shape[2]
    kernel = functools.partial(_general_large_kernel, C=C, S=_super_s(C), T=T)
    bt = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((1, 1, C_s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C_s), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bits.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),   # cols stay in HBM
            pl.BlockSpec((10, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                        vma=ray_vma(r10_p, tmax_p)),
        scratch_shapes=[
            pltpu.VMEM((2, REC_GEN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(order, minds, counts, bits, box, cols_rec, r10_p, tmax_p)
    return bt[0, :n]
