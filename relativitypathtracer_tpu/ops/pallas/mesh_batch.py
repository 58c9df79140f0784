"""Batched multi-mesh Pallas kernels: N mesh instances, ONE kernel.

In-kernel dots pin precision=DEFAULT: the renderer traces under
default_matmul_precision("highest"), which would otherwise slow these
f32-exact small-K dots 3-6x (see ops/pallas/mesh_kernels._shared_kernel).

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

from . import ray_vma

from .mesh_kernels import (
    INF, NB, TC, N_ATTR, _mt_mask, _pair_mode, _revcone_on, _round_up,
    _safe_inv, _shadow_cull_mode, _sub_cone_cull, bucket_order,
    chunk_interleave, split_bf16,
)

ROWS_SH = 8   # scratch rows per object, shared kernel: [dh(3), s(1), pad(4)]
ROWS_GEN = 16  # scratch rows per object, general kernel: [r10(10), s(1), pad]

# Per-object transform table (SMEM (O, MAT_COLS)); rays are transformed
# IN-KERNEL at block start (a static O-loop of scalar-broadcast FMAs into
# VMEM scratch), so the kernels read only the camera-frame dir4/origins4 --
# materializing (8|16)*O ray rows per frame in HBM cost ~O x 100MB of
# traffic at 8 instances.
MAT_COLS = 40
_A = 0      # rows 0:12  fused dir/origin transform A = R_invm @ L[1:4,:]
_B = 12     # rows 12:15 inv_m translation (origin affine part)
_RO = 15    # rows 15:18 shared-origin object-space origin (shared kernel)
_MR = 18    # rows 18:27 m4[:3,:3] row-major (object->rest scale for s)
_L3 = 27    # rows 27:39 L[1:4,:] row-major (|d3| for s)


def _fill_ray_scratch(mats_ref, d4, o4, scratch, rows: int, O: int):
    """Per-object transformed rays into VMEM scratch (static O-loop).

    d4: (4, NB) camera 4-dirs; o4: (4, NB) camera 4-origins or None
    (shared-origin kernels). Writes per object g:
      rows 0:3  dh   unit object-space dir
      row  3    s    object-dist -> shared-t scale   (shared layout), or
      rows 0:10 r10 = [dh, ro x dh, ro, 1], row 10 s (general layout).
    """
    def mat_rows(g, base, n_out, vec, ncols=4):
        out = []
        for i in range(n_out):
            acc = mats_ref[g, base + ncols * i] * vec[0]
            for j in range(1, ncols):
                acc = acc + mats_ref[g, base + ncols * i + j] * vec[j]
            out.append(acc)
        return out

    d4l = [d4[i] for i in range(4)]
    o4l = None if o4 is None else [o4[i] for i in range(4)]
    for g in range(O):
        d = mat_rows(g, _A, 3, d4l)
        dn = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
        dh = [dk / dn for dk in d]
        d3 = mat_rows(g, _L3, 3, d4l)
        d3n = jnp.sqrt(d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2])
        mdh = mat_rows(g, _MR, 3, dh, ncols=3)
        s = jnp.sqrt(mdh[0] * mdh[0] + mdh[1] * mdh[1] + mdh[2] * mdh[2]) / d3n
        if o4 is None:
            for k in range(3):
                scratch[rows * g + k, :] = dh[k]
            scratch[rows * g + 3, :] = s
        else:
            ro = mat_rows(g, _A, 3, o4l)
            ro = [ro[k] + mats_ref[g, _B + k] for k in range(3)]
            mom = [ro[1] * dh[2] - ro[2] * dh[1],
                   ro[2] * dh[0] - ro[0] * dh[2],
                   ro[0] * dh[1] - ro[1] * dh[0]]
            for k in range(3):
                scratch[rows * g + k, :] = dh[k]
                scratch[rows * g + 3 + k, :] = mom[k]
                scratch[rows * g + 6 + k, :] = ro[k]
            scratch[rows * g + 9, :] = jnp.ones_like(s)
            scratch[rows * g + 10, :] = s


def live_chunk_lists_multi(spheres, chunk_counts, d_os, o_os, s_os,
                           valid=None, enabled=None, lane_bound_shared=None,
                           endpoints_os=None, seg_len_os=None):
    """Fused live lists over the concatenated pool.

    spheres: (C, 4) object-space chunk spheres (object-major concat);
    chunk_counts: static tuple -- chunks per object, in concat order;
    d_os/o_os: (O, 3, n_pad) per-object dirs / origins; s_os: (O, n_pad)
    per-lane object->shared scale; valid: optional (n_pad,) bool;
    enabled: optional static bool tuple -- a disabled object's chunks are
    never live (how shadow rays exclude the light object itself, mirroring
    the reference's `i == lightIndex` skip, opencl_kernel.cl:497);
    lane_bound_shared: optional (n_pad,) f32 max useful SHARED ray parameter
    per lane (e.g. a shadow ray's light distance) -- converted per object to
    its own units for segment culling (mesh_kernels._sub_cone_cull);
    endpoints_os / seg_len_os: optional (O, 3, n_pad) / (O, n_pad)
    per-object segment endpoints + lengths in OBJECT units for the
    reversed-cone shadow cull (mesh_kernels._revcone_on).
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
        s = s_os[g].reshape(n_blocks, NB)
        if valid is not None:
            s = jnp.where(valid.reshape(n_blocks, NB), s, INF)
        lb_g = None
        if lane_bound_shared is not None:
            # shared -> this object's units (t_shared = t_obj * s)
            lb_g = lane_bound_shared / jnp.maximum(s_os[g], 1e-12)
        mind_g, over_g = _sub_cone_cull(
            spheres[c0:c0 + nck], d_os[g], o_os[g], valid, lb_g,
            endpoints=None if endpoints_os is None else endpoints_os[g],
            seg_len=None if seg_len_os is None else seg_len_os[g])
        c0 += nck
        s_min = jnp.min(s, axis=1, keepdims=True)  # (B, 1) lower bound
        minds.append(mind_g * s_min)
        overlaps.append(over_g)
    return bucket_order(jnp.concatenate(minds, axis=1),
                        jnp.concatenate(overlaps, axis=1))


def _shared_batch_kernel(order_ref, minds_ref, count_ref, cobj_ref, box_ref,
                         mats_ref, consts_ref, attr_ref, dir4_ref,
                         t_ref, u_ref, v_ref, tri_ref, obj_ref, attr_out_ref,
                         rays_ref, *, O: int, Tsum_pad: int,
                         pair: bool = False):
    """Walk the fused live-chunk list; per chunk, intersect in the chunk's
    object frame and reduce nearest on the SHARED ray parameter.
    box_ref: (O, 9) SMEM rows [union lo(3), hi(3), ro(3)] per object;
    rays_ref: VMEM scratch filled at block start from dir4 + mats."""
    nb = NB
    n_live = count_ref[0, 0, 0]
    _fill_ray_scratch(mats_ref, dir4_ref[:], None, rays_ref, ROWS_SH, O)

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
            inv = _safe_inv(dh[ax])
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

    def chunk_uvtsh(k, live):
        """One chunk's candidates in SHARED units: (g, u, v, tsh), each
        field (Tc, NB); tsh is INF outside the acceptance mask (or
        everywhere for the masked duplicate half of an odd-count pair)."""
        g = cobj_ref[0, 0, k]
        blk = rays_ref[pl.ds(ROWS_SH * g, ROWS_SH), :]
        dh = blk[0:3]
        s = blk[3]
        base = k * TC
        # K=3 contraction as exact VPU broadcast-FMAs (see
        # mesh_kernels._shared_kernel: MXU DEFAULT is bf16-lossy, HIGHEST 3x).
        cblk = consts_ref[pl.ds(3 * base, 3 * TC), :]
        ct = consts_ref[pl.ds(3 * Tsum_pad + base, TC), 0]

        det = (cblk[0:TC, 0:1] * dh[0:1] + cblk[0:TC, 1:2] * dh[1:2]
               + cblk[0:TC, 2:3] * dh[2:3])
        u_num = (cblk[TC:2 * TC, 0:1] * dh[0:1] + cblk[TC:2 * TC, 1:2] * dh[1:2]
                 + cblk[TC:2 * TC, 2:3] * dh[2:3])
        v_num = (cblk[2 * TC:, 0:1] * dh[0:1] + cblk[2 * TC:, 1:2] * dh[1:2]
                 + cblk[2 * TC:, 2:3] * dh[2:3])
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = ct[:, None] * inv_det  # object-space units
        ok = _mt_mask(det, u, v, dist, live)
        return g, u, v, jnp.where(ok, dist * s[None, :], INF)  # s > 0

    def body(state):
        j, mb, best_t, best_u, best_v, best_tri, best_obj, best_attr = state
        k0 = order_ref[0, 0, j]
        if pair:
            # Two live chunks per iteration (mesh_kernels._pair_mode);
            # shared-unit distances are comparable across objects, so the
            # concatenated argmin reduces both chunks at once.
            live1 = (j + 1) < n_live
            k1 = order_ref[0, 0, jnp.minimum(j + 1, n_live - 1)]
            g0, u0, v0, t0 = chunk_uvtsh(k0, True)
            g1, u1, v1, t1 = chunk_uvtsh(k1, live1)
            u = jnp.concatenate([u0, u1], axis=0)
            v = jnp.concatenate([v0, v1], axis=0)
            tsh = jnp.concatenate([t0, t1], axis=0)
        else:
            g0, u, v, tsh = chunk_uvtsh(k0, True)
        rows = tsh.shape[0]  # TC or 2*TC
        tmin = jnp.min(tsh, axis=0)
        better = tmin < best_t
        idx = jnp.argmin(tsh, axis=0)
        onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, nb), 0) == idx[None, :]
        umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
        vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        onehot_f = jnp.where(onehot, 1.0, 0.0)
        # hi/lo bf16-split one-hot attr select (see mesh_kernels.split_bf16)
        if pair:
            attrs = jnp.concatenate(
                [attr_ref[pl.ds(k0 * TC, TC), :], attr_ref[pl.ds(k1 * TC, TC), :]],
                axis=0)  # (2Tc, 30) [hi | lo]
            tri_id = jnp.where(idx < TC, k0 * TC + idx, k1 * TC + (idx - TC))
            obj_id = jnp.where(idx < TC, g0, g1)
        else:
            attrs = attr_ref[pl.ds(k0 * TC, TC), :]  # (Tc, 30) [hi | lo]
            tri_id = k0 * TC + idx
            obj_id = g0  # scalar; broadcasts in the select below
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
        new_t = jnp.where(better, tmin, best_t)
        return (
            j + (2 if pair else 1),
            jnp.max(jnp.minimum(new_t, bound_vec)),
            new_t,
            jnp.where(better, umin, best_u),
            jnp.where(better, vmin, best_v),
            jnp.where(better, tri_id, best_tri),
            jnp.where(better, obj_id, best_obj),
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
def batched_nearest_shared(consts, attrs, spheres, boxes, mats, dir4,
                           d_os, o_os, s_os,
                           chunk_counts: tuple, interpret=False):
    """Nearest hit over ALL mesh objects for shared-per-object-origin rays.

    consts: (4*Tsum_pad, 3) factor-grouped pool; attrs: (Tsum_pad, 15);
    spheres: (C, 4); boxes: (O, 9); mats: (O, MAT_COLS) per-object
    transform table (rays transform IN-KERNEL); dir4: (4, N) camera
    4-dirs; d_os/o_os/s_os: (O, 3, N)/(O, 3, N)/(O, N) per-object dirs /
    origins / scales for the live-list pass only (XLA fuses them into the
    cone reductions); chunk_counts: static tuple, chunks per object.
    Returns (t_shared, u, v, tri (pool row), obj slot, attr (15, N));
    tri/obj are -1 where no hit.
    """
    Tsum_pad = attrs.shape[0]
    O = boxes.shape[0]
    n = dir4.shape[1]
    n_pad = _round_up(n, NB)
    pad = n_pad - n
    consts = jnp.concatenate(
        [chunk_interleave(consts[:3 * Tsum_pad], Tsum_pad, 3, TC),
         consts[3 * Tsum_pad:]], axis=0)
    attrs = split_bf16(attrs)  # (Tsum_pad, 30) [hi | lo]
    dir4_p = jnp.pad(dir4, ((0, 0), (0, pad)), constant_values=1.0)
    d_p = jnp.pad(d_os, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
    o_p = jnp.pad(o_os, ((0, 0), (0, 0), (0, pad)))
    s_p = jnp.pad(s_os, ((0, 0), (0, pad)), constant_values=1.0)
    order, minds, counts = live_chunk_lists_multi(spheres, chunk_counts,
                                                  d_p, o_p, s_p)
    chunk_obj = sum(((g,) * c for g, c in enumerate(chunk_counts)), ())
    cobj = jnp.asarray(chunk_obj, jnp.int32)[None, None, :]

    kernel = functools.partial(_shared_batch_kernel, O=O, Tsum_pad=Tsum_pad,
                               pair=_pair_mode())
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
            pl.BlockSpec((O, MAT_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((consts.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tsum_pad, 2 * N_ATTR), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_vec, out_vec, out_vec, out_vec, out_vec,
                   pl.BlockSpec((N_ATTR, NB), lambda i: (0, i), memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((N_ATTR, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p)),
        ),
        scratch_shapes=[pltpu.VMEM((ROWS_SH * O, NB), jnp.float32)],
        interpret=interpret,
    )(order, minds, counts, cobj, boxes, mats, consts, attrs, dir4_p)
    return (bt[0, :n], bu[0, :n], bv[0, :n], btri[0, :n], bobj[0, :n],
            battr[:, :n])


def _general_batch_kernel(order_ref, minds_ref, count_ref, cobj_ref, box_ref,
                          mats_ref, cols_ref, o4_ref, dir4_ref, tmax_ref,
                          t_ref, rays_ref, *, O: int, Tsum_pad: int,
                          pair: bool = False):
    nb = NB
    n_live = count_ref[0, 0, 0]
    tmax = tmax_ref[0, :]
    _fill_ray_scratch(mats_ref, dir4_ref[:], o4_ref[:], rays_ref, ROWS_GEN, O)

    # Per-lane walk bound: min(tmax, max over objects of that object's
    # chunk-union-box exit in SHARED units) -- see _general_kernel. Disabled
    # objects carry an empty box (lo > hi) and contribute nothing.
    bound_vec = jnp.zeros((nb,), jnp.float32)
    for g in range(O):  # static unroll
        blk = rays_ref[ROWS_GEN * g:ROWS_GEN * (g + 1), :]
        far = jnp.full((nb,), INF, jnp.float32)
        near = jnp.full((nb,), -INF, jnp.float32)
        for ax in range(3):
            inv = _safe_inv(blk[ax])
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

    def chunk_min(k, live):
        """One chunk's per-lane min SHARED-unit candidate (INF when `live`
        is the traced-False duplicate half of an odd-count pair)."""
        g = cobj_ref[0, 0, k]
        blk = rays_ref[pl.ds(ROWS_GEN * g, ROWS_GEN), :]
        r10 = blk[0:10]
        s = blk[10]
        base = k * TC
        # Structured exact VPU FMAs over the sparse Plucker operators (see
        # mesh_kernels._general_kernel).
        blk2 = cols_ref[pl.ds(4 * base, 4 * TC), :]

        def fma(rows, lo, hi):
            acc = rows[:, lo:lo + 1] * r10[lo:lo + 1]
            for c in range(lo + 1, hi):
                acc = acc + rows[:, c:c + 1] * r10[c:c + 1]
            return acc

        det = fma(blk2[0:TC], 0, 3)
        u_num = fma(blk2[TC:2 * TC], 0, 6)
        v_num = fma(blk2[2 * TC:3 * TC], 0, 6)
        t_num = fma(blk2[3 * TC:], 6, 10)
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = t_num * inv_det
        ok = _mt_mask(det, u, v, dist, live)
        return jnp.min(jnp.where(ok, dist * s[None, :], INF), axis=0)

    def body(state):
        j, mb, best_t = state
        k0 = order_ref[0, 0, j]
        new_t = jnp.minimum(best_t, chunk_min(k0, True))
        if pair:
            live1 = (j + 1) < n_live
            k1 = order_ref[0, 0, jnp.minimum(j + 1, n_live - 1)]
            new_t = jnp.minimum(new_t, chunk_min(k1, live1))
        # Occlusion retirement: tsh and tmax are both in SHARED units and the
        # caller only consumes `result >= tmax`, so any hit strictly below
        # tmax proves the lane shadowed -- drop it from the walk bound (its
        # exact nearest hit no longer matters).
        live_bound = jnp.where(new_t < tmax, 0.0, jnp.minimum(new_t, tmax_eff))
        return j + (2 if pair else 1), jnp.max(live_bound), new_t

    init = (jnp.int32(0), jnp.max(tmax_eff), jnp.full((nb,), INF, jnp.float32))
    _, _, bt = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = jnp.minimum(bt, tmax)


@functools.partial(jax.jit, static_argnames=("chunk_counts", "enabled", "interpret"))
def batched_min_t_general(cols, spheres, mats, origins4, dir4,
                          d_os, o_os, s_os, tmax, chunk_counts: tuple,
                          enabled: tuple = None, valid=None, interpret=False):
    """Min SHARED-parameter hit over all mesh objects, per-ray origins.

    cols: (4*Tsum_pad, 10) factor-grouped pool; spheres: (C, 4);
    mats: (O, MAT_COLS) per-object transform table (r10 built IN-KERNEL);
    origins4/dir4: (4, N) camera-frame 4-origins/4-dirs; d_os/o_os/s_os:
    (O, 3|3|-, N) per-object quantities for the live-list pass only;
    tmax: (N,) shared-parameter search bound (0 = masked lane);
    chunk_counts: static tuple, chunks per object; enabled: static bool
    tuple (False = object excluded, e.g. the light itself); valid:
    optional (N,) bool for the culling cones.
    Returns (N,) min(t_shared, tmax).
    """
    Tsum_pad = cols.shape[0] // 4
    O = mats.shape[0]
    n = dir4.shape[1]
    n_pad = _round_up(n, NB)
    pad = n_pad - n
    cols = chunk_interleave(cols, Tsum_pad, 4, TC)
    dir4_p = jnp.pad(dir4, ((0, 0), (0, pad)), constant_values=1.0)
    o4_p = jnp.pad(origins4, ((0, 0), (0, pad)))
    tmax_p = jnp.pad(tmax, (0, pad))[None, :]
    valid_p = None if valid is None else jnp.pad(valid, (0, pad))
    d_p = jnp.pad(d_os, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
    o_p = jnp.pad(o_os, ((0, 0), (0, 0), (0, pad)))
    s_p = jnp.pad(s_os, ((0, 0), (0, pad)), constant_values=1.0)
    endpoints_os = seg_len_os = None
    if valid is not None and _revcone_on():
        # Reversed-cone shadow culling (mesh_kernels._revcone_on): each
        # object sees the light at o + dh * (tmax / s) in its own units --
        # the exact acceptance boundary of the kernel's shared-unit clamp,
        # margined like the single-mesh path's tmax_obj.
        seg_len_os = (tmax_p[0][None, :] * 1.001 + 1e-3) / jnp.maximum(s_p, 1e-12)
        endpoints_os = o_p + d_p * seg_len_os[:, None, :]
    order, minds, counts = live_chunk_lists_multi(
        spheres, chunk_counts, d_p, o_p, s_p, valid=valid_p, enabled=enabled,
        # Segment culling with the caller's shared-unit bound (the per-object
        # boxfar refinement of the single-mesh path is not worth O extra slab
        # passes here; the in-kernel walk bound still applies it).
        lane_bound_shared=None if _shadow_cull_mode() == "none" else tmax_p[0],
        endpoints_os=endpoints_os, seg_len_os=seg_len_os)
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

    kernel = functools.partial(_general_batch_kernel, O=O, Tsum_pad=Tsum_pad,
                               pair=_pair_mode())
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
            pl.BlockSpec((O, MAT_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((cols.shape[0], 10), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                        vma=ray_vma(o4_p, dir4_p, tmax_p)),
        scratch_shapes=[pltpu.VMEM((ROWS_GEN * O, NB), jnp.float32)],
        interpret=interpret,
    )(order, minds, counts, cobj, boxes, mats, cols, o4_p, dir4_p, tmax_p)
    return bt[0, :n]
