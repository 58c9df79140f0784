"""Batched ray/triangle-mesh intersection, designed for the MXU.

The reference walks a stackless octree per pixel with a divergent while-loop
(/root/reference/opencl_kernel.cl:200-308). On TPU the FLOPs want to live in
big dense matmuls, so the formulation here factors Moller-Trumbore
(/root/reference/opencl_kernel.cl:106-126) into per-triangle constants and a
single triangle-matrix x ray-matrix product:

* Shared-origin rays (all primary rays of one object share origin
  `stationaryCam`): with tvec = o - A constant per triangle,
      det   = cross(e2, e1) . d
      u_num = cross(e2, o - A) . d
      v_num = qvec . d,   qvec = (o - A) x e1     (per-triangle constant)
      t_num = e2 . qvec                            (per-triangle scalar)
  so the whole test is one (3T, 3) @ (3, N) matmul plus elementwise masking.

* General rays (per-pixel shadow-ray origins): lift each ray to the 10-vector
  r = [d, m, o, 1] with moment m = cross(o, d); then det/u_num/v_num/t_num are
  all linear in r, i.e. one (4T, 10) @ (10, N) matmul (Plucker-style).

LAYOUT: rays on the LAST axis everywhere -- directions (3, N), origins (3,)
or (3, N) -- so the minor dimension maps onto the TPU's 128 lanes.

Both paths stream triangle chunks with a running best-hit reduce. Semantics
(epsilon test on det, backface hits allowed, u/v/t acceptance order) match
the reference.
"""

from __future__ import annotations

import math

import os

import jax
import jax.numpy as jnp

from .intersect import apply_affine3, apply_linear3, apply_normal3, norm3, normalize3

EPSILON = 1e-7
INF = 1e20

_PREC = jax.lax.Precision.HIGHEST

# Routing override for the streaming mesh kernels. None = auto (Pallas on
# non-CPU backends, jnp fallback on CPU); True/False force a path;
# "interpret" runs the REAL Pallas kernels in interpret mode (CPU-testable:
# exercises live-chunk culling, the counting sort, early termination and
# tmax bounding -- none of which the jnp fallback contains). Tests that flip
# this must clear the render-fn caches (they close over the resolved mode).
PALLAS_MODE = None

# Routing override for the LARGE-mesh streaming kernels (HBM-resident
# constants + superchunk ordering, ops.pallas.mesh_large). None = auto
# (T_pad > mesh_large.LARGE_T); True/False force. Tests force True to
# exercise the large path on small fixtures in interpret mode.
LARGE_MODE = None


def _resolve_large(T_pad: int) -> bool:
    if LARGE_MODE is not None:
        return bool(LARGE_MODE)
    from .pallas.mesh_large import LARGE_T

    return T_pad > LARGE_T


def _resolve_pallas(use_pallas):
    if use_pallas is None:
        use_pallas = PALLAS_MODE
    if use_pallas is None:
        # Env hook for tools (e.g. RPT_PALLAS=interpret runs the production
        # kernel bodies on a CPU host for walk statistics); read at trace time.
        env = os.environ.get("RPT_PALLAS", "").strip().lower()
        if env in ("1", "true", "on"):
            use_pallas = True
        elif env in ("0", "false", "off"):
            use_pallas = False
        elif env == "interpret":
            use_pallas = "interpret"
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    interpret = use_pallas == "interpret"
    return bool(use_pallas), interpret


def _vma_like(init, like):
    """Cast replicated constants in the pytree `init` to `like`'s
    varying-manual-axes, so lax.scan/while carries initialized from constants
    type-check under shard_map(check_vma=True): the carry starts replicated
    but the body combines it with per-shard rays, and JAX's VMA typing
    requires the init to already be declared varying."""
    vma = getattr(jax.typeof(like), "vma", frozenset())
    if not vma:
        return init
    return jax.tree.map(
        lambda x: jax.lax.pcast(x, tuple(vma), to="varying"), init)


def _cross_cols(a, b):
    """Cross product over the LAST axis for (T, 3) row-vectors."""
    return jnp.stack(
        [
            a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
            a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
            a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
        ],
        axis=-1,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tri_count(tri_range, perm):
    return int(perm.shape[0]) if perm is not None else int(tri_range[1]) - int(tri_range[0])


def mesh_tri_vertices(mesh, tri_range, perm=None):
    """perm, when given, holds ABSOLUTE triangle ids (the Morton-ordered
    octree-reachable set); otherwise the contiguous seeded range is used."""
    if perm is not None:
        tv = mesh.tri_v[perm]
    else:
        lo, hi = int(tri_range[0]), int(tri_range[1])
        tv = mesh.tri_v[lo:hi]
    A = mesh.vertices[tv[:, 0]]
    B = mesh.vertices[tv[:, 1]]
    C = mesh.vertices[tv[:, 2]]
    return A, B, C


def shared_origin_constants(mesh, tri_range, ro, perm=None):
    """Per-triangle constant matrix for the shared-origin factorization.

    ro: (3,) object-space origin. Returns (consts (3T_pad, 3), c_t (T_pad,),
    T, T_pad) with T_pad rounded up to 128; padding rows are zero (det == 0
    -> auto-masked by the epsilon test). `perm` optionally reorders triangles
    (Morton order for chunk locality).
    """
    T = tri_count(tri_range, perm)
    A, B, C = mesh_tri_vertices(mesh, tri_range, perm)
    e1 = B - A
    e2 = C - A
    qvec = _cross_cols(ro[None, :] - A, e1)
    c_det = _cross_cols(e2, e1)
    c_u = _cross_cols(e2, ro[None, :] - A)
    c_t = jnp.sum(e2 * qvec, axis=-1)

    T_pad = _round_up(max(T, 1), 256)  # multiple of the Pallas chunk size TC
    pad = T_pad - T
    c_det = jnp.pad(c_det, ((0, pad), (0, 0)))
    c_u = jnp.pad(c_u, ((0, pad), (0, 0)))
    qvec = jnp.pad(qvec, ((0, pad), (0, 0)))
    c_t = jnp.pad(c_t, (0, pad))
    # ct rides in lane 0 of a 4th block so every kernel slice is a
    # sublane-dynamic (Tc, 3) window (lane slices would force Tc >= 128).
    ct_block = jnp.concatenate([c_t[:, None], jnp.zeros((T_pad, 2))], axis=1)
    consts = jnp.concatenate([c_det, c_u, qvec, ct_block], axis=0)  # (4*T_pad, 3)
    return consts, c_t, T, T_pad


def tri_attr_matrix(mesh, tri_range, T_pad, perm=None):
    """(T_pad, 15) interpolation operators: cols = [nA(3), uvA(2),
    (nB-nA)(3), (uvB-uvA)(2), (nC-nA)(3), (uvC-uvA)(2)] so that
    attr(u, v) = base + u*du + v*dv reproduces barycentric interpolation."""
    T = tri_count(tri_range, perm)
    if perm is not None:
        tn = mesh.tri_n[perm]
        tuv = mesh.tri_uv[perm]
    else:
        lo, hi = int(tri_range[0]), int(tri_range[1])
        tn = mesh.tri_n[lo:hi]
        tuv = mesh.tri_uv[lo:hi]
    nA, nB, nC = (mesh.normals[tn[:, k]] for k in range(3))
    uA, uB, uC = (mesh.uvs[tuv[:, k]] for k in range(3))
    base = jnp.concatenate([nA, uA], axis=1)  # (T, 5)
    du = jnp.concatenate([nB - nA, uB - uA], axis=1)
    dv = jnp.concatenate([nC - nA, uC - uA], axis=1)
    attrs = jnp.concatenate([base, du, dv], axis=1)  # (T, 15)
    # (T_pad, 15): row-major so kernel slices are sublane-dynamic (8-aligned)
    return jnp.pad(attrs, ((0, T_pad - T), (0, 0)))


def general_ray_constants(mesh, tri_range, perm=None):
    """Per-triangle Plucker-lift operators, FACTOR-GROUPED: returns
    (cols (4*T_pad, 10), T, T_pad) where rows [0,T_pad) are the det
    operators, then u, v, t blocks. Grouped layout keeps per-chunk slices
    contiguous (no strided sublane access). Zero padding rows auto-mask."""
    T = tri_count(tri_range, perm)
    A, B, C = mesh_tri_vertices(mesh, tri_range, perm)
    e1 = B - A
    e2 = C - A
    zeros = jnp.zeros_like(A)
    zcol = jnp.zeros((T, 1))
    col_det = jnp.concatenate([_cross_cols(e2, e1), zeros, zeros, zcol], axis=-1)
    col_u = jnp.concatenate([_cross_cols(A, e2), e2, zeros, zcol], axis=-1)
    col_v = jnp.concatenate([-_cross_cols(A, e1), -e1, zeros, zcol], axis=-1)
    tnum_c = -jnp.sum(e2 * _cross_cols(A, e1), axis=-1)
    col_t = jnp.concatenate([zeros, zeros, _cross_cols(e1, e2), tnum_c[:, None]], axis=-1)
    T_pad = _round_up(max(T, 1), 256)  # multiple of the Pallas chunk size TC

    def padrows(x):
        return jnp.pad(x, ((0, T_pad - T), (0, 0)))

    cols = jnp.concatenate(
        [padrows(col_det), padrows(col_u), padrows(col_v), padrows(col_t)], axis=0
    )
    return cols, T, T_pad


def _mt_accept(det, u_num, v_num, t_num, tri_ok):
    """Shared acceptance logic; returns dist (INF where rejected), u, v."""
    inv_det = 1.0 / det
    u = u_num * inv_det
    v = v_num * inv_det
    dist = t_num * inv_det
    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (dist >= 0.0) & tri_ok
    )
    return jnp.where(ok, dist, INF), u, v


def mesh_intersect_shared(mesh, tri_range, m4, inv_m, o3, d3, *, tri_chunk=512,
                          use_pallas=None, perm=None, static=None,
                          debug_iters=False):
    """Nearest-hit of shared-origin rays against triangles [lo, hi).

    o3: (3,) rest-frame spatial origin; d3: (3, N) rest-frame spatial dirs.
    Returns (t, normal (3, N), uv (2, N), valid); t is the 4D ray parameter,
    converted via world-space distance like intersect_octree
    (opencl_kernel.cl:301-303).

    use_pallas: route the streaming reduce through the Pallas TPU kernel
    (default: automatically on TPU backends).
    """
    n = d3.shape[1]
    lo = int(tri_range[0])
    if tri_count(tri_range, perm) == 0:
        return (jnp.full((n,), INF), jnp.zeros((3, n)), jnp.zeros((2, n)),
                jnp.zeros((n,), bool))

    ro = apply_affine3(inv_m, o3)  # (3,)
    d = apply_linear3(inv_m, d3)  # (3, N)
    scale = norm3(d)
    dh = d / scale

    use_pallas, interpret = _resolve_pallas(use_pallas)
    consts, c_t, T, T_pad = shared_origin_constants(mesh, tri_range, ro, perm)

    if use_pallas:
        from .pallas.mesh_kernels import chunk_spheres, shared_nearest_hit

        if static is not None:
            attrs, spheres = static.attrs, static.spheres
        else:
            A, B, C = mesh_tri_vertices(mesh, tri_range, perm)
            attrs = tri_attr_matrix(mesh, tri_range, T_pad, perm)
            spheres = chunk_spheres(A, B, C, T, T_pad)
        if _resolve_large(T_pad):
            from .pallas.mesh_kernels import split_bf16
            from .pallas.mesh_large import (
                large_shared_nearest_hit, pack_attr_records,
                pack_shared_records)

            attrs_rec = (static.attrs_split if static is not None
                         and static.attrs_split is not None
                         else pack_attr_records(split_bf16(attrs), T_pad))
            consts_rec = pack_shared_records(consts, T_pad)
            out = large_shared_nearest_hit(
                consts_rec, attrs_rec, spheres, dh, ro, T=T,
                interpret=interpret)
        else:
            out = shared_nearest_hit(
                consts, c_t, attrs, spheres, dh, ro, interpret=interpret,
                debug_iters=debug_iters)
        bt, bu, bv, btri, battr = out[:5]
        valid = btri >= 0  # kernel init is -1; any real hit overwrites it
        # attr(u, v) = base + u*du + v*dv (see tri_attr_matrix)
        interp = battr[0:5] + bu * battr[5:10] + bv * battr[10:15]
        normal = normalize3(apply_normal3(inv_m, interp[0:3]))
        uv = interp[3:5]
        obj_pt = ro[:, None] + bt * dh
        world_pt = apply_affine3(m4, obj_pt)
        t = norm3(world_pt - o3[:, None]) / norm3(d3)
        t = jnp.where(valid, t, INF)
        if debug_iters:
            return t, normal, uv, valid, out[5]
        return t, normal, uv, valid

    # Tc must DIVIDE T_pad: the factor blocks are packed contiguously at
    # T_pad stride, so a floor-divided chunk count silently drops the tail
    # triangles (T_pad = 768 with Tc = 512 skipped tris 512..767 -- rays
    # passed through geometry on the jnp path), while a ceil count would
    # run the last chunk's cv slice out of bounds (dynamic_slice clamps the
    # start, unmasking WRONG rows). T_pad is a multiple of 256, so the gcd
    # is always >= 256.
    Tc = math.gcd(min(tri_chunk, T_pad), T_pad)
    n_chunks = T_pad // Tc

    def chunk_step(carry, k):
        best_t, best_u, best_v, best_tri = carry
        base = k * Tc
        cd = jax.lax.dynamic_slice_in_dim(consts, base, Tc, 0)
        cu = jax.lax.dynamic_slice_in_dim(consts, T_pad + base, Tc, 0)
        cv = jax.lax.dynamic_slice_in_dim(consts, 2 * T_pad + base, Tc, 0)
        ct = jax.lax.dynamic_slice_in_dim(c_t, base, Tc, 0)
        blk = jnp.concatenate([cd, cu, cv], axis=0)  # (3Tc, 3)
        prods = jnp.matmul(blk, dh, precision=_PREC)  # (3Tc, N)
        det, u_num, v_num = prods[:Tc], prods[Tc:2 * Tc], prods[2 * Tc:]
        tri_ok = (base + jnp.arange(Tc)) < T
        dist, u, v = _mt_accept(det, u_num, v_num, ct[:, None], tri_ok[:, None])
        idx = jnp.argmin(dist, axis=0)  # (N,)
        # One-hot row select instead of a sublane gather (TPU-friendly).
        onehot = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0) == idx[None, :]
        dmin = jnp.min(dist, axis=0)
        umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
        vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        better = dmin < best_t
        carry = (
            jnp.where(better, dmin, best_t),
            jnp.where(better, umin, best_u),
            jnp.where(better, vmin, best_v),
            jnp.where(better, (base + idx).astype(jnp.int32), best_tri),
        )
        return carry, None

    init = _vma_like((jnp.full((n,), INF), jnp.zeros((n,)), jnp.zeros((n,)),
                      jnp.zeros((n,), jnp.int32)), dh)
    (bt, bu, bv, btri), _ = jax.lax.scan(chunk_step, init, jnp.arange(n_chunks))

    return finalize_best_hit(mesh, lo, m4, inv_m, o3, d3, ro, dh, bt, bu, bv, btri, perm)


def finalize_best_hit(mesh, lo, m4, inv_m, o3, d3, ro, dh, bt, bu, bv, btri, perm=None):
    """Attribute interpolation + world-distance conversion for the best hit.

    Mirrors the post-walk block of intersect_octree
    (opencl_kernel.cl:287-303). Shared by the jnp and Pallas mesh paths.
    """
    valid = bt < INF
    if perm is not None:
        tri = perm[jnp.clip(btri, 0, perm.shape[0] - 1)]
    else:
        tri = jnp.clip(btri + lo, 0, mesh.tri_v.shape[0] - 1)

    w0 = 1.0 - bu - bv
    tn = mesh.tri_n[tri]  # (N, 3) gather
    nrm = (
        w0 * mesh.normals[tn[:, 0]].T
        + bu * mesh.normals[tn[:, 1]].T
        + bv * mesh.normals[tn[:, 2]].T
    )  # (3, N)
    normal = normalize3(apply_normal3(inv_m, nrm))
    tuv = mesh.tri_uv[tri]
    uv = (
        w0 * mesh.uvs[tuv[:, 0]].T
        + bu * mesh.uvs[tuv[:, 1]].T
        + bv * mesh.uvs[tuv[:, 2]].T
    )  # (2, N)

    # World-distance conversion (opencl_kernel.cl:301-303).
    obj_pt = ro[:, None] + bt * dh if ro.ndim == 1 else ro + bt * dh
    world_pt = apply_affine3(m4, obj_pt)
    o3b = o3[:, None] if o3.ndim == 1 else o3
    t = norm3(world_pt - o3b) / norm3(d3)
    t = jnp.where(valid, t, INF)
    return t, normal, uv, valid


def mesh_intersect_shared_batched(mesh, meta, batch, L, inv_ms, m4s,
                                  stat_cams, dir4, interpret=False):
    """All mesh objects in ONE kernel (shared-origin rays).

    meta: SceneMeta; batch: models.scene.MeshBatchStatic; L/inv_ms/m4s:
    (O_total, 4, 4) frame/model matrices (indexed by meta.mesh_ids);
    stat_cams: (O_total, 4); dir4: (4, N) camera-frame 4-dirs.
    Returns (t, normal (3, N) rest-frame of the winner, uv, obj global id,
    valid) directly mergeable with the analytic candidates.
    """
    from .pallas.mesh_batch import MAT_COLS, batched_nearest_shared

    n = dir4.shape[1]
    consts_det, consts_u, consts_v, consts_ct = [], [], [], []
    boxes, mats_rows = [], []
    d_os, o_os, s_os = [], [], []
    c0 = 0
    for k, i in enumerate(meta.mesh_ids):
        d4 = L[i] @ dir4
        perm = (jnp.asarray(meta.mesh_perms[k], jnp.int32)
                if meta.mesh_perms[k] else None)
        ro = apply_affine3(inv_ms[i], stat_cams[i, 1:4])  # (3,)
        d = apply_linear3(inv_ms[i], d4[1:4])
        dh = d / norm3(d)
        # object-space dist -> shared 4D parameter: t = dist*|M_R dh|/|d3|
        s = norm3(apply_linear3(m4s[i], dh)) / norm3(d4[1:4])
        cst, _, _, T_pad_k = shared_origin_constants(mesh, meta.mesh_tri_ranges[k],
                                                     ro, perm)
        consts_det.append(cst[0:T_pad_k])
        consts_u.append(cst[T_pad_k:2 * T_pad_k])
        consts_v.append(cst[2 * T_pad_k:3 * T_pad_k])
        consts_ct.append(cst[3 * T_pad_k:4 * T_pad_k])
        # Live-list inputs (XLA fuses these into the cone reductions); the
        # kernel itself re-derives rays in-kernel from the mats table.
        d_os.append(dh)
        o_os.append(jnp.broadcast_to(ro[:, None], (3, n)))
        s_os.append(s)
        A = inv_ms[i][:3, :3] @ L[i][1:4, :]  # (3, 4) fused dir transform
        mats_rows.append(jnp.concatenate([
            A.reshape(12), inv_ms[i][:3, 3], ro, m4s[i][:3, :3].reshape(9),
            L[i][1:4, :].reshape(12), jnp.zeros((MAT_COLS - 39,)),
        ]))
        nck = meta.mesh_chunk_counts[k]
        sph_k = batch.spheres[c0:c0 + nck]
        c0 += nck
        lo = jnp.min(sph_k[:, :3] - sph_k[:, 3:4], axis=0)
        hi = jnp.max(sph_k[:, :3] + sph_k[:, 3:4], axis=0)
        boxes.append(jnp.concatenate([lo, hi, ro]))
    consts = jnp.concatenate(consts_det + consts_u + consts_v + consts_ct, axis=0)
    boxes = jnp.stack(boxes)
    mats = jnp.stack(mats_rows)

    t, bu, bv, btri, bobj, battr = batched_nearest_shared(
        consts, batch.attrs, batch.spheres, boxes, mats, dir4,
        jnp.stack(d_os), jnp.stack(o_os), jnp.stack(s_os),
        meta.mesh_chunk_counts, interpret=interpret)
    valid = btri >= 0
    interp = battr[0:5] + bu * battr[5:10] + bv * battr[10:15]
    # Winner-frame normal transform + global object id via one-hot selects
    # over the (few) mesh objects -- no gathers.
    onehot = (bobj[None, :] ==
              jnp.arange(len(meta.mesh_ids), dtype=jnp.int32)[:, None])
    onehot_f = onehot.astype(jnp.float32)
    inv_sel = jnp.stack([inv_ms[i] for i in meta.mesh_ids])  # (O, 4, 4)
    nt = jnp.swapaxes(inv_sel[:, :3, :3], 1, 2).reshape(len(meta.mesh_ids), 9)
    nt_pix = jnp.matmul(nt.T, onehot_f).reshape(3, 3, -1)  # (3, 3, N)
    normal = normalize3(jnp.einsum("ijn,jn->in", nt_pix, interp[0:3]))
    ids_col = jnp.asarray(meta.mesh_ids, jnp.int32)[:, None]
    obj = jnp.sum(jnp.where(onehot, ids_col, 0), axis=0)
    t = jnp.where(valid, t, INF)
    return t, normal, interp[3:5], obj, valid


def mesh_min_t_general_batched(mesh, meta, batch, L, inv_ms, m4s,
                               origins4, dir4, exclude_id, tmax,
                               interpret=False):
    """All mesh objects in ONE kernel (per-ray-origin shadow rays).

    tmax: (N,) SHARED-parameter search bound (0 = masked lane). The
    excluded object (the light) is dropped by zeroing its chunk range from
    the live lists via a masked spheres copy -- exclusion by object id is
    static per light loop, so the caller passes exclude_id and this builds
    a per-call pool view without touching the static arrays.
    Returns (N,) f32 min(t_shared, tmax)-like (INF where nothing hit).
    """
    from .pallas.mesh_batch import MAT_COLS, batched_min_t_general

    d_os, o_os, s_os, mats_rows = [], [], [], []
    for k, i in enumerate(meta.mesh_ids):
        o4 = L[i] @ origins4
        d4 = L[i] @ dir4
        ro = apply_affine3(inv_ms[i], o4[1:4])
        d = apply_linear3(inv_ms[i], d4[1:4])
        dh = d / norm3(d)
        s = norm3(apply_linear3(m4s[i], dh)) / norm3(d4[1:4])
        d_os.append(dh)
        o_os.append(ro)
        s_os.append(s)
        A = inv_ms[i][:3, :3] @ L[i][1:4, :]
        mats_rows.append(jnp.concatenate([
            A.reshape(12), inv_ms[i][:3, 3], jnp.zeros((3,)),
            m4s[i][:3, :3].reshape(9), L[i][1:4, :].reshape(12),
            jnp.zeros((MAT_COLS - 39,)),
        ]))
    mats = jnp.stack(mats_rows)
    enabled = tuple(i != exclude_id for i in meta.mesh_ids)
    valid = tmax > 0.0
    bt = batched_min_t_general(batch.gen_cols, batch.spheres, mats,
                               origins4, dir4, jnp.stack(d_os),
                               jnp.stack(o_os), jnp.stack(s_os), tmax,
                               meta.mesh_chunk_counts, enabled=enabled,
                               valid=valid, interpret=interpret)
    return bt


def mesh_min_t_general(mesh, tri_range, m4, inv_m, o3, d3, *, tri_chunk=512,
                       use_pallas=None, perm=None, tmax=None, static=None,
                       debug_iters=False):
    """Minimum hit parameter t for rays with per-ray origins (shadow rays).

    o3: (3, N) rest-frame spatial origins; d3: (3, N) spatial dirs.
    tmax: optional (N,) search bound in ray-parameter units (the light
    distance for shadow rays); hits beyond it need not be found exactly.
    Lanes with tmax == 0 are treated as fully masked: they are excluded from
    the block bounding cones (their origins/dirs may be garbage) and their
    search bound is EXACTLY zero so masked-only blocks run no chunk work.
    Returns t (N,), INF where no hit, converted to the shared ray parameter.
    """
    n = d3.shape[1]
    if tri_count(tri_range, perm) == 0:
        return jnp.full((n,), INF)

    ro = apply_affine3(inv_m, o3)  # (3, N)
    d = apply_linear3(inv_m, d3)
    scale = norm3(d)
    dh = d / scale
    mom = jnp.stack(
        [
            ro[1] * dh[2] - ro[2] * dh[1],
            ro[2] * dh[0] - ro[0] * dh[2],
            ro[0] * dh[1] - ro[1] * dh[0],
        ]
    )
    r10 = jnp.concatenate([dh, mom, ro, jnp.ones((1, n))], axis=0)  # (10, N)

    use_pallas, interpret = _resolve_pallas(use_pallas)
    T = tri_count(tri_range, perm)
    T_pad = _round_up(max(T, 1), 256)
    if use_pallas and static is not None:
        cols = static.gen_cols
    else:
        cols, T, T_pad = general_ray_constants(mesh, tri_range, perm)

    if use_pallas:
        from .pallas.mesh_kernels import TC_GEN, chunk_spheres, general_min_t

        if static is not None:
            spheres = static.gen_spheres
        else:
            A, B, C = mesh_tri_vertices(mesh, tri_range, perm)
            spheres = chunk_spheres(A, B, C, T, T_pad, tc=TC_GEN)
        tmax_obj = None
        valid = None
        tcut_obj = None
        if tmax is not None:
            # Convert the t-parameter bound to object-space distance: along a
            # ray, t = bt * |M3 dh| / |d3| (M maps object space back to the
            # rest frame and the origin is a fixed point of the round trip).
            # 0.1% margin keeps the no-hit result strictly beyond the caller's
            # `t < tmax` test (hits inside the margin fail it anyway). Masked
            # lanes (tmax == 0) keep an EXACT zero bound -- the margin would
            # otherwise keep whole blocks walking floor-0 chunks for lanes
            # whose result is discarded.
            valid = tmax > 0.0
            k_r = norm3(apply_linear3(m4, dh))
            tmax_base = tmax * norm3(d3) / k_r
            tmax_obj = jnp.where(valid, tmax_base * 1.001 + 1e-3, 0.0)
            # Occlusion retirement: shadow callers only test `t >= tmax`, so
            # a hit strictly below tcut (inverse margin of the bound above)
            # proves the lane shadowed no matter what closer hits exist --
            # the kernel then drops it from the walk bound. The margin keeps
            # fp error in the object->shared conversion from flipping the
            # caller's comparison.
            tcut_obj = jnp.where(valid,
                                 jnp.maximum(tmax_base * 0.999 - 1e-3, 0.0),
                                 0.0)
        if _resolve_large(T_pad):
            from .pallas.mesh_kernels import TC
            from .pallas.mesh_large import (
                large_general_min_t, pack_general_records)

            # Records are TC-granularity: use TC chunk spheres (NOT the
            # TC_GEN `spheres` above -- with TC_GEN != TC the bitmask and
            # record cursor would index the wrong chunks).
            sph_tc = (static.spheres if static is not None
                      else spheres if TC_GEN == TC
                      else chunk_spheres(A, B, C, T, T_pad, tc=TC))
            cols_rec = (static.gen_rec if static is not None
                        and static.gen_rec is not None
                        else pack_general_records(cols, T_pad))
            bt = large_general_min_t(cols_rec, sph_tc, r10, tmax_obj,
                                     valid=valid, tcut_obj=tcut_obj, T=T,
                                     interpret=interpret)
            dbg_iters = None
        else:
            bt = general_min_t(cols, spheres, r10, tmax_obj, valid=valid,
                               tcut_obj=tcut_obj, interpret=interpret,
                               debug_iters=debug_iters)
            if debug_iters:
                bt, dbg_iters = bt
    else:
        # Tc must divide T_pad (see mesh_intersect_shared: a floor-divided
        # chunk count drops tail triangles; shadows then leak).
        Tc = math.gcd(min(tri_chunk, T_pad), T_pad)
        n_chunks = T_pad // Tc

        def chunk_step(best_t, k):
            base = k * Tc
            det = jnp.matmul(jax.lax.dynamic_slice_in_dim(cols, base, Tc, 0), r10, precision=_PREC)
            u_num = jnp.matmul(jax.lax.dynamic_slice_in_dim(cols, T_pad + base, Tc, 0), r10, precision=_PREC)
            v_num = jnp.matmul(jax.lax.dynamic_slice_in_dim(cols, 2 * T_pad + base, Tc, 0), r10, precision=_PREC)
            t_num = jnp.matmul(jax.lax.dynamic_slice_in_dim(cols, 3 * T_pad + base, Tc, 0), r10, precision=_PREC)
            tri_ok = (base + jnp.arange(Tc)) < T
            dist, _, _ = _mt_accept(det, u_num, v_num, t_num, tri_ok[:, None])
            return jnp.minimum(best_t, jnp.min(dist, axis=0)), None

        bt, _ = jax.lax.scan(chunk_step, _vma_like(jnp.full((n,), INF), r10),
                             jnp.arange(n_chunks))
        dbg_iters = None

    valid = bt < INF
    obj_pt = ro + bt * dh
    world_pt = apply_affine3(m4, obj_pt)
    t = norm3(world_pt - o3) / norm3(d3)
    t = jnp.where(valid, t, INF)
    if debug_iters:
        return t, dbg_iters
    return t
