"""Pallas TPU kernels for analytic primitives (spheres + cubes).

The jnp analytic path (render.intersect_scene / scene_min_t) runs
ceil(O/8) sequential vmapped passes, each materializing ~(8, N) transient
arrays in HBM -- for a 34-cube scene that is ~150MB of HBM traffic per
chunk and dominates the frame (cubes.txt spent 14.6ms with ZERO
triangles). These kernels are the fused TPU answer: every object's
frame-composed constants live in SMEM (a few hundred scalars), each
1024-ray block stays resident in VMEM, and a fori_loop walks ALL objects
per block with scalar-broadcast FMAs -- one HBM read of the rays and one
write of the results, total.

Geometry semantics mirror the reference intersectors exactly
(intersect_sphere /root/reference/opencl_kernel.cl:335-359,
intersect_cube :312-333, object iteration :379-424):
- The per-object ray transform chain (Lorentz boost L, then the object's
  inverse model matrix) is pre-fused OUTSIDE the kernel into a single
  (3, 4) matrix A = inv_m[:3,:3] @ L[1:4,:] per object, since both are
  per-object constants within a frame. Rays enter the kernel ONCE, in the
  camera frame.
- Sphere/cube code is specialized at TRACE time from the static kind
  list: a cubes-only scene emits no sphere math at all (and vice versa).
- Mosaic has no atan2/arcsin lowering, so the kernel returns the winning
  object-space hit point + winner kind, and the wrapper computes the
  spherical-UV transcendentals outside on the final (3, N) values only.

Per-block object culling (nearest kernel): each 1024-ray block's camera
cone is mapped CONSERVATIVELY into every object's rest frame (the affine
dir transform bounds the transformed cone's half-angle via the Frobenius
norm of its linear part) and tested against the object's bounding sphere
(unit sphere / sqrt(3) cube). Live objects arrive per block as an
approximately front-to-back SMEM list with camera-t bucket floors, and the
walk early-terminates once every lane's best t is nearer than the next
object's floor -- the analytic analog of the mesh kernels' live-chunk
machinery. A 34-cube scene's receding rows then cost each block only the
handful of cubes its cone can see.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ray_vma

EPSILON = 1e-7
INF = 1e20
NB = 1024  # rays per block (matches the mesh kernels' screen-tile blocks)

# params row layout (one row of 32 f32 per object):
#   [0:12)  A   -- fused dir/origin transform (3, 4) row-major
#   [12:15) b   -- affine translation (object-space origin for shared-origin
#                  kernels; inv_m translation for general-origin kernels)
#   [15:24) NT  -- inv_m[:3,:3]^T row-major (normal transform)
#   [24]    id  -- global object index (float; exact for O < 2^24)
PARAM_COLS = 32
# Live-list culling pays a per-block list build + SMEM walk; below this many
# objects of a kind, a plain static loop is cheaper than the machinery.
CULL_MIN_OBJECTS = 5


def _abound_mode() -> bool:
    """Per-lane walk-bound pre-pass for the analytic NEAREST kernel.

    Without it, a block's early-termination bound is max over lanes of
    best_t -- any sky lane (hits nothing) pins that at INF, so blocks with
    background rays walk their FULL live list every frame. The pre-pass
    walks the live list once computing each lane's max bounding-sphere exit
    distance (0 where every sphere is missed): a sound upper bound on any
    hit t, so capping mb with it is exact. Costs ~1/4 of an uncull walk;
    wins when early termination then cuts more than that. RPT_ABOUND=1
    enables; read at trace time (A/B like RPT_PAIR)."""
    import os

    return os.environ.get("RPT_ABOUND", "").strip() == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_analytic_params(L, inv_m, stat_cam, ids):
    """Fuse each object's frame chain into kernel constants, in-jit.

    L: (O, 4, 4) camera->rest Lorentz; inv_m: (O, 4, 4); stat_cam: (O, 4)
    camera event in each object's Lorentz frame; ids: static index tuple.
    Returns (G_pad, PARAM_COLS) f32 with G = len(ids) rows used.
    """
    idx = jnp.asarray(ids, jnp.int32)
    Lg = L[idx]
    ig = inv_m[idx]
    R = ig[:, :3, :3]
    A = jnp.einsum("gij,gjk->gik", R, Lg[:, 1:4, :])  # (G, 3, 4)
    # shared-origin object-space origin: inv_m affine of stat_cam's spatial part
    ro = jnp.einsum("gij,gj->gi", R, stat_cam[idx][:, 1:4]) + ig[:, :3, 3]
    NT = jnp.swapaxes(R, 1, 2).reshape(-1, 9)
    idf = idx.astype(jnp.float32)[:, None]
    rows = jnp.concatenate([A.reshape(-1, 12), ro, NT, idf], axis=1)
    return jnp.pad(rows, ((0, 0), (0, PARAM_COLS - rows.shape[1])))


def pack_analytic_params_general(L, inv_m, ids):
    """Params for per-ray-origin kernels: b is inv_m's translation (origins
    are transformed in-kernel: ro = A @ o4 + b)."""
    idx = jnp.asarray(ids, jnp.int32)
    Lg = L[idx]
    ig = inv_m[idx]
    R = ig[:, :3, :3]
    A = jnp.einsum("gij,gjk->gik", R, Lg[:, 1:4, :])
    b = ig[:, :3, 3]
    NT = jnp.swapaxes(R, 1, 2).reshape(-1, 9)
    idf = idx.astype(jnp.float32)[:, None]
    rows = jnp.concatenate([A.reshape(-1, 12), b, NT, idf], axis=1)
    return jnp.pad(rows, ((0, 0), (0, PARAM_COLS - rows.shape[1])))


def live_objects(params, rs, dir4_p, interval):
    """Per-block live-object lists for the shared-origin nearest kernel.

    params: (G_pad, PARAM_COLS) rows for ONE kind (G = rs.shape[0] real
    rows); rs: (G,) object-space bounding radius (1 sphere, sqrt(3) cube);
    dir4_p: (4, n_pad) camera 4-dirs (spatial part unit). Returns
    (order, floors, counts) rank-3 SMEM lists via bucket_order, with
    floors as conservative lower bounds on the CAMERA-frame hit t.

    Soundness: for block cone axis c (half-angle a) the transformed dir
    d' = A3 d3 + interval*a_t satisfies |d' - d_c| <= |A3|_F * 2 sin(a/2),
    so angle(d', d_c) <= asin(dev / (|d_c| - dev)); the object-space test
    is then cone-vs-origin-sphere. A hit at object distance >= dlen - rs
    has camera t = dist/|d'| >= (dlen - rs)/(|A3|_F + |a_t|).
    """
    from .mesh_kernels import bucket_order

    G = rs.shape[0]
    A = params[:G, 0:12].reshape(G, 3, 4)
    a_t = A[:, :, 0]  # (G, 3) time column (scaled by interval below)
    A3 = A[:, :, 1:4]
    ro = params[:G, 12:15]
    fro = jnp.sqrt(jnp.sum(A3 * A3, axis=(1, 2)))  # (G,) |A3|_F >= sigma_max
    at_n = jnp.sqrt(jnp.sum(a_t * a_t, axis=1)) * abs(float(interval))

    d3 = dir4_p[1:4].reshape(3, -1, NB)  # (3, B, NB) unit camera dirs
    mean = jnp.mean(d3, axis=2)
    axis = mean / jnp.maximum(jnp.sqrt(jnp.sum(mean * mean, axis=0)), 1e-12)
    cos_a = jnp.min(jnp.sum(d3 * axis[:, :, None], axis=0), axis=1)  # (B,)
    half = jnp.sqrt(jnp.maximum((1.0 - cos_a) / 2.0, 0.0))  # sin(a/2)

    # Transformed cone center per (object, block).
    d_c = jnp.einsum("gij,jb->gib", A3, axis) + float(interval) * a_t[:, :, None]
    nc = jnp.sqrt(jnp.sum(d_c * d_c, axis=1))  # (G, B)
    dev = fro[:, None] * (2.0 * half[None, :])  # (G, B)
    full = dev >= nc - 1e-12
    sin_t = jnp.clip(dev / jnp.maximum(nc - dev, 1e-12), 0.0, 1.0)
    sin_t = jnp.where(full, 1.0, sin_t)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    cos_t = jnp.where(full, -1.0, cos_t)  # full cone: overlap everything

    dlen = jnp.sqrt(jnp.sum(ro * ro, axis=1))  # (G,) apex to sphere center
    cos_d = jnp.sum(-ro[:, :, None] * d_c, axis=1) / jnp.maximum(
        dlen[:, None] * nc, 1e-12)
    sin_b = jnp.minimum(rs / jnp.maximum(dlen, 1e-12), 1.0)[:, None]
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    sin_tt = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    overlap = ((dlen <= rs)[:, None] | (cos_b <= -cos_t)
               | (cos_d >= cos_t * cos_b - sin_tt * sin_b))  # (G, B)
    mind = (jnp.maximum(dlen - rs, 0.0)[:, None]
            / jnp.maximum(fro + at_n, 1e-12)[:, None])  # camera-t lower bound
    mind = jnp.broadcast_to(mind, overlap.shape)
    return bucket_order(mind.T, overlap.T)  # (B, G) per-block lists


def live_objects_general(params, rs, dir4_p, o4_p, tmax_p, interval):
    """Per-block live-object lists for per-ray-origin (shadow) rays.

    Like live_objects, but the apex is the block's (camera-frame) origin
    centroid mapped through each object's affine transform, with the
    bounding radius inflated by the origin spread times |A|_F; lanes with
    tmax == 0 (masked-irrelevant, possibly garbage rays) are excluded from
    the cone statistics. Floors are camera-t lower bounds as in
    live_objects.
    """
    from .mesh_kernels import bucket_order

    G = rs.shape[0]
    A = params[:G, 0:12].reshape(G, 3, 4)
    a_t = A[:, :, 0]
    A3 = A[:, :, 1:4]
    b = params[:G, 12:15]
    fro = jnp.sqrt(jnp.sum(A3 * A3, axis=(1, 2)))
    froA = jnp.sqrt(jnp.sum(A * A, axis=(1, 2)))  # bounds the 4-origin map
    at_n = jnp.sqrt(jnp.sum(a_t * a_t, axis=1)) * abs(float(interval))

    n_blocks = dir4_p.shape[1] // NB
    d3 = dir4_p[1:4].reshape(3, n_blocks, NB)
    o4 = o4_p.reshape(4, n_blocks, NB)
    v = (tmax_p > 0.0).reshape(1, n_blocks, NB)
    nv = jnp.maximum(jnp.sum(v, axis=2, keepdims=True), 1)
    d_mean = jnp.sum(jnp.where(v, d3, 0.0), axis=2, keepdims=True) / nv
    o_mean = jnp.sum(jnp.where(v, o4, 0.0), axis=2, keepdims=True) / nv
    d3 = jnp.where(v, d3, d_mean)
    o4 = jnp.where(v, o4, o_mean)

    axis = d_mean[:, :, 0] / jnp.maximum(
        jnp.sqrt(jnp.sum(d_mean[:, :, 0] ** 2, axis=0)), 1e-12)  # (3, B)
    cos_a = jnp.min(jnp.sum(d3 * axis[:, :, None], axis=0), axis=1)
    half = jnp.sqrt(jnp.maximum((1.0 - cos_a) / 2.0, 0.0))
    oc = o_mean[:, :, 0]  # (4, B)
    spread4 = jnp.sqrt(jnp.max(jnp.sum((o4 - o_mean) ** 2, axis=0), axis=1))

    d_c = jnp.einsum("gij,jb->gib", A3, axis) + float(interval) * a_t[:, :, None]
    nc = jnp.sqrt(jnp.sum(d_c * d_c, axis=1))
    dev = fro[:, None] * (2.0 * half[None, :])
    full = dev >= nc - 1e-12
    sin_t = jnp.where(full, 1.0, jnp.clip(dev / jnp.maximum(nc - dev, 1e-12), 0.0, 1.0))
    cos_t = jnp.where(full, -1.0, jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0)))

    center = jnp.einsum("gij,jb->gib", A, oc) + b[:, :, None]  # (G, 3, B)
    dlen = jnp.sqrt(jnp.sum(center * center, axis=1))  # (G, B)
    r_eff = rs[:, None] + froA[:, None] * spread4[None, :]
    cos_d = jnp.sum(-center * d_c, axis=1) / jnp.maximum(dlen * nc, 1e-12)
    sin_b = jnp.minimum(r_eff / jnp.maximum(dlen, 1e-12), 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    sin_tt = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    overlap = ((dlen <= r_eff) | (cos_b <= -cos_t)
               | (cos_d >= cos_t * cos_b - sin_tt * sin_b))
    mind = (jnp.maximum(dlen - r_eff, 0.0)
            / jnp.maximum(fro + at_n, 1e-12)[:, None])
    return bucket_order(mind.T, overlap.T)


def _affine_rows(p_ref, g, vec4, with_b: bool):
    """A @ vec4 (+ b) with scalar-broadcast FMAs. vec4: (4, NB) VMEM value."""
    out = []
    for ax in range(3):
        acc = p_ref[g, 4 * ax] * vec4[0]
        for j in range(1, 4):
            acc = acc + p_ref[g, 4 * ax + j] * vec4[j]
        if with_b:
            acc = acc + p_ref[g, 12 + ax]
        out.append(acc)
    return out  # list of 3 (NB,) values


def _sphere_hit(ro, dh):
    """Unit-sphere hit (object space). ro/dh: lists of 3 (NB,) values.
    Returns (dist, valid, obj_pt list)."""
    b = -(ro[0] * dh[0] + ro[1] * dh[1] + ro[2] * dh[2])
    c = ro[0] * ro[0] + ro[1] * ro[1] + ro[2] * ro[2] - 1.0
    disc = b * b - c
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = b - sq
    far = b + sq
    use_near = near > EPSILON
    dist = jnp.where(use_near, near, far)
    valid = hit & (use_near | (far > EPSILON))
    obj_pt = [ro[k] + dh[k] * dist for k in range(3)]
    return dist, valid, obj_pt


def _cube_hit(ro, dh):
    """Unit-cube [-1,1]^3 slab hit (object space, Majercik winding form).
    Returns (dist, valid, sgn list (face normal), obj_pt list)."""
    inside = jnp.maximum(jnp.maximum(jnp.abs(ro[0]), jnp.abs(ro[1])),
                         jnp.abs(ro[2])) < 1.0
    winding = jnp.where(inside, -1.0, 1.0)
    sgn = [-jnp.sign(dh[k]) for k in range(3)]
    dcand = [(winding * sgn[k] - ro[k]) / dh[k] for k in range(3)]

    def face_test(axis, a1, a2):
        da = dcand[axis]
        p1 = jnp.abs(ro[a1] + dh[a1] * da)
        p2 = jnp.abs(ro[a2] + dh[a2] * da)
        return (da >= 0.0) & (p1 < 1.0) & (p2 < 1.0)

    tx = face_test(0, 1, 2)
    ty = face_test(1, 2, 0)
    tz = face_test(2, 0, 1)
    sx = jnp.where(tx, sgn[0], 0.0)
    sy = jnp.where(~tx & ty, sgn[1], 0.0)
    sz = jnp.where(~tx & ~ty & tz, sgn[2], 0.0)
    dist = jnp.where(sx != 0.0, dcand[0], jnp.where(sy != 0.0, dcand[1], dcand[2]))
    valid = (sx != 0.0) | (sy != 0.0) | (sz != 0.0)
    obj_pt = [ro[k] + dh[k] * dist for k in range(3)]
    return dist, valid, [sx, sy, sz], obj_pt


def _norm3(v):
    return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def _apply_nt(p_ref, g, n):
    """NT @ n (normal transform) via scalar FMAs; returns normalized list."""
    out = []
    for ax in range(3):
        acc = p_ref[g, 15 + 3 * ax] * n[0]
        for j in range(1, 3):
            acc = acc + p_ref[g, 15 + 3 * ax + j] * n[j]
        out.append(acc)
    inv = 1.0 / _norm3(out)
    return [o * inv for o in out]


def _nearest_kernel(os_ref, ms_ref, cs_ref, oc_ref, mc_ref, cc_ref,
                    p_ref, dir4_ref, t_ref, obj_ref, kind_ref, n_ref, s3_ref,
                    *, n_spheres: int, n_cubes: int, pair: bool = False,
                    abound: bool = False):
    """Walk this block's LIVE objects (per-kind front-to-back SMEM lists),
    tracking the nearest hit. Spheres walk first, then cubes (matching the
    jnp path's merge order; within a kind the order only differs at exact
    fp ties). Early termination: the walk stops once every lane's best t is
    nearer than the next object's camera-t floor. pair=True steps TWO live
    objects per iteration (mesh_kernels._pair_mode): the per-object step is
    small here, so the fixed loop overhead is a larger fraction than in the
    mesh kernels."""
    dir4 = dir4_ref[:]  # (4, NB)
    nb = dir4.shape[1]

    def obj_step(g, is_sphere: bool, state, live=True):
        best_t, best_obj, best_kind, best_n, best_s3 = state
        d = _affine_rows(p_ref, g, dir4, with_b=False)
        scale = _norm3(d)
        dh = [dk / scale for dk in d]  # divisions, matching the jnp path's fp
        ro = [p_ref[g, 12 + k] for k in range(3)]  # scalars; broadcast in use
        if is_sphere:
            dist, valid, obj_pt = _sphere_hit(ro, dh)
            nrm = _apply_nt(p_ref, g, obj_pt)
            s3 = obj_pt  # spherical uv computed outside (no atan2 in Mosaic)
        else:
            dist, valid, sgn, obj_pt = _cube_hit(ro, dh)
            nrm = _apply_nt(p_ref, g, sgn)
            on_x = sgn[0] != 0.0
            on_y = sgn[1] != 0.0
            u = jnp.where(on_x, obj_pt[1], obj_pt[0])
            v = jnp.where(on_x | on_y, obj_pt[2], obj_pt[1])
            s3 = [(u + 1.0) / 2.0, (v + 1.0) / 2.0, jnp.zeros((nb,), jnp.float32)]
        t = jnp.where(valid & live, dist / scale, INF)
        better = t < best_t
        kind_val = jnp.float32(0.0 if is_sphere else 1.0)
        return (
            jnp.where(better, t, best_t),
            jnp.where(better, p_ref[g, 24], best_obj),
            jnp.where(better, kind_val, best_kind),
            [jnp.where(better, nrm[k], best_n[k]) for k in range(3)],
            [jnp.where(better, s3[k], best_s3[k]) for k in range(3)],
        )

    # Per-lane walk-bound pre-pass (see _abound_mode): each lane's max
    # bounding-sphere exit over the live lists -- 0 for lanes that miss
    # everything, so sky lanes stop pinning the early-termination bound at
    # INF. One shared bound over both kinds is sound for each kind's walk
    # (a larger bound only weakens termination, never skips a real hit);
    # kinds on the static fori_loop path never skip objects, so they need
    # no bound contribution.
    bound_vec = None
    if abound:
        def bound_pass(o_ref, c_ref, offset, rs2, bound):
            n_live = c_ref[0, 0, 0]

            def bstep(j, bound):
                g = o_ref[0, 0, j] + offset
                d = _affine_rows(p_ref, g, dir4, with_b=False)
                scale = _norm3(d)
                dh = [dk / scale for dk in d]
                ro = [p_ref[g, 12 + k] for k in range(3)]
                b = ro[0] * dh[0] + ro[1] * dh[1] + ro[2] * dh[2]
                c = ro[0] * ro[0] + ro[1] * ro[1] + ro[2] * ro[2] - rs2
                disc = b * b - c
                exit_d = jnp.maximum(-b + jnp.sqrt(jnp.maximum(disc, 0.0)), 0.0)
                exit_t = jnp.where(disc >= 0.0, exit_d, 0.0) / scale
                return jnp.maximum(bound, exit_t * 1.001 + 1e-3)

            return jax.lax.fori_loop(0, n_live, bstep, bound)

        bound_vec = jnp.zeros((nb,), jnp.float32)
        if n_spheres >= CULL_MIN_OBJECTS:
            bound_vec = bound_pass(os_ref, cs_ref, 0, 1.0, bound_vec)
        if n_cubes >= CULL_MIN_OBJECTS:
            bound_vec = bound_pass(oc_ref, cc_ref, n_spheres, 3.0, bound_vec)

    def walk(o_ref, m_ref, c_ref, is_sphere: bool, offset: int, state):
        n_live = c_ref[0, 0, 0]

        def cond(st):
            j, mb = st[0], st[1]
            return (j < n_live) & (m_ref[0, 0, o_ref[0, 0, j]] < mb)

        def body(st):
            j, mb, inner = st[0], st[1], st[2:]
            g = o_ref[0, 0, j] + offset
            new = obj_step(g, is_sphere, tuple(inner))
            if pair:
                live1 = (j + 1) < n_live
                g1 = o_ref[0, 0, jnp.minimum(j + 1, n_live - 1)] + offset
                new = obj_step(g1, is_sphere, new, live1)
            nt = new[0] if bound_vec is None else jnp.minimum(new[0], bound_vec)
            return (j + (2 if pair else 1), jnp.max(nt)) + new

        mb0 = jnp.float32(INF) if bound_vec is None else jnp.max(bound_vec)
        st = jax.lax.while_loop(cond, body, (jnp.int32(0), mb0) + state)
        return st[2:]

    state = (
        jnp.full((nb,), INF, jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        [jnp.zeros((nb,), jnp.float32) for _ in range(3)],
        [jnp.zeros((nb,), jnp.float32) for _ in range(3)],
    )
    # Static specialization: a scene with no spheres emits no sphere code,
    # and below CULL_MIN_OBJECTS the plain loop beats the list machinery.
    if 0 < n_spheres < CULL_MIN_OBJECTS:
        state = jax.lax.fori_loop(
            0, n_spheres, lambda g, s: obj_step(g, True, s), state)
    elif n_spheres:
        state = walk(os_ref, ms_ref, cs_ref, True, 0, state)
    if 0 < n_cubes < CULL_MIN_OBJECTS:
        state = jax.lax.fori_loop(
            n_spheres, n_spheres + n_cubes,
            lambda g, s: obj_step(g, False, s), state)
    elif n_cubes:
        state = walk(oc_ref, mc_ref, cc_ref, False, n_spheres, state)

    best_t, best_obj, best_kind, best_n, best_s3 = state
    t_ref[0, :] = best_t
    obj_ref[0, :] = best_obj.astype(jnp.int32)
    kind_ref[0, :] = best_kind
    for k in range(3):
        n_ref[k, :] = best_n[k]
        s3_ref[k, :] = best_s3[k]


def _finish_uv(kind, s3):
    """Post-kernel spherical UV: Mosaic lacks atan2/arcsin, so the kernel
    returns the winner's object-space hit point (spheres) or the final uv
    (cubes) and the transcendentals run here on (N,) lanes only."""
    u_s = 0.5 + jnp.arctan2(s3[2], s3[0]) / (2.0 * jnp.pi)
    v_s = jnp.arcsin(jnp.clip(s3[1], -1.0, 1.0)) / jnp.pi + 0.5
    is_sphere = kind == 0.0
    u = jnp.where(is_sphere, u_s, s3[0])
    v = jnp.where(is_sphere, v_s, s3[1])
    return jnp.stack([u, v])


@functools.partial(jax.jit, static_argnames=("n_spheres", "n_cubes",
                                             "interval", "interpret"))
def analytic_nearest_shared(params, dir4, n_spheres: int, n_cubes: int,
                            interval: int, interpret: bool = False):
    """Nearest sphere/cube hit for rays sharing the camera origin.

    params: (G, PARAM_COLS) from pack_analytic_params (spheres first, then
    cubes -- the same merge order as the jnp path); dir4: (4, N) camera-frame
    ray 4-dirs; interval: the static light-propagation toggle (needed for
    the conservative cone transform in live_objects). Returns (t (N,),
    normal (3, N) rest-frame, uv (2, N), obj (N,) i32 global ids). Lanes
    with no hit carry t = INF, obj of the last compare loser (consumers
    mask on t < INF).
    """
    n = dir4.shape[1]
    n_pad = _round_up(n, NB)
    dir4_p = jnp.pad(dir4, ((0, 0), (0, n_pad - n)), constant_values=1.0)

    # Per-kind per-block live-object lists (size-1 dummies for absent kinds
    # keep the kernel signature fixed; static counts skip their walks).
    n_blocks = n_pad // NB
    dummy = (jnp.zeros((n_blocks, 1, 1), jnp.int32),
             jnp.zeros((n_blocks, 1, 1), jnp.float32),
             jnp.zeros((n_blocks, 1, 1), jnp.int32))
    if n_spheres >= CULL_MIN_OBJECTS:
        os_, ms_, cs_ = live_objects(
            params[:n_spheres], jnp.ones((n_spheres,)), dir4_p, interval)
    else:
        os_, ms_, cs_ = dummy
    if n_cubes >= CULL_MIN_OBJECTS:
        oc_, mc_, cc_ = live_objects(
            params[n_spheres:n_spheres + n_cubes],
            jnp.full((n_cubes,), 3.0 ** 0.5), dir4_p, interval)
    else:
        oc_, mc_, cc_ = dummy

    from .mesh_kernels import _pair_mode

    kernel = functools.partial(_nearest_kernel, n_spheres=n_spheres,
                               n_cubes=n_cubes, pair=_pair_mode(),
                               abound=_abound_mode())
    row = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec3 = pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM)

    def smem3(a):
        return pl.BlockSpec((1, 1, a.shape[2]), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    t, obj, kind, nrm, s3 = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            smem3(os_), smem3(ms_), smem3(cs_),
            smem3(oc_), smem3(mc_), smem3(cc_),
            pl.BlockSpec((params.shape[0], PARAM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(row, row, row, vec3, vec3),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32, vma=ray_vma(dir4_p)),
        ),
        interpret=interpret,
    )(os_, ms_, cs_, oc_, mc_, cc_, params, dir4_p)
    uv = _finish_uv(kind[0, :n], s3[:, :n])
    return t[0, :n], nrm[:, :n], uv, obj[0, :n]


def _min_t_kernel(os_ref, ms_ref, cs_ref, oc_ref, mc_ref, cc_ref,
                  p_ref, o4_ref, dir4_ref, tmax_ref, t_ref,
                  *, n_spheres: int, n_cubes: int, pair: bool = False):
    """Min hit parameter over this block's LIVE objects (shadow rays), with
    the same tmax-bounded early termination as the mesh shadow kernels."""
    o4 = o4_ref[:]  # (4, NB)
    dir4 = dir4_ref[:]
    tmax = tmax_ref[0, :]
    nb = dir4.shape[1]

    def obj_step(g, is_sphere: bool, best_t, live=True):
        d = _affine_rows(p_ref, g, dir4, with_b=False)
        ro = _affine_rows(p_ref, g, o4, with_b=True)
        scale = _norm3(d)
        dh = [dk / scale for dk in d]
        if is_sphere:
            dist, valid, _ = _sphere_hit(ro, dh)
        else:
            dist, valid, _, _ = _cube_hit(ro, dh)
        t = jnp.where(valid & live, dist / scale, INF)
        return jnp.minimum(best_t, t)

    def walk(o_ref, m_ref, c_ref, is_sphere: bool, offset: int, best_t):
        n_live = c_ref[0, 0, 0]

        def cond(st):
            j, mb = st[0], st[1]
            return (j < n_live) & (m_ref[0, 0, o_ref[0, 0, j]] < mb)

        def body(st):
            j, mb, bt = st
            bt = obj_step(o_ref[0, 0, j] + offset, is_sphere, bt)
            if pair:
                live1 = (j + 1) < n_live
                g1 = o_ref[0, 0, jnp.minimum(j + 1, n_live - 1)] + offset
                bt = obj_step(g1, is_sphere, bt, live1)
            return (j + (2 if pair else 1),
                    jnp.max(jnp.minimum(bt, tmax)), bt)

        st = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.max(tmax), best_t))
        return st[2]

    best_t = jnp.full((nb,), INF, jnp.float32)
    if 0 < n_spheres < CULL_MIN_OBJECTS:
        best_t = jax.lax.fori_loop(
            0, n_spheres, lambda g, s: obj_step(g, True, s), best_t)
    elif n_spheres:
        best_t = walk(os_ref, ms_ref, cs_ref, True, 0, best_t)
    if 0 < n_cubes < CULL_MIN_OBJECTS:
        best_t = jax.lax.fori_loop(
            n_spheres, n_spheres + n_cubes,
            lambda g, s: obj_step(g, False, s), best_t)
    elif n_cubes:
        best_t = walk(oc_ref, mc_ref, cc_ref, False, n_spheres, best_t)
    t_ref[0, :] = best_t


@functools.partial(jax.jit, static_argnames=("n_spheres", "n_cubes",
                                             "interval", "interpret"))
def analytic_min_t_general(params, origins4, dir4, n_spheres: int, n_cubes: int,
                           interval: int, tmax=None, interpret: bool = False):
    """Min hit parameter over spheres+cubes for per-ray-origin (shadow) rays.

    params from pack_analytic_params_general (exclude the light by omitting
    its row -- exclusion is static per light loop). origins4/dir4: (4, N);
    tmax: optional (N,) search bound in the shared ray parameter (0 = masked
    lane) -- enables per-block object culling + early termination. The
    result is min(nearest hit, INF) as before; hits beyond tmax may be
    reported as any value >= tmax (callers only test t < tmax).
    Returns (N,) f32.
    """
    n = dir4.shape[1]
    n_pad = _round_up(n, NB)
    dir4_p = jnp.pad(dir4, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    o4_p = jnp.pad(origins4, ((0, 0), (0, n_pad - n)))
    if tmax is None:
        tmax = jnp.full((n,), INF, jnp.float32)
    tmax_p = jnp.pad(tmax, (0, n_pad - n))[None, :]

    n_blocks = n_pad // NB
    dummy = (jnp.zeros((n_blocks, 1, 1), jnp.int32),
             jnp.zeros((n_blocks, 1, 1), jnp.float32),
             jnp.zeros((n_blocks, 1, 1), jnp.int32))
    if n_spheres >= CULL_MIN_OBJECTS:
        os_, ms_, cs_ = live_objects_general(
            params[:n_spheres], jnp.ones((n_spheres,)), dir4_p, o4_p,
            tmax_p[0], interval)
    else:
        os_, ms_, cs_ = dummy
    if n_cubes >= CULL_MIN_OBJECTS:
        oc_, mc_, cc_ = live_objects_general(
            params[n_spheres:n_spheres + n_cubes],
            jnp.full((n_cubes,), 3.0 ** 0.5), dir4_p, o4_p, tmax_p[0], interval)
    else:
        oc_, mc_, cc_ = dummy

    def smem3(a):
        return pl.BlockSpec((1, 1, a.shape[2]), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    from .mesh_kernels import _pair_mode

    kernel = functools.partial(_min_t_kernel, n_spheres=n_spheres,
                               n_cubes=n_cubes, pair=_pair_mode())
    t = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            smem3(os_), smem3(ms_), smem3(cs_),
            smem3(oc_), smem3(mc_), smem3(cc_),
            pl.BlockSpec((params.shape[0], PARAM_COLS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                        vma=ray_vma(o4_p, dir4_p, tmax_p)),
        interpret=interpret,
    )(os_, ms_, cs_, oc_, mc_, cc_, params, o4_p, dir4_p, tmax_p)
    return t[0, :n]
