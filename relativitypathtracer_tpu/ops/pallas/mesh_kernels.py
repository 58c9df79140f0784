"""Pallas TPU kernels for streaming ray/triangle intersection.

The jnp mesh path (ops.mesh_intersect) materializes (T_chunk, N) matmul
products in HBM -- ~3*T*N*4 bytes of traffic per frame, which dominates frame
time. These kernels stream triangle chunks against a VMEM-resident ray block
and keep every intermediate on-chip: per grid step the only HBM traffic is
the ray block in and the best-hit carry out.

Kernel 1 (shared origin): per-triangle constants (det/u/v rows + t scalar)
against unit ray dirs -- three (Tc, 3) @ (3, NB) MXU products per chunk.
Kernel 2 (general origin): (4*Tc, 10) @ (10, NB) Plucker product for
per-pixel shadow rays, min-t only.

Acceptance semantics identical to ops.mesh_intersect._mt_accept (reference
Moller-Trumbore, /root/reference/opencl_kernel.cl:106-126).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-7
INF = 1e20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shared_kernel(consts_ref, ct_ref, dh_ref, t_ref, u_ref, v_ref, tri_ref,
                   *, T: int, T_pad: int, Tc: int):
    dh = dh_ref[:]  # (3, NB)
    nb = dh.shape[1]
    n_chunks = T_pad // Tc

    def body(k, carry):
        best_t, best_u, best_v, best_tri = carry
        base = k * Tc
        cd = consts_ref[pl.ds(base, Tc), :]  # (Tc, 3)
        cu = consts_ref[pl.ds(T_pad + base, Tc), :]
        cv = consts_ref[pl.ds(2 * T_pad + base, Tc), :]
        ct = ct_ref[0, pl.ds(base, Tc)]  # (Tc,)

        det = jax.lax.dot_general(cd, dh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        u_num = jax.lax.dot_general(cu, dh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        v_num = jax.lax.dot_general(cv, dh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = ct[:, None] * inv_det
        tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (Tc, nb), 0)) < T
        ok = (
            (jnp.abs(det) >= EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (dist >= 0.0) & tri_ok
        )
        dist = jnp.where(ok, dist, INF)
        idx = jnp.argmin(dist, axis=0)  # (NB,)
        onehot = jax.lax.broadcasted_iota(jnp.int32, (Tc, nb), 0) == idx[None, :]
        dmin = jnp.min(dist, axis=0)
        umin = jnp.sum(jnp.where(onehot, u, 0.0), axis=0)
        vmin = jnp.sum(jnp.where(onehot, v, 0.0), axis=0)
        better = dmin < best_t
        return (
            jnp.where(better, dmin, best_t),
            jnp.where(better, umin, best_u),
            jnp.where(better, vmin, best_v),
            jnp.where(better, base + idx, best_tri),
        )

    init = (
        jnp.full((nb,), INF, jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.int32),
    )
    bt, bu, bv, btri = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[0, :] = bt
    u_ref[0, :] = bu
    v_ref[0, :] = bv
    tri_ref[0, :] = btri


@functools.partial(jax.jit, static_argnames=("interpret",))
def shared_nearest_hit(consts, c_t, dh, *, interpret=False):
    """consts: (3*T_pad, 3); c_t: (T_pad,); dh: (3, N) unit object-space dirs.

    Returns (best_t, best_u, best_v, best_tri) over all triangles, per ray.
    T is inferred: padding rows have det == 0 and are epsilon-masked, so we
    pass T = T_pad here (callers pre-zero the padding).
    """
    T_pad = c_t.shape[0]
    n = dh.shape[1]
    NB = 1024  # VMEM budget: ~6 (Tc, NB) f32 intermediates must fit in 16MB
    Tc = min(256, T_pad)
    n_pad = _round_up(n, NB)
    dh_p = jnp.pad(dh, ((0, 0), (0, n_pad - n)), constant_values=1.0)

    grid = (n_pad // NB,)
    kernel = functools.partial(_shared_kernel, T=T_pad, T_pad=T_pad, Tc=Tc)
    out_shapes = (
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
    )
    out_spec = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    bt, bu, bv, btri = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((consts.shape[0], 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=out_shapes,
        interpret=interpret,
    )(consts, c_t[None, :], dh_p)
    return bt[0, :n], bu[0, :n], bv[0, :n], btri[0, :n]


def _general_kernel(cols_ref, r10_ref, t_ref, *, T: int, T_pad: int, Tc: int):
    r10 = r10_ref[:]  # (10, NB)
    nb = r10.shape[1]
    n_chunks = T_pad // Tc

    def body(k, best_t):
        base = k * Tc
        cd = cols_ref[pl.ds(base, Tc), :]  # (Tc, 10), factor-grouped
        cu = cols_ref[pl.ds(T_pad + base, Tc), :]
        cv = cols_ref[pl.ds(2 * T_pad + base, Tc), :]
        ctm = cols_ref[pl.ds(3 * T_pad + base, Tc), :]

        def prod(m):
            return jax.lax.dot_general(m, r10, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        det = prod(cd)
        u_num = prod(cu)
        v_num = prod(cv)
        t_num = prod(ctm)
        inv_det = 1.0 / det
        u = u_num * inv_det
        v = v_num * inv_det
        dist = t_num * inv_det
        tri_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (Tc, nb), 0)) < T
        ok = (
            (jnp.abs(det) >= EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (dist >= 0.0) & tri_ok
        )
        dist = jnp.where(ok, dist, INF)
        return jnp.minimum(best_t, jnp.min(dist, axis=0))

    t_ref[0, :] = jax.lax.fori_loop(0, n_chunks, body, jnp.full((nb,), INF, jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def general_min_t(cols_grouped, r10, *, interpret=False):
    """cols_grouped: (4*T_pad, 10) with det/u/v/t blocks each T_pad rows;
    r10: (10, N) lifted rays. Returns per-ray min object-space distance."""
    T_pad = cols_grouped.shape[0] // 4
    n = r10.shape[1]
    NB = 1024  # VMEM budget: ~8 (Tc, NB) f32 intermediates must fit in 16MB
    Tc = min(256, T_pad)
    n_pad = _round_up(n, NB)
    r10_p = jnp.pad(r10, ((0, 0), (0, n_pad - n)), constant_values=1.0)

    kernel = functools.partial(_general_kernel, T=T_pad, T_pad=T_pad, Tc=Tc)
    bt = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((cols_grouped.shape[0], 10), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((10, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(cols_grouped, r10_p)
    return bt[0, :n]
