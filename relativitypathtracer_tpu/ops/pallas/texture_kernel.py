"""Pallas TPU kernel for footprint-atlas texture sampling (small atlases).

The XLA path (ops.texture_sample.bilinear_sample_footprint) does one 32-byte
row gather per ray; on TPU that lowers to per-row scalar fetches, ~4.3 ms for
786k rays EVEN WHEN THE WHOLE ATLAS IS 4 KB (bunny's uv-hull region). When
the atlas fits comfortably in VMEM, the gather is better expressed as a
one-hot MXU matmul that never touches HBM for intermediates:

    onehot (Rq, NB) = (row iota == per-ray row index)      VPU compare
    rows   (8, NB)  = atlas^T (8, Rq) @ onehot             MXU, K = Rq

Packed texel values are < 2^24 (R | G<<8 | B<<16), exactly representable in
f32, so the matmul is bit-exact. The footprint's 4 taps sit in lanes
[0,4) or [4,8) of the fetched row; weighting matches the reference's tap
pattern (/root/reference/opencl_kernel.cl:427-470) exactly as in the XLA
path. Used when Rq <= MAX_ROWS (VMEM budget: onehot is (Rq, NB) f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 1024  # rays per block (matches the mesh kernels' tile-major blocks)
MAX_ROWS = 1024  # onehot (MAX_ROWS, NB) f32 = 4 MB VMEM


def _tex_kernel(quads_ref, uv_ref, fp_ref, wh_ref, out_ref):
    uv = uv_ref[:]  # (2, NB)
    fp = fp_ref[:]  # (6, NB) i32: base rx ry wb rw rh
    wh = wh_ref[:]  # (2, NB) i32
    rq = quads_ref.shape[0]
    nb = uv.shape[1]

    w = wh[0]
    h = wh[1]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    u = wf * uv[0]
    v = hf * (1.0 - uv[1])
    x = jnp.minimum(jnp.floor(u).astype(jnp.int32), w - 1)
    y = jnp.minimum(jnp.floor(v).astype(jnp.int32), h - 1)
    u_ratio = u - x.astype(jnp.float32)
    v_ratio = v - y.astype(jnp.float32)
    u_opp = 1.0 - u_ratio
    v_opp = 1.0 - v_ratio
    x0 = jnp.clip(x, 0, w - 1)
    y0 = jnp.clip(y, 0, h - 1)

    base_quad, rx, ry, wb, rw, rh = fp[0], fp[1], fp[2], fp[3], fp[4], fp[5]
    lx = jnp.clip(x0 - rx, 0, jnp.maximum(rw - 1, 0))
    ly = jnp.clip(y0 - ry, 0, jnp.maximum(rh - 1, 0))
    slot = ((ly >> 4) * wb + (lx >> 4)) * 256 + (ly & 15) * 16 + (lx & 15)
    idx4 = jnp.clip((base_quad + slot) * 4, 0, rq * 8 - 4)
    row = idx4 >> 3  # (NB,)
    hi_half = (idx4 & 7) >= 4

    # One-hot row fetch on the MXU: atlas^T (8, Rq) @ onehot (Rq, NB).
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (rq, nb), 0) == row[None, :]
    ).astype(jnp.float32)
    # Mosaic lacks u32->f32; the table arrives as i32 (values < 2^24, so the
    # reinterpretation outside the kernel is lossless).
    table = quads_ref[:].astype(jnp.float32)  # (Rq, 8)
    rows = jax.lax.dot_general(
        table, onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, NB)

    quad = jnp.where(hi_half[None, :], rows[4:8], rows[0:4]).astype(jnp.int32)
    r = (quad & 0xFF).astype(jnp.float32) / 255.0  # (4, NB)
    g = ((quad >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((quad >> 16) & 0xFF).astype(jnp.float32) / 255.0

    # taps: [(x0,y0), (x1,y0), (x1,y1), (x2,y1)] -- reference order
    def mix(t):  # t: (4, NB) one channel's taps
        row1 = t[0] * u_opp + t[1] * u_ratio
        row2 = t[2] * u_ratio + t[3] * u_opp
        return row1 * v_opp + row2 * v_ratio

    out_ref[0, :] = mix(r)
    out_ref[1, :] = mix(g)
    out_ref[2, :] = mix(b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def footprint_sample_small(quads, fp, width, height, uv, interpret=False):
    """quads: (Rq, 8) uint32 footprint atlas, Rq <= MAX_ROWS;
    fp: (6, N) i32 per-ray region params; width/height: (N,) i32; uv: (2, N).
    Returns (3, N) float RGB in [0, 1] -- same results as
    texture_sample.bilinear_sample_footprint.
    """
    n = uv.shape[1]
    n_pad = -(-n // NB) * NB
    pad = n_pad - n
    uv_p = jnp.pad(uv, ((0, 0), (0, pad)))
    fp_p = jnp.pad(fp, ((0, 0), (0, pad)))
    wh_p = jnp.pad(jnp.stack([width, height]), ((0, 0), (0, pad)), constant_values=1)
    rq = quads.shape[0]
    quads = jax.lax.bitcast_convert_type(quads, jnp.int32)  # values < 2^24

    out = pl.pallas_call(
        _tex_kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((rq, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(quads, uv_p, fp_p, wh_p)
    return out[:, :n]
