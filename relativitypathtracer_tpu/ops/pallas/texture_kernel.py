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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ray_vma

from ..texture_layout import tile_slot, tile_slot_fast

NB = 1024  # rays per block (matches the mesh kernels' tile-major blocks)
MAX_ROWS = 1024  # onehot (MAX_ROWS, NB) f32 = 4 MB VMEM


def _address_lanes(quads_rows, fp, width, height, uv):
    """XLA-side footprint addressing: everything from uv to the atlas ROW id
    (incl. the Morton tile_slot math) runs OUTSIDE the Pallas kernels, which
    then consume precomputed per-lane (row, hi_half, u_ratio, v_ratio).
    Keeping the address math out of Mosaic both shares it verbatim with the
    XLA gather path and keeps exotic ops (per-lane-variable shifts in
    tile_slot) away from the kernel compiler.

    fp is (6, N) [base rx ry wb rw rh] or (9, N) with the precomputed
    tile_params rows [sm1 ss r16] appended (the renderer selects them
    per-object; the 9-row form skips the per-ray pow2-grid derivation and
    integer divisions -- ~1 ms/786k rays on a v5e, ROUND5_POST.json
    bunny_tex_address).

    Returns (addr_i (2, N) i32 rows [row, hi_half], addr_f (2, N) f32 rows
    [u_ratio, v_ratio])."""
    w = width
    h = height
    u = w.astype(jnp.float32) * uv[0]
    v = h.astype(jnp.float32) * (1.0 - uv[1])
    x = jnp.minimum(jnp.floor(u).astype(jnp.int32), w - 1)
    y = jnp.minimum(jnp.floor(v).astype(jnp.int32), h - 1)
    u_ratio = u - x.astype(jnp.float32)
    v_ratio = v - y.astype(jnp.float32)
    x0 = jnp.clip(x, 0, w - 1)
    y0 = jnp.clip(y, 0, h - 1)
    base_quad, rx, ry, wb, rw, rh = fp[0], fp[1], fp[2], fp[3], fp[4], fp[5]
    lx = jnp.clip(x0 - rx, 0, jnp.maximum(rw - 1, 0))
    ly = jnp.clip(y0 - ry, 0, jnp.maximum(rh - 1, 0))
    if fp.shape[0] >= 9:  # Morton tiles, region constants preselected
        slot = tile_slot_fast(lx, ly, fp[6], fp[7], fp[8])
    else:
        slot = tile_slot(lx, ly, wb, rh)  # Morton tiles (ops.texture_layout)
    idx4 = jnp.clip((base_quad + slot) * 4, 0, quads_rows * 8 - 4)
    addr_i = jnp.stack([idx4 >> 3, ((idx4 & 7) >= 4).astype(jnp.int32)])
    addr_f = jnp.stack([u_ratio, v_ratio])
    return addr_i, addr_f


def _tex_kernel(table_ref, ai_ref, af_ref, out_ref):
    rq = table_ref.shape[0]
    row = ai_ref[0, :]  # (NB,)
    hi_half = ai_ref[1, :] != 0
    u_ratio = af_ref[0, :]
    v_ratio = af_ref[1, :]
    u_opp = 1.0 - u_ratio
    v_opp = 1.0 - v_ratio
    nb = row.shape[0]

    # One-hot row fetch on the MXU: table^T (24, Rq) @ onehot (Rq, NB).
    # The table arrives CHANNEL-SPLIT (see footprint_sample_small): every
    # value is an integer < 256, exact in bf16, and the one-hot leaves a
    # single nonzero product per output -- so Mosaic's DEFAULT bf16 dot is
    # bit-exact here in ONE pass. The previous packed-u32 variant needed
    # Precision.HIGHEST (6 bf16 passes) to protect 24-bit texels plus an
    # integer unpack of the result; the split costs 3x the VMEM table
    # (still tiny) and deletes both (measured r5: the texture share of the
    # bunny frame, ROUND5_POST.json).
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (rq, nb), 0) == row[None, :]
    ).astype(jnp.float32)
    rows = jax.lax.dot_general(
        table_ref[:], onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (24, NB): [R(8) | G(8) | B(8)] per fetched atlas row

    # taps: [(x0,y0), (x1,y0), (x1,y1), (x2,y1)] -- reference order
    def mix(ch):  # channel offset in the split rows
        quad = jnp.where(hi_half[None, :], rows[ch + 4:ch + 8],
                         rows[ch:ch + 4]) / 255.0  # (4, NB)
        row1 = quad[0] * u_opp + quad[1] * u_ratio
        row2 = quad[2] * u_ratio + quad[3] * u_opp
        return row1 * v_opp + row2 * v_ratio

    out_ref[0, :] = mix(0)
    out_ref[1, :] = mix(8)
    out_ref[2, :] = mix(16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def footprint_sample_small(quads, fp, width, height, uv, interpret=False):
    """quads: (Rq, 8) uint32 footprint atlas, Rq <= MAX_ROWS;
    fp: (6|9, N) i32 per-ray region params (see _address_lanes);
    width/height: (N,) i32; uv: (2, N).
    Returns (3, N) float RGB in [0, 1] -- same results as
    texture_sample.bilinear_sample_footprint.
    """
    n = uv.shape[1]
    n_pad = -(-n // NB) * NB
    pad = n_pad - n
    rq = quads.shape[0]
    addr_i, addr_f = _address_lanes(rq, fp, width, height, uv)
    ai_p = jnp.pad(addr_i, ((0, 0), (0, pad)))
    af_p = jnp.pad(addr_f, ((0, 0), (0, pad)))
    # Channel-split f32 table [R(8) | G(8) | B(8)] per atlas row: every
    # value < 256 is bf16-exact, so the kernel's one-hot fetch runs ONE
    # DEFAULT-precision MXU pass (see _tex_kernel). Built outside the
    # kernel (u32 ops are XLA-side); 3x the VMEM of the packed table, still
    # <= 96 KB at MAX_ROWS.
    q = jax.lax.bitcast_convert_type(quads, jnp.int32)  # values < 2^24
    table = jnp.concatenate(
        [(q & 0xFF).astype(jnp.float32),
         ((q >> 8) & 0xFF).astype(jnp.float32),
         ((q >> 16) & 0xFF).astype(jnp.float32)], axis=1)  # (Rq, 24)

    out = pl.pallas_call(
        _tex_kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((rq, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32,
                                       vma=ray_vma(ai_p, af_p)),
        interpret=interpret,
    )(table, ai_p, af_p)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Windowed variant: arbitrary-size atlases without XLA's row gather.
#
# The XLA (Rq, 8) row gather costs ~3.2 ms per 786k rays on a v5e REGARDLESS
# of table size or access coherence (latency-bound, ~4 ns/row). But rays are
# processed in tile-major order, so one 1024-ray block touches a COMPACT row
# range of the atlas at moderate minification. This kernel keeps the atlas in
# HBM (pl.ANY), computes the block's row range in-kernel, and walks it in
# 1024-row windows: each window is DMA'd into VMEM scratch and fetched with
# the same one-hot MXU product as the small-table kernel. Blocks whose rays
# span one window (the common case) cost ~1 window; heavily minified blocks
# walk more. Exactness: windows ascend and each lane accumulates only rows in
# [max(start, prev_end), start + W), so clamp-induced overlaps never double
# count; the final quad values are the same i32 -> f32 selects as the gather.

W_ROWS = 1024  # window rows (= W_GRP row-groups of 16 packed into 128 lanes)
W_GRP = W_ROWS // 16
# Routing cap for the windowed path. With the Morton tile layout
# (ops.texture_layout) a block's atlas ROW RANGE is proportional to its 2D
# texel-footprint AREA, so even 1024^2 atlases (524k rows) walk a handful
# of windows per block at moderate minification; the cap only guards
# pathological spreads beyond the corpus (the flat ~3 ms XLA row gather is
# the fallback floor).
WINDOWED_MAX_ROWS = 1_100_000
# The windowed kernel was the prime suspect for the round-3 relay wedges
# (ROADMAP: first arch.txt run after the Morton re-layout, then texprobe on
# cube.txt). Round 4 proved it EXACT and wedge-free on-chip (texprobe
# max_diff 0.0, on cube.txt's 32k-row atlas) but 14-21x SLOWER than the
# flat XLA gather on the 1024^2 (524k-row) atlases, where heavy
# minification makes a block's footprint row-range span most of the atlas.
# WINDOWED_PROVEN therefore stays False for BIG atlases; the MID tier
# (<= WINDOWED_MID_CAP rows) was adopted in round 5 on a measured win at
# the proven size (ROUND5_POST2.json: cube.txt 5.951 -> 5.630 ms, +5.4%).
WINDOWED_PROVEN = False
WINDOWED_MID_CAP = 65_536


def windowed_max_rows() -> int:
    """Effective routing cap for the windowed kernel.

    `RPT_WINDOWED_MAX_ROWS` overrides: `0` disables the windowed path
    entirely, any other integer replaces the cap. Without the env var the
    cap is WINDOWED_MAX_ROWS when WINDOWED_PROVEN else WINDOWED_MID_CAP
    (see above). Read at trace time: set it before the first render compile
    of the process.
    """
    v = os.environ.get("RPT_WINDOWED_MAX_ROWS")
    if v is not None and v.strip():
        return int(v)
    return WINDOWED_MAX_ROWS if WINDOWED_PROVEN else WINDOWED_MID_CAP


def texture_route(rq: int, use_pallas: bool) -> str:
    """Pick the footprint-fetch implementation for an Rq-row atlas.

    Returns "small" (VMEM-resident one-hot MXU kernel), "windowed"
    (HBM-windowed DMA kernel) or "gather" (XLA row gather). Centralised so
    the routing policy -- including the RPT_WINDOWED_MAX_ROWS escape hatch --
    is a single tested function rather than inline conditionals."""
    if not use_pallas:
        return "gather"
    if rq <= MAX_ROWS:
        return "small"
    if rq <= windowed_max_rows():
        return "windowed"
    return "gather"


def _tex_window_kernel(quads_hbm, ai_ref, af_ref, out_ref,
                       scratch, sem, *, rq: int):
    row = ai_ref[0, :]  # (NB,) in [0, rq), precomputed (see _address_lanes)
    hi_half = ai_ref[1, :] != 0
    u_ratio = af_ref[0, :]
    v_ratio = af_ref[1, :]
    u_opp = 1.0 - u_ratio
    v_opp = 1.0 - v_ratio
    nb = row.shape[0]

    # HBM layout packs 16 atlas rows per 128-lane scratch row: the DMA slice
    # is lane-aligned, and the one-hot contraction runs over ROW-GROUPS
    # (K = W_GRP per window, one MXU pass).
    grp = row >> 4  # (NB,) row-group id
    sub = row & 15
    rqg = rq // 16
    # Sublane-align window starts (HBM DMA slices of an i32 (8, 128)-tiled
    # array need 8-aligned row offsets); rqg is 8-aligned by construction.
    g_min = (jnp.min(grp) >> 3) << 3
    g_max = jnp.max(grp)
    n_win = (g_max - g_min) // W_GRP + 1

    def body(state):
        j, acc = state
        start = jnp.minimum(g_min + j * W_GRP, rqg - W_GRP)
        dma = pltpu.make_async_copy(
            quads_hbm.at[pl.ds(start, W_GRP), :], scratch, sem)
        dma.start()
        dma.wait()
        # Groups already covered by earlier (ascending, possibly clamped)
        # windows are excluded so nothing double-counts.
        prev_end = g_min + j * W_GRP  # unclamped => covered so far
        rel = grp - start
        in_win = (grp >= prev_end) & (rel >= 0) & (rel < W_GRP)
        onehot = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (W_GRP, nb), 0)
             == rel[None, :]) & in_win[None, :], 1.0, 0.0)
        table = scratch[:].astype(jnp.float32)  # (W_GRP, 128)
        # HIGHEST: see _tex_kernel -- bf16 passes would truncate the packed
        # 24-bit texel values.
        big = jax.lax.dot_general(
            table, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (128, NB) whole row-group
        # Select this lane's 8-wide quad row out of the 16 packed per group.
        fetched = []
        for k in range(8):
            v = jnp.zeros((nb,), jnp.float32)
            for g in range(16):
                v = v + jnp.where(sub == g, big[g * 8 + k], 0.0)
            fetched.append(v)
        return j + 1, acc + jnp.stack(fetched)

    init = (jnp.int32(0), jnp.zeros((8, nb), jnp.float32))
    _, rows8 = jax.lax.while_loop(lambda s: s[0] < n_win, body, init)

    quad = jnp.where(hi_half[None, :], rows8[4:8], rows8[0:4]).astype(jnp.int32)
    r = (quad & 0xFF).astype(jnp.float32) / 255.0
    g = ((quad >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((quad >> 16) & 0xFF).astype(jnp.float32) / 255.0

    def mix(t):
        row1 = t[0] * u_opp + t[1] * u_ratio
        row2 = t[2] * u_ratio + t[3] * u_opp
        return row1 * v_opp + row2 * v_ratio

    out_ref[0, :] = mix(r)
    out_ref[1, :] = mix(g)
    out_ref[2, :] = mix(b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def footprint_sample_windowed(quads, fp, width, height, uv, interpret=False):
    """Arbitrary-Rq footprint fetch via HBM-windowed DMA + one-hot MXU.

    Same signature/results as bilinear_sample_footprint; use when
    Rq > MAX_ROWS (the VMEM-resident small kernel is cheaper below that).
    """
    n = uv.shape[1]
    n_pad = -(-n // NB) * NB
    pad = n_pad - n
    rq = max(-(-quads.shape[0] // 128) * 128, W_ROWS)
    addr_i, addr_f = _address_lanes(quads.shape[0], fp, width, height, uv)
    # Edge-replicate (not zero-fill): zero-padded lanes map to atlas row 0,
    # dragging the final partial block's g_min down and forcing it to walk
    # the whole row range below its real lanes (perf only).
    ai_p = jnp.pad(addr_i, ((0, 0), (0, pad)), mode="edge")
    af_p = jnp.pad(addr_f, ((0, 0), (0, pad)), mode="edge")
    quads_i = jax.lax.bitcast_convert_type(quads, jnp.int32)
    if rq > quads.shape[0]:
        quads_i = jnp.pad(quads_i, ((0, rq - quads.shape[0]), (0, 0)))
    quads_i = quads_i.reshape(rq // 16, 128)  # 16 rows packed per 128 lanes

    kernel = functools.partial(_tex_window_kernel, rq=rq)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            # Explicit HBM: pl.ANY may try VMEM, and a 1024^2 atlas is
            # ~16.7 MB -- beyond the ~16 MB/core budget.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32,
                                       vma=ray_vma(ai_p, af_p)),
        scratch_shapes=[
            pltpu.VMEM((W_GRP, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(quads_i, ai_p, af_p)
    return out[:, :n]
