"""Fused shadow-setup chain: hit reconstruction + frame-hopping light
direction in ONE Pallas pass.

The jnp version of this chain (render.shade, mirroring
/root/reference/opencl_kernel.cl:572-599) is ~10 matmul/elementwise XLA
passes per light -- per-pixel 4x4 matrix gathers (one-hot MXU products),
apply44 einsums, norms -- each materializing (4, N) intermediates in HBM.
At 786k rays that is ~3 ms/frame of pure HBM round-trips. This kernel keeps
one ray block resident and does the whole chain on-chip:

  - The hit object's L / invL / stationaryCam are selected by an IN-KERNEL
    one-hot MXU product against a (40, O) VMEM matrix table (no per-lane
    gathers, no HBM-side gather_mats pass).
  - Hit event reconstruction in the camera frame (+0.001 normal bias), hop
    to the light frame, retarded light direction (interval * |d|, d), hop
    back to the camera and hit-object frames, N.L and the light-distance
    search bound -- all scalar-FMA chains over the resident block.

Outputs exactly the quantities the shadow pass consumes: camera-frame hit
event (origins for the occlusion query), camera-frame light direction,
N.L, tmax (light distance in shared ray-parameter units), and |ld_of| for
the falloff term.

Semantics preserved from opencl_kernel.cl:572-599: bias before the frame
hop, retarded time component interval*|d| in the LIGHT frame, N.L against
the direction expressed in the hit object's rest frame. Lanes that missed
(t = INF) compute with t = 1 stand-ins; every consumer masks them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ray_vma

INF = 1e20
NB = 1024
MROWS = 40  # per-object matrix table rows: L(16) + invL(16) + stat_cam(4) + pad


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chain_kernel(light_ref, mats_ref, dir4_ref, t_ref, nrm_ref, obj_ref,
                  hit_out, ld_out, ndotl_out, tmax_out, llen_out, *, O: int,
                  interval: int):
    dir4 = dir4_ref[:]  # (4, NB)
    nb = dir4.shape[1]
    t = t_ref[0, :]
    nrm = nrm_ref[:]  # (3, NB) rest-frame normal (zeros where miss)
    obj = obj_ref[0, :]

    hit = t < INF
    t_safe = jnp.where(hit, t, 1.0)
    nrm = [jnp.where(hit, nrm[k], 0.0) for k in range(3)]

    # Hit object's matrices via exact per-object VPU broadcast FMAs (the
    # one-hot MXU product is bf16-lossy at DEFAULT precision and 3x slower
    # at HIGHEST; O is small, so O (MROWS, NB) FMAs win).
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (O, nb), 0) == obj[None, :])
    onehot_f = jnp.where(onehot, 1.0, 0.0)
    mats = mats_ref[:]
    sel = jnp.zeros((mats.shape[0], nb), jnp.float32)
    for o in range(O):
        sel = sel + mats[:, o:o + 1] * onehot_f[o][None, :]
    # (MROWS, NB): rows L(16) | invL(16) | stat_cam(4)

    def apply4(rows, v):  # rows: base index into sel; v: list of 4 (NB,)
        return [
            sel[rows + 4 * i] * v[0] + sel[rows + 4 * i + 1] * v[1]
            + sel[rows + 4 * i + 2] * v[2] + sel[rows + 4 * i + 3] * v[3]
            for i in range(4)
        ]

    def apply4_s(base, v):  # scalar (SMEM light row) 4x4 apply
        return [
            light_ref[0, base + 4 * i] * v[0] + light_ref[0, base + 4 * i + 1] * v[1]
            + light_ref[0, base + 4 * i + 2] * v[2] + light_ref[0, base + 4 * i + 3] * v[3]
            for i in range(4)
        ]

    d4 = [dir4[i] for i in range(4)]
    ray_dir_of = apply4(0, d4)  # hit-object frame ray dir
    # Hit event in the object frame, normal-biased (opencl_kernel.cl:575-580)
    hit_pos_of = [sel[32 + i] + ray_dir_of[i] * t_safe for i in range(4)]
    for k in range(3):
        hit_pos_of[1 + k] = hit_pos_of[1 + k] + nrm[k] * 0.001
    hit_pos = apply4(16, hit_pos_of)  # camera frame

    # Hop to the light frame; retarded direction to the light's position.
    hp_lf = apply4_s(0, hit_pos)  # light L rows 0..15
    ld3_lf = [light_ref[0, 32 + k] - hp_lf[1 + k] for k in range(3)]
    nlf = jnp.sqrt(ld3_lf[0] * ld3_lf[0] + ld3_lf[1] * ld3_lf[1]
                   + ld3_lf[2] * ld3_lf[2])
    ld_lf = [jnp.float32(interval) * nlf] + ld3_lf
    ld = apply4_s(16, ld_lf)  # camera frame (light invL rows 16..31)
    ld_of = apply4(0, ld)  # hit-object frame

    llen = jnp.sqrt(ld_of[1] * ld_of[1] + ld_of[2] * ld_of[2]
                    + ld_of[3] * ld_of[3])
    inv_llen = 1.0 / jnp.maximum(llen, 1e-20)
    ndotl = (nrm[0] * ld_of[1] + nrm[1] * ld_of[2] + nrm[2] * ld_of[3]) * inv_llen
    tmax = jnp.sqrt(ld[1] * ld[1] + ld[2] * ld[2] + ld[3] * ld[3])

    for i in range(4):
        hit_out[i, :] = hit_pos[i]
    for k in range(3):
        ld_out[k, :] = ld[1 + k]
    ndotl_out[0, :] = ndotl
    tmax_out[0, :] = tmax
    llen_out[0, :] = llen


@functools.partial(jax.jit, static_argnames=("interval", "interpret"))
def shadow_chain(mats, light_row, dir4, t, normal, obj, interval: int,
                 interpret: bool = False):
    """mats: (MROWS, O) per-object [L row-major(16), invL(16), stat_cam(4)];
    light_row: (1, 36) [L_light(16), invL_light(16), light_pos3, pad];
    dir4: (4, N); t: (N,); normal: (3, N) rest-frame; obj: (N,) i32.
    Returns (hit_pos4 (4, N) camera frame, ld3 (3, N) camera frame,
    ndotl (N,), tmax (N,), llen (N,))."""
    O = mats.shape[1]
    n = dir4.shape[1]
    n_pad = _round_up(n, NB)
    pad = n_pad - n
    dir4_p = jnp.pad(dir4, ((0, 0), (0, pad)), constant_values=1.0)
    t_p = jnp.pad(t, (0, pad), constant_values=INF)[None, :]
    nrm_p = jnp.pad(normal, ((0, 0), (0, pad)))
    obj_p = jnp.pad(obj, (0, pad))[None, :]

    kernel = functools.partial(_chain_kernel, O=O, interval=interval)
    row = pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    out4 = pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    hp, ld3, ndotl, tmax, llen = pl.pallas_call(
        kernel,
        grid=(n_pad // NB,),
        in_specs=[
            pl.BlockSpec((1, 36), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((MROWS, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            row,
            pl.BlockSpec((3, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(out4, out3, row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((4, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p, t_p)),
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p, t_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p, t_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p, t_p)),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32,
                                 vma=ray_vma(dir4_p, t_p)),
        ),
        interpret=interpret,
    )(light_row, mats, dir4_p, t_p, nrm_p, obj_p)
    return hp[:, :n], ld3[:, :n], ndotl[0, :n], tmax[0, :n], llen[0, :n]


def pack_chain_mats(L, inv_L, stat_cam):
    """(MROWS, O) matrix table + per-light row builder. L/inv_L: (O, 4, 4);
    stat_cam: (O, 4). Rows: L row-major, invL row-major, stat_cam."""
    O = L.shape[0]
    mats = jnp.concatenate([
        L.reshape(O, 16), inv_L.reshape(O, 16), stat_cam,
        jnp.zeros((O, MROWS - 36)),
    ], axis=1).T  # (MROWS, O)
    return mats


def pack_light_row(L_i, inv_L_i, light_pos3):
    return jnp.concatenate(
        [L_i.reshape(16), inv_L_i.reshape(16), light_pos3,
         jnp.zeros((1,))])[None, :]  # (1, 36)
