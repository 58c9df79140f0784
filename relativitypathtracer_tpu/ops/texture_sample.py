"""Bilinear texture sampling from the flat byte atlas.

Reproduces the reference's exact tap pattern
(/root/reference/opencl_kernel.cl:427-470), including its quirky clamp
sequence: after clamping x+1 for the second tap, the fourth tap uses
clamp((x+1)-1), which differs from the original x when x was at the border.
Per-pixel texture (offset, width, height) come from the hit object, so mixed
texture sizes batch fine; out-of-atlas lanes must be masked by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(atlas, offset, width, height, uv):
    """atlas: (B,) uint8; offset/width/height: (N,) int32; uv: (N, 2) float.

    Returns (N, 3) float RGB in [0, 1].
    """
    w = width
    h = height
    u = w.astype(jnp.float32) * uv[..., 0]
    v = h.astype(jnp.float32) * (1.0 - uv[..., 1])
    x = jnp.minimum(jnp.floor(u).astype(jnp.int32), w - 1)
    y = jnp.minimum(jnp.floor(v).astype(jnp.int32), h - 1)
    u_ratio = u - x.astype(jnp.float32)
    v_ratio = v - y.astype(jnp.float32)
    u_opp = 1.0 - u_ratio
    v_opp = 1.0 - v_ratio

    # The reference indexes the first tap unclamped-below (UB for uv < 0); we
    # clamp to keep gathers in-bounds, which only differs on out-of-range UVs.
    x0 = jnp.clip(x, 0, w - 1)
    y0 = jnp.clip(y, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x2 = jnp.clip(x1 - 1, 0, w - 1)  # reference quirk: derived from x1, not x0

    def fetch(xi, yi):
        base = offset + 3 * (w * yi + xi)
        base = jnp.clip(base, 0, atlas.shape[0] - 3)
        idx = base[..., None] + jnp.arange(3)
        return jnp.take(atlas, idx, axis=0).astype(jnp.float32) / 255.0

    row1 = (fetch(x0, y0) * u_opp[..., None] + fetch(x1, y0) * u_ratio[..., None]) * v_opp[..., None]
    row2 = (fetch(x1, y1) * u_ratio[..., None] + fetch(x2, y1) * u_opp[..., None]) * v_ratio[..., None]
    return row1 + row2
