"""Hable filmic tonemapping, normalized by a white point.

Constants match /root/reference/opencl_kernel.cl:607-616 so rendered frames are
comparable within fp tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

_A = 0.15
_B = 0.50
_C = 0.10
_D = 0.20
_E = 0.02
_F = 0.30


def hable(x):
    """Hable operator applied elementwise."""
    x = jnp.asarray(x, jnp.float32)
    return ((x * (_A * x + _C * _B) + _D * _E) / (x * (_A * x + _B) + _D * _F)) - _E / _F


def tonemap(color, white_point):
    """hable(color)/hable(white_point), clamped to <= 1.

    Mirrors /root/reference/opencl_kernel.cl:649-650.
    color: (..., 3); white_point: (3,)
    """
    out = hable(color) / hable(white_point)
    return jnp.minimum(out, 1.0)


def pack_rgb8(color):
    """Float RGB in [0,1] -> uint8, truncating like the reference's
    (unsigned char)(c * 255) cast (/root/reference/opencl_kernel.cl:653-657)."""
    return (color * 255.0).astype(jnp.uint8)
