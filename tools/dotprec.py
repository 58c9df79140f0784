"""Verify in-kernel dot numerics: DEFAULT vs HIGHEST vs numpy f64, under the
renderer's default_matmul_precision("highest") context (as in production).
Usage: python tools/dotprec.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 1024


def make(rows, kdim, prec):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((rows, kdim), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((kdim, NB), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, NB), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, NB), jnp.float32),
    )


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for rows, kdim in ((96, 3), (128, 10), (64, 6), (15, 32)):
        # magnitudes representative of MT constants (geometry ~ unit..10)
        a = (rng.normal(size=(rows, kdim)) * 3).astype(np.float32)
        b = (rng.normal(size=(kdim, NB)) * 3).astype(np.float32)
        ref = a.astype(np.float64) @ b.astype(np.float64)
        scale = np.abs(ref).max()
        for name, prec in (("default", jax.lax.Precision.DEFAULT),
                           ("high", jax.lax.Precision.HIGH),
                           ("highest", jax.lax.Precision.HIGHEST)):
            with jax.default_matmul_precision("highest"):
                out = np.asarray(jax.jit(make(rows, kdim, prec))(jnp.asarray(a), jnp.asarray(b)))
            err = np.abs(out - ref).max() / scale
            print(f"({rows:4d},{kdim:3d}) {name:8s}: max rel err {err:.3e}")
