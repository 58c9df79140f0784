"""Settle the in-kernel MXU cost model: time a Pallas kernel that runs K
iterations of the walk-shaped dot at different precisions.
Usage: python tools/dotbench.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 1024
K = 2000


def make(rows, kdim, mode):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if mode == "bf16":
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)

        def body(i, acc):
            prec = {"default": jax.lax.Precision.DEFAULT,
                    "high": jax.lax.Precision.HIGH,
                    "highest": jax.lax.Precision.HIGHEST,
                    "bf16": None}[mode]
            # iteration-dependent operand: keeps the dot inside the loop
            # (a loop-invariant dot gets hoisted and times as ~0)
            bi = b * (1.0 + i.astype(a.dtype) * 1e-9)
            p = jax.lax.dot_general(a, bi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            return acc + p[0] * (1.0 / (i + 1.0))

        o_ref[0, :] = jax.lax.fori_loop(0, K, body, jnp.zeros((NB,), jnp.float32))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((rows, kdim), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((kdim, NB), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NB), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NB), jnp.float32),
    )


if __name__ == "__main__":
    import numpy as np
    rng = np.random.default_rng(0)
    for rows, kdim in ((96, 3), (128, 10), (120, 3)):
        a = jnp.asarray(rng.normal(size=(rows, kdim)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(kdim, NB)).astype(np.float32))
        for mode in ("default", "high", "highest"):
            fn = jax.jit(make(rows, kdim, mode))
            out = fn(a, b)
            _ = float(jnp.sum(out))
            t0 = time.perf_counter()
            _ = float(jnp.sum(out))
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                out = fn(a, b)
            _ = float(jnp.sum(out))
            dt = (time.perf_counter() - t0 - rtt) / reps / K * 1e9
            print(f"({rows:4d},{kdim:3d}) {mode:8s}: {dt:8.1f} ns/dot")
