"""Microbench the live-list build stages (cull vs bucket sort vs inversion).
Usage: python tools/listbench.py [C] [B]"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    from relativitypathtracer_tpu.ops.pallas.mesh_kernels import (
        INF, _sub_cone_cull, bucket_order,
    )

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 156
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    NBKT = 16
    rng = np.random.default_rng(0)
    mind = jnp.asarray(rng.uniform(0, 10, (B, C)).astype(np.float32))
    overlap = jnp.asarray(rng.uniform(size=(B, C)) < 0.1)
    spheres = jnp.asarray(
        np.concatenate([rng.normal(size=(C, 3)), rng.uniform(0.1, 0.3, (C, 1))],
                       axis=1).astype(np.float32))
    dh = rng.normal(size=(3, B * 1024)).astype(np.float32)
    dh /= np.linalg.norm(dh, axis=0, keepdims=True)
    dh = jnp.asarray(dh)
    o = jnp.asarray(rng.normal(size=(3, B * 1024)).astype(np.float32))

    def timeit(fn, *args, reps=30):
        out = jax.jit(fn)(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf))
        t0 = time.perf_counter()
        _ = float(jnp.sum(leaf))
        rtt = time.perf_counter() - t0
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        for _i in range(reps):
            out = jf(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf))
        return (time.perf_counter() - t0 - rtt) / reps * 1e3

    print(f"C={C} B={B} backend={jax.default_backend()}")
    print(f"cull (sub-cones):  {timeit(lambda: _sub_cone_cull(spheres, dh, o)):7.3f} ms")
    print(f"bucket_order:      {timeit(lambda: bucket_order(mind, overlap)):7.3f} ms")

    def buckets_only(mind, overlap):
        lo_k = jnp.min(mind, axis=1, keepdims=True)
        hi_k = jnp.max(jnp.where(overlap, mind, -INF), axis=1, keepdims=True)
        span = jnp.maximum(hi_k - lo_k, 1e-6)
        bucket = jnp.clip(((mind - lo_k) / span * (NBKT - 1)).astype(jnp.int32), 0, NBKT - 1)
        key = lo_k + bucket.astype(jnp.float32) * (span / (NBKT - 1))
        bucket = jnp.where(overlap, bucket, NBKT)
        onehot_b = bucket[:, :, None] == jnp.arange(NBKT + 1)[None, None, :]
        per_bucket = jnp.sum(onehot_b, axis=1)
        offsets = jnp.cumsum(per_bucket, axis=1) - per_bucket
        rank = jnp.sum(jnp.cumsum(onehot_b, axis=1) * onehot_b, axis=2) - 1
        pos = jnp.sum(jnp.where(onehot_b, offsets[:, None, :], 0), axis=2) + rank
        return pos, key

    print(f"  buckets+rank:    {timeit(lambda: buckets_only(mind, overlap)):7.3f} ms")

    def invert(pos):
        ppos = pos[:, :, None] == jnp.arange(C)[None, None, :]
        ids = jnp.arange(C, dtype=jnp.int32)
        return jnp.sum(jnp.where(ppos, ids[None, :, None], 0), axis=1).astype(jnp.int32)

    pos, _ = jax.jit(buckets_only)(mind, overlap)
    print(f"  inversion CxC:   {timeit(lambda: invert(pos)):7.3f} ms")
