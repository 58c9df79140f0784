"""Multi-chip rendering: shard the pixel grid across a device mesh.

The reference is strictly single-device (one OpenCL device,
/root/reference/CLSetup.cpp:86-98); its only parallelism is the flat NDRange
over pixels. The TPU-native scale-out of that axis is data-parallel row-bands
over an ICI mesh: each chip renders a horizontal band of the image with the
scene pytree replicated, and the full frame materializes sharded across
devices (an all-gather only happens if the host fetches it). The only
in-frame collective is an optional psum of the tiny aux counters; rays never
cross tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level; fall back for older
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.scene import Scene, SceneMeta
from ..ops.camera import camera_ray_dirs
from ..ops.tonemap import tonemap
from ..render import (
    FrameState, TILE, _round_up, msaa_mean_unswizzle, msaa_swizzle,
    object_frames, shade, tile_swizzle, tile_unswizzle,
)


def build_sharded_render_fn(meta: SceneMeta, width: int, height: int, interval: int,
                            mesh: Mesh, axis: str = "tiles", msaa: int = 1,
                            with_aux: bool = False):
    """Compile a renderer that splits the image into horizontal bands across
    `mesh` (1D). Returns render(scene, state) -> (H, W, 3) float image, or
    (image, aux) when with_aux (aux counters psum'd over the mesh, so every
    device holds the frame totals -- the only in-frame collective).

    The band height is padded so every device gets an equal multiple of the
    32-pixel tile; the padding is cropped after the gather. msaa folds the
    sample sets into each band's ray axis exactly like the single-device
    renderer (render.msaa_swizzle); supported values are 1, 2, 4, 8, 16.
    """
    if msaa not in (1, 2, 4, 8, 16):
        raise ValueError(f"sharded renderer supports msaa in 1/2/4/8/16, got {msaa}")
    n_dev = mesh.shape[axis]
    pw = _round_up(width, TILE)
    band_h = _round_up(-(-height // n_dev), TILE)
    ph = band_h * n_dev

    # Same eager precompute as build_render_fn so per-pixel results match the
    # single-device renderer bit-for-bit (jit-fused dir math differs slightly).
    dirs = camera_ray_dirs(width, height, msaa, pad_width=pw, pad_height=ph)
    if msaa == 1:
        dirs_bands = jnp.stack(
            [tile_swizzle(dirs[b * band_h:(b + 1) * band_h].reshape(-1, 3).T,
                          band_h, pw)
             for b in range(n_dev)]
        )  # (n_dev, 3, band_N)
    else:
        dirs_bands = jnp.stack(
            [msaa_swizzle(dirs[:, b * band_h:(b + 1) * band_h], band_h, pw, msaa)
             for b in range(n_dev)]
        )  # (n_dev, 3, band_N * msaa^2)
    dirs_bands = jax.device_put(dirs_bands)

    def band_render(scene: Scene, state: FrameState):
        # Runs per-device: render rows [band * band_h, (band+1) * band_h).
        band = jax.lax.axis_index(axis)
        L, inv_L, stat_cam = object_frames(scene.objects, state)
        d = jax.lax.dynamic_index_in_dim(dirs_bands, band, 0, keepdims=False)
        with jax.default_matmul_precision("highest"):
            color, aux = shade(scene, meta, L, inv_L, stat_cam, d, interval)
        if msaa == 1:
            color = tile_unswizzle(color, band_h, pw)
        else:
            color = msaa_mean_unswizzle(color, band_h, pw, msaa)
        img = tonemap(color.T, scene.white_point).reshape(band_h, pw, 3)
        if with_aux:
            # frame totals on every device; the frame's only collective
            return img, jax.tree.map(lambda x: jax.lax.psum(x, axis), aux)
        return img

    sharded = shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(), P()),  # scene + state replicated
        # bands concatenate over rows; psum'd aux is replicated
        out_specs=(P(axis, None, None), P()) if with_aux else P(axis, None, None),
        # check_vma=True rejects the mesh fallback's lax.scan: its carries
        # (best-hit accumulators initialized from constants) start replicated
        # and become varying once combined with the per-band rays. Fixing it
        # needs jax.lax.pvary on every scan/while carry init inside
        # ops.mesh_intersect -- replication mistakes are instead covered by
        # tests comparing sharded vs single-device renders bit-for-bit
        # (tests/test_parallel.py), including the Pallas interpret kernels.
        check_vma=False,
    )

    @jax.jit
    def render(scene: Scene, state: FrameState):
        out = sharded(scene, state)
        if with_aux:
            img, aux = out
            return img[:height, :width], aux
        return out[:height, :width]

    return render


def default_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
