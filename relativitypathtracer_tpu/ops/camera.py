"""Primary-ray generation for the pinhole camera.

Geometry matches createCamRay (/root/reference/opencl_kernel.cl:55-73): camera
at the origin of the camera frame, image plane at z = 0.5, aspect-corrected x.
Pixel (0, 0) is the bottom-left of the screen (the reference draws the buffer
bottom-up through GL); `flip_y` utilities in utils.image handle PNG order.
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_ray_dirs(width: int, height: int, msaa: int = 1,
                    pad_width: int | None = None, pad_height: int | None = None):
    """Unit ray directions for every (sub)pixel.

    Returns (msaa*msaa, H, W, 3) float32 when msaa > 1, else (H, W, 3).
    Subpixel offsets follow the reference MSAA loop
    (/root/reference/opencl_kernel.cl:642-647): offset k/msaa for k in [0, msaa).

    pad_width/pad_height: generate extra off-sensor rows/columns (projection
    still uses width/height) so callers can tile the pixel grid; the padded
    region is cropped after rendering.
    """
    pw = pad_width or width
    ph = pad_height or height
    xs = jnp.arange(pw, dtype=jnp.float32)
    ys = jnp.arange(ph, dtype=jnp.float32)
    aspect = float(width) / float(height)

    def dirs_at(dx, dy):
        fx = (xs + dx) / width  # (PW,)
        fy = (ys + dy) / height  # (PH,)
        px = (fx - 0.5) * aspect
        py = fy - 0.5
        px = jnp.broadcast_to(px[None, :], (ph, pw))
        py = jnp.broadcast_to(py[:, None], (ph, pw))
        pz = jnp.full((ph, pw), 0.5, jnp.float32)
        d = jnp.stack([px, py, pz], axis=-1)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    if msaa == 1:
        return dirs_at(0.0, 0.0)
    samples = [
        dirs_at(float(sx) / msaa, float(sy) / msaa)
        for sy in range(msaa)
        for sx in range(msaa)
    ]
    return jnp.stack(samples, axis=0)
