"""ops.texture_layout: Morton tile addressing invariants.

tile_slot is consumed identically by the numpy atlas builder, the XLA
sampler and (via precomputed lanes) the Pallas texture kernels; these
tests pin the algebra those consumers share.
"""

import numpy as np

from relativitypathtracer_tpu.ops.texture_layout import (
    region_quads, region_tile_grid, tile_slot,
)


import pytest

pytestmark = pytest.mark.fast  # inner-loop subset (VERDICT r4 item 8)


def _grid(rw, rh):
    lx = np.broadcast_to(np.arange(rw, dtype=np.int64)[None, :], (rh, rw))
    ly = np.broadcast_to(np.arange(rh, dtype=np.int64)[:, None], (rh, rw))
    return lx, ly


def test_slot_bijective_and_bounded():
    """Every texel of a region maps to a UNIQUE slot below region_quads,
    across square, wide, tall, and non-pow2 tile grids."""
    for rw, rh in ((1024, 1024), (224, 225), (48, 130), (3, 2), (16, 16),
                   (1024, 64)):
        wb = -(-rw // 16)
        lx, ly = _grid(rw, rh)
        slot = tile_slot(lx, ly, np.int64(wb), np.int64(rh))
        assert slot.min() >= 0
        assert slot.max() < int(region_quads(np.int64(wb), np.int64(rh)))
        assert len(np.unique(slot)) == rw * rh, (rw, rh)


def test_morton_locality():
    """The point of the layout: a 2D texel neighborhood spans a 1D slot
    range proportional to its AREA, not to its tile-row span. For a 32x32
    texel patch of a 1024^2 region, row-major tile order spans ~2 tile-rows
    = ~32k slots; Morton must stay within a small constant of the patch's
    own slot count."""
    rw = rh = 1024
    wb = -(-rw // 16)
    for ox, oy in ((0, 0), (512, 256), (960, 960), (133, 711)):
        xs = np.arange(ox, min(ox + 32, rw), dtype=np.int64)
        ys = np.arange(oy, min(oy + 32, rh), dtype=np.int64)
        lx = np.broadcast_to(xs[None, :], (len(ys), len(xs)))
        ly = np.broadcast_to(ys[:, None], (len(ys), len(xs)))
        slot = tile_slot(lx, ly, np.int64(wb), np.int64(rh))
        span = int(slot.max() - slot.min())
        assert span <= 16 * 1024, (ox, oy, span)  # vs ~131k for row-major


def test_grid_pow2():
    wb2, hb2 = region_tile_grid(np.int64(14), np.int64(225))
    assert (int(wb2), int(hb2)) == (16, 16)
    wb2, hb2 = region_tile_grid(np.int64(64), np.int64(1024))
    assert (int(wb2), int(hb2)) == (64, 64)
    wb2, hb2 = region_tile_grid(np.int64(1), np.int64(2))
    assert (int(wb2), int(hb2)) == (1, 1)
