"""FAST-9/16 corner scores as whole-image vectorized ops.

TPU-native replacement for the per-cell cv::FAST calls in
``ORBextractor::ComputeKeyPointsOctTree`` (``ORBextractor.cc:790-863``): one
pass computes the OpenCV ``cornerScore`` map for the entire image (16 shifted
difference planes, circular 9-run min/max via rolls), so the 20->7 threshold
fallback and non-max suppression become mask algebra instead of control flow.

Semantics match OpenCV FAST_t<16>: a pixel is a corner at threshold t iff
there exist 9 contiguous ring pixels all brighter than center+t or all darker
than center-t; the score is the largest t at which it remains a corner
(cornerScore convention: max over arcs of min |diff|, minus 1). Non-max keeps
pixels whose score is strictly greater than all 8 neighbors (ties dropped,
exactly like OpenCV).
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_2_ros_tpu.ops.image import max_pool_3x3

# OpenCV 16-pixel Bresenham ring of radius 3, as (dx, dy) offsets
RING_16 = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Corner score for every pixel. img: (H, W) float32 with integral values.

    Returns (H, W) float32 score (== OpenCV cornerScore); a pixel is a FAST
    corner at threshold t iff score >= t... precisely: corner(t) <=> score > t - 1
    <=> score >= t for integral scores. Border pixels (within 3 of the edge)
    get garbage from wraparound; callers must mask a border >= 3.
    """
    # bfloat16 is exact for u8 differences (integers <= 256 have exact bf16
    # representations) and halves the HBM traffic of the (16, H, W) stacks
    x = img.astype(jnp.bfloat16)
    planes = []
    for dx, dy in RING_16:
        planes.append(jnp.roll(x, shift=(-dy, -dx), axis=(0, 1)))
    ring = jnp.stack(planes)              # (16, H, W): ring[k] = I(y+dy_k, x+dx_k)
    d = x[None, :, :] - ring              # center - ring; >0 where ring darker

    def max_min_over_9runs(diffs):
        # logarithmic contiguous-run min: {0,1} -> {0..3} -> {0..7} -> {0..8}
        m1 = jnp.minimum(diffs, jnp.roll(diffs, -1, axis=0))
        m2 = jnp.minimum(m1, jnp.roll(m1, -2, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -4, axis=0))
        m9 = jnp.minimum(m4, jnp.roll(diffs, -8, axis=0))
        return jnp.max(m9, axis=0)

    dark = max_min_over_9runs(d)          # best "center brighter" arc
    bright = max_min_over_9runs(-d)       # best "center darker" arc
    return (jnp.maximum(dark, bright) - 1.0).astype(jnp.float32)


def detect(score: jnp.ndarray, threshold: float, min_threshold: float,
           cell: int, border: int) -> jnp.ndarray:
    """Corner response map with per-cell threshold fallback + non-max.

    Mirrors ``ComputeKeyPointsOctTree``'s retry (``ORBextractor.cc:839-850``):
    cells of ``cell`` px that yield no corner at ``threshold`` are re-detected
    at ``min_threshold``. Returns the response map (score where a kept corner,
    0 elsewhere) after OpenCV-style strict non-max suppression.
    """
    H, W = score.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_border = ((xs >= border) & (xs < W - border)
                 & (ys >= border) & (ys < H - border))

    corner_hi = (score >= threshold) & in_border
    corner_lo = (score >= min_threshold) & in_border

    # cell occupancy at the high threshold (pad to multiple of cell)
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    occ = jnp.pad(corner_hi, ((0, Hp - H), (0, Wp - W)))
    occ = occ.reshape(Hp // cell, cell, Wp // cell, cell).any(axis=(1, 3))
    occ_full = jnp.repeat(jnp.repeat(occ, cell, axis=0), cell, axis=1)[:H, :W]

    mask = corner_hi | (corner_lo & ~occ_full)
    # NMS in bf16: scores are integers <= 255, exact in bf16, half the
    # bandwidth of the 8-slice neighborhood max
    resp = jnp.where(mask, score, 0.0).astype(jnp.bfloat16)
    keep = mask & (resp > max_pool_3x3(resp))
    return jnp.where(keep, score, 0.0)
