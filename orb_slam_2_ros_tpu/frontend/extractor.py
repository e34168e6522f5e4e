"""ORB feature extraction as a batched TPU program.

Replaces ``ORBextractor.cc`` (pyramid + tiled FAST + quadtree + IC-angle +
rBRIEF, 1187 LoC of per-pixel C++): here each stage is a whole-image array op
— FAST corner scoring is 16 shifted difference planes (ops/fast.py), the
sequential quadtree culling (``DistributeOctTree``, ``ORBextractor.cc:561-787``)
becomes per-level top-K selection on the non-max-suppressed response map
(documented behavioral difference: same per-level budgets
``ORBextractor.cc:444-455``, spatial uniformity enforced by non-max + cell
threshold fallback instead of the quadtree), IC-angle
(``ORBextractor.cc:77-104``) is a 2-channel 31x31 convolution + gather, and
rBRIEF (``computeOrbDescriptor``, ``ORBextractor.cc:108-147``) is a 512-sample
rotated gather from the blurred level image using the same public 256-pair
pattern (``bit_pattern_31_``), bit-packed to match OpenCV byte order exactly.

Everything is static-shape: each frame yields ``cfg.orb.max_kps`` keypoint
slots with a validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import OrbConfig
from orb_slam_2_ros_tpu.ops import fast as fast_ops
from orb_slam_2_ros_tpu.ops.image import gaussian_blur_7x7, resize_linear, quantize_u8

HALF_PATCH = 15
_PATTERN_PATH = __file__.rsplit("/", 2)[0] + "/ops/data/brief_pattern.npy"


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one image (SURVEY.md §7.0).

    ``xy`` are raw (distorted) level-0 pixel coords like the reference's
    ``mvKeys``; undistortion happens at Frame build (frontend/frame.py).
    """

    xy: jnp.ndarray        # (max_kps, 2) float32, level-0 pixel coords
    response: jnp.ndarray  # (max_kps,) float32 FAST corner score
    angle: jnp.ndarray     # (max_kps,) float32 radians
    octave: jnp.ndarray    # (max_kps,) int32 pyramid level
    desc: jnp.ndarray      # (max_kps, 8) uint32 = 256-bit rBRIEF
    valid: jnp.ndarray     # (max_kps,) bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def level_budgets(cfg: OrbConfig) -> list:
    """Per-level feature budgets, geometric series with remainder on the last
    level (``ORBextractor.cc:444-455``)."""
    factor = 1.0 / cfg.scale_factor
    n_desired = cfg.n_features * (1 - factor) / (1 - factor ** cfg.n_levels)
    budgets = []
    for i in range(cfg.n_levels - 1):
        budgets.append(int(round(n_desired * factor ** i)))
    budgets.append(max(cfg.n_features - sum(budgets), 0))
    return budgets


@functools.lru_cache()
def umax_table(hp: int = HALF_PATCH) -> tuple:
    """Circular-patch row extents, replicating the ORBextractor constructor's
    symmetry-corrected table (``ORBextractor.cc:452-468``)."""
    umax = [0] * (hp + 2)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2.0 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2.0))
    hp2 = hp * hp
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return tuple(umax[: hp + 1])


@functools.lru_cache()
def _ic_angle_kernels() -> np.ndarray:
    """(2, 1, 31, 31) correlation kernels: channel 0 -> m10 (u moment),
    channel 1 -> m01 (v moment), over the circular patch."""
    um = umax_table()
    size = 2 * HALF_PATCH + 1
    k = np.zeros((2, 1, size, size), np.float32)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        for u in range(-HALF_PATCH, HALF_PATCH + 1):
            if abs(u) <= um[abs(v)]:
                k[0, 0, v + HALF_PATCH, u + HALF_PATCH] = u
                k[1, 0, v + HALF_PATCH, u + HALF_PATCH] = v
    return k


@functools.lru_cache()
def _brief_pattern() -> np.ndarray:
    """(512, 2) int8 sampling offsets — the public learned pattern from the
    ORB paper (Rublee et al. 2011), identical to OpenCV's bit_pattern_31_."""
    return np.load(_PATTERN_PATH)


def ic_angle_maps(img: jnp.ndarray) -> jnp.ndarray:
    """(2, H, W) moment maps m10, m01 for every pixel via conv (MXU).

    Kept for oracle tests; the production path uses ic_angles_at (per-keypoint
    prefix-sum lookups — ~100x less arithmetic)."""
    k = jnp.asarray(_ic_angle_kernels())
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :], k,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


def ic_angles_at(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """IC angles at integer keypoint positions via row prefix sums.

    Exactly the circular-patch moments of IC_Angle (``ORBextractor.cc:77-104``):
    each patch row's sums come from two cumsum lookups instead of a 31-tap
    correlation, so the cost is ~125 gathers per keypoint instead of a 31x31
    whole-image conv. Keypoints must lie >= 16 px from the border (they do:
    detection uses edge_threshold >= 19).
    """
    H, W = img.shape
    um = umax_table()
    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    P0 = jnp.cumsum(img, axis=1)
    P1 = jnp.cumsum(img * col, axis=1)
    P0f = P0.ravel()
    P1f = P1.ravel()

    xf = x.astype(jnp.float32)
    m10 = jnp.zeros(x.shape, jnp.float32)
    m01 = jnp.zeros(x.shape, jnp.float32)
    for v in range(-HALF_PATCH, HALF_PATCH + 1):
        d = um[abs(v)]
        base = (y + v) * W
        hi = jnp.clip(base + x + d, 0, H * W - 1)       # invalid slots only
        lo = jnp.clip(base + x - d - 1, 0, H * W - 1)
        s0 = P0f[hi] - P0f[lo]
        s1 = P1f[hi] - P1f[lo]
        m10 = m10 + (s1 - xf * s0)
        m01 = m01 + float(v) * s0
    return jnp.arctan2(m01, m10)


def _pack_bits_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) bool -> (N, 8) uint32, little-endian within bytes and words so
    byte k of the OpenCV descriptor == (word[k//4] >> 8*(k%4)) & 0xFF."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def _descriptors(blurred: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated rBRIEF for keypoints at integer coords (x, y) on one level.

    Matches computeOrbDescriptor (``ORBextractor.cc:108-147``): sample point i
    is read at (x + round(px_i*cos - py_i*sin), y + round(px_i*sin + py_i*cos))
    from the blurred image; bit i = sample(2i) < sample(2i+1).
    """
    H, W = blurred.shape
    pat = jnp.asarray(_brief_pattern().astype(np.float32))  # (512, 2)
    a = jnp.cos(angle)[:, None]
    b = jnp.sin(angle)[:, None]
    px, py = pat[:, 0][None, :], pat[:, 1][None, :]
    sx = jnp.round(px * a - py * b).astype(jnp.int32) + x[:, None]
    sy = jnp.round(px * b + py * a).astype(jnp.int32) + y[:, None]
    sx = jnp.clip(sx, 0, W - 1)
    sy = jnp.clip(sy, 0, H - 1)
    vals = blurred.ravel()[sy * W + sx]                      # (N, 512)
    v0 = vals[:, 0::2]
    v1 = vals[:, 1::2]
    return _pack_bits_u32(v0 < v1)


# rBRIEF sample offsets stay within +-18 px of the keypoint under any
# rotation (max pattern radius 18.38 -> round() <= 18), and IC-angle's
# circular patch within +-15; detection keeps keypoints >= 19 px
# (edge_threshold) from the border, so a 37x37 patch covers both stages.
PATCH_HALF = 18
PATCH = 2 * PATCH_HALF + 1


@functools.lru_cache()
def _ic_patch_kernels() -> np.ndarray:
    """(2, PATCH, PATCH) u/v circular-moment weights, centered in the 37x37
    extraction patch (outer ring zero — IC angle uses only the +-15 disc)."""
    k31 = _ic_angle_kernels()[:, 0]          # (2, 31, 31)
    pad = PATCH_HALF - HALF_PATCH
    return np.pad(k31, ((0, 0), (pad, pad), (pad, pad)))


def _patches_at(raw: jnp.ndarray, blurred: jnp.ndarray,
                x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(n, 2, PATCH, PATCH) image patches centered at integer (x, y) via
    one-hot row/col selection MATMULS on the MXU.

    This replaces per-sample random gathers: the TPU's gather unit runs at
    ~0.125 elements/cycle regardless of batching, which made rBRIEF's 512
    samples/keypoint the single most expensive stage of the whole frame
    (~5 ms at 1200 kps); the same selection as two one-hot matmuls streams
    through the systolic array in tens of microseconds. Values are exact:
    u8 pixels are integers <= 255 (exact in bf16) and each one-hot product
    accumulates exactly one nonzero term in f32.
    """
    H, W = raw.shape
    d = jnp.arange(-PATCH_HALF, PATCH_HALF + 1, dtype=jnp.int32)
    rows = y[:, None] + d                           # (n, PATCH)
    cols = x[:, None] + d                           # (n, PATCH)
    oh_r = (rows[:, :, None] ==
            jnp.arange(H, dtype=jnp.int32)[None, None, :]).astype(jnp.bfloat16)
    oh_c = (jnp.arange(W, dtype=jnp.int32)[None, :, None] ==
            cols[:, None, :]).astype(jnp.bfloat16)
    img2 = jnp.stack([raw, blurred]).astype(jnp.bfloat16)   # (2, H, W)
    strips = jnp.einsum("krh,chw->kcrw", oh_r, img2,
                        preferred_element_type=jnp.float32)  # (n, 2, P, W)
    patches = jnp.einsum("kcrw,kwp->kcrp", strips.astype(jnp.bfloat16), oh_c,
                         preferred_element_type=jnp.float32)
    return patches


def _ic_angles_from_patches(patch_raw: jnp.ndarray) -> jnp.ndarray:
    """IC angle per keypoint from its raw patch — same circular moments as
    IC_Angle (``ORBextractor.cc:77-104``), as two weighted patch sums."""
    k = jnp.asarray(_ic_patch_kernels())            # (2, P, P)
    m = jnp.einsum("kij,cij->kc", patch_raw, k)     # (n, 2) -> m10, m01
    return jnp.arctan2(m[:, 1], m[:, 0])


def _descriptors_from_patches(patch_blur: jnp.ndarray,
                              angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated rBRIEF from blurred patches (computeOrbDescriptor,
    ``ORBextractor.cc:108-147``): the rotated in-patch sample is selected by
    a one-hot row matmul + one-hot column reduce — no gathers."""
    n = patch_blur.shape[0]
    pat = jnp.asarray(_brief_pattern().astype(np.float32))   # (512, 2)
    a = jnp.cos(angle)[:, None]
    b = jnp.sin(angle)[:, None]
    px, py = pat[:, 0][None, :], pat[:, 1][None, :]
    sx = jnp.round(px * a - py * b).astype(jnp.int32) + PATCH_HALF  # (n, 512)
    sy = jnp.round(px * b + py * a).astype(jnp.int32) + PATCH_HALF
    grid = jnp.arange(PATCH, dtype=jnp.int32)
    oh_y = (sy[:, :, None] == grid[None, None, :]).astype(jnp.bfloat16)
    t = jnp.einsum("ksr,krc->ksc", oh_y, patch_blur.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)       # (n, 512, P)
    oh_x = (sx[:, :, None] == grid[None, None, :]).astype(jnp.float32)
    vals = jnp.sum(t * oh_x, axis=-1)                        # (n, 512)
    v0 = vals[:, 0::2]
    v1 = vals[:, 1::2]
    return _pack_bits_u32(v0 < v1)


def extract(img: jnp.ndarray, cfg: OrbConfig) -> Keypoints:
    """Full ORB extraction for one grayscale image (H, W) float32 in [0, 255].

    Python loop over static pyramid levels (each level is its own fused XLA
    subgraph); returns a fixed ``cfg.max_kps``-slot Keypoints struct.
    """
    kps, _ = extract_with_pyramid(img, cfg)
    return kps


def extract_with_pyramid(img: jnp.ndarray, cfg: OrbConfig):
    """extract() that also returns the unblurred pyramid level images
    (needed by the stereo SAD refinement, frontend/stereo.py).

    Structure: detection (whole-image ops, XLA-fused) runs per level; the
    per-keypoint stages (IC angle, rBRIEF) read one 37x37 patch per keypoint
    extracted by one-hot matmuls (_patches_at) — the gather-free MXU path."""
    budgets = level_budgets(cfg)
    H, W = img.shape
    img = quantize_u8(img)

    # NOTE on the pyramid: the resize chain is the extractor's largest cost
    # (~1.1 ms standalone). Two alternatives were built and measured SLOWER:
    # interpolation-matrix matmuls in XLA (ops/image.resize_matmul, -4% fps
    # end-to-end) and the same chain fused into one Pallas kernel with all
    # levels resident in VMEM (mosaic's HIGHEST-precision matmul on these
    # skinny unaligned shapes: 2.7 ms vs 1.9 ms). The gather-based
    # jax.image.resize chain stays.
    xs_l, ys_l, rs, octs, valids, angles, descs = [], [], [], [], [], [], []
    pyramid = []
    level_img = img
    for lvl in range(cfg.n_levels):
        if lvl > 0:
            scale = cfg.scale_factor ** lvl
            sz = (int(round(H / scale)), int(round(W / scale)))
            level_img = quantize_u8(resize_linear(level_img, sz))
        pyramid.append(level_img)
        Hl, Wl = level_img.shape

        resp_map = fast_ops.detect(
            fast_ops.fast_score_map(level_img),
            threshold=float(cfg.ini_th_fast),
            min_threshold=float(cfg.min_th_fast),
            cell=cfg.fast_cell, border=cfg.edge_threshold)
        # per-level budget selection (the geometric budgets of
        # ORBextractor.cc:444-455). Exact top_k by default; a recall < 1
        # switches to approx_max_k, which silently drops up to (1-recall)
        # of the strongest corners per level (measured on chip: exact
        # top_k costs the same at these budget sizes, so exact is default)
        if cfg.approx_topk_recall < 1.0:
            vals, idx = jax.lax.approx_max_k(
                resp_map.ravel(), budgets[lvl],
                recall_target=cfg.approx_topk_recall)
        else:
            vals, idx = jax.lax.top_k(resp_map.ravel(), budgets[lvl])
        y = idx // Wl
        x = idx % Wl
        n_l = budgets[lvl]
        xs_l.append(x)
        ys_l.append(y)
        rs.append(vals)
        valids.append(vals > 0.0)
        octs.append(jnp.full((n_l,), lvl, jnp.int32))

        blurred = quantize_u8(gaussian_blur_7x7(level_img))
        patches = _patches_at(level_img, blurred, x, y)
        angle_l = _ic_angles_from_patches(patches[:, 0])
        angles.append(angle_l)
        descs.append(_descriptors_from_patches(patches[:, 1], angle_l))

    x = jnp.concatenate(xs_l)
    y = jnp.concatenate(ys_l)
    response = jnp.concatenate(rs)
    octave = jnp.concatenate(octs)
    valid = jnp.concatenate(valids)
    angle = jnp.concatenate(angles)
    desc = jnp.concatenate(descs)

    scale_per = jnp.asarray([cfg.scale_factor ** l
                             for l in range(cfg.n_levels)], jnp.float32)
    xy = jnp.stack([x, y], -1).astype(jnp.float32) * scale_per[octave][:, None]

    n = xy.shape[0]
    pad = cfg.max_kps - n
    if pad < 0:
        raise ValueError(f"max_kps={cfg.max_kps} < n_features={n}")
    if pad:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        response = jnp.pad(response, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        octave = jnp.pad(octave, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return Keypoints(xy=xy, response=response, angle=angle,
                     octave=octave, desc=desc, valid=valid), pyramid
