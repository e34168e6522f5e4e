"""Stereo matching: rectified left/right ORB association + subpixel disparity.

Replaces ``Frame::ComputeStereoMatches`` (``Frame.cc:502-676``): the
reference builds per-row candidate lists, finds the best Hamming match along
the epipolar band, then refines disparity to subpixel by sliding an 11x11
SAD window on the pyramid level image with parabola interpolation, and
rejects outliers against a median-SAD threshold. Here the candidate search
is one masked (P x P) Hamming matrix (row band, octave band, disparity
range), and the SAD refinement is a batched gather over a flattened pyramid
buffer — identical math, no loops.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend.extractor import Keypoints
from orb_slam_2_ros_tpu.ops.hamming import INF_DIST, hamming_matrix

_W = 5           # SAD half-window (Frame.cc:570)
_SLIDE = 5       # disparity slide range L (Frame.cc:579)


class FlatPyramid(NamedTuple):
    """A pyramid flattened into one buffer for octave-indexed gathers."""

    data: jnp.ndarray      # (total_pixels,) float32
    offset: jnp.ndarray    # (L,) int32 start of each level
    width: jnp.ndarray     # (L,) int32
    height: jnp.ndarray    # (L,) int32


def flatten_pyramid(levels: Sequence[jnp.ndarray]) -> FlatPyramid:
    offs, ws, hs = [], [], []
    o = 0
    for img in levels:
        offs.append(o)
        hs.append(img.shape[0])
        ws.append(img.shape[1])
        o += img.shape[0] * img.shape[1]
    return FlatPyramid(
        data=jnp.concatenate([im.ravel() for im in levels]),
        offset=jnp.asarray(offs, jnp.int32),
        width=jnp.asarray(ws, jnp.int32),
        height=jnp.asarray(hs, jnp.int32))


def _gather_patches(pyr: FlatPyramid, octave, xc, yc, dxs, dys):
    """Gather pyramid values at (xc + dx, yc + dy) on each keypoint's level.

    octave, xc, yc: (N,) int32 level coords; dxs, dys: (K,) offsets.
    Returns (N, K) float32."""
    off = pyr.offset[octave][:, None]
    W = pyr.width[octave][:, None]
    H = pyr.height[octave][:, None]
    x = jnp.clip(xc[:, None] + dxs[None, :], 0, W - 1)
    y = jnp.clip(yc[:, None] + dys[None, :], 0, H - 1)
    return pyr.data[off + y * W + x]


def compute_stereo_matches(kl: Keypoints, kr: Keypoints,
                           pyr_l: FlatPyramid, pyr_r: FlatPyramid,
                           cfg: SlamConfig):
    """Returns (u_right (P,), depth (P,)) for the left frame, -1 where
    unmatched — the ``mvuRight``/``mvDepth`` channels (``Frame.cc:504-505``).
    """
    cam = cfg.camera
    m = cfg.matcher
    P = kl.xy.shape[0]
    sf = cfg.orb.scale_factor
    inv_sf = jnp.float32(1.0 / sf)

    # ---- 1. coarse hamming match along the epipolar band
    vL = kl.xy[:, 1]
    vR = kr.xy[None, :, 1]
    r_band = 2.0 * sf ** kr.octave.astype(jnp.float32)      # (P,) of right kp
    row_ok = jnp.abs(vL[:, None] - vR) <= r_band[None, :]

    oL = kl.octave[:, None]
    oR = kr.octave[None, :]
    oct_ok = (oR >= oL - 1) & (oR <= oL + 1)

    uL = kl.xy[:, 0]
    uR = kr.xy[None, :, 0]
    min_d, max_d = 0.0, cam.bf / 1.0 * 0 + cam.fx           # maxD = bf/minB = fx
    disp = uL[:, None] - uR
    disp_ok = (disp > min_d) & (disp <= max_d)

    mask = row_ok & oct_ok & disp_ok & kl.valid[:, None] & kr.valid[None, :]
    D = jnp.where(mask, hamming_matrix(kl.desc, kr.desc), INF_DIST)
    best = jnp.argmin(D, axis=1)
    best_d = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    th_orb = (m.th_high + m.th_low) / 2                     # Frame.cc:547
    coarse_ok = best_d < th_orb

    # ---- 2. subpixel SAD refinement on the left keypoint's octave
    scale_inv = inv_sf ** kl.octave.astype(jnp.float32)
    xL = jnp.round(kl.xy[:, 0] * scale_inv).astype(jnp.int32)
    yL = jnp.round(kl.xy[:, 1] * scale_inv).astype(jnp.int32)
    uR0 = kr.xy[best, 0]
    xR0 = jnp.round(uR0 * scale_inv).astype(jnp.int32)

    win = np.arange(-_W, _W + 1)
    dxs = jnp.asarray(np.tile(win, len(win)), jnp.int32)        # (121,)
    dys = jnp.asarray(np.repeat(win, len(win)), jnp.int32)
    patch_l = _gather_patches(pyr_l, kl.octave, xL, yL, dxs, dys)  # (P, 121)
    # center-normalized SAD like the reference (IL - IL_center)
    center_l = _gather_patches(pyr_l, kl.octave, xL, yL,
                               jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1,), jnp.int32))
    patch_l = patch_l - center_l

    slide = np.arange(-_SLIDE, _SLIDE + 1)
    wide = np.arange(-_W - _SLIDE, _W + _SLIDE + 1)
    dxs_w = jnp.asarray(np.tile(wide, len(win)), jnp.int32)      # (11*21,)
    dys_w = jnp.asarray(np.repeat(win, len(wide)), jnp.int32)
    patch_r = _gather_patches(pyr_r, kl.octave, xR0, yL, dxs_w, dys_w)
    center_r = _gather_patches(pyr_r, kl.octave, xR0, yL,
                               jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1,), jnp.int32))
    patch_r = (patch_r - center_r).reshape(P, len(win), len(wide))
    pl = patch_l.reshape(P, len(win), len(win))

    # SAD for each of the 11 slide offsets
    sads = []
    for i, s in enumerate(slide):
        pr = jax.lax.dynamic_slice_in_dim(patch_r, i, len(win), axis=2)
        sads.append(jnp.sum(jnp.abs(pl - pr), axis=(1, 2)))
    sads = jnp.stack(sads, axis=1)                              # (P, 11)

    best_i = jnp.argmin(sads, axis=1)
    interior = (best_i > 0) & (best_i < len(slide) - 1)
    i0 = jnp.clip(best_i, 1, len(slide) - 2)
    s_m = jnp.take_along_axis(sads, (i0 - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sads, i0[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sads, (i0 + 1)[:, None], 1)[:, 0]
    delta = (s_m - s_p) / jnp.maximum(2.0 * (s_m + s_p - 2.0 * s_0), 1e-9)
    delta = jnp.clip(delta, -1.0, 1.0)

    sf_l = sf ** kl.octave.astype(jnp.float32)
    uR_sub = sf_l * (xR0.astype(jnp.float32)
                     + (i0 - _SLIDE).astype(jnp.float32) + delta)
    disparity = uL - uR_sub
    ok = (coarse_ok & interior & (disparity > min_d) & (disparity < max_d)
          & kl.valid)

    # ---- 3. median-SAD outlier rejection (Frame.cc:644-667)
    sad_best = s_0
    sad_sorted = jnp.sort(jnp.where(ok, sad_best, jnp.inf))
    n_ok = jnp.sum(ok.astype(jnp.int32))
    median = sad_sorted[jnp.clip(n_ok // 2, 0, P - 1)]
    th = 1.5 * 1.4 * median
    ok = ok & (sad_best <= th)

    u_right = jnp.where(ok, uR_sub, -1.0)
    depth = jnp.where(ok, cam.bf / jnp.maximum(disparity, 1e-9), -1.0)
    return u_right, depth
