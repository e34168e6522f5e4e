"""Frame: fixed-shape per-image measurement struct.

Functional replacement for the reference ``Frame`` class (``Frame.cc``): ORB
keypoints + undistorted coords + stereo/depth channels, built in one jitted
call. The 64x48 feature grid (``Frame.cc:239-256``) is not materialized —
windowed candidate search is done with whole-matrix masks in matcher.py,
which is the TPU-shaped equivalent of GetFeaturesInArea.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend import extractor
from orb_slam_2_ros_tpu.frontend.extractor import Keypoints
from orb_slam_2_ros_tpu.geometry import camera


class Frame(NamedTuple):
    """One image's measurements (pose lives in the tracking state, not here)."""

    kps: Keypoints          # raw (distorted) coords + desc + angle + octave
    uv: jnp.ndarray         # (max_kps, 2) undistorted pixel coords
    u_right: jnp.ndarray    # (max_kps,) right-image u coord, -1 if unavailable
    depth: jnp.ndarray      # (max_kps,) metric depth, -1 if unavailable

    @property
    def valid(self):
        return self.kps.valid

    @property
    def desc(self):
        return self.kps.desc


def build_mono(gray: jnp.ndarray, cfg: SlamConfig) -> Frame:
    """Monocular frame (``Frame.cc:182-236``): extract + undistort."""
    kps = extractor.extract(gray, cfg.orb)
    uv = camera.undistort_pixels(cfg.camera, kps.xy)
    neg = jnp.full((cfg.orb.max_kps,), -1.0)
    return Frame(kps=kps, uv=uv, u_right=neg, depth=neg)


def build_stereo(gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                 cfg: SlamConfig) -> Frame:
    """Rectified stereo frame (``Frame.cc:62-118``): ORB on both images (the
    reference uses two std::threads, ``Frame.cc:79-82`` — here one fused
    program), then epipolar-band matching with subpixel SAD disparity
    (frontend/stereo.py)."""
    from orb_slam_2_ros_tpu.frontend import stereo as stereo_mod
    kl, pyr_l = extractor.extract_with_pyramid(gray_l, cfg.orb)
    kr, pyr_r = extractor.extract_with_pyramid(gray_r, cfg.orb)
    uv = camera.undistort_pixels(cfg.camera, kl.xy)
    ur, depth = stereo_mod.compute_stereo_matches(
        kl, kr, stereo_mod.flatten_pyramid(pyr_l),
        stereo_mod.flatten_pyramid(pyr_r), cfg)
    return Frame(kps=kl, uv=uv, u_right=ur, depth=depth)


def build_rgbd(gray: jnp.ndarray, depth_img: jnp.ndarray, cfg: SlamConfig) -> Frame:
    """RGB-D frame (``Frame.cc:62-118`` + ``ComputeStereoFromRGBD``
    ``Frame.cc:679-701``): depth sampled at the raw keypoint pixel, pseudo
    right coordinate uR = u_undist - bf/d.

    depth_img: (H, W) float32 in metric units (already divided by the TUM
    depth factor by the dataset loader); <=0 marks missing depth.
    """
    kps = extractor.extract(gray, cfg.orb)
    uv = camera.undistort_pixels(cfg.camera, kps.xy)
    H, W = depth_img.shape
    xi = jnp.clip(jnp.round(kps.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(kps.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img.ravel()[yi * W + xi]
    d = jnp.where(kps.valid & (d > 0), d, -1.0)
    ur = camera.right_coord_from_depth(cfg.camera, uv[:, 0], d)
    return Frame(kps=kps, uv=uv, u_right=ur, depth=d)
