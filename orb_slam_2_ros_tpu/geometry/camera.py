"""Pinhole camera with Brown-Conrady distortion; batched over points.

Replaces the reference's OpenCV calls: ``cv::projectPoints``-style forward
projection used implicitly throughout, ``cv::undistortPoints``
(``Frame.cc:438-469``) via a fixed-iteration Newton/fixed-point inverse, and
the RGB-D pseudo-stereo coordinate ``uR = u - bf/d`` (``Frame.cc:679-701``).
All functions take pixel arrays (..., 2) / point arrays (..., 3) and are
jit/vmap friendly (fixed iteration counts, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam_2_ros_tpu.config import CameraConfig

_EPS = 1e-9


def intrinsics(cam: CameraConfig) -> jnp.ndarray:
    return jnp.array([[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]])


def distort_normalized(cam: CameraConfig, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply Brown model to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xt = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yt = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xt, yt], axis=-1)


def undistort_normalized(cam: CameraConfig, xy_d: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert the Brown model by fixed-point iteration (cv::undistortPoints
    uses the same scheme with 5 iterations; we use `iters` for tighter parity
    with its termination on strong distortion)."""
    x_d, y_d = xy_d[..., 0], xy_d[..., 1]
    x, y = x_d, y_d
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x = (x_d - dx) / radial
        y = (y_d - dy) / radial
    return jnp.stack([x, y], axis=-1)


def undistort_pixels(cam: CameraConfig, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted pixel coords (same K), the
    ``Frame::UndistortKeyPoints`` operation (``Frame.cc:438-469``)."""
    if not cam.has_distortion:
        return uv
    xy_d = (uv - jnp.array([cam.cx, cam.cy])) / jnp.array([cam.fx, cam.fy])
    xy = undistort_normalized(cam, xy_d)
    return xy * jnp.array([cam.fx, cam.fy]) + jnp.array([cam.cx, cam.cy])


def project(cam: CameraConfig, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> undistorted pixels (..., 2).

    Matching/optimization all operate in the undistorted pixel frame, like the
    reference (keypoints are undistorted once at Frame build; projections use
    plain pinhole, e.g. ``Frame.cc:284-350``, ``Optimizer.cc`` cam_project).
    """
    z = jnp.maximum(xc[..., 2:3], _EPS)
    xy = xc[..., :2] / z
    return xy * jnp.array([cam.fx, cam.fy]) + jnp.array([cam.cx, cam.cy])


def project_stereo(cam: CameraConfig, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points -> (u, v, uR) with uR = u - bf/z (g2o
    EdgeStereoSE3ProjectXYZ measurement model)."""
    uv = project(cam, xc)
    z = jnp.maximum(xc[..., 2:3], _EPS)
    ur = uv[..., :1] - cam.bf / z
    return jnp.concatenate([uv, ur], axis=-1)


def backproject(cam: CameraConfig, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels + depth -> camera-frame 3D (``Frame::UnprojectStereo``,
    ``Frame.cc:704-720``). depth shape (...,) or (..., 1)."""
    d = depth[..., None] if depth.ndim == uv.ndim - 1 else depth
    xy = (uv - jnp.array([cam.cx, cam.cy])) / jnp.array([cam.fx, cam.fy])
    return jnp.concatenate([xy * d, d], axis=-1)


def depth_from_disparity(cam: CameraConfig, u_left: jnp.ndarray, u_right: jnp.ndarray) -> jnp.ndarray:
    """z = bf / (uL - uR); invalid (non-positive) disparity -> -1."""
    disp = u_left - u_right
    z = cam.bf / jnp.maximum(disp, _EPS)
    return jnp.where(disp > 0, z, -1.0)


def right_coord_from_depth(cam: CameraConfig, u: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """RGB-D pseudo-stereo: uR = u - bf/d for valid depth else -1
    (``Frame::ComputeStereoFromRGBD``, ``Frame.cc:679-701``)."""
    return jnp.where(depth > 0, u - cam.bf / jnp.maximum(depth, _EPS), -1.0)


def in_image(cam: CameraConfig, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    """Frustum bounds check against the undistorted image rectangle
    (cf. ``Frame::ComputeImageBounds`` + ``isInFrustum`` ``Frame.cc:284-350``)."""
    u, v = uv[..., 0], uv[..., 1]
    return ((u >= border) & (u < cam.width - border)
            & (v >= border) & (v < cam.height - border))
