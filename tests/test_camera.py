"""Camera model tests: project/backproject roundtrips and undistortion parity
with cv::undistortPoints (the exact routine the reference calls at
``Frame.cc:438-469``)."""

import cv2
import jax.numpy as jnp
import numpy as np

from orb_slam_2_ros_tpu.config import CameraConfig, tum_fr1_config
from orb_slam_2_ros_tpu.geometry import camera, triangulate, se3

RNG = np.random.default_rng(1)


def _cam():
    return tum_fr1_config().camera


def test_project_backproject_roundtrip():
    cam = _cam()
    pts = np.stack([
        RNG.uniform(-2, 2, 256), RNG.uniform(-2, 2, 256), RNG.uniform(0.5, 5, 256)
    ], axis=-1)
    uv = camera.project(cam, jnp.array(pts))
    back = camera.backproject(cam, uv, jnp.array(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_undistort_matches_opencv():
    cam = _cam()
    uv = np.stack([RNG.uniform(30, 610, 500), RNG.uniform(30, 450, 500)], -1)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2, cam.k3])
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, dist, P=K).reshape(-1, 2)
    ours = np.asarray(camera.undistort_pixels(cam, jnp.array(uv)))
    # fixed-point iteration vs opencv's; should agree to sub-0.05px over the image
    err = np.linalg.norm(ours - ref, axis=-1)
    assert np.percentile(err, 95) < 5e-2, err.max()


def test_undistort_distort_roundtrip():
    cam = _cam()
    xy = np.stack([RNG.uniform(-0.4, 0.4, 300), RNG.uniform(-0.3, 0.3, 300)], -1)
    xy_d = camera.distort_normalized(cam, jnp.array(xy))
    xy_u = camera.undistort_normalized(cam, xy_d, iters=20)
    np.testing.assert_allclose(np.asarray(xy_u), xy, atol=1e-5)


def test_no_distortion_is_identity():
    cam = CameraConfig()
    uv = jnp.array(RNG.uniform(0, 600, size=(64, 2)))
    np.testing.assert_allclose(np.asarray(camera.undistort_pixels(cam, uv)), np.asarray(uv))


def test_stereo_depth_consistency():
    cam = _cam()
    pts = np.stack([
        RNG.uniform(-2, 2, 128), RNG.uniform(-2, 2, 128), RNG.uniform(0.5, 5, 128)
    ], axis=-1)
    uvr = camera.project_stereo(cam, jnp.array(pts))
    z = camera.depth_from_disparity(cam, uvr[..., 0], uvr[..., 2])
    np.testing.assert_allclose(np.asarray(z), pts[:, 2], rtol=1e-4)
    ur = camera.right_coord_from_depth(cam, uvr[..., 0], jnp.array(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(ur), np.asarray(uvr[..., 2]), atol=1e-4)


def test_triangulate_exact():
    cam = _cam()
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    pts = np.stack([
        RNG.uniform(-1, 1, 128), RNG.uniform(-1, 1, 128), RNG.uniform(2, 6, 128)
    ], axis=-1)
    q1, t1 = se3.identity()
    phi = np.array([0.02, -0.03, 0.01])
    q2 = se3.quat_exp(jnp.array(phi))
    t2 = jnp.array([0.3, 0.02, -0.05])
    P1 = triangulate.projection_matrix(jnp.array(K), q1, t1)
    P2 = triangulate.projection_matrix(jnp.array(K), q2, t2)
    uv1 = camera.project(cam, jnp.array(pts))
    uv2 = camera.project(cam, se3.apply(q2, t2, jnp.array(pts)))
    X = triangulate.triangulate_dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(X), pts, atol=3e-2)
    cosp = triangulate.parallax_cos(X, se3.camera_center(q1, t1), se3.camera_center(q2, t2))
    assert np.all(np.asarray(cosp) < 1.0)
    assert np.all(np.asarray(triangulate.depth_in_camera(q2, t2, X)) > 0)


def test_in_image():
    cam = CameraConfig()
    uv = jnp.array([[0.0, 0.0], [639.0, 479.0], [-1.0, 10.0], [640.0, 100.0], [320.0, 240.0]])
    mask = np.asarray(camera.in_image(cam, uv))
    np.testing.assert_array_equal(mask, [True, True, False, False, True])
